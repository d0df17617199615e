"""Byte-pair-encoding tokenizer: distributed training + encoding over the
``documents`` table.

The training-data-pipeline shape (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public):

1. **Word counting is the only pass over the corpus** (map_batches
   partials → one small groupby). BPE training operates on the
   word-frequency TABLE, never the corpus — the table is bounded by
   vocabulary (≈ hundreds of thousands of rows at 100 TB), so the merge
   loop runs on the driver over kilobytes-to-megabytes, not terabytes.
2. **Merge training** is inherently sequential (each merge changes pair
   counts), done once on the driver with incremental pair-count updates.
   A top-``MAX_TRAIN_WORDS`` cap by frequency bounds driver memory; the
   dropped tail is logged via the returned stats, never silent.
3. **Encoding** broadcasts the merge ranks (``ray.put`` once) and encodes
   per distinct word per batch with an actor-held cache — corpus word
   distributions are Zipfian, so the cache hit rate dominates.

Rows-only oracle (SQL cannot express iterative merge training); exact
semantics are pinned by tests/test_tokenize.py against an independent
reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_MERGES = 200
MAX_TRAIN_WORDS = 100_000
_EOW = ""  # end-of-word sentinel (control char never in corpus text)


def _read(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def word_counts(sf_dir: str):
    """Distributed (word, n) over whitespace tokens — the corpus'
    single full pass for BPE training."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        toks = pc.list_flatten(pc.split_pattern_regex(text, r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    return _read(sf_dir, ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))


def train_merges(vocab: dict[str, int],
                 n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Sequential BPE merge training over a word-frequency dict.
    Incremental pair-count maintenance: each merge only touches words
    containing the merged pair (indexed), so the loop is
    O(n_merges × affected words), not O(n_merges × vocab)."""
    words: list[list[str]] = [list(w) + [_EOW] for w in vocab]
    freqs = list(vocab.values())
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic: max count, ties by lexicographic pair
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0][0],
                                                        kv[0][1]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms, f = words[wi], freqs[wi]
            # remove old pair contributions of this word
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[(a, b)]
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the standard
    inference loop)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(sf_dir: str, n_merges: int = N_MERGES,
              max_words: int = MAX_TRAIN_WORDS):
    """→ (merges, stats). Word counts distributed; merge loop driver-side
    over the top-``max_words`` rows of the (small) frequency table."""
    wc = word_counts(sf_dir)

    def topcut(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "word"],
                              ascending=[False, True]).head(max_words)

    pdf = wc.map_batches(topcut, batch_format="pandas").to_pandas()
    pdf = pdf.sort_values(["n", "word"],
                          ascending=[False, True])
    n_total = len(pdf)
    pdf = pdf.head(max_words)
    vocab = dict(zip(pdf["word"], pdf["n"].astype(int)))
    merges = train_merges(vocab, n_merges)
    stats = {"n_distinct_words": n_total,
             "n_train_words": len(vocab),
             "n_merges": len(merges)}
    return merges, stats


class _BpeEncoder:
    """Actor-pool encode stage: merge ranks fetched once per actor from
    the object store; per-word memo cache (Zipfian corpus → high reuse)."""

    def __init__(self, ranks_ref):
        self.ranks: dict[tuple[str, str], int] = ray.get(ranks_ref)
        self.cache: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy().astype("int64")
        flat = toks.values.to_pylist()
        cache, ranks = self.cache, self.ranks
        ntok = np.empty(len(flat), dtype="int64")
        for i, w in enumerate(flat):
            n = cache.get(w)
            if n is None:
                n = len(encode_word(w, ranks)) if w else 0
                if len(cache) < 1_000_000:
                    cache[w] = n
            ntok[i] = n
        # per-doc sums via the list offsets
        ends = np.cumsum(lens)
        starts = ends - lens
        csum = np.concatenate([[0], np.cumsum(ntok)])
        per_doc = csum[ends] - csum[starts]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bpe_tokens": pa.array(per_doc.astype("int64")),
        })


def bpe_tokenize(sf_dir: str, n_merges: int = N_MERGES):
    """(doc_id, n_bpe_tokens): BPE token count per document under merges
    trained on this corpus. Rows-only oracle (iterative training is not
    SQL-expressible); tests/test_tokenize.py pins exact token counts
    against an independent naive implementation."""
    merges, _ = train_bpe(sf_dir, n_merges)
    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    return _read(sf_dir, ["doc_id", "text"]) \
        .map_batches(_BpeEncoder, fn_constructor_args=(ranks_ref,),
                     batch_format="pyarrow", concurrency=(1, 8))
