"""BPE tokenizer: trained merges and encoded token counts pinned against
an independent naive reference implementation (recount-all-pairs-per-
iteration, straight from the Sennrich 2016 pseudocode)."""
import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mycelium_ray.pipelines.tokenize import (_EOW, bpe_tokenize,
                                             encode_word, train_bpe,
                                             train_merges)

SF = "/root/testdata/sf0.001"


def naive_train(vocab: dict[str, int], n_merges: int):
    """Reference: full pair recount every iteration."""
    words = {w: list(w) + [_EOW] for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for w, syms in words.items():
            f = vocab[w]
            for p in zip(syms, syms[1:]):
                counts[p] += f
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0][0],
                                                   kv[0][1]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def naive_encode(word: str, merges) -> list[str]:
    syms = list(word) + [_EOW]
    for a, b in merges:  # apply merges in training order
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


VOCAB = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4,
         "new": 7, "wide": 1, "west": 2}


def test_train_matches_naive():
    assert train_merges(dict(VOCAB), 40) == naive_train(dict(VOCAB), 40)


def test_encode_matches_naive():
    merges = train_merges(dict(VOCAB), 40)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(VOCAB) + ["lowlife", "widestest", "zzz", "n"]:
        assert encode_word(w, ranks) == naive_encode(w, merges), w


def test_encode_word_no_merges():
    assert encode_word("abc", {}) == ["a", "b", "c", _EOW]
    assert encode_word("", {}) == [_EOW]


def test_bpe_tokenize_counts_vs_reference(ray_session):
    """End-to-end over the sf0.001 documents table: per-doc counts equal
    the naive per-word encode applied to the same corpus + same merges."""
    out = bpe_tokenize(SF, n_merges=60).to_pandas() \
        .set_index("doc_id")["n_bpe_tokens"]

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    vocab = collections.Counter()
    for txt in docs.values():
        vocab.update((txt or "").split())
    merges = naive_train(dict(vocab), 60)
    memo = {}
    for did, txt in docs.items():
        n = 0
        for w in (txt or "").split():
            if w not in memo:
                memo[w] = len(naive_encode(w, merges))
            n += memo[w]
        assert out[did] == n, did
    assert len(out) == len(docs)
    assert (out > 0).any()


def test_merges_nontrivial_on_corpus(ray_session):
    merges, stats = train_bpe(SF, n_merges=60)
    assert stats["n_merges"] == 60  # corpus is big enough to sustain 60
    assert stats["n_train_words"] == stats["n_distinct_words"] \
        or stats["n_train_words"] == 100_000
    # merged symbols grow: later merges build on earlier ones
    assert any(len(a) + len(b) > 3 for a, b in merges)
