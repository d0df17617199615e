"""Document embedding as a stateful actor-pool inference stage.

The canonical "batched model inference" shape for a training-data
pipeline: a callable CLASS passed to ``map_batches(Cls, concurrency=N)``
whose ``__init__`` loads the model ONCE per actor and whose ``__call__``
embeds a whole Arrow batch vectorized. The container has no real encoder,
so the model is a deterministic signed feature-hashing projection
(Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning"): token → bucket ``h % D`` with sign ``±1`` from one hash bit,
L2-normalized — order-independent, reproducible across processes, and the
plumbing (schema, batching, actor signature, downstream ANN compatibility)
is real and tested. Swapping in a true encoder changes ``__init__`` and
the per-batch matmul only.

Reference analog: the reference has no embedding stage; this is a
build-brief training-data addition (SURVEY.md §2.7 extensions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..hashing import token_hash64_many

EMBED_DIM = 64


class HashEmbedder:
    """text → unit-norm float32 embedding of dimension ``dim``.

    One instance per actor: the "model load" (here: dimension + seed
    constants; for a real encoder: weights off object store / disk)
    happens once in ``__init__``, NOT per batch.
    """

    def __init__(self, dim: int = EMBED_DIM, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        text = pc.fill_null(t[self.text_col], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        # whitespace-split of ""/" " yields empty-string tokens — drop them
        keep = pc.not_equal(flat, "")
        flat = pc.filter(flat, keep)
        parent = pc.filter(parent, keep).to_numpy()
        n = len(t)
        if len(flat) == 0:
            vecs = np.zeros((n, self.dim), dtype=np.float32)
        else:
            h = token_hash64_many(flat)
            bucket = (h % np.uint64(self.dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            # one scatter-add over (row, bucket) pairs — no Python loop
            vecs = np.zeros((n, self.dim), dtype=np.float64)
            np.add.at(vecs, (parent, bucket), sign)
            norm = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = (vecs / np.maximum(norm, 1e-12)).astype(np.float32)
        return pa.table({
            self.id_col: t[self.id_col],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), self.dim),
        })


def embed_documents(sf_dir: str, dim: int = EMBED_DIM):
    """(doc_id, embedding fixed_size_list<float32>[dim]) for every
    document — actor-pool stage (concurrency sized modestly for the toy
    scale; on a cluster set concurrency × num_cpus to the node budget).
    Deterministic → rows-only driver check; semantics pinned by
    test_embed.py (unit norms, cross-run determinism, duplicate texts ⇒
    identical vectors, near-dup texts ⇒ high cosine).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(HashEmbedder, fn_constructor_kwargs={"dim": dim},
                          batch_format="pyarrow", concurrency=2)
