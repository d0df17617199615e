#!/usr/bin/env python
"""Scale the driver's testdata up deterministically (sf0.1 -> sf1).

The sandbox driver generates sf0.001/0.01/0.1; the 100-TB design target
needs at least one order-of-magnitude stress point beyond what the
driver checks, so this tool replicates /root/testdata/sf0.1 REP times
with key shifts that preserve referential integrity exactly:

- every primary key column shifts by ``rep * (max_key + 1)`` and every
  foreign key column shifts by ITS referenced table's span, so replica r
  of orders joins replica r of customer, etc. — join/groupby cardinality
  scales linearly with no cross-replica key collisions;
- dimension tables that the driver keeps fixed across sf (region,
  nation) are copied unchanged;
- ``documents.text`` is perturbed per replica (word replacement at 40%
  from the same language's vocabulary, RNG seeded by (rep, block)) so
  exact/near-dup operators see realistic 10x corpora instead of a
  degenerate every-doc-has-9-identical-copies corpus; within-replica
  near-dup structure is preserved untouched;
- ``embeddings.embedding`` gets per-replica gaussian noise at 5% of the
  per-corpus std, so ANN/near-dup vector ops see 10x distinct points.

Values within a replica are the driver's own distributions (including
its skew), which is the point of the stress test. Deterministic:
seed=42 throughout. Output is one parquet per table, same schema.

Usage: python tools/gen_sf.py [--src /root/testdata/sf0.1] \
           [--out /tmp/sf1] [--reps 10]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: key-domain} ; a key domain's span is computed once
# from the source data and every column in that domain shifts by it
KEY_DOMAINS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
# which (table, column) defines each domain's span
DOMAIN_DEF = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
COPY_TABLES = ["region", "nation"]
SCALE_TABLES = ["customer", "supplier", "part", "orders", "lineitem",
                "events", "documents", "embeddings"]


def _spans(src: str) -> dict[str, int]:
    spans = {}
    for dom, (tbl, col) in DOMAIN_DEF.items():
        arr = pq.read_table(os.path.join(src, f"{tbl}.parquet"),
                            columns=[col])[col]
        spans[dom] = int(pc.max(arr).as_py()) + 1
    return spans


def _shift_columns(t: pa.Table, table: str, rep: int,
                   spans: dict[str, int]) -> pa.Table:
    for col, dom in KEY_DOMAINS.get(table, {}).items():
        idx = t.schema.get_field_index(col)
        arr = t[col]
        shifted = pc.add(arr, pa.scalar(rep * spans[dom], type=arr.type))
        t = t.set_column(idx, t.schema.field(idx), shifted.cast(arr.type))
    return t


def _perturb_documents(t: pa.Table, rep: int) -> pa.Table:
    """Word-replacement perturbation, vocabulary drawn per language."""
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    vocab: dict[str, list[str]] = {}
    for txt, lg in zip(texts, langs):
        vocab.setdefault(lg, [])
        if len(vocab[lg]) < 20000:
            vocab[lg].extend(txt.split())
    vocab = {lg: sorted(set(ws)) for lg, ws in vocab.items()}
    rng = np.random.default_rng((42, rep))
    out = []
    for txt, lg in zip(texts, langs):
        words = txt.split(" ")
        vw = vocab[lg]
        mask = rng.random(len(words)) < 0.4
        picks = rng.integers(0, len(vw), size=int(mask.sum()))
        j = 0
        for i in np.flatnonzero(mask):
            words[i] = vw[picks[j]]
            j += 1
        out.append(" ".join(words))
    n_chars = pa.array([len(s) for s in out], type=pa.int64())
    t = t.set_column(t.schema.get_field_index("text"),
                     t.schema.field("text"), pa.array(out, type=pa.string()))
    return t.set_column(t.schema.get_field_index("n_chars"),
                        t.schema.field("n_chars"), n_chars)


def _perturb_embeddings(t: pa.Table, rep: int) -> pa.Table:
    col = t["embedding"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # single chunk after combine
        col = col.chunk(0)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = col.offsets
    rng = np.random.default_rng((4242, rep))
    noise = rng.normal(0.0, 0.05 * float(values.std()),
                       size=values.shape).astype(np.float32)
    arr = pa.ListArray.from_arrays(offsets, pa.array(values + noise,
                                                     type=pa.float32()))
    return t.set_column(t.schema.get_field_index("embedding"),
                        t.schema.field("embedding"), arr)


def generate(src: str, out: str, reps: int) -> None:
    os.makedirs(out, exist_ok=True)
    spans = _spans(src)
    for name in COPY_TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows} rows", flush=True)
    for name in SCALE_TABLES:
        t0 = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = []
        for rep in range(reps):
            t = _shift_columns(t0, name, rep, spans)
            if rep > 0 and name == "documents":
                t = _perturb_documents(t, rep)
            if rep > 0 and name == "embeddings":
                t = _perturb_embeddings(t, rep)
            parts.append(t)
        full = pa.concat_tables(parts)
        pq.write_table(full, os.path.join(out, f"{name}.parquet"),
                       row_group_size=1 << 18)
        print(f"{name}: {t0.num_rows} -> {full.num_rows} rows", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=10)
    a = ap.parse_args()
    generate(a.src, a.out, a.reps)
