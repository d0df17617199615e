"""Driver simulator: run every __ray_entry__.queries() key at a given
scale factor, run the matching oracle_sql() in DuckDB over the same
parquet tables, and compare rows / schema / values the way the external
driver does (sort columns by name, sort rows, hash values).

Usage:
    python tools/driver_check.py [sf_dir] [--only key1,key2] [--skip-slow]

Exit 0 iff every oracle-backed query matches and every oracle-less query
runs without error.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import numpy as np
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Keys whose DuckDB ORACLE (not the engine) goes quadratic/recursive at
# sf1 — range-join CTEs, recursive connected components, all-pairs
# verification (BASELINE.md "sf1 hotspot attribution").
SLOW_ORACLE_KEYS = {"orders_band_join", "dedup_clusters", "corpus_filter",
                    "curation_pipeline", "ngram_jaccard_pairs",
                    "editdist_pairs", "substring_dedup"}


def _empty_typed(ds) -> "pd.DataFrame":
    """Typed empty DataFrame from a Dataset's schema — ds.to_pandas()
    returns a column-less frame when every block is empty, even though
    the schema is known (Arrow-typed batches preserve it)."""
    sch = ds.schema()
    import pyarrow as pa
    return pa.Table.from_arrays(
        [pa.array([], t) for t in sch.types], names=sch.names).to_pandas()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            return _empty_typed(res)
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # driver hashes VALUES: int width doesn't matter, int-vs-float does
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # binary/list columns: make hashable/sortable
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                else (tuple(v) if isinstance(v, (list, np.ndarray)) else v))
    df = df.sort_values(list(df.columns), kind="mergesort",
                        ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            # match driver tolerance: round floats
            h.update(np.round(col.to_numpy(), 9).tobytes())
        else:
            h.update(repr(col.to_list()).encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip keys whose DUCKDB ORACLE is quadratic or "
                         "recursive (minutes-to-hours at sf1; the engine "
                         "side of each is profiled separately in "
                         "BASELINE.md)")
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as em
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')")

    qs = em.queries()
    oracles = em.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    results: dict[str, dict] = {}
    n_fail = 0
    for key, fn in qs.items():
        if only and key not in only:
            continue
        if args.skip_slow and key in SLOW_ORACLE_KEYS:
            continue
        row: dict = {"err": None}
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(args.sf_dir)))
            row["spark_rows"] = len(got)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"engine: {type(e).__name__}: {e}"
            results[key] = row
            n_fail += 1
            print(f"FAIL {key}: {row['err']}", flush=True)
            continue
        sql = oracles.get(key)
        if sql is None:
            row["oracle"] = "no_oracle"
            results[key] = row
            print(f"ok   {key}: rows={len(got)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            row["err"] = f"oracle: {type(e).__name__}: {e}"
            results[key] = row
            n_fail += 1
            print(f"FAIL {key}: {row['err']}", flush=True)
            continue
        row["oracle_rows"] = len(want)
        row["rows_match"] = len(got) == len(want)
        row["schema_match"] = (
            list(got.columns) == list(want.columns)
            and all(got[c].dtype == want[c].dtype for c in got.columns))
        row["hash_match"] = (row["rows_match"] and row["schema_match"]
                             and value_hash(got) == value_hash(want))
        results[key] = row
        status = "ok  " if row["hash_match"] else "FAIL"
        if not row["hash_match"]:
            n_fail += 1
            detail = []
            if not row["rows_match"]:
                detail.append(f"rows {len(got)}!={len(want)}")
            elif not row["schema_match"]:
                gc, wc = list(got.columns), list(want.columns)
                if gc != wc:
                    detail.append(f"cols {gc} != {wc}")
                else:
                    detail.append("dtypes " + str(
                        [(c, str(got[c].dtype), str(want[c].dtype))
                         for c in gc if got[c].dtype != want[c].dtype]))
            else:
                detail.append("value hash")
            print(f"FAIL {key}: {'; '.join(detail)}", flush=True)
        else:
            print(f"{status} {key}: rows={len(got)} "
                  f"[{time.time()-t0:.1f}s]", flush=True)

    n_oracle = sum(1 for r in results.values() if "hash_match" in r)
    n_green = sum(1 for r in results.values() if r.get("hash_match"))
    print(json.dumps({"total": len(results), "oracle_checked": n_oracle,
                      "oracle_green": n_green, "failures": n_fail}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
