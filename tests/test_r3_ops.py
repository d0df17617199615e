"""Round-3 operator robustness tests beyond the DuckDB oracle equality
(which tests/test_queries.py already parametrizes over every key):

- the bloom-pruned join must stay EXACT when the bloom is saturated with
  false positives (correctness must come from the join, not the filter);
- the global total-order rank must be a permutation of 1..N even with
  heavy length ties.
"""
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_bloom_join_exact_under_false_positives(ray_session, monkeypatch):
    import duckdb

    from mycelium_ray.pipelines import analytics

    # 256-bit bloom over ~300 urgent orderkeys → saturated, FP rate ~1:
    # nearly every lineitem row survives the prune and the bucketed join
    # must remove every false positive.
    monkeypatch.setattr(analytics, "_BLOOM_BITS", 256)
    got = analytics.urgent_revenue_bloom_join(SF).to_pandas()

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.execute(analytics.URGENT_REVENUE_BLOOM_SQL).df()
    assert int(got["n_items"][0]) == int(want["n_items"][0])
    assert int(got["revenue_cents"][0]) == int(want["revenue_cents"][0])


def test_global_length_rank_is_permutation(ray_session):
    from mycelium_ray.pipelines import textops

    df = textops.global_length_rank(SF).to_pandas()
    n = len(df)
    ranks = np.sort(df["rank"].to_numpy())
    assert (ranks == np.arange(1, n + 1)).all()
    # order contract: rank asc ⇒ n_chars non-increasing, and doc_id asc
    # within one length
    df = df.sort_values("rank").reset_index(drop=True)
    assert (np.diff(df["n_chars"].to_numpy()) <= 0).all()
    same_len = np.diff(df["n_chars"].to_numpy()) == 0
    assert (np.diff(df["doc_id"].to_numpy())[same_len] > 0).all()


def test_triangle_count_matches_closed_form(ray_session):
    # circulant graph with offsets {1,2,3} on N nodes has exactly 3N
    # triangles (each node starts {a,a+1,a+2}, {a,a+1,a+3}, {a,a+2,a+3})
    import pyarrow.parquet as pq

    from mycelium_ray.pipelines import graph

    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    got = graph.triangle_count(SF).to_pandas()
    assert int(got["n_triangles"][0]) == 3 * n


def test_grouped_hll_error_bound(ray_session):
    # ~0.8% std error at P=14; assert 5% against the exact dual
    from mycelium_ray.pipelines import analytics

    exact = analytics.distinct_users_per_type(SF).to_pandas() \
        .set_index("event_type")["n_users"]
    approx = analytics.distinct_users_per_type_hll(SF).to_pandas() \
        .set_index("event_type")["n_users_approx"]
    assert set(exact.index) == set(approx.index)
    for et in exact.index:
        err = abs(int(approx[et]) - int(exact[et])) / max(1, int(exact[et]))
        assert err <= 0.05, (et, int(approx[et]), int(exact[et]))


def test_quantile_sketch_rank_error_bound(ray_session):
    import pyarrow.parquet as pq

    from mycelium_ray.functions import sketch
    from mycelium_ray.pipelines import analytics

    got = analytics.value_quantiles_sketch(SF).to_pandas() \
        .set_index("q")["approx_cents"]
    vals = np.sort(np.rint(
        pq.read_table(f"{SF}/events.parquet", columns=["value"])
        .column("value").to_numpy() * 100).astype("int64"))
    n = len(vals)
    tol = 4.0 / sketch.QSUMMARY_SIZE  # two compaction levels + slack
    for q in (50, 90, 99):
        est = int(got[q])
        lo = np.searchsorted(vals, est, side="left")
        hi = np.searchsorted(vals, est, side="right")
        target = q * n / 100.0
        # the target rank must fall within tol*n of the estimate's span
        dist = 0.0 if lo <= target <= hi else min(abs(target - lo),
                                                  abs(target - hi))
        assert dist <= tol * n, (q, est, lo, hi, target, tol * n)


def test_qsummary_merge_and_fine_quantiles():
    from mycelium_ray.functions import sketch

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1_000_000, size=60_000).astype("int64")
    a = sketch.qsummary_from(x[:25_000])
    b = sketch.qsummary_from(x[25_000:])
    v, w = sketch.qsummary_merge(a, b)
    assert len(v) <= sketch.QSUMMARY_SIZE
    assert int(w.sum()) == len(x)
    xs = np.sort(x)
    n = len(x)
    tol = 4.0 / sketch.QSUMMARY_SIZE
    # includes NON-whole-percent quantiles (0.995, 0.125) — the int(q*100)
    # quantization bug regression guard
    for q in (0.125, 0.5, 0.9, 0.99, 0.995):
        est = sketch.qsummary_quantile(v, w, q)
        lo = np.searchsorted(xs, est, side="left")
        hi = np.searchsorted(xs, est, side="right")
        target = q * n
        dist = 0.0 if lo <= target <= hi else min(abs(target - lo),
                                                  abs(target - hi))
        assert dist <= tol * n, (q, est, dist, tol * n)
