"""Hypothesis property tests for the pure vectorized kernels added in
round 3 — no Ray involved, so these run instantly and stress shapes the
corpus tests can't (degenerate groups, giant weights, pathological
boundaries)."""
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.integers(0, 50)), min_size=1, max_size=60),
       st.integers(1, 17))
def test_pack_group_matches_bruteforce(rows, budget):
    from mycelium_ray.pipelines.textops import _pack_group

    df = pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype="int64"),
        "source": [r[0] for r in rows],
        "n_tokens": np.array([r[1] for r in rows], dtype="int64"),
    })
    got = _pack_group(df.sample(frac=1, random_state=0), budget) \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force: per source in doc_id order, prefix sum // budget
    exp = {}
    for src in sorted(set(df["source"])):
        g = df[df["source"] == src].sort_values("doc_id")
        acc = 0
        for _, r in g.iterrows():
            exp[int(r["doc_id"])] = acc // budget
            acc += int(r["n_tokens"])
    for _, r in got.iterrows():
        assert int(r["seq_id"]) == exp[int(r["doc_id"])], (r, exp)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=5000),
       st.integers(4, 64))
def test_qsummary_invariants(values, size):
    from mycelium_ray.functions import sketch

    x = np.array(values, dtype="int64")
    v, w = sketch.qsummary_from(x, size=size)
    # invariants: bounded size, weight preserved, values from the input,
    # sorted
    assert len(v) <= size
    assert int(w.sum()) == len(x)
    assert (w > 0).all()
    assert np.isin(v, x).all()
    assert (np.diff(v) >= 0).all()
    # rank error bound: one compaction perturbs any rank by <= W/(2*size)
    # plus the representative's own slice width W/size → check 2W/size
    xs = np.sort(x)
    n = len(x)
    for q in (0.25, 0.5, 0.9):
        est = sketch.qsummary_quantile(v, w, q)
        lo = np.searchsorted(xs, est, side="left")
        hi = np.searchsorted(xs, est, side="right")
        target = q * n
        dist = 0.0 if lo <= target <= hi else min(abs(target - lo),
                                                  abs(target - hi))
        assert dist <= max(2.0, 2.0 * n / size), (q, est, dist)
