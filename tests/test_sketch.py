"""HyperLogLog sketch: error bound, merge semantics, distributed query."""
import numpy as np

from mycelium_ray.functions import sketch
from mycelium_ray.hashing import url_hash64_many


def _regs_for(values):
    regs = sketch.empty_registers()
    sketch.add_values(regs, values)
    return regs


def test_error_bound_across_cardinalities():
    # P=14 ⇒ ~0.8% standard error; assert within 3% (≈4 sigma)
    for n in (100, 10_000, 200_000):
        est = sketch.estimate(_regs_for([f"k{i}" for i in range(n)]))
        assert abs(est - n) / n < 0.03, (n, est)


def test_duplicates_do_not_inflate():
    vals = [f"k{i % 50}" for i in range(5000)]
    est = sketch.estimate(_regs_for(vals))
    assert abs(est - 50) / 50 < 0.05


def test_merge_equals_union():
    a = _regs_for([f"a{i}" for i in range(5000)])
    b = _regs_for([f"b{i}" for i in range(5000)])
    ab = _regs_for([f"a{i}" for i in range(5000)]
                   + [f"b{i}" for i in range(5000)])
    merged = sketch.merge(a, b)
    assert np.array_equal(merged, ab)  # max-merge is exactly the union
    # merge is commutative + idempotent
    assert np.array_equal(sketch.merge(b, a), merged)
    assert np.array_equal(sketch.merge(merged, merged), merged)


def test_rank_computation_matches_bit_length():
    # cross-check the vectorized leading-zero kernel against int.bit_length
    h = url_hash64_many([f"x{i}" for i in range(2000)])
    regs = sketch.empty_registers()
    sketch.add_hashed(regs, h)
    expect = np.zeros(sketch.M, dtype=np.uint8)
    for v in h.tolist():
        idx = v >> (64 - sketch.P)
        rest = (v << sketch.P) & ((1 << 64) - 1)
        rank = (64 - sketch.P + 1 if rest == 0
                else 64 - rest.bit_length() + 1)
        expect[idx] = max(expect[idx], rank)
    assert np.array_equal(regs, expect)


def test_distinct_users_hll_query(ray_session):
    from mycelium_ray.pipelines.analytics import distinct_users_hll
    t = distinct_users_hll("/root/testdata/sf0.001")
    # 150-user domain at sf0.001 (15 present); exact at tiny cardinality
    # because the linear-counting branch is engaged
    assert t["n_users_approx"][0].as_py() == 15


# --------------------------------------------------------------------------
# count-min sketch (heavy_hitters candidate filter)
# --------------------------------------------------------------------------
def test_cms_upper_bound_and_linearity():
    import numpy as np

    from mycelium_ray.functions.sketch import (cms_add, cms_empty,
                                               cms_estimate)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 62, size=5000).astype(np.uint64)
    cnts = rng.integers(1, 50, size=5000)
    full = cms_add(cms_empty(), keys, cnts)
    # linearity: sum of per-half partials == one-shot fold
    a = cms_add(cms_empty(), keys[:2500], cnts[:2500])
    b = cms_add(cms_empty(), keys[2500:], cnts[2500:])
    assert (a + b == full).all()
    est = cms_estimate(full, keys)
    assert (est >= cnts).all()  # one-sided error, always
    # Pr[err > eN/W] ≤ e^-D per key — allow the few-percent tail over
    # 5000 keys but pin the envelope and the typical error
    en = cnts.sum() * (2.71828 / 8192)
    assert (est - cnts).max() <= 2 * en
    assert ((est - cnts) > en).mean() <= 0.05
    assert (est - cnts).mean() < en / 4


def test_heavy_hitters_threshold_logic(ray_session):
    """heavy_hitters returns the EXACT top-k (already oracle-checked in
    test_queries); here: the pass-2 enlarged set must contain every true
    top-k user even with a tiny candidate budget (exactness must not
    depend on candidate quality)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mycelium_ray.pipelines.analytics import heavy_hitters

    got = heavy_hitters("/root/testdata/sf0.001", k=5).to_pandas()
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["user_id"])
    u, c = np.unique(t["user_id"].to_numpy(), return_counts=True)
    order = np.lexsort((u, -c))[:5]
    want = sorted(zip(c[order], u[order]), key=lambda x: (-x[0], x[1]))
    assert list(zip(got["n"], got["user_id"])) == want
