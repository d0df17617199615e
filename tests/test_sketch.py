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
