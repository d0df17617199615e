"""Unit semantics for the sequence-analytics ops (funnel / retention) —
the integer week-truncation kernel vs DuckDB, and the greedy-chain rule
on a handcrafted history (the oracle parity test in test_queries.py
covers the distributed end-to-end path)."""
import duckdb
import numpy as np
import pandas as pd

from mycelium_ray.pipelines.analytics import _week_day, FUNNEL_STEPS


def test_week_day_matches_duckdb_date_trunc():
    rng = np.random.default_rng(7)
    us = rng.integers(0, 2_000_000_000 * 10**6, size=5000, dtype=np.int64)
    got = _week_day(us)
    con = duckdb.connect()
    want = con.execute(
        "SELECT datediff('day', DATE '1970-01-01', "
        "CAST(date_trunc('week', make_timestamp(u)) AS DATE)) "
        "FROM (SELECT unnest(?) AS u)", [us.tolist()]
    ).fetchnumpy()
    key = list(want.keys())[0]
    assert np.array_equal(got, want[key].astype(np.int64))


def test_week_day_monday_anchor():
    # 1970-01-05 was the first Monday after the epoch (day 4)
    day_us = 86_400 * 10**6
    assert _week_day(np.array([4 * day_us])) == [4]       # Monday → itself
    assert _week_day(np.array([10 * day_us])) == [4]      # Sunday → prior Mon
    assert _week_day(np.array([11 * day_us])) == [11]     # next Monday
    assert _week_day(np.array([0])) == [-3]               # epoch Thu → Mon before


def test_funnel_greedy_chain_strictness():
    # click at the SAME instant as the first view must not count (strict >)
    assert FUNNEL_STEPS == ("view", "click", "purchase")
    con = duckdb.connect()
    con.execute("""
      CREATE TABLE events AS SELECT * FROM (VALUES
        (1, TIMESTAMP '2024-01-01 00:00:00', 'view'),
        (1, TIMESTAMP '2024-01-01 00:00:00', 'click'),
        (2, TIMESTAMP '2024-01-01 00:00:00', 'view'),
        (2, TIMESTAMP '2024-01-01 00:00:01', 'click'),
        (2, TIMESTAMP '2024-01-01 00:00:02', 'purchase'),
        (3, TIMESTAMP '2024-01-01 00:00:05', 'click')
      ) t(user_id, ts, event_type)""")
    from mycelium_ray.pipelines.analytics import EVENTS_FUNNEL_SQL
    out = con.execute(EVENTS_FUNNEL_SQL).df().sort_values("step")
    assert out["users"].tolist() == [2, 1, 1]
