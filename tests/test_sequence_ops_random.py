"""Randomized parity for the sequence-analytics ops (funnel, retention,
group quantiles) vs their DuckDB oracles on GENERATED events tables —
edge distributions the fixed testdata can't produce: heavy timestamp
ties, single-event users, steps that never fire, value domains that
stress the discrete-quantile index rule."""
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _gen_events(seed: int, n: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_users = max(1, n // rng.integers(2, 12))
    # coarse time grid → many exact ts ties (strict-> semantics stress)
    us = rng.integers(0, 50, size=n) * 1_000_000 * rng.integers(1, 90)
    us = us + np.int64(1_700_000_000) * 1_000_000
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(us.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, size=n,
                                         dtype=np.int64)),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "error", "signup"], size=n,
            p=[0.4, 0.25, 0.1, 0.15, 0.1])),
        "value": pa.array(np.round(rng.uniform(0, 30, size=n), 2)),
        "props": pa.array(["{}"] * n),
    })


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


@pytest.mark.parametrize("seed,n", [(1, 400), (2, 37), (3, 1500), (4, 3)])
def test_sequence_ops_match_duckdb_on_random_tables(
        ray_session, tmp_path, seed, n):
    from mycelium_ray.pipelines import analytics
    import __ray_entry__ as em

    sf_dir = str(tmp_path / f"rand{seed}")
    os.makedirs(sf_dir)
    t = _gen_events(seed, n)
    pq.write_table(t, f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    oracles = em.oracle_sql()
    for key, fn in (("events_funnel", analytics.events_funnel),
                    ("events_retention", analytics.events_retention),
                    ("group_value_quantiles",
                     analytics.group_value_quantiles)):
        got = _norm(fn(sf_dir).to_pandas())
        want = _norm(con.execute(oracles[key]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      obj=key)


def _ds_to_pdf(ds) -> pd.DataFrame:
    from .conftest import ds_to_pandas
    return ds_to_pandas(ds)


@pytest.mark.parametrize("seed,n", [(11, 500), (12, 41), (13, 1200),
                                    (14, 5)])
def test_window_ops_match_duckdb_on_random_tables(
        ray_session, tmp_path, seed, n):
    """Randomized parity for the round-3 window/sliding ops — heavy ts
    ties stress LAG/cumsum tie-breaks, the coarse day grid stresses the
    7-day sliding-distinct window, and tiny tables stress empty buckets."""
    from mycelium_ray.pipelines import analytics
    import __ray_entry__ as em

    sf_dir = str(tmp_path / f"randw{seed}")
    os.makedirs(sf_dir)
    t = _gen_events(seed, n)
    pq.write_table(t, f"{sf_dir}/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    oracles = em.oracle_sql()
    for key, fn in (
            ("events_lag_diff", analytics.events_lag_diff),
            ("user_cumulative_value", analytics.user_cumulative_value),
            ("user_mode_event_type", analytics.user_mode_event_type),
            ("rolling_7d_active_users",
             analytics.rolling_7d_active_users),
            ("distinct_users_per_type",
             analytics.distinct_users_per_type),
            ("user_event_path", analytics.user_event_path),
            ("purchasers_no_errors", analytics.purchasers_no_errors),
            ("event_type_value_stats",
             analytics.event_type_value_stats),
            ("events_outliers", analytics.events_outliers)):
        got = _norm(_ds_to_pdf(fn(sf_dir)))
        want = _norm(con.execute(oracles[key]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      obj=key)
