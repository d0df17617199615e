"""Aggregation operators (SURVEY.md §2.5 A1-A5 rebuilt over the testdata
stream/star tables).

- ``events_window_agg`` — A2's throughput-window aggregate generalized:
  tumbling 5-minute windows per event_type. Pre-aggregated inside
  map_batches (partial sums per window per batch) before the global
  groupby, so the shuffle moves one row per (window, type) per batch.
- ``events_user_stats`` — per-key counters (A5 analog).
- ``source_stats`` — A1's queue-length stats analog over document sources.
- ``lineitem_pricing`` — wide-table grouped aggregate showing the same
  partial-aggregation pattern at 600k rows.

All sums are integer (value_cents) — float accumulation order would break
value-hash parity with the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

WINDOW_S = 300


def events_window_agg(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # force µs unit explicitly (pandas 2.x preserves the Arrow unit)
        us = df["ts"].astype("datetime64[us]").astype("int64")
        win = (us // (WINDOW_S * 10 ** 6)) * WINDOW_S
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"],
                          "window_start": win, "n": 1, "value_cents": cents})
        return g.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"), value_cents=("value_cents", "sum"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"), value_cents=("value_cents", "sum"))

    # partials per batch → ONE combine task: with ~40k groups the partials
    # are tiny, and a repartition(1) combine beats the groupby all-to-all's
    # fixed cost ~8×. (groupby().aggregate() is the general form for group
    # cardinalities that don't fit one task — see events_user_stats.)
    return ds.repartition(16) \
        .map_batches(partial, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


EVENTS_WINDOW_AGG_SQL = f"""
SELECT event_type,
       (epoch_us(ts) // ({WINDOW_S} * 1000000)) * {WINDOW_S} AS window_start,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""


def events_user_stats(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "event_id"])
    out = ds.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Min("event_id", alias_name="first_event"),
        Max("event_id", alias_name="last_event"))
    return out


EVENTS_USER_STATS_SQL = """
SELECT user_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM events GROUP BY user_id
"""


def source_stats(sf_dir: str):
    """A1 analog: per-'host' (source) row counts + total chars."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"))


SOURCE_STATS_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
"""


def lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with batch-level pre-aggregation."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = np.rint(df["l_quantity"].to_numpy() * 100).astype("int64")
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty_c": qty, "sum_price_c": price,
            "sum_disc_price_c": price * (100 - disc),  # cents × basis points
            "n": 1,
        })
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_c=("sum_qty_c", "sum"), sum_price_c=("sum_price_c", "sum"),
            sum_disc_price_c=("sum_disc_price_c", "sum"), n=("n", "sum"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(
            sum_qty_c=("sum_qty_c", "sum"), sum_price_c=("sum_price_c", "sum"),
            sum_disc_price_c=("sum_disc_price_c", "sum"), n=("n", "sum"))

    # ~6 groups: one combine task, not an all-to-all
    return ds.map_batches(partial, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS sum_disc_price_c,
       count(*) AS n
FROM lineitem GROUP BY 1, 2
"""


def top_users_by_value(sf_dir: str, k: int = 20):
    """Top-k pattern: partial per-batch top is wrong for sums — aggregate
    first (small result), then sort+limit on the aggregate."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"], "value_cents": cents})
        return g.groupby("user_id", as_index=False).sum()

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("user_id").aggregate(Sum("value_cents",
                                          alias_name="value_cents"))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        # keep k rows per block (deterministic (value desc, user asc)
        # tie-break) so the driver merges k×n_blocks rows, never the full
        # per-user aggregate (10^8 users at scale)
        return df.sort_values(["value_cents", "user_id"],
                              ascending=[False, True]).head(k)

    pdf = agg.map_batches(partial_topk, batch_format="pandas").to_pandas()
    pdf = pdf.sort_values(["value_cents", "user_id"],
                          ascending=[False, True]).head(k)
    pdf["rank"] = range(1, len(pdf) + 1)
    import pyarrow as pa
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)


TOP_USERS_SQL = """
SELECT user_id, CAST(value_cents AS BIGINT) AS value_cents, rank FROM (
  SELECT user_id,
         sum(CAST(round(value * 100) AS BIGINT)) AS value_cents,
         row_number() OVER (
           ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC,
                    user_id ASC) AS rank
  FROM events GROUP BY user_id
) WHERE rank <= 20
"""


SESSION_GAP_S = 1800  # 30 min


def events_sessionize(sf_dir: str):
    """Session windows per user: a new session starts when the gap since
    the previous event exceeds SESSION_GAP_S. The streaming-shaped op of
    SURVEY.md §2.9 done the Ray Data way: partition by key
    (groupby user_id) → sort within group → cumulative gap logic in pandas.
    Output: (user_id, session_id, n_events, start_us, end_us).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    n_buckets = _n_join_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        # coarse user-hash bucketing: one Ray group per ~(users/B), NOT
        # one per user — a per-user map_groups would mean one Python call
        # per key, catastrophic at web-scale user cardinality
        df = df.copy()
        df["bucket"] = (df["user_id"].to_numpy().astype("uint64")
                        % np.uint64(n_buckets)).astype("int64")
        return df

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all users of the bucket in ONE vectorized pass: sort by
        # (user, ts, event_id); a session break is a user boundary or a
        # gap > SESSION_GAP_S; sessions are contiguous runs, so their
        # stats are pure index arithmetic on the run starts/ends
        g = g.sort_values(["user_id", "ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        if len(g) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "session_id": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "start_us": pd.Series([], dtype="int64"),
                                 "end_us": pd.Series([], dtype="int64")})
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[10**18], np.diff(us)])
        new = new_user | (gap > SESSION_GAP_S * 10**6)
        glob = np.cumsum(new)                      # global run counter
        u_starts = np.flatnonzero(new_user)
        u_lens = np.diff(np.append(u_starts, len(uid)))
        first_glob = np.repeat(glob[u_starts], u_lens)
        sid = (glob - first_glob + 1).astype("int64")  # restarts per user
        s_idx = np.flatnonzero(new)
        s_end = np.append(s_idx[1:], len(us)) - 1
        return pd.DataFrame({
            "user_id": uid[s_idx],
            "session_id": sid[s_idx],
            "n_events": (s_end - s_idx + 1).astype("int64"),
            "start_us": us[s_idx],
            "end_us": us[s_end],
        })

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(sessions_bucket, batch_format="pandas")


EVENTS_SESSIONIZE_SQL = f"""
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_S} * 1000000
              OR lag(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, us,
         CAST(sum(new_session) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) AS BIGINT)
           AS session_id
  FROM t
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(us) AS start_us, max(us) AS end_us
FROM s GROUP BY user_id, session_id
"""


def orders_by_nation(sf_dir: str):
    """Broadcast hash join: orders ⋈ customer (small side via ray.put once,
    dict probe per batch — never a shuffle), grouped by nation.
    Output: (c_nationkey, n_orders, total_cents)."""
    import pyarrow.parquet as pq
    import ray
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    lookup = dict(zip(cust["c_custkey"].to_pylist(),
                      cust["c_nationkey"].to_pylist()))
    lookup_ref = ray.put(lookup)

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        lk = _ray.get(lookup_ref)
        nat = df["o_custkey"].map(lk).astype("int64")
        cents = np.rint(df["o_totalprice"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"c_nationkey": nat, "n_orders": 1,
                          "total_cents": cents})
        return g.groupby("c_nationkey", as_index=False).agg(
            n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("c_nationkey") \
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents"))


ORDERS_BY_NATION_SQL = """
SELECT c.c_nationkey,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
"""


def _n_join_buckets() -> int:
    """Partitioned-join bucket count scales with the cluster (≈4 buckets
    per CPU for scheduling slack, floor 16) instead of a constant that
    would cap join parallelism at 16 tasks on a 256-node cluster."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(16, 4 * cpus)


def revenue_by_priority(sf_dir: str):
    """Both-sides-large partitioned hash join: lineitem ⋈ orders on
    orderkey, revenue per order priority.

    The portable Ray Data join pattern (no broadcast possible): add
    ``bucket = key % B`` to both sides, union, groupby(bucket), and join
    the two sides pairwise inside each bucket group with a pandas merge —
    an explicit partitioned hash join with B ∝ cluster CPUs. Skewed keys would
    be salted into sub-buckets; orderkeys here are uniform.
    Output: (o_orderpriority, n_items, revenue_cents).
    """
    n_buckets = _n_join_buckets()
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({
            "key": df["l_orderkey"].astype("int64"),
            "bucket": (df["l_orderkey"] % n_buckets).astype("int64"),
            "side": 0, "rev_c": price * (100 - disc), "prio": "",
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_orderkey"].astype("int64"),
            "bucket": (df["o_orderkey"] % n_buckets).astype("int64"),
            "side": 1, "rev_c": 0, "prio": df["o_orderpriority"],
        })

    both = li.map_batches(tag_li, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev_c"]]
        o = g[g["side"] == 1][["key", "prio"]]
        m = l.merge(o, on="key")
        if len(m) == 0:
            return pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                                 "n_items": pd.Series([], dtype="int64"),
                                 "revenue_cents": pd.Series([], dtype="int64")})
        out = m.groupby("prio", as_index=False).agg(
            n_items=("key", "size"), revenue_cents=("rev_c", "sum"))
        return out.rename(columns={"prio": "o_orderpriority"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum"))

    return both.groupby("bucket").map_groups(join_bucket,
                                             batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


REVENUE_BY_PRIORITY_SQL = """
SELECT o.o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""
