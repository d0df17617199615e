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
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

WINDOW_S = 300


def events_window_agg(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def partial(t):
        # Arrow-native: µs cast + integer window truncation + one Arrow
        # group_by — zero-copy from the object store, no pandas boxing
        # (pc.round is half-to-even, identical to the np.rint it replaces)
        import pyarrow as pa
        import pyarrow.compute as pc
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, WINDOW_S * 10 ** 6), WINDOW_S)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        g = pa.table({"event_type": t["event_type"], "window_start": win,
                      "value_cents": cents}) \
            .group_by(["event_type", "window_start"]) \
            .aggregate([("value_cents", "sum"), ([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "window_start": g["window_start"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "value_cents": g["value_cents_sum"]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"), value_cents=("value_cents", "sum"))

    # partials per batch → ONE combine task: with ~40k groups the partials
    # are tiny, and a repartition(1) combine beats the groupby all-to-all's
    # fixed cost ~8×. (groupby().aggregate() is the general form for group
    # cardinalities that don't fit one task — see events_user_stats.)
    # The partial fan-out scales with input rows capped ∝ cluster CPUs
    # (a constant 16 would bound the stage at 16 tasks on a big cluster);
    # wide inputs skip the repartition — the scan is already many blocks.
    import pyarrow.parquet as pq
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    if n_rows <= 2_000_000:
        ds = ds.repartition(min(_n_join_buckets(), max(8, n_rows // 5000)))
    return ds.map_batches(partial, batch_format="pyarrow") \
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

    def partial(t):
        # Arrow-native pre-agg (pc.round = half-to-even, same as np.rint)
        import pyarrow as pa
        import pyarrow.compute as pc
        qty = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)),
                      pa.int64())
        price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                       pa.int64())
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty_c": qty, "sum_price_c": price,
            # cents × basis points
            "sum_disc_price_c": pc.multiply(price, pc.subtract(100, disc)),
        }).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty_c", "sum"), ("sum_price_c", "sum"),
             ("sum_disc_price_c", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty_c": g["sum_qty_c_sum"],
            "sum_price_c": g["sum_price_c_sum"],
            "sum_disc_price_c": g["sum_disc_price_c_sum"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(
            sum_qty_c=("sum_qty_c", "sum"), sum_price_c=("sum_price_c", "sum"),
            sum_disc_price_c=("sum_disc_price_c", "sum"), n=("n", "sum"))

    # ~6 groups: one combine task, not an all-to-all
    return ds.map_batches(partial, batch_format="pyarrow") \
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


# ---------------------------------------------------------------------------
# Temporal joins the reference lacks but a training-data pipeline needs
# (build-brief "custom operators": as-of join + range join). Both follow the
# documented partitioning assumption: rows are hash-bucketed by user_id, all
# rows of one user land in one group, and the per-group logic is a
# vectorized pandas/numpy kernel (merge_asof / rank arithmetic) — never a
# per-pair or per-row Python loop. B = _n_join_buckets() ∝ cluster CPUs.
# ---------------------------------------------------------------------------

def events_asof_join(sf_dir: str):
    """As-of join: each 'purchase' event matched to the same user's most
    recent 'view' event at-or-before it (inner, backward, ties allowed).

    Ray shape: single pruned read → hash-bucket by user → groupby(bucket)
    → per-group pd.merge_asof (vectorized backward search). The right side
    is deduplicated to one row per (user_id, ts) keeping max event_id so
    the as-of pick is deterministic (mirrors the oracle's max() pre-agg).
    Output: (purchase_id, user_id, purchase_us, view_id, gap_us).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    n_buckets = _n_join_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "view"])].copy()
        df["us"] = df["ts"].astype("datetime64[us]").astype("int64")
        df["bucket"] = (df["user_id"].to_numpy().astype("uint64")
                        % np.uint64(n_buckets)).astype("int64")
        return df[["event_id", "user_id", "event_type", "us", "bucket"]]

    EMPTY = pd.DataFrame({
        "purchase_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "purchase_us": pd.Series([], dtype="int64"),
        "view_id": pd.Series([], dtype="int64"),
        "gap_us": pd.Series([], dtype="int64")})

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"]
        v = g[g["event_type"] == "view"]
        if len(p) == 0 or len(v) == 0:
            return EMPTY.copy()
        # deterministic right side: one view per (user, ts), max event_id
        v = (v.sort_values(["user_id", "us", "event_id"])
               .groupby(["user_id", "us"], as_index=False).last())
        p = p.sort_values("us", kind="mergesort")
        v = v.sort_values("us", kind="mergesort")
        m = pd.merge_asof(p, v, on="us", by="user_id",
                          direction="backward", allow_exact_matches=True,
                          suffixes=("", "_v"))
        m = m[m["event_id_v"].notna()]
        if len(m) == 0:
            return EMPTY.copy()
        out = pd.DataFrame({
            "purchase_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "purchase_us": m["us"].astype("int64"),
            "view_id": m["event_id_v"].astype("int64"),
        })
        # merge_asof keeps only the left 'us'; recover the view ts via the
        # dedup frame to compute the gap without a second join: index lookup
        vv = v.set_index(["user_id", "event_id"])["us"]
        out["gap_us"] = (out["purchase_us"].to_numpy()
                         - vv.loc[list(zip(out["user_id"], out["view_id"]))]
                             .to_numpy()).astype("int64")
        return out

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(asof_bucket, batch_format="pandas")


EVENTS_ASOF_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, epoch_us(ts) AS view_us, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT p.purchase_id, p.user_id, p.purchase_us, v.view_id,
       p.purchase_us - v.view_us AS gap_us
FROM p ASOF JOIN v
  ON p.user_id = v.user_id AND p.purchase_us >= v.view_us
"""


RANGE_JOIN_WINDOW_S = 300


def events_error_burst(sf_dir: str):
    """Range join: per purchase, how many 'error' events the same user had
    in the preceding RANGE_JOIN_WINDOW_S seconds (exclusive lower bound,
    inclusive upper: err.us ∈ (p.us - W, p.us]). Purchases with zero
    errors are kept (count 0) — LEFT range-join semantics.

    Distributed shape: hash-bucket by user → per-group the count is rank
    arithmetic, not a pair join: errors get a per-user running rank, and
    two backward merge_asof probes (at p.us and at p.us - W) give the
    rank at each bound; the count is the difference. O((P+E) log E) per
    bucket, vectorized, and never materializes the pair blow-up a naive
    range join would.
    Output: (purchase_id, user_id, n_errors).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    n_buckets = _n_join_buckets()
    w_us = RANGE_JOIN_WINDOW_S * 10 ** 6

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "error"])].copy()
        df["us"] = df["ts"].astype("datetime64[us]").astype("int64")
        df["bucket"] = (df["user_id"].to_numpy().astype("uint64")
                        % np.uint64(n_buckets)).astype("int64")
        return df[["event_id", "user_id", "event_type", "us", "bucket"]]

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"].sort_values(
            "us", kind="mergesort")
        if len(p) == 0:
            return pd.DataFrame({"purchase_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "n_errors": pd.Series([], dtype="int64")})
        e = g[g["event_type"] == "error"].sort_values(
            ["user_id", "us", "event_id"], kind="mergesort").copy()
        if len(e) == 0:
            return pd.DataFrame({
                "purchase_id": p["event_id"].astype("int64").to_numpy(),
                "user_id": p["user_id"].astype("int64").to_numpy(),
                "n_errors": np.zeros(len(p), dtype="int64")})
        e["rank"] = e.groupby("user_id").cumcount() + 1
        e = e.sort_values("us", kind="mergesort")
        er = e[["user_id", "us", "rank"]]

        def rank_at(ts_us: np.ndarray) -> np.ndarray:
            probe = pd.DataFrame({"user_id": p["user_id"].to_numpy(),
                                  "us": ts_us}).sort_values(
                "us", kind="mergesort")
            probe["order"] = np.arange(len(probe))
            m = pd.merge_asof(probe, er, on="us", by="user_id",
                              direction="backward",
                              allow_exact_matches=True)
            return m.sort_values("order")["rank"].fillna(0).to_numpy()

        hi = rank_at(p["us"].to_numpy())
        lo = rank_at(p["us"].to_numpy() - w_us)  # ≤ p.us - W ⇒ excluded
        return pd.DataFrame({
            "purchase_id": p["event_id"].astype("int64").to_numpy(),
            "user_id": p["user_id"].astype("int64").to_numpy(),
            "n_errors": (hi - lo).astype("int64")})

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(count_bucket, batch_format="pandas")


EVENTS_ERROR_BURST_SQL = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'
)
SELECT p.purchase_id, p.user_id,
       count(e.us) AS n_errors
FROM p LEFT JOIN e
  ON p.user_id = e.user_id
 AND e.us > p.us - {RANGE_JOIN_WINDOW_S} * 1000000
 AND e.us <= p.us
GROUP BY 1, 2
"""


PCTL_QS = (50, 90, 99)


def value_percentiles(sf_dir: str):
    """Exact distributed percentiles per event_type over a fixed-point
    domain: map_batches partial histogram per (event_type, cents) →
    groupby sum → tiny driver cumsum picks the smallest value whose
    cumulative count reaches ceil(q/100 × n).

    Scale shape: the shuffle moves one row per distinct (type, cents) per
    batch — the value domain is bounded (cents), so the histogram is
    small no matter how many rows stream through; the all-to-all is over
    the histogram, never the raw events. (For unbounded/continuous
    domains the same pipeline runs on quantized buckets + a second pruned
    pass — not needed for a priced-value column.)
    Output: (event_type, p50_cents, p90_cents, p99_cents).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "cents": cents,
                          "cnt": 1})
        return g.groupby(["event_type", "cents"], as_index=False).sum()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "cents"], as_index=False)["cnt"] \
            .sum()

    # per-batch partials are bounded by the value domain, so the reduce
    # is a histogram combine, not a key-space shuffle: one task at test
    # scale (the groupby all-to-all's fixed cost measured 5.7× slower on
    # the same input), a width-∝-CPUs middle level first when the scan is
    # wide enough that blocks × domain won't fit one combine task.
    import pyarrow.parquet as pq
    n_rows = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    hist = ds.map_batches(partial, batch_format="pandas")
    if n_rows > 50_000_000:
        hist = hist.repartition(_n_join_buckets()) \
            .map_batches(combine, batch_format="pandas")
    h = hist.repartition(1).map_batches(combine, batch_format="pandas") \
        .to_pandas()  # bounded: |types| × |distinct cents| rows

    outs = []
    for et, g in h.groupby("event_type"):
        g = g.sort_values("cents")
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        row = {"event_type": et}
        for q in PCTL_QS:
            target = -(-q * n // 100)  # ceil(q*n/100)
            row[f"p{q}_cents"] = int(
                g["cents"].to_numpy()[np.searchsorted(cum, target)])
        outs.append(row)
    out = pd.DataFrame(outs).sort_values("event_type").reset_index(drop=True)
    for q in PCTL_QS:
        out[f"p{q}_cents"] = out[f"p{q}_cents"].astype("int64")
    return out


VALUE_PERCENTILES_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), r AS (
  SELECT event_type, cents, count(*) AS cnt FROM c GROUP BY 1, 2
), w AS (
  SELECT event_type, cents,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM r
)
SELECT event_type,
       min(CASE WHEN cum >= CAST(ceil(50 * total / 100.0) AS BIGINT)
                THEN cents END) AS p50_cents,
       min(CASE WHEN cum >= CAST(ceil(90 * total / 100.0) AS BIGINT)
                THEN cents END) AS p90_cents,
       min(CASE WHEN cum >= CAST(ceil(99 * total / 100.0) AS BIGINT)
                THEN cents END) AS p99_cents
FROM w GROUP BY event_type
"""


SEGMENT = "BUILDING"
SEGMENT_TOPK = 10


def segment_revenue_topk(sf_dir: str, k: int = SEGMENT_TOPK):
    """TPC-H-Q3-shaped 3-table pipeline: customers in one market segment →
    their orders (broadcast semi-join: the segment's custkey set rides
    ray.put once) → lineitem revenue per order (partitioned hash join on
    orderkey, bucketed ∝ CPUs) → top-k orders by revenue.

    Composition of both join strategies in one pipeline: small side
    broadcast where one side is bounded (customers of one segment), all-
    to-all bucket join where both sides are large (lineitem ⋈ orders).
    Output: (o_orderkey, o_orderdate_us, revenue_cents), top-k by
    (revenue desc, orderkey asc).
    """
    import pyarrow.parquet as pq
    import ray
    import pyarrow as pa

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(
        pa.compute.equal(cust["c_mktsegment"], SEGMENT))["c_custkey"]
    seg_keys = ray.put(set(keys.to_pylist()))

    n_buckets = _n_join_buckets()
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        sk = _ray.get(seg_keys)
        df = df[df["o_custkey"].isin(sk)]
        return pd.DataFrame({
            "key": df["o_orderkey"].astype("int64"),
            "bucket": (df["o_orderkey"] % n_buckets).astype("int64"),
            "side": 1, "rev_c": 0,
            "date_us": df["o_orderdate"].astype("datetime64[us]")
                         .astype("int64"),
        })

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({
            "key": df["l_orderkey"].astype("int64"),
            "bucket": (df["l_orderkey"] % n_buckets).astype("int64"),
            "side": 0, "rev_c": price * (100 - disc),
            "date_us": 0,
        })

    both = orders.map_batches(tag_orders, batch_format="pandas").union(
        li.map_batches(tag_li, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 1][["key", "date_us"]]
        l = g[g["side"] == 0][["key", "rev_c"]]
        m = l.merge(o, on="key")
        if len(m) == 0:
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate_us": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64")})
        out = m.groupby(["key", "date_us"], as_index=False).agg(
            revenue_cents=("rev_c", "sum"))
        out = out.rename(columns={"key": "o_orderkey",
                                  "date_us": "o_orderdate_us"})
        # partial top-k inside the bucket: only k rows per bucket travel
        return out.sort_values(["revenue_cents", "o_orderkey"],
                               ascending=[False, True]).head(k)

    pdf = both.groupby("bucket").map_groups(
        join_bucket, batch_format="pandas").to_pandas()
    pdf = pdf.sort_values(["revenue_cents", "o_orderkey"],
                          ascending=[False, True]).head(k)
    import pyarrow as _pa
    return _pa.Table.from_pandas(
        pdf[["o_orderkey", "o_orderdate_us", "revenue_cents"]]
        .reset_index(drop=True), preserve_index=False)


SEGMENT_REVENUE_SQL = f"""
SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{SEGMENT}'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT {SEGMENT_TOPK}
"""


def distinct_users_hll(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) via a distributed HyperLogLog
    (functions/sketch.py, P=14 ⇒ ~0.8% standard error).

    The 100-TB COUNT(DISTINCT) shape: each batch folds its keys into a
    fixed 16 KiB register array, one register row per batch travels, and
    the driver merges a handful of arrays with elementwise max — no
    shuffle of the key space at any cardinality. Rows-only by design
    (probabilistic); the error bound vs exact is asserted in
    tests/test_sketch.py.
    Output: one row (n_users_approx: int64).
    """
    from ..functions import sketch

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = sketch.empty_registers()
        sketch.add_values(regs, df["user_id"].to_numpy())
        return pd.DataFrame({"regs": [regs.tobytes()]})

    rows = ds.map_batches(partial, batch_format="pandas").take_all()
    regs = sketch.empty_registers()
    for r in rows:
        regs = sketch.merge(regs, np.frombuffer(r["regs"], dtype=np.uint8))
    import pyarrow as pa
    return pa.table({"n_users_approx":
                     pa.array([int(round(sketch.estimate(regs)))],
                              pa.int64())})


# --------------------------------------------------------------------------
# Multi-way join queries (TPC-H Q3/Q10 shapes): one broadcast side + one
# both-sides-large bucketed join, composed. These exercise the join
# machinery beyond two tables; all money in integer cents and dates as
# int64 epoch-us so value-hash parity with the DuckDB oracle is exact.
# --------------------------------------------------------------------------
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-01-01"


def shipping_priority_topk(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape: customer(filter segment) ⋈ orders(filter date) ⋈
    lineitem(filter date), revenue per (orderkey, orderdate, priority),
    top-k. Plan: customer is the small side (one mktsegment) → broadcast
    custkey set via ray.put; orders ⋈ lineitem are both large → bucketed
    partitioned hash join on orderkey with per-bucket partial top-k, so
    the driver merges k×B rows, never the joined table. Date predicates
    are pushed INTO the parquet scan (row-group pruning at the read).
    Output: (l_orderkey, revenue_cents, o_orderdate_us, o_orderpriority).
    """
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    n_buckets = _n_join_buckets()
    cutoff = pd.Timestamp(Q3_CUTOFF).to_pydatetime()

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keep = cust.filter(pa.compute.equal(cust["c_mktsegment"], Q3_SEGMENT))
    cust_ref = ray.put(frozenset(keep["c_custkey"].to_pylist()))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cutoff)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > cutoff)

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"key": df["l_orderkey"].astype("int64"),
                          "rev_c": price * (100 - disc)})
        g = g.groupby("key", as_index=False).sum()  # per-batch pre-agg
        g["bucket"] = (g["key"] % n_buckets).astype("int64")
        g["side"] = 0
        g["odate_us"] = np.int64(0)
        g["prio"] = ""
        return g

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        keep_keys = ray.get(cust_ref)
        m = df["o_custkey"].isin(keep_keys)
        df = df[m]
        return pd.DataFrame({
            "key": df["o_orderkey"].astype("int64"),
            "rev_c": np.int64(0),
            "bucket": (df["o_orderkey"] % n_buckets).astype("int64"),
            "side": 1,
            "odate_us": df["o_orderdate"].astype("int64") // 1000
            if df["o_orderdate"].dtype == "datetime64[ns]"
            else df["o_orderdate"].astype("int64"),
            "prio": df["o_orderpriority"],
        })

    both = li.map_batches(tag_li, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev_c"]]
        o = g[g["side"] == 1][["key", "odate_us", "prio"]]
        m = l.merge(o, on="key")
        if len(m) == 0:
            return pd.DataFrame({
                "l_orderkey": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64"),
                "o_orderdate_us": pd.Series([], dtype="int64"),
                "o_orderpriority": pd.Series([], dtype="object")})
        out = m.groupby(["key", "odate_us", "prio"], as_index=False).agg(
            revenue_cents=("rev_c", "sum"))
        out = out.rename(columns={"key": "l_orderkey",
                                  "odate_us": "o_orderdate_us",
                                  "prio": "o_orderpriority"})
        # per-bucket partial top-k (deterministic tie-break)
        return out.sort_values(["revenue_cents", "l_orderkey"],
                               ascending=[False, True]).head(k)[
            ["l_orderkey", "revenue_cents", "o_orderdate_us",
             "o_orderpriority"]]

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "l_orderkey"],
                              ascending=[False, True]).head(k) \
            .reset_index(drop=True)

    return both.groupby("bucket").map_groups(join_bucket,
                                             batch_format="pandas") \
        .repartition(1).map_batches(final_topk, batch_format="pandas")


SHIPPING_PRIORITY_SQL = f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cents,
       epoch_us(o.o_orderdate) AS o_orderdate_us,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, l.l_orderkey ASC
LIMIT 10
"""


def returned_items_topk(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape: lineitem(returnflag='R') ⋈ orders ⋈ customer ⋈
    nation, revenue per customer, top-k. Plan: the returnflag predicate is
    pushed into the scan; lineitem ⋈ orders is the bucketed large-large
    join (per-batch revenue pre-agg first so the shuffle carries one row
    per orderkey per batch); customer+nation are broadcast dicts applied
    AFTER the per-custkey aggregate, i.e. to ≤|customers| rows, not to
    the fact table.
    Output: (c_custkey, c_name, revenue_cents, acctbal_cents, n_name).
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    n_buckets = _n_join_buckets()

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pads.field("l_returnflag") == "R")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"key": df["l_orderkey"].astype("int64"),
                          "rev_c": price * (100 - disc)})
        g = g.groupby("key", as_index=False).sum()
        g["bucket"] = (g["key"] % n_buckets).astype("int64")
        g["side"] = 0
        g["custkey"] = np.int64(0)
        return g

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_orderkey"].astype("int64"),
            "rev_c": np.int64(0),
            "bucket": (df["o_orderkey"] % n_buckets).astype("int64"),
            "side": 1,
            "custkey": df["o_custkey"].astype("int64"),
        })

    both = li.map_batches(tag_li, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev_c"]]
        o = g[g["side"] == 1][["key", "custkey"]]
        m = l.merge(o, on="key")
        out = m.groupby("custkey", as_index=False).agg(
            revenue_cents=("rev_c", "sum"))
        return out.rename(columns={"custkey": "c_custkey"})

    per_cust = both.groupby("bucket").map_groups(join_bucket,
                                                 batch_format="pandas") \
        .groupby("c_custkey").aggregate(Sum("revenue_cents",
                                            alias_name="revenue_cents"))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal",
                                  "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nat_names = dict(zip(nation["n_nationkey"].to_pylist(),
                         nation["n_name"].to_pylist()))
    cust_info = {ck: (nm, int(round(ab * 100)), nat_names[nk])
                 for ck, nm, ab, nk in zip(cust["c_custkey"].to_pylist(),
                                           cust["c_name"].to_pylist(),
                                           cust["c_acctbal"].to_pylist(),
                                           cust["c_nationkey"].to_pylist())}
    info_ref = ray.put(cust_info)

    def enrich_topk(df: pd.DataFrame) -> pd.DataFrame:
        # partial top-k per block, then a k×n_blocks driver merge
        df = df.sort_values(["revenue_cents", "c_custkey"],
                            ascending=[False, True]).head(k)
        info = ray.get(info_ref)
        rows = [info[ck] for ck in df["c_custkey"]]
        df = df.copy()
        df["c_name"] = [r[0] for r in rows]
        df["acctbal_cents"] = np.asarray([r[1] for r in rows], dtype="int64")
        df["n_name"] = [r[2] for r in rows]
        return df[["c_custkey", "c_name", "revenue_cents",
                   "acctbal_cents", "n_name"]]

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "c_custkey"],
                              ascending=[False, True]).head(k) \
            .reset_index(drop=True)

    return per_cust.map_batches(enrich_topk, batch_format="pandas") \
        .repartition(1).map_batches(final_topk, batch_format="pandas")


RETURNED_ITEMS_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cents,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue_cents DESC, c.c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# events_rolling_avg: per-user trailing-K rolling average over the event
# stream (ordered by ts, event_id). The reference analog is the windowed
# stats tick (A2) generalized to per-key order-sensitive windows.
# --------------------------------------------------------------------------
ROLLING_K = 5


def events_rolling_avg(sf_dir: str, k: int = ROLLING_K):
    """(event_id, user_id, win_sum_cents, win_n, rolling_avg) — trailing
    k-row window per user. Window sums are int64 cents (exact under any
    accumulation order, matching the module-wide convention); the average
    is one IEEE division, so the oracle hash-compares exactly.

    Ray shape: hash-bucket by user → one vectorized pass per bucket
    (sort, per-user int cumsum, subtract the k-shifted cumsum). The
    rolling window never crosses buckets because a user is wholly inside
    one bucket — the documented partitioning assumption.
    """
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "us": us,
            "cents": cents,
            "bucket": (df["user_id"].to_numpy().astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        grp = g.groupby("user_id")
        cum = grp["cents"].cumsum()
        cum_k = cum.groupby(g["user_id"]).shift(k).fillna(0).astype("int64")
        win_sum = (cum - cum_k).to_numpy()
        pos = grp.cumcount().to_numpy()
        win_n = np.minimum(pos + 1, k)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "win_sum_cents": win_sum.astype("int64"),
            "win_n": win_n.astype("int64"),
            "rolling_avg": win_sum / (100.0 * win_n),
        })

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(roll_bucket, batch_format="pandas")


EVENTS_ROLLING_AVG_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(cents) OVER w AS BIGINT) AS win_sum_cents,
       CAST(count(*) OVER w AS BIGINT) AS win_n,
       CAST(sum(cents) OVER w AS DOUBLE) / (100.0 * (count(*) OVER w))
         AS rolling_avg
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_K - 1} PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# customers_no_urgent_orders: distributed ANTI-join (the missing join
# flavor; semi-joins appear inside the near-dup verifies, equi-joins in
# the multi-way query suite). The right side is predicate-filtered at the
# read (priority = 1-URGENT) so the result is non-trivial on the testdata
# corpus, and the filter is pushed before the shuffle.
# --------------------------------------------------------------------------
def customers_no_urgent_orders(sf_dir: str):
    """(c_custkey, c_name) of customers with zero 1-URGENT orders.

    Both sides hash-bucket on custkey, union, one groupby: inside each
    bucket group the order-side keys form the exclusion set — a per-
    bucket vectorized isin, never a driver-side set. Scales as the
    partitioned join: B buckets ∝ cluster CPUs, each bucket holds
    ~|customer|/B + ~|orders|/B rows.
    """
    n_buckets = _n_join_buckets()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    import pyarrow.compute as pc
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"],
                             filter=pc.field("o_orderpriority")
                             == "1-URGENT")

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        key = df["c_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key, "name": df["c_name"].astype("object"),
            "side": np.zeros(len(df), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        # pre-dedup per batch: the anti-join only needs key presence
        key = np.unique(df["o_custkey"].to_numpy().astype("int64"))
        return pd.DataFrame({
            "key": key, "name": pd.Series([""] * len(key), dtype="object"),
            "side": np.ones(len(key), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["side"] == 1, "key"].to_numpy()
        c = g[g["side"] == 0]
        keep = c[~c["key"].isin(have)]
        return pd.DataFrame({
            "c_custkey": keep["key"].to_numpy().astype("int64"),
            "c_name": keep["name"].to_numpy(),
        })

    return cust.map_batches(tag_cust, batch_format="pandas") \
        .union(orders.map_batches(tag_orders, batch_format="pandas")) \
        .groupby("bucket").map_groups(anti, batch_format="pandas")


CUSTOMERS_NO_URGENT_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# --------------------------------------------------------------------------
# heavy_hitters: EXACT top-k users by event count via a count-min-sketch
# candidate filter — the 100-TB shape for top-k over a skewed unbounded
# key space. No key-space shuffle anywhere:
#
#   pass 1 (one scan): per-batch exact local counts fold into a CMS
#     partial (fixed 4×8192 int64 grid, linear → merges by +) and the
#     batch's top candidates ride along as (user, local-count) rows; a
#     narrow combine sums both. The driver sees one sketch + a bounded
#     candidate table.
#   threshold: L = k-th largest candidate partial-count sum. L is an
#     UNDERestimate of the true k-th count, and CMS estimates are
#     OVERestimates, so every true top-k user has est ≥ true ≥ L —
#     the pass-2 filter provably misses nothing (exactness does not
#     depend on candidate quality; candidates only tighten L).
#   pass 2 (one scan): per-batch exact local counts for users with
#     broadcast-CMS est ≥ L; combine sums to exact global counts of the
#     enlarged set (≤ N/(L−εN) users by the CMS guarantee); driver cuts
#     the final top-k.
#
# Output: (user_id, n, rank), ties by user_id asc — full SQL oracle.
# --------------------------------------------------------------------------
HH_K = 20
_HH_CAND_PER_BATCH = 4 * HH_K


def heavy_hitters(sf_dir: str, k: int = HH_K):
    import pyarrow as pa
    import ray

    from ..functions.sketch import (CMS_D, CMS_W, cms_add, cms_empty,
                                    cms_estimate)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def pass1(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["user_id"].to_numpy().astype("int64"),
                         return_counts=True)
        cms = cms_add(cms_empty(), u.astype(np.uint64), c)
        top = np.argsort(c)[::-1][:_HH_CAND_PER_BATCH]
        return pa.table({
            "kind": pa.array(np.r_[0, np.ones(len(top))].astype("int64")),
            "user_id": pa.array(np.r_[0, u[top]].astype("int64")),
            "n": pa.array(np.r_[0, c[top]].astype("int64")),
            "blob": pa.array([cms.tobytes()] + [b""] * len(top),
                             pa.binary()),
        })

    def combine1(df: pd.DataFrame) -> pd.DataFrame:
        cms = cms_empty()
        for b in df.loc[df["kind"] == 0, "blob"]:
            cms += np.frombuffer(b, np.int64).reshape(CMS_D, CMS_W)
        cand = df[df["kind"] == 1].groupby("user_id", as_index=False)[
            "n"].sum()
        out = pd.concat([
            pd.DataFrame({"kind": [0], "user_id": [0], "n": [0],
                          "blob": [cms.tobytes()]}),
            cand.assign(kind=1, blob=b"")[
                ["kind", "user_id", "n", "blob"]]])
        return out

    p1 = ds.map_batches(pass1, batch_format="pyarrow") \
        .repartition(1).map_batches(combine1, batch_format="pandas") \
        .to_pandas()
    cms = np.frombuffer(p1.loc[p1["kind"] == 0, "blob"].iloc[0],
                        np.int64).reshape(CMS_D, CMS_W).copy()
    cand = p1[p1["kind"] == 1]
    L = int(np.sort(cand["n"].to_numpy())[::-1][:k][-1]) if len(cand) \
        else 1
    cms_ref = ray.put(cms)

    def pass2(t: pa.Table) -> pa.Table:
        grid = ray.get(cms_ref)
        u, c = np.unique(t["user_id"].to_numpy().astype("int64"),
                         return_counts=True)
        keep = cms_estimate(grid, u.astype(np.uint64)) >= L
        return pa.table({"user_id": pa.array(u[keep]),
                         "n": pa.array(c[keep].astype("int64"))})

    exact = ds.map_batches(pass2, batch_format="pyarrow") \
        .repartition(1).map_batches(
            lambda df: df.groupby("user_id", as_index=False)["n"].sum(),
            batch_format="pandas").to_pandas()
    exact = exact.sort_values(["n", "user_id"],
                              ascending=[False, True]).head(k)
    exact["rank"] = np.arange(1, len(exact) + 1, dtype="int64")
    return pa.table({
        "user_id": pa.array(exact["user_id"].to_numpy().astype("int64")),
        "n": pa.array(exact["n"].to_numpy().astype("int64")),
        "rank": pa.array(exact["rank"].to_numpy()),
    })


HEAVY_HITTERS_SQL = f"""
SELECT user_id, count(*) AS n,
       row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank
FROM events GROUP BY user_id
ORDER BY n DESC, user_id ASC LIMIT {HH_K}
"""


# --------------------------------------------------------------------------
# events_funnel: ordered-sequence funnel (view → click → purchase)
# --------------------------------------------------------------------------
FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str):
    """Per-user ordered funnel with greedy earliest-chain semantics: a
    user reaches step i+1 iff an event of that type occurs STRICTLY after
    the timestamp at which the user reached step i (step 1 = earliest
    'view'). Output: (step, step_name, users) — one row per funnel step,
    users = count of users reaching it; always 3 rows (0 for dry steps).

    Distributed shape: users are hash-bucketed so each user's whole
    history lands in one group; the chain walk is vectorized pandas joins
    inside the group (3 groupby-mins, no per-user Python); each bucket
    emits ≤3 partial count rows, the final reduce is a tiny one-task sum.
    Analog of the reference's per-host sequential state machines
    (src/crawler/Url_classifier.cc) applied to the event-sequence domain.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    n_buckets = _n_join_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(FUNNEL_STEPS)]
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "us": df["ts"].astype("datetime64[us]").astype("int64"),
            "event_type": df["event_type"],
            "bucket": (df["user_id"].to_numpy().astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # chain of groupby-mins: t_i = min us of step-i events strictly
        # after the user's t_{i-1}; each join keeps only users still alive
        reached = np.zeros(len(FUNNEL_STEPS), dtype="int64")
        prev = None  # Series: user_id -> us reached at previous step
        for i, step in enumerate(FUNNEL_STEPS):
            e = g[g["event_type"] == step]
            if prev is not None:
                t = prev.reindex(e["user_id"]).to_numpy()
                e = e[e["us"].to_numpy() > t]  # NaN compares False: drops
            cur = e.groupby("user_id")["us"].min()
            reached[i] = len(cur)
            if len(cur) == 0:
                break
            prev = cur
        return pd.DataFrame({
            "step": np.arange(1, len(FUNNEL_STEPS) + 1, dtype="int64"),
            "users": reached,
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("step")["users"].sum() \
            .reindex(range(1, len(FUNNEL_STEPS) + 1), fill_value=0)
        return pd.DataFrame({
            "step": tot.index.to_numpy().astype("int64"),
            "step_name": list(FUNNEL_STEPS),
            "users": tot.to_numpy().astype("int64"),
        })

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(funnel_bucket, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


EVENTS_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT 1 AS step, 'view' AS step_name, count(*) AS users FROM s1
UNION ALL
SELECT 2 AS step, 'click' AS step_name, count(*) AS users FROM s2
UNION ALL
SELECT 3 AS step, 'purchase' AS step_name, count(*) AS users FROM s3
"""


# --------------------------------------------------------------------------
# events_retention: weekly cohort retention matrix
# --------------------------------------------------------------------------
def _week_day(us: np.ndarray) -> np.ndarray:
    """Monday-start week truncation in the integer domain: epoch day of
    the Monday beginning the week containing each microsecond timestamp.
    1970-01-01 was a Thursday, so Monday-indexed weekday = (d + 3) % 7 —
    identical to DuckDB's date_trunc('week', ts)."""
    d = us // (86_400 * 10**6)
    return (d - (d + 3) % 7).astype("int64")


def events_retention(sf_dir: str):
    """Cohort retention: cohort_day = Monday epoch-day of each user's
    FIRST event's week; week_offset = whole weeks between that Monday and
    the Monday of each later active week. Output one row per
    (cohort_day, week_offset) with the distinct-user count — the classic
    retention triangle, all integers so the value hash vs DuckDB is exact.

    Distributed shape: users hash-bucketed so a user's min-ts and active
    weeks are computed in one group (distinct-per-user is safe inside the
    bucket — a user lives in exactly one); buckets emit partial counts
    per (cohort_day, week_offset), tiny by construction (≤ cohorts ×
    horizon per bucket), then one small groupby-sum.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    n_buckets = _n_join_buckets()

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy().astype("int64")
        return pd.DataFrame({
            "user_id": uid,
            "week_day": _week_day(us),
            "bucket": (uid.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def retain_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass: per-user cohort via groupby-min transform,
        # then distinct (cohort, offset) pairs via drop_duplicates
        cohort = g.groupby("user_id")["week_day"].transform("min")
        pairs = pd.DataFrame({
            "cohort_day": cohort.to_numpy(),
            "week_offset": ((g["week_day"].to_numpy()
                             - cohort.to_numpy()) // 7).astype("int64"),
            "user_id": g["user_id"].to_numpy(),
        }).drop_duplicates()
        out = pairs.groupby(["cohort_day", "week_offset"],
                            as_index=False).size()
        return pd.DataFrame({
            "cohort_day": out["cohort_day"].astype("int64"),
            "week_offset": out["week_offset"].astype("int64"),
            "users": out["size"].astype("int64"),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_day", "week_offset"],
                         as_index=False)["users"].sum()
        return out.astype("int64")

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(retain_bucket, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


EVENTS_RETENTION_SQL = """
WITH w AS (
  SELECT user_id,
         datediff('day', DATE '1970-01-01',
                  CAST(date_trunc('week', ts) AS DATE)) AS week_day
  FROM events
), f AS (
  SELECT user_id, min(week_day) AS cohort_day FROM w GROUP BY user_id
), act AS (
  SELECT DISTINCT w.user_id, f.cohort_day,
         (w.week_day - f.cohort_day) // 7 AS week_offset
  FROM w JOIN f ON w.user_id = f.user_id
)
SELECT cohort_day, week_offset, count(*) AS users
FROM act GROUP BY cohort_day, week_offset
"""


# --------------------------------------------------------------------------
# group_value_quantiles: exact per-group percentiles via histogram merge
# --------------------------------------------------------------------------
_QUANT_FRACS = ((1, 2), (9, 10), (99, 100))  # p50 / p90 / p99 as rationals


def group_value_quantiles(sf_dir: str):
    """(event_type, n, p50_cents, p90_cents, p99_cents) — EXACT discrete
    quantiles per group, computed scale-safely: per-batch (type, cents)
    histogram partials (rows ∝ distinct values, not input rows), one
    groupby over event_type whose group payload is the merged histogram,
    then a CDF walk. A hot group's shuffle volume is bounded by the value
    DOMAIN, not its row count — the skew-proof form of per-group order
    statistics (value_percentiles is the global cousin).

    quantile_disc semantics pinned to DuckDB's: k-th smallest with
    k = ceil(q*n), evaluated in exact integer arithmetic
    ((num*n + den - 1) // den) — float ceil would misround (e.g.
    0.99*100 → 99.0000…01), verified rule-vs-DuckDB for n = 1..500.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        g = pa.table({"event_type": t["event_type"], "cents": cents}) \
            .group_by(["event_type", "cents"]) \
            .aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "cents": g["cents"],
                         "cnt": pc.cast(g["count_all"], pa.int64())})

    def cdf_walk(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("cents", as_index=False)["cnt"].sum() \
            .sort_values("cents")
        cents = h["cents"].to_numpy()
        cum = h["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        qs = [int(cents[np.searchsorted(
            cum, (num * n + den - 1) // den)])
            for num, den in _QUANT_FRACS]
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], dtype="int64"),
            "p50_cents": np.array([qs[0]], dtype="int64"),
            "p90_cents": np.array([qs[1]], dtype="int64"),
            "p99_cents": np.array([qs[2]], dtype="int64"),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").map_groups(cdf_walk, batch_format="pandas")


GROUP_VALUE_QUANTILES_SQL = """
SELECT event_type, count(*) AS n,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS p90_cents,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS p99_cents
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# local_supplier_revenue: TPC-H Q5 shape (6 tables, 2 bucketed shuffles)
# --------------------------------------------------------------------------
Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1998-01-01"


def local_supplier_revenue(sf_dir: str):
    """Revenue per nation from LOCAL supply (customer and supplier in the
    same nation of one region, orders within a date window) — the TPC-H
    Q5 join graph: region ⋈ nation ⋈ supplier ⋈ lineitem ⋈ orders ⋈
    customer. Output (n_name, revenue_cbp, n), revenue in cents ×
    (100 - discount basis points), integer-exact vs the oracle.

    Physical plan (the 6-way join as 2 bucketed shuffles + broadcasts):
    - nation ⋈ region (≤25 rows) and supplier→nationkey (1000× smaller
      than lineitem at every TPC-H SF) broadcast once via ray.put — the
      supplier map as a flat int32 array indexed by suppkey (vectorized
      probe, no per-row dict). At extreme SF supplier would graduate to
      a third bucketed join; the dims never would.
    - shuffle 1: orders(date-pruned AT THE READ via a parquet filter)
      ⋈ customer on custkey, bucketed ∝ cluster CPUs.
    - shuffle 2: that result ⋈ lineitem on orderkey (lineitem rows
      pre-filtered to in-region suppliers by the broadcast probe, and
      pre-aggregated nothing — the join is selective); same-nation
      filter + per-nation partial sums inside the bucket, tiny combine.
    """
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    n_buckets = _n_join_buckets()

    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    regiont = _pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {rk for rk, rn in zip(regiont["r_regionkey"].to_pylist(),
                                  regiont["r_name"].to_pylist())
             if rn == Q5_REGION}
    nat_name = {int(k): str(nm) for k, nm, rk in zip(
        nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist(),
        nation["n_regionkey"].to_pylist()) if int(rk) in rkeys}
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    skey = sup["s_suppkey"].to_numpy()
    snat = sup["s_nationkey"].to_numpy()
    smap = np.full(int(skey.max()) + 1, -1, dtype=np.int32)
    in_region = np.isin(snat, np.array(list(nat_name), dtype=snat.dtype))
    smap[skey[in_region]] = snat[in_region]
    smap_ref = ray.put(smap)
    nat_keys = ray.put(set(nat_name))

    lo = _dt.datetime.fromisoformat(Q5_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q5_DATE_HI)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))
    customer = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])

    # ---- shuffle 1: orders ⋈ customer on custkey ----
    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_custkey"].astype("int64"),
            "bucket": (df["o_custkey"] % n_buckets).astype("int64"),
            "side": 0,
            "okey": df["o_orderkey"].astype("int64"),
            "nat": np.int32(-1),
        })

    def tag_customer(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["c_nationkey"].isin(ray.get(nat_keys))
        d = df[keep]
        return pd.DataFrame({
            "key": d["c_custkey"].astype("int64"),
            "bucket": (d["c_custkey"] % n_buckets).astype("int64"),
            "side": 1,
            "okey": np.int64(0),
            "nat": d["c_nationkey"].astype("int32"),
        })

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "okey"]]
        c = g[g["side"] == 1][["key", "nat"]]
        m = o.merge(c, on="key")
        return pd.DataFrame({
            "key": m["okey"].astype("int64"),
            "bucket": (m["okey"] % n_buckets).astype("int64"),
            "side": 1,
            "nat": m["nat"].astype("int32"),
            "rev": np.int64(0),
        })

    o_nat = orders.map_batches(tag_orders, batch_format="pandas").union(
        customer.map_batches(tag_customer, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_cust, batch_format="pandas")

    # ---- shuffle 2: ⋈ lineitem on orderkey, same-nation filter, agg ----
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        arr = ray.get(smap_ref)
        sk = df["l_suppkey"].to_numpy()
        nat = np.where(sk < len(arr), arr[np.minimum(sk, len(arr) - 1)],
                       -1).astype("int32")
        keep = nat >= 0
        d = df[keep]
        price = np.rint(d["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(d["l_discount"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({
            "key": d["l_orderkey"].astype("int64"),
            "bucket": (d["l_orderkey"] % n_buckets).astype("int64"),
            "side": 0,
            "nat": nat[keep],
            "rev": price * (100 - disc),
        })

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "nat", "rev"]]
        o = g[g["side"] == 1][["key", "nat"]]
        m = l.merge(o, on="key", suffixes=("_s", "_c"))
        m = m[m["nat_s"] == m["nat_c"]]
        out = m.groupby("nat_s", as_index=False).agg(
            revenue_cbp=("rev", "sum"), n=("rev", "size"))
        return out.rename(columns={"nat_s": "nat"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("nat", as_index=False).agg(
            revenue_cbp=("revenue_cbp", "sum"), n=("n", "sum"))
        return pd.DataFrame({
            "n_name": out["nat"].map(nat_name),
            "revenue_cbp": out["revenue_cbp"].astype("int64"),
            "n": out["n"].astype("int64"),
        })

    return li.map_batches(tag_li, batch_format="pandas").union(o_nat) \
        .groupby("bucket").map_groups(join_li, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


LOCAL_SUPPLIER_REVENUE_SQL = f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cbp,
       count(*) AS n
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q5_DATE_HI}'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# orders_rollup: GROUP BY ROLLUP via re-aggregation of one partial pass
# --------------------------------------------------------------------------
def orders_rollup(sf_dir: str):
    """(status, priority, n, total_cents) under ROLLUP(status, priority):
    the detail rows plus per-status subtotals plus the grand total, with
    'ALL' as the rolled-up marker (COALESCE'd identically in the oracle).

    The distributed shape reads the fact table ONCE: per-batch Arrow
    partials over the finest grouping (status × priority — bounded
    cardinality, so the shuffle is metadata-sized), then every coarser
    level is derived by re-aggregating the tiny partial table in the
    single combine task — no second scan per grouping set."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"status": t["o_orderstatus"],
                      "priority": t["o_orderpriority"],
                      "total_cents": cents}) \
            .group_by(["status", "priority"]) \
            .aggregate([("total_cents", "sum"), ([], "count_all")])
        return pa.table({"status": g["status"], "priority": g["priority"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "total_cents": g["total_cents_sum"]})

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        base = df.groupby(["status", "priority"], as_index=False).agg(
            n=("n", "sum"), total_cents=("total_cents", "sum"))
        lvl1 = base.groupby("status", as_index=False).agg(
            n=("n", "sum"), total_cents=("total_cents", "sum"))
        lvl1["priority"] = "ALL"
        lvl0 = pd.DataFrame({
            "status": ["ALL"], "priority": ["ALL"],
            "n": [base["n"].sum()],
            "total_cents": [base["total_cents"].sum()],
        })
        out = pd.concat([base, lvl1, lvl0], ignore_index=True)
        return out[["status", "priority", "n", "total_cents"]].astype(
            {"n": "int64", "total_cents": "int64"})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(rollup, batch_format="pandas")


ORDERS_ROLLUP_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# events_pivot: long → wide conditional aggregation
# --------------------------------------------------------------------------
PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")


def events_pivot(sf_dir: str):
    """One row per user with event-type counts as COLUMNS
    (n_view/n_click/n_purchase/n_signup/n_error) — the long→wide pivot,
    distributed as conditional-count partials per batch (an Arrow
    group_by over (user, type) pivoted in numpy) and one bucketed
    groupby over user to merge partials; the column set is fixed by the
    schema, never data-dependent, so the plan is static at any scale."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    n_buckets = _n_join_buckets()

    def partial(t):
        import pyarrow as pa
        g = pa.table({"user_id": t["user_id"],
                      "event_type": t["event_type"]}) \
            .group_by(["user_id", "event_type"]) \
            .aggregate([([], "count_all")])
        uid = g["user_id"].to_numpy()
        et = np.asarray(g["event_type"].to_pylist())
        cnt = g["count_all"].to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        cols = {"user_id": pa.array(users, pa.int64()),
                "bucket": pa.array((users.astype("uint64")
                                    % np.uint64(n_buckets)).astype("int64"))}
        for ty in PIVOT_TYPES:
            v = np.zeros(len(users), dtype="int64")
            m = et == ty
            np.add.at(v, inv[m], cnt[m])
            cols[f"n_{ty}"] = pa.array(v, pa.int64())
        return pa.table(cols)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)[
            [f"n_{t}" for t in PIVOT_TYPES]].sum()
        return out.astype("int64")

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(merge, batch_format="pandas")


EVENTS_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# semi-join: customers WITH ≥1 urgent order (EXISTS — the anti-join's dual)
# --------------------------------------------------------------------------
def customers_with_urgent_orders(sf_dir: str):
    """(c_custkey, c_name) of customers having at least one 1-URGENT
    order — the distributed EXISTS/semi-join, same bucketed shape as
    the anti-join (customers_no_urgent_orders) with the membership test
    inverted; the build side is pre-deduplicated per batch so the
    shuffle carries distinct keys, not order rows."""
    n_buckets = _n_join_buckets()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    import pyarrow.compute as pc
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"],
                             filter=pc.field("o_orderpriority")
                             == "1-URGENT")

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        key = df["c_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key, "name": df["c_name"].astype("object"),
            "side": np.zeros(len(df), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(df["o_custkey"].to_numpy().astype("int64"))
        return pd.DataFrame({
            "key": key, "name": pd.Series([""] * len(key), dtype="object"),
            "side": np.ones(len(key), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["side"] == 1, "key"].to_numpy()
        c = g[g["side"] == 0]
        keep = c[c["key"].isin(have)]
        return pd.DataFrame({
            "c_custkey": keep["key"].to_numpy().astype("int64"),
            "c_name": keep["name"].to_numpy(),
        })

    return cust.map_batches(tag_cust, batch_format="pandas") \
        .union(orders.map_batches(tag_orders, batch_format="pandas")) \
        .groupby("bucket").map_groups(semi, batch_format="pandas")


CUSTOMERS_WITH_URGENT_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


# --------------------------------------------------------------------------
# promo_revenue_share (TPC-H Q14 shape): lineitem ⋈ part on partkey, share
# of revenue from PROMO-type parts. Same partitioned-hash-join pattern as
# revenue_by_priority (bucket = key % B, B ∝ CPUs), but the join output is
# reduced to two conditional int64 cents sums INSIDE each bucket group, so
# only B tiny rows reach the final one-task combine. Reference analog:
# none (no relational joins in mycelium, SURVEY §2.4) — this is an added
# training-corpus analytics shape.
# --------------------------------------------------------------------------
def promo_revenue_share(sf_dir: str):
    """One row: (promo_revenue_cents, total_revenue_cents, promo_share).
    Revenue is exact int64 cents×(100-disc); the share is one IEEE
    division of the two exact sums, so it hash-compares exactly."""
    n_buckets = _n_join_buckets()
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        key = df["l_partkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
            "side": np.zeros(len(df), dtype="int64"),
            "rev_c": price * (100 - disc),
            "promo": np.zeros(len(df), dtype="bool"),
        })

    def tag_part(df: pd.DataFrame) -> pd.DataFrame:
        key = df["p_partkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
            "side": np.ones(len(df), dtype="int64"),
            "rev_c": np.zeros(len(df), dtype="int64"),
            "promo": (df["p_type"] == "PROMO").to_numpy(),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev_c"]]
        p = g[g["side"] == 1][["key", "promo"]]
        m = l.merge(p, on="key")
        promo_c = int(m.loc[m["promo"], "rev_c"].sum())
        total_c = int(m["rev_c"].sum())
        return pd.DataFrame({"promo_c": [promo_c], "total_c": [total_c]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        promo_c = int(df["promo_c"].sum())
        total_c = int(df["total_c"].sum())
        return pd.DataFrame({
            "promo_revenue_cents": pd.Series([promo_c], dtype="int64"),
            "total_revenue_cents": pd.Series([total_c], dtype="int64"),
            # round each operand to double FIRST (float()), matching the
            # oracle's CAST(.. AS DOUBLE)/CAST(.. AS DOUBLE): Python's
            # exact-int division is correctly rounded from the exact
            # quotient and diverges by 1 ulp past 2^53 (sf≈4 here)
            "promo_share": [float(promo_c) / float(total_c)
                            if total_c else 0.0],
        })

    return li.map_batches(tag_li, batch_format="pandas") \
        .union(part.map_batches(tag_part, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_bucket, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


PROMO_REVENUE_SQL = """
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_c,
         p.p_type = 'PROMO' AS promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT coalesce(CAST(sum(CASE WHEN promo THEN rev_c ELSE 0 END)
                     AS BIGINT), 0) AS promo_revenue_cents,
       coalesce(CAST(sum(rev_c) AS BIGINT), 0) AS total_revenue_cents,
       coalesce(CAST(sum(CASE WHEN promo THEN rev_c ELSE 0 END) AS DOUBLE)
                  / nullif(CAST(sum(rev_c) AS DOUBLE), 0), 0.0)
         AS promo_share
FROM j
"""


# --------------------------------------------------------------------------
# large_orders (TPC-H Q18 shape): orders whose total lineitem quantity
# exceeds a threshold, joined back to orders + customer. The 100-TB shape:
#
#   pass 1: per-batch partial (orderkey, qty) sums → bucketed groupby →
#     per-bucket exact sums, HAVING filter applied INSIDE the bucket group
#     so only the (provably tiny — 99.9th-percentile threshold) winner set
#     leaves the shuffle;
#   pass 2: winners broadcast once via ray.put; the orders scan keeps only
#     winner orderkeys (map-side semi-join, no shuffle);
#   pass 3: the filtered orders (bounded by the winner set) broadcast
#     against the customer scan — another map-side join.
#
# Nothing larger than the winner set ever leaves a worker, and no
# all-to-all exchange touches the big tables beyond the one bucketed
# pre-aggregation.
# --------------------------------------------------------------------------
LARGE_ORDER_QTY_C = 30000  # qty*100 > 300 units ≈ 99.7th pct — the
# winner set must stay broadcast-small at any scale (TPC-H Q18 uses the
# same >300 bar); non-vacuous at every test sf (5 rows at sf0.001)


def large_orders(sf_dir: str, qty_c: int = LARGE_ORDER_QTY_C):
    """(c_custkey, c_name, o_orderkey, total_qty_c, o_totalprice_cents)
    for orders with sum(l_quantity)*100 > qty_c."""
    import ray
    n_buckets = _n_join_buckets()
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(df["l_quantity"].to_numpy() * 100).astype("int64")
        g = pd.DataFrame({"key": df["l_orderkey"].astype("int64"),
                          "qty_c": q}) \
            .groupby("key", as_index=False)["qty_c"].sum()
        g["bucket"] = (g["key"].to_numpy().astype("uint64")
                       % np.uint64(n_buckets)).astype("int64")
        return g

    def winners_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("key", as_index=False)["qty_c"].sum()
        s = s[s["qty_c"] > qty_c]
        return pd.DataFrame({"o_orderkey": s["key"].astype("int64"),
                             "total_qty_c": s["qty_c"].astype("int64")})

    win = li.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(winners_of_bucket,
                                      batch_format="pandas").to_pandas()
    win_ref = ray.put(win)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])

    def keep_winners(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(win_ref)
        m = df.merge(w, left_on="o_orderkey", right_on="o_orderkey")
        return pd.DataFrame({
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "o_custkey": m["o_custkey"].astype("int64"),
            "total_qty_c": m["total_qty_c"].astype("int64"),
            "o_totalprice_cents": np.rint(
                m["o_totalprice"].to_numpy() * 100).astype("int64"),
        })

    big = orders.map_batches(keep_winners, batch_format="pandas") \
        .to_pandas()
    big_ref = ray.put(big)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])

    def attach_cust(df: pd.DataFrame):
        import pyarrow as pa
        b = ray.get(big_ref)
        m = df.merge(b, left_on="c_custkey", right_on="o_custkey")
        # typed Arrow: an all-empty result (threshold above every order)
        # still carries its schema through to_pandas
        return pa.table({
            "c_custkey": pa.array(m["c_custkey"].to_numpy()
                                  .astype("int64"), pa.int64()),
            "c_name": pa.array(m["c_name"], pa.string()),
            "o_orderkey": pa.array(m["o_orderkey"].to_numpy()
                                   .astype("int64"), pa.int64()),
            "total_qty_c": pa.array(m["total_qty_c"].to_numpy()
                                    .astype("int64"), pa.int64()),
            "o_totalprice_cents": pa.array(
                m["o_totalprice_cents"].to_numpy().astype("int64"),
                pa.int64()),
        })

    return cust.map_batches(attach_cust, batch_format="pandas")


LARGE_ORDERS_SQL = f"""
WITH q AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS total_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > {LARGE_ORDER_QTY_C}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, q.total_qty_c,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
"""


# --------------------------------------------------------------------------
# linestatus_priority_counts (TPC-H Q12 shape): lineitem (date-windowed at
# the parquet scan) ⋈ orders on orderkey, conditional line counts per
# linestatus by order priority class. The date predicate is pushed into
# the read so only the window's row-groups leave storage; the join is the
# bucketed pattern with the conditional counts folded per bucket.
# --------------------------------------------------------------------------
_Q12_LO = "1997-01-01"
_Q12_HI = "1998-01-01"


def linestatus_priority_counts(sf_dir: str):
    """(l_linestatus, high_line_count, low_line_count) over lineitems
    shipped within [1997-01-01, 1998-01-01); high = order priority in
    {1-URGENT, 2-HIGH}."""
    from datetime import datetime
    import pyarrow.compute as pc
    n_buckets = _n_join_buckets()
    lo = datetime(1997, 1, 1)
    hi = datetime(1998, 1, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        key = df["l_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
            "side": np.zeros(len(df), dtype="int64"),
            "status": df["l_linestatus"].astype("object"),
            "high": np.zeros(len(df), dtype="bool"),
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        key = df["o_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
            "side": np.ones(len(df), dtype="int64"),
            "status": pd.Series([""] * len(df), dtype="object"),
            "high": df["o_orderpriority"].isin(
                ["1-URGENT", "2-HIGH"]).to_numpy(),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "status"]]
        o = g[g["side"] == 1][["key", "high"]]
        m = l.merge(o, on="key")
        if len(m) == 0:
            return pd.DataFrame({
                "l_linestatus": pd.Series([], dtype="object"),
                "high_line_count": pd.Series([], dtype="int64"),
                "low_line_count": pd.Series([], dtype="int64")})
        out = m.groupby("status", as_index=False).agg(
            high_line_count=("high", "sum"),
            low_line_count=("high", lambda s: int((~s).sum())))
        out["high_line_count"] = out["high_line_count"].astype("int64")
        out["low_line_count"] = out["low_line_count"].astype("int64")
        return out.rename(columns={"status": "l_linestatus"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_linestatus", as_index=False).agg(
            high_line_count=("high_line_count", "sum"),
            low_line_count=("low_line_count", "sum"))

    return li.map_batches(tag_li, batch_format="pandas") \
        .union(orders.map_batches(tag_orders, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_bucket, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


LINESTATUS_PRIORITY_SQL = f"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO}'
  AND l.l_shipdate < TIMESTAMP '{_Q12_HI}'
GROUP BY l.l_linestatus
"""


# --------------------------------------------------------------------------
# Window-function family over hash-bucketed per-key groups. All three
# follow the events_rolling_avg partitioning assumption — a key (user /
# customer) is wholly inside one bucket, so per-key windows never cross
# groups — and each per-bucket kernel is one vectorized pandas pass.
# --------------------------------------------------------------------------
def events_lag_diff(sf_dir: str):
    """(event_id, user_id, gap_us) — microseconds since the same user's
    previous event (ts, event_id order); first event per user → -1.
    The LAG window function, distributed by user hash bucket."""
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "us": df["ts"].astype("datetime64[us]").astype("int64"),
            "bucket": (df["user_id"].to_numpy().astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        prev = g.groupby("user_id")["us"].shift(1)
        gap = (g["us"] - prev).fillna(-1).astype("int64")
        return pd.DataFrame({"event_id": g["event_id"],
                             "user_id": g["user_id"],
                             "gap_us": gap})

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(lag_bucket, batch_format="pandas")


EVENTS_LAG_DIFF_SQL = """
SELECT event_id, user_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""


def user_cumulative_value(sf_dir: str):
    """(event_id, user_id, cum_cents) — running int64-cents total of
    `value` per user in (ts, event_id) order. The cumulative-SUM window,
    exact under any distribution because cents are integers and a user's
    rows are totally ordered inside one bucket group."""
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "us": df["ts"].astype("datetime64[us]").astype("int64"),
            "cents": np.rint(df["value"].to_numpy() * 100).astype("int64"),
            "bucket": (df["user_id"].to_numpy().astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def cum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        cum = g.groupby("user_id")["cents"].cumsum().astype("int64")
        return pd.DataFrame({"event_id": g["event_id"],
                             "user_id": g["user_id"],
                             "cum_cents": cum})

    return ds.map_batches(bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(cum_bucket, batch_format="pandas")


USER_CUMULATIVE_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_cents
FROM e
"""


TOP_ORDERS_PER_CUST = 2


def top_orders_per_customer(sf_dir: str, k: int = TOP_ORDERS_PER_CUST):
    """(o_custkey, o_orderkey, price_cents, rnk) — each customer's top-k
    orders by totalprice (ties by orderkey asc). ROW_NUMBER per group,
    distributed as: per-batch partial top-k per custkey (bounds shuffle
    rows at k per customer per batch) → custkey-bucket groupby → exact
    per-customer rank inside the bucket group."""
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "price_cents": np.rint(
                df["o_totalprice"].to_numpy() * 100).astype("int64"),
        })
        out = out.sort_values(["o_custkey", "price_cents", "o_orderkey"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out = out.groupby("o_custkey", as_index=False).head(k)
        out["bucket"] = (out["o_custkey"].to_numpy().astype("uint64")
                         % np.uint64(n_buckets)).astype("int64")
        return out

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "price_cents", "o_orderkey"],
                          ascending=[True, False, True],
                          kind="mergesort").reset_index(drop=True)
        rnk = g.groupby("o_custkey").cumcount() + 1
        g = g.assign(rnk=rnk.astype("int64"))
        g = g[g["rnk"] <= k]
        return g[["o_custkey", "o_orderkey", "price_cents", "rnk"]]

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(rank_bucket, batch_format="pandas")


TOP_ORDERS_PER_CUST_SQL = f"""
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(round(o_totalprice * 100)
                                          AS BIGINT) DESC,
                                     o_orderkey ASC) AS rnk
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {TOP_ORDERS_PER_CUST}
"""


# --------------------------------------------------------------------------
# rich_idle_customers (TPC-H Q22 shape): a global scalar subquery (average
# positive account balance) gating a predicate, composed with an anti-join
# (customers with no orders). Distributed shape:
#
#   scalar: one scan folds per-batch (sum_cents, n) partials → a single
#     broadcastable float threshold (two ints cross the driver, not rows);
#   anti-join: the customers_no_urgent_orders bucket pattern, with the
#     threshold filter applied map-side BEFORE the shuffle so only
#     above-average customers move.
# --------------------------------------------------------------------------
def rich_idle_customers(sf_dir: str):
    """(c_custkey, acctbal_cents) of customers whose balance exceeds the
    average positive balance and who have placed no 1-URGENT order (the
    anti-join side is priority-filtered at the parquet scan so the result
    is non-trivial at every sf — the synthetic corpus gives every
    customer at least one order)."""
    import pyarrow.compute as pc
    n_buckets = _n_join_buckets()
    cust_bal = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_acctbal"])

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["c_acctbal"].to_numpy() * 100).astype("int64")
        pos = cents[cents > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    parts = cust_bal.map_batches(bal_partial,
                                 batch_format="pandas").to_pandas()
    total_s, total_n = int(parts["s"].sum()), int(parts["n"].sum())
    # round the numerator to double FIRST, matching the oracle's
    # CAST(sum AS DOUBLE)/count(*): exact-int division would differ by
    # 1 ulp past 2^53 and could flip boundary rows at very large sf
    thresh = float(total_s) / total_n if total_n else 0.0

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"],
                             filter=pc.field("o_orderpriority")
                             == "1-URGENT")

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["c_acctbal"].to_numpy() * 100).astype("int64")
        keep = cents > thresh          # map-side gate BEFORE the shuffle
        key = df["c_custkey"].to_numpy().astype("int64")[keep]
        return pd.DataFrame({
            "key": key, "cents": cents[keep],
            "side": np.zeros(len(key), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(df["o_custkey"].to_numpy().astype("int64"))
        return pd.DataFrame({
            "key": key, "cents": np.zeros(len(key), dtype="int64"),
            "side": np.ones(len(key), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def anti(g: pd.DataFrame):
        import pyarrow as pa
        have = g.loc[g["side"] == 1, "key"].to_numpy()
        c = g[g["side"] == 0]
        keep = c[~c["key"].isin(have)]
        return pa.table({
            "c_custkey": pa.array(keep["key"].to_numpy()
                                  .astype("int64"), pa.int64()),
            "acctbal_cents": pa.array(keep["cents"].to_numpy()
                                      .astype("int64"), pa.int64()),
        })

    return cust_bal.map_batches(tag_cust, batch_format="pandas") \
        .union(orders.map_batches(tag_orders, batch_format="pandas")) \
        .groupby("bucket").map_groups(anti, batch_format="pandas")


RICH_IDLE_CUSTOMERS_SQL = """
WITH c AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
), t AS (
  -- mirror the pipeline's empty-input fallback (thresh = 0.0 when no
  -- positive balances) so both sides agree on degenerate input
  SELECT coalesce(CAST(sum(cents) AS DOUBLE) / nullif(count(*), 0), 0.0)
           AS thresh
  FROM c WHERE cents > 0
)
SELECT c.c_custkey, c.cents AS acctbal_cents
FROM c, t
WHERE c.cents > t.thresh
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# --------------------------------------------------------------------------
# distinct_users_per_type: EXACT count(distinct) per group — the exact dual
# of distinct_users_hll. Raw rows never shuffle: each batch pre-dedups its
# (type, user) pairs, the pair stream hash-buckets on user so the SECOND
# dedup is local to a group, and only (type, partial_count) rows reach the
# final tiny combine. Shuffle volume ≤ distinct pairs, not events.
# --------------------------------------------------------------------------
def distinct_users_per_type(sf_dir: str):
    """(event_type, n_users) with n_users = exact distinct user count."""
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def pair_dedup(df: pd.DataFrame) -> pd.DataFrame:
        p = df.drop_duplicates(["event_type", "user_id"])
        u = p["user_id"].to_numpy().astype("int64")
        return pd.DataFrame({
            "event_type": p["event_type"].astype("object"),
            "user_id": u,
            "bucket": (u.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop_duplicates(["event_type", "user_id"]) \
            .groupby("event_type", as_index=False).size()
        return pd.DataFrame({"event_type": c["event_type"],
                             "n_users": c["size"].astype("int64")})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_users=("n_users", "sum"))

    return ds.map_batches(pair_dedup, batch_format="pandas") \
        .groupby("bucket").map_groups(count_bucket, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


DISTINCT_USERS_PER_TYPE_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# user_mode_event_type: per-group MODE (most frequent value, ties broken
# by value asc). Per-batch (user, type) partial counts bound the shuffle
# at |users|×|types| per batch; the user-bucket groupby sums partials and
# takes the argmax inside one vectorized sort+head pass.
# --------------------------------------------------------------------------
def user_mode_event_type(sf_dir: str):
    """(user_id, mode_type, n) — each user's most frequent event type."""
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["user_id", "event_type"], as_index=False).size()
        u = c["user_id"].to_numpy().astype("int64")
        return pd.DataFrame({
            "user_id": u, "event_type": c["event_type"],
            "n": c["size"].astype("int64"),
            "bucket": (u.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def mode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        s = s.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = s.groupby("user_id", as_index=False).head(1)
        return pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "mode_type": top["event_type"].astype("object"),
            "n": top["n"].astype("int64"),
        })

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(mode_bucket, batch_format="pandas")


USER_MODE_EVENT_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type ASC) AS rnk
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_type, n FROM c WHERE rnk = 1
"""


# --------------------------------------------------------------------------
# event_type_value_stats: per-group variance from EXACT integer moment
# partials — (n, sum_cents, sumsq_cents) fold per batch as int64, combine
# by +, and the float variance is derived at the end with a PINNED
# evaluation order ((sumsq - sum·sum/n)/n on doubles) mirrored verbatim
# in the oracle SQL, so even the IEEE results hash-compare exactly.
# Shuffle volume: one row per (type, batch). sumsq fits int64 through
# sf100 (cents² ≤ 1e10 × 1e7 rows/type = 1e17 < 2^63).
# --------------------------------------------------------------------------
def event_type_value_stats(sf_dir: str):
    """(event_type, n, sum_cents, sumsq_cents, var_pop)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        t = pd.DataFrame({"event_type": df["event_type"],
                          "c": cents, "c2": cents * cents})
        g = t.groupby("event_type", as_index=False).agg(
            n=("c", "size"), sum_cents=("c", "sum"),
            sumsq_cents=("c2", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    from ray.data.aggregate import Sum
    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sumsq_cents", alias_name="sumsq_cents"))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy().astype("float64")
        s = df["sum_cents"].to_numpy().astype("float64")
        s2 = df["sumsq_cents"].to_numpy().astype("float64")
        df = df.copy()
        # pinned order: (s2 - s*s/n)/n, all doubles
        df["var_pop"] = (s2 - s * s / n) / n
        return df

    return agg.map_batches(finalize, batch_format="pandas")


EVENT_TYPE_VALUE_STATS_SQL = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sum_cents,
         CAST(sum(c * c) AS BIGINT) AS sumsq_cents
  FROM e GROUP BY event_type
)
SELECT event_type, n, sum_cents, sumsq_cents,
       (CAST(sumsq_cents AS DOUBLE)
        - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE)
          / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_pop
FROM m
"""


# --------------------------------------------------------------------------
# props_key_agg: semi-structured (JSON) column extraction + grouped exact
# aggregate — the scalar-library shape a props/metadata column needs. The
# extraction is one compiled-regex vectorized pass over the batch (the
# props contract is flat single-key JSON; a general parser would be
# orjson per row), then integer partials per (event_type, batch) so the
# shuffle is ∝ groups, never events.
# --------------------------------------------------------------------------
_PROPS_K_RE = r'"k"\s*:\s*(?P<k>-?\d+)'


def props_key_agg(sf_dir: str):
    """(event_type, n, sum_k, min_k, max_k) of the JSON props field k."""
    import pyarrow.compute as pc
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(t):
        import pyarrow as pa
        import pyarrow.compute as pc
        ex = pc.extract_regex(pc.fill_null(t["props"], ""),
                              _PROPS_K_RE).combine_chunks()
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        import numpy as _np
        one = pa.array(_np.ones(len(t), dtype="int64"))
        # n counts ROWS (count(*) in the oracle), not non-null extracted
        # k — a props row without an extractable integer k must still
        # count toward n
        g = pa.table({"event_type": t["event_type"], "k": k, "one": one}) \
            .group_by("event_type").aggregate(
                [("one", "sum"), ("k", "sum"), ("k", "min"), ("k", "max")])
        return pa.table({
            "event_type": g["event_type"],
            "n": pc.cast(g["one_sum"], pa.int64()),
            "sum_k": pc.cast(g["k_sum"], pa.int64()),
            "min_k": pc.cast(g["k_min"], pa.int64()),
            "max_k": pc.cast(g["k_max"], pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"))


PROPS_KEY_AGG_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# urgent_revenue_bloom_join: a BLOOM-PRUNED partitioned join — the
# at-scale optimization for a selective build side. The urgent-orders
# scan folds per-batch bloom partials (fixed 2^17-bit arrays, merged by
# OR — a few KiB each, never row data); the merged bloom broadcasts via
# ray.put and prunes the lineitem side MAP-SIDE, so the shuffle moves
# only ~|matching| + fp_rate·|lineitem| rows instead of all of lineitem.
# Bloom false positives are eliminated by the real bucketed join, so the
# result is exact (oracle: the plain filtered join). Uses the same
# BloomFilter the URL-seen stage checkpoints (state/bloom.py).
# --------------------------------------------------------------------------
_BLOOM_BITS = 1 << 17


def urgent_revenue_bloom_join(sf_dir: str):
    """(o_orderpriority='1-URGENT' only) (n_items, revenue_cents) — one
    row; lineitem pruned by a broadcast bloom before the join shuffle."""
    import pyarrow.compute as pc
    import ray

    from ..state.bloom import BloomFilter

    n_buckets = _n_join_buckets()
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"],
                             filter=pc.field("o_orderpriority")
                             == "1-URGENT")

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter(n_bits=_BLOOM_BITS, k=4)
        b.add_many(df["o_orderkey"].to_numpy().astype("uint64"))
        return pd.DataFrame({"words": [b.to_bytes()]})

    parts = orders.map_batches(bloom_partial,
                               batch_format="pandas").to_pandas()
    merged = BloomFilter(n_bits=_BLOOM_BITS, k=4)
    for blob in parts["words"]:
        merged.words |= np.frombuffer(blob, dtype=np.uint64)
    bloom_ref = ray.put(merged.to_bytes())

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def prune_and_tag(df: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter.from_bytes(ray.get(bloom_ref),
                                   n_bits=_BLOOM_BITS, k=4, seed=0x5EED)
        keys = df["l_orderkey"].to_numpy().astype("uint64")
        hit = b.contains_many(keys)
        df = df[hit]
        key = df["l_orderkey"].to_numpy().astype("int64")
        price = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({
            "key": key,
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
            "side": np.zeros(len(key), dtype="int64"),
            "rev_c": price * (100 - disc),
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        key = df["o_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
            "side": np.ones(len(key), dtype="int64"),
            "rev_c": np.zeros(len(key), dtype="int64"),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev_c"]]
        o = g.loc[g["side"] == 1, "key"].drop_duplicates()
        m = l[l["key"].isin(o)]     # exact join kills bloom false positives
        return pd.DataFrame({"n": [len(m)], "r": [int(m["rev_c"].sum())]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_items": pd.Series([int(df["n"].sum())], dtype="int64"),
            "revenue_cents": pd.Series([int(df["r"].sum())], dtype="int64"),
        })

    return li.map_batches(prune_and_tag, batch_format="pandas") \
        .union(orders.map_batches(tag_orders, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_bucket, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


URGENT_REVENUE_BLOOM_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
"""


# --------------------------------------------------------------------------
# user_event_path: ordered LIMITED string aggregation — each user's first
# K events as 'type>type>...'. The unbounded-group hazard of string_agg
# is handled by per-batch partial top-k (keep the k earliest (ts,
# event_id) rows per user per batch), so no group ever materializes more
# than k rows per batch upstream of the bucket shuffle.
# --------------------------------------------------------------------------
EVENT_PATH_K = 10


def user_event_path(sf_dir: str, k: int = EVENT_PATH_K):
    """(user_id, path) with path = '>'-joined first-k event types in
    (ts, event_id) order."""
    n_buckets = _n_join_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "us": df["ts"].astype("datetime64[us]").astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"].astype("object"),
        }).sort_values(["user_id", "us", "event_id"], kind="mergesort")
        out = out.groupby("user_id", as_index=False).head(k)
        out["bucket"] = (out["user_id"].to_numpy().astype("uint64")
                         % np.uint64(n_buckets)).astype("int64")
        return out

    def path_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"],
                          kind="mergesort")
        g = g.groupby("user_id", as_index=False).head(k)
        p = g.groupby("user_id")["event_type"].agg(">".join)
        return pd.DataFrame({"user_id": p.index.astype("int64"),
                             "path": p.to_numpy()})

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(path_bucket, batch_format="pandas")


USER_EVENT_PATH_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rnk
  FROM events
)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY rnk) AS path
FROM r WHERE rnk <= {EVENT_PATH_K}
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# purchasers_no_errors: distributed SET DIFFERENCE (EXCEPT) of two derived
# key sets — users with a 'purchase' event minus users with an 'error'
# event. The reference has no set operators (SURVEY §2.7); this supplies
# the except/intersect shape: both sides pre-dedup per batch, one
# user-bucket groupby resolves membership vectorized.
# --------------------------------------------------------------------------
def purchasers_no_errors(sf_dir: str):
    """(user_id, week_day) set difference at user-week granularity:
    weeks in which the user purchased but logged no error. (At the plain
    user granularity the corpus makes the difference empty at every sf —
    every user has both — so the op would prove nothing; the week key
    keeps the set-op semantics and a non-trivial result.) week_day is
    the Monday epoch-day (the events_retention convention)."""
    import pyarrow.compute as pc
    n_buckets = _n_join_buckets()

    # ONE scan of the big table tags both sides (side = 1 for error) —
    # two per-side scans would read events twice at corpus scale
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"],
        filter=pc.field("event_type").isin(["purchase", "error"]))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        t = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "week_day": _week_day(us.to_numpy()),
            "side": (df["event_type"] == "error").to_numpy()
            .astype("int64"),
        }).drop_duplicates()
        u = t["user_id"].to_numpy().astype("int64")
        t["bucket"] = (u.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64")
        return t

    def diff_bucket(g: pd.DataFrame):
        import pyarrow as pa
        pos = g[g["side"] == 0][["user_id", "week_day"]].drop_duplicates()
        neg = g[g["side"] == 1][["user_id", "week_day"]]
        m = pos.merge(neg, on=["user_id", "week_day"], how="left",
                      indicator=True)
        keep = m[m["_merge"] == "left_only"]
        # typed Arrow so an empty difference keeps its schema
        return pa.table({
            "user_id": pa.array(keep["user_id"].to_numpy()
                                .astype("int64"), pa.int64()),
            "week_day": pa.array(keep["week_day"].to_numpy()
                                 .astype("int64"), pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("bucket").map_groups(diff_bucket, batch_format="pandas")


PURCHASERS_NO_ERRORS_SQL = """
WITH w AS (
  SELECT user_id, event_type,
         datediff('day', DATE '1970-01-01',
                  CAST(date_trunc('week', ts) AS DATE)) AS week_day
  FROM events
)
SELECT DISTINCT user_id, CAST(week_day AS BIGINT) AS week_day
FROM w WHERE event_type = 'purchase'
EXCEPT
SELECT DISTINCT user_id, CAST(week_day AS BIGINT) AS week_day
FROM w WHERE event_type = 'error'
"""


# --------------------------------------------------------------------------
# distinct_users_per_type_hll: GROUPED HyperLogLog — the sketch-groupby
# composition: one 16 KiB register array PER GROUP per batch travels
# (groups here are 5 event types; at an unbounded group count the rows
# stay ∝ groups × batches, still never the key space), merged by
# elementwise max inside a tiny groupby. Rows-only by design; the error
# bound is asserted against the EXACT dual (distinct_users_per_type) in
# tests/test_r3_ops.py.
# --------------------------------------------------------------------------
def distinct_users_per_type_hll(sf_dir: str):
    """(event_type, n_users_approx) — approximate distinct per group."""
    from ..functions import sketch

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            regs = sketch.empty_registers()
            sketch.add_values(regs, g["user_id"].to_numpy())
            rows.append((et, regs.tobytes()))
        return pd.DataFrame({"event_type": [r[0] for r in rows],
                             "regs": [r[1] for r in rows]})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = sketch.empty_registers()
        for blob in g["regs"]:
            acc = sketch.merge(acc, np.frombuffer(blob, dtype=acc.dtype))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_users_approx": pd.Series([int(round(sketch.estimate(acc)))],
                                        dtype="int64"),
        })

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type").map_groups(merge_group,
                                          batch_format="pandas")


# --------------------------------------------------------------------------
# value_quantiles_sketch: mergeable quantile summary (deterministic
# equal-weight compaction, functions/sketch.py) — the unbounded-domain
# dual of the exact histogram percentiles (value_percentiles assumes a
# bounded fixed-point domain; the summary works for any ordered values).
# Per-batch fold caps each batch's contribution at QSUMMARY_SIZE weighted
# rows; one final task merges and recompacts. Rows-only by design; the
# ≤ ~2/S rank-error bound is asserted against exact numpy quantiles in
# tests/test_r3_ops.py.
# --------------------------------------------------------------------------
QSKETCH_QS = (50, 90, 99)


def value_quantiles_sketch(sf_dir: str):
    """(q, approx_cents) for q ∈ {50, 90, 99} over events.value cents."""
    from ..functions import sketch

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        v, w = sketch.qsummary_from(cents)
        return pd.DataFrame({"v": v, "w": w})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        v, w = sketch.qsummary_compact(df["v"].to_numpy(),
                                       df["w"].to_numpy())
        return pd.DataFrame({
            "q": pd.Series(list(QSKETCH_QS), dtype="int64"),
            "approx_cents": pd.Series(
                [sketch.qsummary_quantile(v, w, q / 100.0)
                 for q in QSKETCH_QS], dtype="int64"),
        })

    return ds.map_batches(partial, batch_format="pandas") \
        .repartition(1).map_batches(finalize, batch_format="pandas")


# --------------------------------------------------------------------------
# rolling_7d_active_users: EXACT sliding-window COUNT(DISTINCT) — 7-day
# trailing active users per day. Window distinct doesn't decompose like a
# sum, so the scale shape is bounded explosion: dedup (user, day) pairs
# (shuffle ∝ distinct pairs), explode each pair to the ≤7 window-end days
# it serves, dedup (user, window_day) in a second bucket shuffle, then
# count per day. Every stage's volume is ≤ 7 × distinct (user, day) —
# never ∝ raw events. Output days are gated to days that actually appear
# (a bounded set — the time span — broadcast once).
# --------------------------------------------------------------------------
ROLLING_WINDOW_DAYS = 7


def rolling_7d_active_users(sf_dir: str):
    """(day, n_users7): day = epoch day, n_users7 = distinct users active
    in [day-6, day]."""
    import ray
    n_buckets = _n_join_buckets()
    w = ROLLING_WINDOW_DAYS
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def pair_dedup(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        day = (us // (86_400 * 10**6)).astype("int64")
        t = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "day": day}).drop_duplicates()
        u = t["user_id"].to_numpy().astype("uint64")
        d = t["day"].to_numpy().astype("uint64")
        t["bucket"] = ((u * np.uint64(0x9E3779B97F4A7C15) + d)
                       % np.uint64(n_buckets)).astype("int64")
        return t

    pairs = ds.map_batches(pair_dedup, batch_format="pandas") \
        .groupby("bucket").map_groups(
            lambda g: g[["user_id", "day"]].drop_duplicates(),
            batch_format="pandas").materialize()

    # the distinct-day set is bounded by the corpus time span — tiny;
    # reduce to one row per day DISTRIBUTED first (a groupby-count), so
    # the driver never sees the (user, day) pair set itself
    from ray.data.aggregate import Count
    days = np.unique(
        pairs.groupby("day").aggregate(Count(alias_name="c"))
        .select_columns(["day"]).to_pandas()["day"].to_numpy())
    days_ref = ray.put(days)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        u = np.repeat(df["user_id"].to_numpy().astype("int64"), w)
        wd = (np.repeat(df["day"].to_numpy().astype("int64"), w)
              + np.tile(np.arange(w, dtype="int64"), n))
        keep = np.isin(wd, ray.get(days_ref))  # gate to days that exist
        u, wd = u[keep], wd[keep]
        out = pd.DataFrame({"user_id": u, "wday": wd}).drop_duplicates()
        uu = out["user_id"].to_numpy().astype("uint64")
        dd = out["wday"].to_numpy().astype("uint64")
        out["bucket"] = ((uu * np.uint64(0x9E3779B97F4A7C15) + dd)
                         % np.uint64(n_buckets)).astype("int64")
        return out

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.drop_duplicates(["user_id", "wday"]) \
            .groupby("wday", as_index=False).size()
        return pd.DataFrame({"day": c["wday"].astype("int64"),
                             "n_users7": c["size"].astype("int64")})

    from ray.data.aggregate import Sum
    return pairs.map_batches(explode, batch_format="pandas") \
        .groupby("bucket").map_groups(count_bucket,
                                      batch_format="pandas") \
        .groupby("day").aggregate(Sum("n_users7", alias_name="n_users7"))


ROLLING_7D_ACTIVE_SQL = f"""
WITH du AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events
), days AS (SELECT DISTINCT day FROM du)
SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users7
FROM days d
JOIN du u ON u.day BETWEEN d.day - {ROLLING_WINDOW_DAYS - 1} AND d.day
GROUP BY d.day
"""


# --------------------------------------------------------------------------
# events_outliers: per-group anomaly gate (value > mean + 3σ of its
# event_type) — the two-pass broadcast-scalar-per-group filter shape:
# pass 1 folds exact int64 moments per type (same partials as
# event_type_value_stats, rows ∝ groups), the per-type thresholds (a few
# doubles) broadcast via ray.put, pass 2 filters MAP-SIDE — no shuffle
# touches the row set at all. Every float op (operand rounding, one
# division, one sqrt, one multiply-add chain) is mirrored verbatim in
# the oracle SQL, and IEEE /, sqrt, * and + are correctly rounded, so
# the comparison is bit-deterministic on both sides.
# --------------------------------------------------------------------------
def events_outliers(sf_dir: str):
    """(event_id, user_id, event_type, cents) of rows whose cents exceed
    their type's mean + 3·stddev_pop."""
    import ray
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        t = pd.DataFrame({"event_type": df["event_type"],
                          "c": cents, "c2": cents * cents})
        g = t.groupby("event_type", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), s2=("c2", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    m = ds.map_batches(moments, batch_format="pandas").to_pandas() \
        .groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))
    n = m["n"].to_numpy().astype("float64")
    s = m["s"].to_numpy().astype("float64")
    s2 = m["s2"].to_numpy().astype("float64")
    # clamp at 0 BEFORE the sqrt: fl(s*s)/n can round above s2 for a
    # zero-variance group past 2^53, and np.sqrt(neg) is NaN while the
    # oracle's sqrt() ERRORS — greatest(0, ·) mirrored in the SQL keeps
    # both sides total and identical
    thresh = s / n + 3.0 * np.sqrt(np.maximum((s2 - s * s / n) / n, 0.0))
    th_ref = ray.put(dict(zip(m["event_type"], thresh)))

    def gate(df: pd.DataFrame):
        import pyarrow as pa
        th = ray.get(th_ref)
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        lim = df["event_type"].map(th).to_numpy().astype("float64")
        keep = cents.astype("float64") > lim
        out = df[keep]
        # typed Arrow output: an all-empty result still carries its
        # schema through to_pandas (empty pandas blocks would not)
        return pa.table({
            "event_id": pa.array(out["event_id"].to_numpy()
                                 .astype("int64"), pa.int64()),
            "user_id": pa.array(out["user_id"].to_numpy()
                                .astype("int64"), pa.int64()),
            "event_type": pa.array(out["event_type"], pa.string()),
            "cents": pa.array(cents[keep], pa.int64()),
        })

    return ds.map_batches(gate, batch_format="pandas")


EVENTS_OUTLIERS_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM e GROUP BY event_type
), t AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         + 3.0 * sqrt(greatest((CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0))
           AS thresh
  FROM m
)
SELECT e.event_id, e.user_id, e.event_type, e.cents
FROM e JOIN t USING (event_type)
WHERE CAST(e.cents AS DOUBLE) > t.thresh
"""


# --------------------------------------------------------------------------
# events_time_rollup: the streaming-metrics time hierarchy — counts and
# exact cents sums at HOUR, DAY, and WEEK granularity from ONE scan.
# Per-batch partials key on the hour bucket (the finest level); the hour
# table is bounded by the corpus time span, so day and week levels are
# re-aggregated FROM IT (the orders_rollup pattern on a time hierarchy)
# — the raw events shuffle once, coarser levels cost ~nothing.
# --------------------------------------------------------------------------
def events_time_rollup(sf_dir: str):
    """(level, bucket, n, sum_cents) with level ∈ {'hour','day','week'};
    bucket = epoch hours / epoch days / Monday epoch-day respectively."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.rint(df["value"].to_numpy() * 100).astype("int64")
        hour = us // (3_600 * 10**6)
        g = pd.DataFrame({"hour": hour, "cents": cents}) \
            .groupby("hour", as_index=False).agg(n=("cents", "size"),
                                                 sum_cents=("cents", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    from ray.data.aggregate import Sum
    hours = ds.map_batches(partial, batch_format="pandas") \
        .groupby("hour").aggregate(Sum("n", alias_name="n"),
                                   Sum("sum_cents",
                                       alias_name="sum_cents"))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        h = df.copy()
        day = h["hour"].to_numpy() // 24
        week = day - (day + 3) % 7        # Monday truncation (_week_day)
        out = [pd.DataFrame({"level": "hour", "bucket": h["hour"],
                             "n": h["n"], "sum_cents": h["sum_cents"]})]
        for name, key in (("day", day), ("week", week)):
            g = pd.DataFrame({"bucket": key, "n": h["n"],
                              "sum_cents": h["sum_cents"]}) \
                .groupby("bucket", as_index=False).sum()
            g.insert(0, "level", name)
            out.append(g)
        r = pd.concat(out, ignore_index=True)
        r["bucket"] = r["bucket"].astype("int64")
        r["n"] = r["n"].astype("int64")
        r["sum_cents"] = r["sum_cents"].astype("int64")
        return r

    # the hour table is bounded by the time span — one-task rollup
    return hours.repartition(1).map_batches(rollup, batch_format="pandas")


EVENTS_TIME_ROLLUP_SQL = """
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), h AS (
  SELECT hour, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM e GROUP BY hour
)
SELECT 'hour' AS level, CAST(hour AS BIGINT) AS bucket, n, sum_cents
FROM h
UNION ALL
SELECT 'day', CAST(hour // 24 AS BIGINT),
       CAST(sum(n) AS BIGINT), CAST(sum(sum_cents) AS BIGINT)
FROM h GROUP BY hour // 24
UNION ALL
SELECT 'week', CAST(hour // 24 - (hour // 24 + 3) % 7 AS BIGINT),
       CAST(sum(n) AS BIGINT), CAST(sum(sum_cents) AS BIGINT)
FROM h GROUP BY hour // 24 - (hour // 24 + 3) % 7
"""


def purchasers_with_errors(sf_dir: str):
    """Distributed SET INTERSECTION — (user_id, week_day) pairs present
    on BOTH derived sides (a purchase AND an error in the same week);
    completes the set-op family next to purchasers_no_errors (EXCEPT).
    Same one-scan/tag/bucket shape; the per-bucket resolve keeps rows
    whose (user, week) appears on both sides."""
    import pyarrow.compute as pc
    n_buckets = _n_join_buckets()

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"],
        filter=pc.field("event_type").isin(["purchase", "error"]))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        t = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "week_day": _week_day(us.to_numpy()),
            "side": (df["event_type"] == "error").to_numpy()
            .astype("int64"),
        }).drop_duplicates()
        u = t["user_id"].to_numpy().astype("uint64")
        t["bucket"] = (u.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64")
        return t

    def inter_bucket(g: pd.DataFrame):
        import pyarrow as pa
        pos = g[g["side"] == 0][["user_id", "week_day"]].drop_duplicates()
        neg = g[g["side"] == 1][["user_id", "week_day"]].drop_duplicates()
        m = pos.merge(neg, on=["user_id", "week_day"])
        return pa.table({
            "user_id": pa.array(m["user_id"].to_numpy()
                                .astype("int64"), pa.int64()),
            "week_day": pa.array(m["week_day"].to_numpy()
                                 .astype("int64"), pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("bucket").map_groups(inter_bucket, batch_format="pandas")


PURCHASERS_WITH_ERRORS_SQL = """
WITH w AS (
  SELECT user_id, event_type,
         datediff('day', DATE '1970-01-01',
                  CAST(date_trunc('week', ts) AS DATE)) AS week_day
  FROM events
)
SELECT DISTINCT user_id, CAST(week_day AS BIGINT) AS week_day
FROM w WHERE event_type = 'purchase'
INTERSECT
SELECT DISTINCT user_id, CAST(week_day AS BIGINT) AS week_day
FROM w WHERE event_type = 'error'
"""


# --------------------------------------------------------------------------
# forecast_revenue (TPC-H Q6 shape): the pure filtered-aggregate scan —
# the no-shuffle extreme of the family. Every predicate (ship-date year,
# discount band, quantity cap) pushes INTO the parquet scan, each batch
# folds to ONE int64 partial (cents x discount-pct-points for exactness),
# and a single tiny combine crosses the driver. At 100 TB this is a
# pruned scan + a scalar — no shuffle at all.
# --------------------------------------------------------------------------
def forecast_revenue(sf_dir: str):
    """(revenue_micro, revenue) — sum(extendedprice * discount) over
    1996 shipments with discount in [0.05, 0.07] and quantity < 24.
    revenue_micro is the exact int64 sum of cents x pct-points; revenue
    is its single IEEE division by 1e4 (operand rounded to double first,
    mirroring the oracle)."""
    import pyarrow.compute as pc

    f = ((pc.field("l_shipdate") >= pc.scalar(np.datetime64("1996-01-01", "us")))
         & (pc.field("l_shipdate") < pc.scalar(np.datetime64("1997-01-01", "us")))
         & (pc.field("l_discount") >= 0.05) & (pc.field("l_discount") <= 0.07)
         & (pc.field("l_quantity") < 24))
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount"],
                         filter=f)

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype("int64")
        pct = np.rint(t["l_discount"].to_numpy() * 100).astype("int64")
        return pa.table({"s": pa.array([int((cents * pct).sum())],
                                       pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["s"].sum())
        return pd.DataFrame({
            "revenue_micro": pd.Series([total], dtype="int64"),
            "revenue": [float(total) / 1e4],
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(combine, batch_format="pandas")


FORECAST_REVENUE_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_micro,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / 1e4 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# small_qty_revenue (TPC-H Q17 shape): the correlated-average join — for
# one brand's parts, revenue of lineitems whose quantity sits below 20%
# of that part's own average. Two pruned passes over lineitem:
#
#   pass 1: brand partkeys broadcast once (ray.put; the part side is the
#     small side by construction) -> map-side semi-join -> per-batch
#     (partkey, qty-sum, count) partials -> tiny groupby -> per-part
#     thresholds, broadcast back;
#   pass 2: same pruned scan, keep rows under their part's threshold,
#     fold to ONE int64 cents partial per batch.
#
# No lineitem-sized shuffle anywhere: the only groupby is |brand parts|
# rows wide.
# --------------------------------------------------------------------------
Q17_BRAND = "Brand#1"


def small_qty_revenue(sf_dir: str, brand: str = Q17_BRAND):
    """(total_cents, avg_yearly) for lineitems of ``brand`` parts with
    quantity < 0.2 x the part's average quantity. avg_yearly mirrors
    TPC-H's sum/7.0 (one IEEE division, operand rounded to double
    first)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand"],
                       filters=[("p_brand", "=", brand)])["p_partkey"] \
        .to_numpy().astype("int64")
    pk_ref = ray.put(set(pk.tolist()))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"],
                         filter=pc.is_in(pc.field("l_partkey"),
                                         pa.array(pk, pa.int64())))

    def qty_partial(t: pa.Table) -> pa.Table:
        key = t["l_partkey"].to_numpy()
        q = np.rint(t["l_quantity"].to_numpy()).astype("int64")
        import pandas as _pd
        g = _pd.DataFrame({"k": key, "q": q}).groupby("k")["q"] \
            .agg(["sum", "count"]).reset_index()
        return pa.table({
            "l_partkey": pa.array(g["k"].astype("int64")),
            "sq": pa.array(g["sum"].astype("int64")),
            "n": pa.array(g["count"].astype("int64")),
        })

    from ray.data.aggregate import Sum
    per_part = li.map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("sq", alias_name="sq"),
                                        Sum("n", alias_name="n")) \
        .to_pandas()  # bounded: one row per brand part
    thresh = {int(r["l_partkey"]): 0.2 * (float(r["sq"]) / float(r["n"]))
              for _, r in per_part.iterrows()}
    th_ref = ray.put(thresh)

    def rev_partial(t: pa.Table) -> pa.Table:
        th = ray.get(th_ref)
        key = t["l_partkey"].to_numpy()
        q = np.rint(t["l_quantity"].to_numpy()).astype("int64")
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100) \
            .astype("int64")
        tvals = np.array([th.get(int(k), -1.0) for k in key])
        keep = q < tvals
        return pa.table({"s": pa.array([int(cents[keep].sum())],
                                       pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["s"].sum())
        return pd.DataFrame({
            "total_cents": pd.Series([total], dtype="int64"),
            "avg_yearly": [float(total) / 700.0],
        })

    return li.map_batches(rev_partial, batch_format="pyarrow") \
        .repartition(1).map_batches(combine, batch_format="pandas")


SMALL_QTY_REVENUE_SQL = f"""
WITH pl AS (
  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
), th AS (
  SELECT l_partkey,
         0.2 * (CAST(sum(q) AS DOUBLE) / count(*)) AS t
  FROM pl GROUP BY 1
)
SELECT coalesce(CAST(sum(cents) AS BIGINT), 0) AS total_cents,
       coalesce(CAST(sum(cents) AS DOUBLE), 0.0) / 700.0 AS avg_yearly
FROM pl JOIN th USING (l_partkey)
WHERE q < t
"""


# --------------------------------------------------------------------------
# orders_cube: CUBE(status, priority) — orders_rollup's full-lattice dual
# (adds the per-priority marginals ROLLUP omits). Same one-scan shape:
# finest-grain Arrow partials per batch, every grouping set derived by
# re-aggregating the tiny partial table in the single combine task.
# --------------------------------------------------------------------------
def orders_cube(sf_dir: str):
    """(status, priority, n, total_cents) under CUBE(status, priority)
    with 'ALL' as the aggregated marker."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(t):
        import pyarrow.compute as pc
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = pa.table({"status": t["o_orderstatus"],
                      "priority": t["o_orderpriority"],
                      "total_cents": cents}) \
            .group_by(["status", "priority"]) \
            .aggregate([("total_cents", "sum"), ([], "count_all")])
        return pa.table({"status": g["status"], "priority": g["priority"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "total_cents": g["total_cents_sum"]})

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        base = df.groupby(["status", "priority"], as_index=False).agg(
            n=("n", "sum"), total_cents=("total_cents", "sum"))
        by_s = base.groupby("status", as_index=False).agg(
            n=("n", "sum"), total_cents=("total_cents", "sum"))
        by_s["priority"] = "ALL"
        by_p = base.groupby("priority", as_index=False).agg(
            n=("n", "sum"), total_cents=("total_cents", "sum"))
        by_p["status"] = "ALL"
        grand = pd.DataFrame({
            "status": ["ALL"], "priority": ["ALL"],
            "n": [base["n"].sum()],
            "total_cents": [base["total_cents"].sum()],
        })
        out = pd.concat([base, by_s, by_p, grand], ignore_index=True)
        return out[["status", "priority", "n", "total_cents"]].astype(
            {"n": "int64", "total_cents": "int64"})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(cube, batch_format="pandas")


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# nation_order_revenue: customer ⋈ orders via Ray Data's NATIVE hash
# join (Dataset.join, the aggregator-based partitioned hash join added
# in Ray 2.47+) — the engine-native path for the case the house
# broadcast/bucketed patterns don't cover: BOTH sides corpus-sized and
# arbitrary projected columns. num_partitions scales with cluster CPUs
# like _n_join_buckets; per-batch int partials BEFORE the final groupby
# keep the post-join shuffle nation-sized.
# --------------------------------------------------------------------------
def nation_order_revenue(sf_dir: str):
    """(c_nationkey, n_orders, total_cents) — revenue by customer
    nation over the full customer ⋈ orders join."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def prep_orders(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "c_custkey": t["o_custkey"].cast(pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                                  100.0)), pa.int64()),
        })

    joined = cust.join(orders.map_batches(prep_orders,
                                          batch_format="pyarrow"),
                       "inner", num_partitions=_n_join_buckets(),
                       on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = pa.table({"c_nationkey": t["c_nationkey"].cast(pa.int64()),
                      "cents": t["cents"]}) \
            .group_by("c_nationkey") \
            .aggregate([("cents", "sum"), ([], "count_all")])
        return pa.table({
            "c_nationkey": g["c_nationkey"],
            "n_orders": pc.cast(g["count_all"], pa.int64()),
            "total_cents": pc.cast(g["cents_sum"], pa.int64()),
        })

    from ray.data.aggregate import Sum
    return joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_nationkey") \
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents"))


NATION_ORDER_REVENUE_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# customer_urgent_counts: LEFT OUTER join semantics through the native
# Dataset.join — customers with no 1-URGENT order must survive with a
# zero count (the NULL-fill path an inner join can't exercise; the
# priority filter guarantees non-matching customers exist at every sf).
# --------------------------------------------------------------------------
def customer_urgent_counts(sf_dir: str):
    """(c_custkey, n_urgent) for EVERY customer — 0 when none."""
    import pyarrow.compute as pc

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    urgent = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"],
                             filter=pc.field("o_orderpriority")
                             == "1-URGENT")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"].cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype="int64")),
        })

    joined = cust.join(urgent.map_batches(prep, batch_format="pyarrow"),
                       "left_outer", num_partitions=_n_join_buckets(),
                       on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        one = pc2.fill_null(t["one"], 0)  # unmatched customers -> 0
        g = pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                      "one": one}).group_by("c_custkey") \
            .aggregate([("one", "sum")])
        return pa.table({"c_custkey": g["c_custkey"],
                         "n_urgent": pc2.cast(g["one_sum"], pa.int64())})

    from ray.data.aggregate import Sum
    return joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("n_urgent",
                                            alias_name="n_urgent"))


CUSTOMER_URGENT_COUNTS_SQL = """
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(count(o.o_custkey) AS BIGINT) AS n_urgent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
GROUP BY c.c_custkey
"""


# --------------------------------------------------------------------------
# Interval (band) self-join: per order, the same customer's OTHER orders
# dated within ±30 days. The missing join shape between the equi joins
# (nation_order_revenue) and the as-of join (events_asof_join): an
# equi-key + RANGE predicate, the backbone of time-windowed feature
# extraction ("recent activity at decision time") at training-data scale.
# --------------------------------------------------------------------------
BAND_DAYS = 30
_DAY_US = 86_400_000_000


def orders_band_join(sf_dir: str):
    """Distributed shape: one pruned read → hash-bucket by o_custkey
    (the equi key, so a customer never spans buckets) → per-bucket
    vectorized band probe: sort once by a composite (custkey, day) key
    chosen so that a ±30-day window never crosses a customer boundary,
    then two `np.searchsorted` calls + a prefix sum answer count and
    revenue for EVERY order in the bucket at once — no per-row loop, no
    pairwise blowup (the window sum is O(n log n) regardless of how many
    pairs the equivalent SQL join materializes).

    Output: (o_orderkey, o_custkey, n_nearby, nearby_revenue_c) with the
    revenue in exact int64 cents (float order-of-accumulation never
    enters), one row per order, zero-neighbor orders included.
    """
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    n_buckets = _n_join_buckets()

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), _DAY_US)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        cust = t["o_custkey"]
        bucket = pa.array(
            (cust.to_numpy().astype("uint64") % np.uint64(n_buckets))
            .astype("int64"))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": cust,
                         "day": day, "cents": cents, "bucket": bucket})

    def band(g: pd.DataFrame) -> pd.DataFrame:
        cust = g["o_custkey"].to_numpy().astype("int64")
        day = g["day"].to_numpy().astype("int64")
        # composite key: days-since-epoch is ~1e4 << 1e7, so customer
        # segments are disjoint by construction and one sorted array
        # serves every customer's window probe
        key = cust * 10_000_000 + day
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        cents_s = g["cents"].to_numpy().astype("int64")[order]
        csum = np.concatenate(([0], np.cumsum(cents_s)))
        lo = np.searchsorted(key_s, key - BAND_DAYS, side="left")
        hi = np.searchsorted(key_s, key + BAND_DAYS, side="right")
        own = g["cents"].to_numpy().astype("int64")
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "o_custkey": cust,
            "n_nearby": (hi - lo - 1).astype("int64"),
            "nearby_revenue_c": csum[hi] - csum[lo] - own,
        })

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("bucket").map_groups(band, batch_format="pandas")


ORDERS_BAND_JOIN_SQL = f"""
SELECT a.o_orderkey,
       a.o_custkey,
       count(b.o_orderkey) AS n_nearby,
       CAST(coalesce(sum(CAST(round(b.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS nearby_revenue_c
FROM orders a
LEFT JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderkey <> a.o_orderkey
 AND abs(epoch_us(a.o_orderdate) // {_DAY_US}
         - epoch_us(b.o_orderdate) // {_DAY_US}) <= {BAND_DAYS}
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# urgent_low_customers: FULL OUTER join semantics through the native
# Dataset.join — the last join mode not yet exercised (inner:
# nation_order_revenue, left_outer: customer_urgent_counts, as-of:
# events_asof_join, band: orders_band_join). Two disjoint priority
# slices of orders guarantee unmatched rows on BOTH sides at every sf:
# customers with urgent orders but no low ones survive with n_low=0 and
# vice versa.
# --------------------------------------------------------------------------
def urgent_low_customers(sf_dir: str):
    """(custkey, n_urgent, n_low) for every customer having at least one
    1-URGENT or 5-LOW order; unmatched side filled with 0."""
    import pyarrow.compute as pc

    def side(priority: str, key: str, cnt: str):
        ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"],
                             filter=pc.field("o_orderpriority")
                             == priority)

        def partial(t: pa.Table) -> pa.Table:
            g = pa.table({key: t["o_custkey"].cast(pa.int64())}) \
                .group_by(key).aggregate([([], "count_all")])
            return pa.table({key: g[key],
                             cnt: g["count_all"].cast(pa.int64())})

        from ray.data.aggregate import Sum
        return ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(key).aggregate(Sum(cnt, alias_name=cnt))

    joined = side("1-URGENT", "uk", "n_urgent").join(
        side("5-LOW", "lk", "n_low"),
        "full_outer", num_partitions=_n_join_buckets(),
        on=("uk",), right_on=("lk",))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        # Dataset.join coalesces the equi key into the LEFT name: right-
        # only rows still carry their key in "uk" (only the value columns
        # of the missing side are null)
        return pa.table({
            "custkey": t["uk"].cast(pa.int64()),
            "n_urgent": pc2.fill_null(t["n_urgent"], 0).cast(pa.int64()),
            "n_low": pc2.fill_null(t["n_low"], 0).cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


URGENT_LOW_CUSTOMERS_SQL = """
SELECT CAST(COALESCE(u.k, l.k) AS BIGINT) AS custkey,
       CAST(COALESCE(u.n, 0) AS BIGINT) AS n_urgent,
       CAST(COALESCE(l.n, 0) AS BIGINT) AS n_low
FROM (SELECT o_custkey k, count(*) n FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u
FULL JOIN (SELECT o_custkey k, count(*) n FROM orders
           WHERE o_orderpriority = '5-LOW' GROUP BY 1) l
  ON u.k = l.k
"""


# --------------------------------------------------------------------------
# part_bulk_orders: RIGHT OUTER join through the native Dataset.join —
# completes the join-mode matrix (inner / left_outer / full_outer /
# as-of / band elsewhere). The probe side is filtered to max-bulk line
# items (quantity >= 49), so a real fraction of parts has no match at
# every sf and must survive via the right side's null-fill.
# --------------------------------------------------------------------------
BULK_QTY = 49


def part_bulk_orders(sf_dir: str):
    """(p_partkey, n_bulk, bulk_qty) for EVERY part — zeros when the
    part was never ordered in bulk."""
    import pyarrow.compute as pc

    bulk = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity"],
                           filter=pc.field("l_quantity") >= BULK_QTY)
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"])

    def prep(t: pa.Table) -> pa.Table:
        # pre-aggregate per batch: the join then moves one row per
        # (batch, partkey), not one per lineitem
        g = pa.table({
            "l_partkey": t["l_partkey"].cast(pa.int64()),
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
        }).group_by("l_partkey").aggregate([("qty", "sum"),
                                            ([], "count_all")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "n_bulk": g["count_all"].cast(pa.int64()),
                         "bulk_qty": g["qty_sum"].cast(pa.int64())})

    joined = bulk.map_batches(prep, batch_format="pyarrow").join(
        parts.map_batches(
            lambda t: pa.table({"p_partkey": t["p_partkey"]
                                .cast(pa.int64())}),
            batch_format="pyarrow"),
        "right_outer", num_partitions=_n_join_buckets(),
        on=("l_partkey",), right_on=("p_partkey",))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        # right-outer coalesces the key under the LEFT name (see
        # urgent_low_customers); unmatched parts carry null partials
        key = t["l_partkey"] if "l_partkey" in t.schema.names \
            else t["p_partkey"]
        return pa.table({
            "p_partkey": key.cast(pa.int64()),
            "n_bulk": pc2.fill_null(t["n_bulk"], 0).cast(pa.int64()),
            "bulk_qty": pc2.fill_null(t["bulk_qty"], 0).cast(pa.int64()),
        })

    from ray.data.aggregate import Sum
    return joined.map_batches(finish, batch_format="pyarrow") \
        .groupby("p_partkey") \
        .aggregate(Sum("n_bulk", alias_name="n_bulk"),
                   Sum("bulk_qty", alias_name="bulk_qty"))


PART_BULK_ORDERS_SQL = f"""
SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey,
       CAST(count(l.l_partkey) AS BIGINT) AS n_bulk,
       CAST(coalesce(sum(CAST(round(l.l_quantity) AS BIGINT)), 0)
            AS BIGINT) AS bulk_qty
FROM lineitem l RIGHT JOIN part p
  ON l.l_partkey = p.p_partkey AND l.l_quantity >= {BULK_QTY}
GROUP BY p.p_partkey
"""


# --------------------------------------------------------------------------
# customer_order_distribution — TPC-H Q13 shape: the "distribution of a
# distribution". Stage 1 is the LEFT OUTER customer⋈orders count (zero-
# order customers included); stage 2 re-aggregates the per-customer
# counts into (c_count, custdist). Stage 2's shuffle is ∝ the DISTINCT
# count domain (a few dozen values), not customers — the second groupby
# costs nothing at 100 TB because the partial histogram is taken inside
# map_batches first.
# --------------------------------------------------------------------------
def customer_order_distribution(sf_dir: str):
    """(c_count, custdist): how many customers placed exactly c_count
    orders, including the zero-order long tail Q13 exists to surface."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"].cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype="int64")),
        })

    joined = cust.join(orders.map_batches(prep, batch_format="pyarrow"),
                       "left_outer", num_partitions=_n_join_buckets(),
                       on=("c_custkey",))

    def per_cust_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        one = pc.fill_null(t["one"], 0)
        g = pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                      "one": one}).group_by("c_custkey") \
            .aggregate([("one", "sum")])
        return pa.table({"c_custkey": g["c_custkey"],
                         "c_count": g["one_sum"].cast(pa.int64())})

    from ray.data.aggregate import Sum
    per_cust = joined.map_batches(per_cust_partial,
                                  batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("c_count",
                                            alias_name="c_count"))

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"c_count": t["c_count"].cast(pa.int64())}) \
            .group_by("c_count").aggregate([([], "count_all")])
        return pa.table({"c_count": g["c_count"],
                         "custdist": g["count_all"].cast(pa.int64())})

    return per_cust.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Sum("custdist",
                                          alias_name="custdist"))


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# waiting_suppliers — TPC-H Q21 shape: EXISTS + NOT-EXISTS self-join on
# the same fact table. The original credits a supplier for orders where
# it alone was late but others participated; this corpus has no
# commit/receipt dates, so the returned flag plays the "failure" role
# with identical join structure: per order, n_supp > 1 (EXISTS another
# supplier) AND exactly ONE supplier shipped returned items (NOT EXISTS
# another failing supplier).
#
# Distributed shape: one pruned lineitem scan → hash-bucket by
# l_orderkey (the correlation key, so an order never spans buckets) →
# per-bucket VECTORIZED per-order aggregates (pandas groupby: supplier
# nunique, returned-supplier nunique/min — no per-order Python task) →
# tiny (suppkey, n) partials → one bounded groupby. Supplier names are
# broadcast-joined (supplier ≪ lineitem, ray.put once).
# --------------------------------------------------------------------------
def waiting_suppliers(sf_dir: str):
    """(s_suppkey, s_name, numwait): per supplier, the number of
    multi-supplier orders where it was the SOLE supplier with returned
    items — Q21's exists/not-exists correlation re-expressed."""
    import ray

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    n_buckets = _n_join_buckets()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    names_ref = ray.put(dict(zip(sup["s_suppkey"].to_pylist(),
                                 sup["s_name"].to_pylist())))

    def prep(t: pa.Table) -> pa.Table:
        okey = t["l_orderkey"].to_numpy()
        bucket = pa.array((okey.astype("uint64")
                           % np.uint64(n_buckets)).astype("int64"))
        return t.append_column("bucket", bucket)

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        n_supp = g.groupby("l_orderkey")["l_suppkey"].nunique()
        ret = g[g["l_returnflag"] == "R"]
        if len(ret) == 0:
            return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                                 "numwait": pd.Series([], dtype="int64")})
        r = ret.groupby("l_orderkey")["l_suppkey"].agg(["nunique", "min"])
        sole = r[(r["nunique"] == 1)
                 & (n_supp.reindex(r.index) > 1)]["min"]
        out = sole.value_counts()
        return pd.DataFrame({"s_suppkey": out.index.astype("int64"),
                             "numwait": out.to_numpy().astype("int64")})

    from ray.data.aggregate import Sum
    counts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_order, batch_format="pandas") \
        .groupby("s_suppkey").aggregate(Sum("numwait",
                                            alias_name="numwait"))

    def attach_name(t: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        return pa.table({
            "s_suppkey": t["s_suppkey"].cast(pa.int64()),
            "s_name": pa.array([names.get(k, "")
                                for k in t["s_suppkey"].to_pylist()],
                               pa.string()),
            "numwait": t["numwait"].cast(pa.int64()),
        })

    return counts.map_batches(attach_name, batch_format="pyarrow")


WAITING_SUPPLIERS_SQL = """
WITH per AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R'
                             THEN l_suppkey END) AS n_ret,
         min(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS ret_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(p.ret_supp AS BIGINT) AS s_suppkey,
       s.s_name AS s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM per p JOIN supplier s ON s.s_suppkey = p.ret_supp
WHERE p.n_supp > 1 AND p.n_ret = 1
GROUP BY p.ret_supp, s.s_name
"""


# --------------------------------------------------------------------------
# cheapest_supplier_per_part — TPC-H Q2 shape: correlated groupwise-MIN
# with a join back to recover the achieving row (Q2's partsupp min-cost
# subquery; this corpus has no partsupp, so lineitem's (part, supplier,
# price) triple plays its role). Deterministic tie-break: the smallest
# suppkey among price-achievers, mirrored exactly in SQL.
#
# One lineitem scan; per-batch partial keeps ONE row per (partkey ×
# batch): (min_cents, best supp at that cents). The groupby then
# resolves the global min per part from partials — no second pass over
# the fact table, no join back at all (the partial carries the argmin).
# --------------------------------------------------------------------------
def cheapest_supplier_per_part(sf_dir: str):
    """(p_partkey, min_price_cents, s_suppkey, s_name): per part, the
    lowest lineitem price and the smallest supplier key achieving it."""
    import ray

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    names_ref = ray.put(dict(zip(sup["s_suppkey"].to_pylist(),
                                 sup["s_name"].to_pylist())))

    n_buckets = _n_join_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["l_extendedprice"].to_numpy()
                         * 100.0).astype("int64")
        t = pd.DataFrame({"p": df["l_partkey"].to_numpy().astype("int64"),
                          "c": cents,
                          "s": df["l_suppkey"].to_numpy().astype("int64")})
        # argmin with (cents, suppkey) lexicographic tie-break: sort once,
        # keep the first row per part
        t = t.sort_values(["p", "c", "s"], kind="stable") \
             .drop_duplicates("p", keep="first")
        return pd.DataFrame({
            "p_partkey": t["p"].to_numpy(),
            "min_price_cents": t["c"].to_numpy(),
            "s_suppkey": t["s"].to_numpy(),
            # bucket by part hash: one Ray group per ~(parts/B), NOT one
            # per part — per-key map_groups is one Python call per key
            "bucket": (t["p"].to_numpy().astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_partkey", "min_price_cents", "s_suppkey"],
                          kind="stable").drop_duplicates("p_partkey",
                                                         keep="first")
        return g[["p_partkey", "min_price_cents", "s_suppkey"]]

    best = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").map_groups(resolve, batch_format="pandas")

    def attach_name(t: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        return pa.table({
            "p_partkey": t["p_partkey"].cast(pa.int64()),
            "min_price_cents": t["min_price_cents"].cast(pa.int64()),
            "s_suppkey": t["s_suppkey"].cast(pa.int64()),
            "s_name": pa.array([names.get(k, "")
                                for k in t["s_suppkey"].to_pylist()],
                               pa.string()),
        })

    return best.map_batches(attach_name, batch_format="pyarrow")


CHEAPEST_SUPPLIER_SQL = """
WITH c AS (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
), m AS (
  SELECT l_partkey, min(cents) AS min_cents FROM c GROUP BY l_partkey
), w AS (
  SELECT c.l_partkey, m.min_cents, min(c.l_suppkey) AS supp
  FROM c JOIN m ON c.l_partkey = m.l_partkey AND c.cents = m.min_cents
  GROUP BY c.l_partkey, m.min_cents
)
SELECT CAST(w.l_partkey AS BIGINT) AS p_partkey,
       CAST(w.min_cents AS BIGINT) AS min_price_cents,
       CAST(w.supp AS BIGINT) AS s_suppkey,
       s.s_name AS s_name
FROM w JOIN supplier s ON s.s_suppkey = w.supp
"""


# --------------------------------------------------------------------------
# trade_volume (TPC-H Q7 shape): the dual-role-dimension join — nation
# joined once through the supplier and once through the customer, with
# direction-sensitive grouping by (supp_nation, cust_nation, year).
# Widened from Q7's single nation pair to a region pair (ASIA<->EUROPE,
# both directions) so every sf has rows on both legs (the sf0.001
# supplier table holds 10 suppliers over 25 nations).
# --------------------------------------------------------------------------
Q7_REGIONS = ("ASIA", "EUROPE")
Q7_DATE_LO = "1995-01-01"
Q7_DATE_HI = "1997-01-01"


def trade_volume(sf_dir: str):
    """(supp_nation, cust_nation, l_year, revenue_cbp, n) — cross-region
    shipments between ASIA and EUROPE, both directions, by ship year.

    Physical plan: nation/region (≤25 rows) and the supplier→nationkey
    probe array broadcast once via ray.put (suppliers are 1000× smaller
    than lineitem at every TPC-H SF — Q5's justification); shuffle 1 is
    orders ⋈ customer on custkey (customer pre-filtered map-side to the
    two regions), shuffle 2 joins date-pruned lineitem (supplier-region
    gate applied map-side via the broadcast probe) on orderkey, with
    per-(supp_nat, cust_nat, year) integer partials inside each bucket
    and a 50-or-so-row combine. Both shuffles ∝ cluster CPUs.
    """
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    n_buckets = _n_join_buckets()

    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    regiont = _pq.read_table(f"{sf_dir}/region.parquet")
    rname = {int(rk): str(rn) for rk, rn in zip(
        regiont["r_regionkey"].to_pylist(), regiont["r_name"].to_pylist())}
    nat_name: dict[int, str] = {}
    nat_region: dict[int, str] = {}
    for nk, nm, rk in zip(nation["n_nationkey"].to_pylist(),
                          nation["n_name"].to_pylist(),
                          nation["n_regionkey"].to_pylist()):
        if rname.get(int(rk)) in Q7_REGIONS:
            nat_name[int(nk)] = str(nm)
            nat_region[int(nk)] = rname[int(rk)]

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    skey = sup["s_suppkey"].to_numpy()
    snat = sup["s_nationkey"].to_numpy()
    smap = np.full(int(skey.max()) + 1, -1, dtype=np.int32)
    in_r = np.isin(snat, np.array(list(nat_name), dtype=snat.dtype))
    smap[skey[in_r]] = snat[in_r]
    smap_ref = ray.put(smap)
    nat_keys_ref = ray.put(set(nat_name))
    # nation -> 0/1 region side for the cross-direction gate
    side_of = {nk: Q7_REGIONS.index(r) for nk, r in nat_region.items()}
    side_ref = ray.put(np.array(
        [side_of.get(i, -1) for i in range(26)], dtype=np.int32))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    customer = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_custkey"].astype("int64"),
            "bucket": (df["o_custkey"] % n_buckets).astype("int64"),
            "side": 0,
            "okey": df["o_orderkey"].astype("int64"),
            "nat": np.int32(-1),
        })

    def tag_customer(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_nationkey"].isin(ray.get(nat_keys_ref))]
        return pd.DataFrame({
            "key": d["c_custkey"].astype("int64"),
            "bucket": (d["c_custkey"] % n_buckets).astype("int64"),
            "side": 1,
            "okey": np.int64(0),
            "nat": d["c_nationkey"].astype("int32"),
        })

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "okey"]]
        c = g[g["side"] == 1][["key", "nat"]]
        m = o.merge(c, on="key")
        return pd.DataFrame({
            "key": m["okey"].astype("int64"),
            "bucket": (m["okey"] % n_buckets).astype("int64"),
            "side": 1,
            "cnat": m["nat"].astype("int32"),
            "snat": np.int32(-1),
            "yr": np.int32(0),
            "rev": np.int64(0),
        })

    o_nat = orders.map_batches(tag_orders, batch_format="pandas").union(
        customer.map_batches(tag_customer, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_cust, batch_format="pandas")

    lo = _dt.datetime.fromisoformat(Q7_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q7_DATE_HI)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        arr = ray.get(smap_ref)
        sk = df["l_suppkey"].to_numpy()
        nat = np.where(sk < len(arr), arr[np.minimum(sk, len(arr) - 1)],
                       -1).astype("int32")
        keep = nat >= 0
        d = df[keep]
        price = np.rint(d["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(d["l_discount"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({
            "key": d["l_orderkey"].astype("int64"),
            "bucket": (d["l_orderkey"] % n_buckets).astype("int64"),
            "side": 0,
            "cnat": np.int32(-1),
            "snat": nat[keep],
            "yr": d["l_shipdate"].dt.year.astype("int32"),
            "rev": price * (100 - disc),
        })

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        sides = ray.get(side_ref)
        l = g[g["side"] == 0][["key", "snat", "yr", "rev"]]
        o = g[g["side"] == 1][["key", "cnat"]]
        m = l.merge(o, on="key")
        # cross-direction only: supplier and customer in DIFFERENT regions
        m = m[sides[m["snat"].to_numpy()]
              != sides[m["cnat"].to_numpy()]]
        return m.groupby(["snat", "cnat", "yr"], as_index=False).agg(
            revenue_cbp=("rev", "sum"), n=("rev", "size"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["snat", "cnat", "yr"], as_index=False).agg(
            revenue_cbp=("revenue_cbp", "sum"), n=("n", "sum"))
        return pd.DataFrame({
            "supp_nation": out["snat"].map(nat_name),
            "cust_nation": out["cnat"].map(nat_name),
            "l_year": out["yr"].astype("int64"),
            "revenue_cbp": out["revenue_cbp"].astype("int64"),
            "n": out["n"].astype("int64"),
        })

    return li.map_batches(tag_li, batch_format="pandas").union(o_nat) \
        .groupby("bucket").map_groups(join_li, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


TRADE_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cbp,
       count(*) AS n
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
WHERE ((sr.r_name = '{Q7_REGIONS[0]}' AND cr.r_name = '{Q7_REGIONS[1]}')
    OR (sr.r_name = '{Q7_REGIONS[1]}' AND cr.r_name = '{Q7_REGIONS[0]}'))
  AND l_shipdate >= TIMESTAMP '{Q7_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q7_DATE_HI}'
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# market_share (TPC-H Q8 shape): a ratio-of-conditional-sums over the
# widest join tree — per order year, the share of EUROPE's PROMO-part
# order revenue supplied by NATION_3.
# --------------------------------------------------------------------------
Q8_REGION = "EUROPE"
Q8_TYPE = "PROMO"
Q8_NATION_KEY = 3
Q8_DATE_LO = "1995-01-01"
Q8_DATE_HI = "1997-01-01"


def market_share(sf_dir: str):
    """(o_year, num_cbp, den_cbp, mkt_share) — numerator and denominator
    emitted alongside the double ratio so the oracle pins the exact
    integers, not just the rounded quotient.

    Physical plan: the part side collapses to a broadcast partkey SET
    (the p_type filter selects ~1/6 of parts; at 100 TB this is the
    selective-filter-then-broadcast rule — a few MB of int64 keys, vs a
    partkey shuffle of the whole lineitem); supplier→nationkey is the
    same broadcast probe array as Q5/Q7. One bucketed shuffle joins
    date-pruned orders ⋈ region-gated customer on custkey, a second
    joins part-gated lineitem on orderkey; per-year integer partials,
    3-row combine, one guarded division mirrored verbatim in SQL.
    """
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    n_buckets = _n_join_buckets()

    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    regiont = _pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {int(rk) for rk, rn in zip(regiont["r_regionkey"].to_pylist(),
                                       regiont["r_name"].to_pylist())
             if rn == Q8_REGION}
    region_nats = {int(nk) for nk, rk in zip(
        nation["n_nationkey"].to_pylist(),
        nation["n_regionkey"].to_pylist()) if int(rk) in rkeys}

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_type"])
    pkeys = {int(k) for k, t in zip(part["p_partkey"].to_pylist(),
                                    part["p_type"].to_pylist())
             if t == Q8_TYPE}
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    skey = sup["s_suppkey"].to_numpy()
    smap = np.full(int(skey.max()) + 1, -1, dtype=np.int32)
    smap[skey] = sup["s_nationkey"].to_numpy().astype(np.int32)

    pkeys_ref = ray.put(np.array(sorted(pkeys), dtype=np.int64))
    smap_ref = ray.put(smap)
    cust_nats_ref = ray.put(region_nats)

    lo = _dt.datetime.fromisoformat(Q8_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q8_DATE_HI)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))
    customer = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_custkey"].astype("int64"),
            "bucket": (df["o_custkey"] % n_buckets).astype("int64"),
            "side": 0,
            "okey": df["o_orderkey"].astype("int64"),
            "yr": df["o_orderdate"].dt.year.astype("int32"),
        })

    def tag_customer(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_nationkey"].isin(ray.get(cust_nats_ref))]
        return pd.DataFrame({
            "key": d["c_custkey"].astype("int64"),
            "bucket": (d["c_custkey"] % n_buckets).astype("int64"),
            "side": 1,
            "okey": np.int64(0),
            "yr": np.int32(0),
        })

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "okey", "yr"]]
        c = g[g["side"] == 1][["key"]]
        m = o.merge(c, on="key")
        return pd.DataFrame({
            "key": m["okey"].astype("int64"),
            "bucket": (m["okey"] % n_buckets).astype("int64"),
            "side": 1,
            "yr": m["yr"].astype("int32"),
            "num": np.int64(0),
            "den": np.int64(0),
        })

    o_yr = orders.map_batches(tag_orders, batch_format="pandas").union(
        customer.map_batches(tag_customer, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_cust, batch_format="pandas")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(pkeys_ref)
        arr = ray.get(smap_ref)
        keep = np.isin(df["l_partkey"].to_numpy(), pk)
        d = df[keep]
        sk = d["l_suppkey"].to_numpy()
        nat = np.where(sk < len(arr), arr[np.minimum(sk, len(arr) - 1)],
                       -1)
        price = np.rint(d["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(d["l_discount"].to_numpy() * 100).astype("int64")
        rev = price * (100 - disc)
        return pd.DataFrame({
            "key": d["l_orderkey"].astype("int64"),
            "bucket": (d["l_orderkey"] % n_buckets).astype("int64"),
            "side": 0,
            "yr": np.int32(0),
            "num": np.where(nat == Q8_NATION_KEY, rev, 0),
            "den": rev,
        })

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "num", "den"]]
        o = g[g["side"] == 1][["key", "yr"]]
        m = l.merge(o, on="key")
        return m.groupby("yr", as_index=False).agg(
            num_cbp=("num", "sum"), den_cbp=("den", "sum"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("yr", as_index=False).agg(
            num_cbp=("num_cbp", "sum"), den_cbp=("den_cbp", "sum"))
        den = out["den_cbp"].to_numpy()
        share = np.where(den == 0, 0.0,
                         out["num_cbp"].to_numpy() / np.maximum(den, 1))
        return pd.DataFrame({
            "o_year": out["yr"].astype("int64"),
            "num_cbp": out["num_cbp"].astype("int64"),
            "den_cbp": out["den_cbp"].astype("int64"),
            "mkt_share": share,
        })

    return li.map_batches(tag_li, batch_format="pandas").union(o_yr) \
        .groupby("bucket").map_groups(join_li, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


MARKET_SHARE_SQL = f"""
WITH t AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
         s_nationkey
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_DATE_LO}'
    AND o_orderdate <  TIMESTAMP '{Q8_DATE_HI}'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN s_nationkey = {Q8_NATION_KEY} THEN rev
                     ELSE 0 END) AS BIGINT) AS num_cbp,
       CAST(sum(rev) AS BIGINT) AS den_cbp,
       coalesce(CAST(sum(CASE WHEN s_nationkey = {Q8_NATION_KEY} THEN rev
                              ELSE 0 END) AS DOUBLE)
                / nullif(CAST(sum(rev) AS DOUBLE), 0), 0.0) AS mkt_share
FROM t
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# top_supplier (TPC-H Q15 shape): argmax over a grouped aggregate —
# the supplier(s) with maximum revenue in a 3-month ship window.
# --------------------------------------------------------------------------
Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def top_supplier(sf_dir: str):
    """(s_suppkey, s_name, total_revenue_cbp) — ties all returned, the
    classic Q15 contract.

    Physical plan: date-pruned column-pruned scan → Arrow-native
    per-batch partial sums by suppkey (pre-aggregation bounds every
    shuffle row count at n_suppliers, not n_lineitems) → one suppkey
    groupby combine → the max gate runs on the ≤n_suppliers result in a
    single task; names attach from the broadcast supplier dim there.
    """
    import datetime as _dt

    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq
    import ray

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    names_ref = ray.put({int(k): str(n) for k, n in zip(
        sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist())})

    lo = _dt.datetime.fromisoformat(Q15_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q15_DATE_HI)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def partial(t: pa.Table) -> pa.Table:
        price = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()),
                                             disc))
        g = pa.table({"s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                      "rev": rev}).group_by("s_suppkey") \
            .aggregate([("rev", "sum")])
        return g.rename_columns(["s_suppkey", "rev"])

    def pick_max(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("s_suppkey", as_index=False)["rev"].sum()
        best = out[out["rev"] == out["rev"].max()]
        names = ray.get(names_ref)
        return pd.DataFrame({
            "s_suppkey": best["s_suppkey"].astype("int64"),
            "s_name": best["s_suppkey"].map(names),
            "total_revenue_cbp": best["rev"].astype("int64"),
        })

    return li.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(pick_max, batch_format="pandas")


TOP_SUPPLIER_SQL = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS total_revenue_cbp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_LO}'
    AND l_shipdate <  TIMESTAMP '{Q15_DATE_HI}'
  GROUP BY 1
)
SELECT CAST(r.s_suppkey AS BIGINT) AS s_suppkey,
       s.s_name AS s_name,
       r.total_revenue_cbp
FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_revenue_cbp = (SELECT max(total_revenue_cbp) FROM r)
"""


# --------------------------------------------------------------------------
# quantity_brand_revenue (TPC-H Q19 shape): disjunctive multi-attribute
# predicates (OR of brand×size×quantity conjunctions) across a join —
# the planner shape where the part side collapses to a broadcast filter.
# --------------------------------------------------------------------------
Q19_CASES = (("Brand#12", 1, 15, 1, 20),
             ("Brand#23", 1, 25, 10, 30),
             ("Brand#15", 1, 35, 20, 40))


def quantity_brand_revenue(sf_dir: str):
    """(revenue_cbp, n) — one row: revenue over lineitems matching ANY
    of the three (brand, size range, quantity range) conjunctions.

    Physical plan: zero shuffle. The three brands select a handful of
    parts, so the part side becomes a broadcast partkey→case-bitmask
    probe array (size gates folded in at build time); each lineitem
    batch evaluates the quantity gates vectorized against the probed
    bitmask and emits a 1-row integer partial; a 1-row-per-block
    combine finishes. At 100 TB the scan is the whole cost — exactly
    what Q19 is a benchmark of.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    brand = part["p_brand"].to_pylist()
    size = part["p_size"].to_numpy()
    mask = np.zeros(int(pk.max()) + 1, dtype=np.uint8)
    for bit, (b, slo, shi, _qlo, _qhi) in enumerate(Q19_CASES):
        sel = (np.array([x == b for x in brand])
               & (size >= slo) & (size <= shi))
        mask[pk[sel]] |= (1 << bit)
    mask_ref = ray.put(mask)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        arr = ray.get(mask_ref)
        pkv = t["l_partkey"].to_numpy()
        bits = np.where(pkv < len(arr),
                        arr[np.minimum(pkv, len(arr) - 1)], 0)
        qty = t["l_quantity"].to_numpy()
        keep = np.zeros(len(pkv), dtype=bool)
        for bit, (_b, _slo, _shi, qlo, qhi) in enumerate(Q19_CASES):
            keep |= ((bits & (1 << bit)) != 0) & (qty >= qlo) & (qty <= qhi)
        price = np.rint(t["l_extendedprice"].to_numpy()[keep]
                        * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy()[keep]
                       * 100).astype(np.int64)
        rev = int((price * (100 - disc)).sum())
        return pa.table({"revenue_cbp": pa.array([rev], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_cbp": pa.array(
                [pc.sum(t["revenue_cbp"]).as_py() or 0], pa.int64()),
            "n": pa.array([pc.sum(t["n"]).as_py() or 0], pa.int64()),
        })

    return li.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(combine, batch_format="pyarrow")


QUANTITY_BRAND_REVENUE_SQL = f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0)
            AS BIGINT) AS revenue_cbp,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = '{Q19_CASES[0][0]}'
       AND p_size BETWEEN {Q19_CASES[0][1]} AND {Q19_CASES[0][2]}
       AND l_quantity BETWEEN {Q19_CASES[0][3]} AND {Q19_CASES[0][4]})
   OR (p_brand = '{Q19_CASES[1][0]}'
       AND p_size BETWEEN {Q19_CASES[1][1]} AND {Q19_CASES[1][2]}
       AND l_quantity BETWEEN {Q19_CASES[1][3]} AND {Q19_CASES[1][4]})
   OR (p_brand = '{Q19_CASES[2][0]}'
       AND p_size BETWEEN {Q19_CASES[2][1]} AND {Q19_CASES[2][2]}
       AND l_quantity BETWEEN {Q19_CASES[2][3]} AND {Q19_CASES[2][4]})
"""


# --------------------------------------------------------------------------
# events_window_join (stream window self-join): for every purchase, how
# many errors did the same user hit in the trailing 24 h? The canonical
# event-correlation join, distributed with HALO REPLICATION: time is
# sliced into window-sized buckets, the small side (errors) is written
# to its own bucket AND the next one, so every qualifying pair co-lives
# in exactly one (user, bucket) group and no pair is counted twice.
# --------------------------------------------------------------------------
WJ_WINDOW_US = 24 * 3600 * 1_000_000


def events_window_join(sf_dir: str):
    """(event_id, n_errors_24h) per purchase event.

    Scale story: the shuffle key is (user_id, time-bucket), so skew is
    bounded by one user-day of events; halo replication doubles only
    the error side (≤2× the smaller input), never the purchases; within
    a group the count is two binary searches on the sorted error
    timestamps — no pair materialization anywhere. At 100 TB this is
    the standard interval-join recipe (bucket + halo ∝ window/bucket
    ratio, here exactly 1).
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin(["purchase", "error"]))

    def tag(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        bucket = pc.divide(us, pa.scalar(WJ_WINDOW_US, pa.int64()))
        is_p = pc.equal(t["event_type"], pa.scalar("purchase"))
        base = pa.table({
            "user_id": t["user_id"],
            "tbucket": bucket,
            "side": pc.cast(pc.invert(is_p), pa.int8()),  # 0=purchase
            "event_id": t["event_id"],
            "ts_us": us,
        })
        err = base.filter(pc.equal(base["side"], pa.scalar(1, pa.int8())))
        halo = err.set_column(
            1, "tbucket", pc.add(err["tbucket"], pa.scalar(1, pa.int64())))
        return pa.concat_tables([base, halo])

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 0]
        if len(p) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_errors_24h": pd.Series([], dtype="int64")})
        e_ts = np.sort(g.loc[g["side"] == 1, "ts_us"].to_numpy())
        t_p = p["ts_us"].to_numpy()
        n = (np.searchsorted(e_ts, t_p, side="left")
             - np.searchsorted(e_ts, t_p - WJ_WINDOW_US, side="left"))
        return pd.DataFrame({"event_id": p["event_id"].astype("int64"),
                             "n_errors_24h": n.astype("int64")})

    return ev.map_batches(tag, batch_format="pyarrow") \
        .groupby(["user_id", "tbucket"]) \
        .map_groups(count_group, batch_format="pandas")


EVENTS_WINDOW_JOIN_SQL = """
SELECT p.event_id,
       CAST(count(e.ts) AS BIGINT) AS n_errors_24h
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events
           WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 24 HOUR AND e.ts < p.ts
GROUP BY p.event_id
"""


# --------------------------------------------------------------------------
# order_priority_check (TPC-H Q4 shape): EXISTS semi-join — count orders
# per priority that have at least one "late-penalty" lineitem (l_tax >
# l_discount, the row-local dual of Q4's commitdate < receiptdate, which
# this schema lacks). One bucketed shuffle on orderkey; the lineitem side
# is deduplicated per batch BEFORE the shuffle so at most one row per
# (batch, orderkey) moves.
# --------------------------------------------------------------------------
Q4_DATE_LO = "1996-01-01"
Q4_DATE_HI = "1997-01-01"


def order_priority_check(sf_dir: str):
    """(o_orderpriority, n) for 1996 orders with >=1 l_tax>l_discount
    lineitem."""
    import datetime as _dt

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    n_buckets = _n_join_buckets()
    lo = _dt.datetime.fromisoformat(Q4_DATE_LO)
    hi = _dt.datetime.fromisoformat(Q4_DATE_HI)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"],
                             filter=(pads.field("o_orderdate") >= lo)
                             & (pads.field("o_orderdate") < hi))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"],
                         filter=pads.field("l_tax") > pads.field("l_discount"))

    def tag_li(t: pa.Table) -> pa.Table:
        okey = pc.unique(t["l_orderkey"]).to_numpy()
        return pa.table({
            "key": pa.array(okey, pa.int64()),
            "bucket": pa.array(okey % n_buckets, pa.int64()),
            "side": pa.array(np.zeros(len(okey), dtype=np.int8)),
            "priority": pa.array([""] * len(okey), pa.string()),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy()
        return pa.table({
            "key": pa.array(okey, pa.int64()),
            "bucket": pa.array(okey % n_buckets, pa.int64()),
            "side": pa.array(np.ones(len(okey), dtype=np.int8)),
            "priority": t["o_orderpriority"],
        })

    def semi_count(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["side"] == 0, "key"].to_numpy().tolist())
        o = g[g["side"] == 1]
        hit = o[o["key"].isin(have)]
        out = hit.groupby("priority", as_index=False).agg(n=("key", "size"))
        return pd.DataFrame({"o_orderpriority": out["priority"],
                             "n": out["n"].astype("int64")})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderpriority", as_index=False).agg(
            n=("n", "sum")).sort_values("o_orderpriority")
        return out.astype({"n": "int64"}).reset_index(drop=True)

    return li.map_batches(tag_li, batch_format="pyarrow") \
        .union(orders.map_batches(tag_orders, batch_format="pyarrow")) \
        .groupby("bucket").map_groups(semi_count, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


ORDER_PRIORITY_CHECK_SQL = f"""
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q4_DATE_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_tax > l_discount)
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# nation_profit (TPC-H Q9 shape): profit by (supplier nation, order year)
# for one part family. Q9's ps_supplycost (no partsupp table here) is
# stood in by p_retailprice: profit_cbp = price_c*(100-disc) -
# retail_c*100*qty, integer-exact. part (filtered) and supplier are
# broadcast probe arrays; the only shuffle is the date-carrying
# lineitem ⋈ orders join on orderkey, bucketed ∝ CPUs.
# --------------------------------------------------------------------------
Q9_PART_TOKEN = "widget"


def nation_profit(sf_dir: str):
    """(nation, o_year, profit_cbp, n) over '%widget%' parts."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    n_buckets = _n_join_buckets()

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name", "p_retailprice"])
    keep = pc.match_substring(part["p_name"], Q9_PART_TOKEN)
    part = part.filter(keep)
    pk = part["p_partkey"].to_numpy()
    retail_c = np.rint(part["p_retailprice"].to_numpy() * 100).astype("int64")
    rmap = np.full(int(pk.max()) + 1 if len(pk) else 1, -1, dtype=np.int64)
    rmap[pk] = retail_c
    rmap_ref = ray.put(rmap)

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    smap = np.full(int(sup["s_suppkey"].to_numpy().max()) + 1, -1,
                   dtype=np.int32)
    smap[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    smap_ref = ray.put(smap)

    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    nat_name = {int(k): str(v) for k, v in zip(
        nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())}

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        rm = ray.get(rmap_ref)
        sm = ray.get(smap_ref)
        pkv = df["l_partkey"].to_numpy()
        rc = np.where(pkv < len(rm), rm[np.minimum(pkv, len(rm) - 1)], -1)
        d = df[rc >= 0]
        rc = rc[rc >= 0]
        price = np.rint(d["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(d["l_discount"].to_numpy() * 100).astype("int64")
        qty = np.rint(d["l_quantity"].to_numpy()).astype("int64")
        sk = d["l_suppkey"].to_numpy()
        return pd.DataFrame({
            "key": d["l_orderkey"].astype("int64"),
            "bucket": (d["l_orderkey"] % n_buckets).astype("int64"),
            "side": np.int8(0),
            "nat": sm[np.minimum(sk, len(sm) - 1)].astype("int32"),
            "amt": price * (100 - disc) - rc * 100 * qty,
            "yr": np.int32(0),
        })

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_orderkey"].astype("int64"),
            "bucket": (df["o_orderkey"] % n_buckets).astype("int64"),
            "side": np.int8(1),
            "nat": np.int32(-1),
            "amt": np.int64(0),
            "yr": df["o_orderdate"].dt.year.astype("int32"),
        })

    def join_year(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "nat", "amt"]]
        if len(l) == 0:
            return pd.DataFrame({"nat": pd.Series([], dtype="int32"),
                                 "yr": pd.Series([], dtype="int32"),
                                 "profit": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        o = g[g["side"] == 1][["key", "yr"]]
        m = l.merge(o, on="key")
        out = m.groupby(["nat", "yr"], as_index=False).agg(
            profit=("amt", "sum"), n=("amt", "size"))
        return out.astype({"profit": "int64", "n": "int64"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["nat", "yr"], as_index=False).agg(
            profit=("profit", "sum"), n=("n", "sum"))
        return pd.DataFrame({
            "nation": out["nat"].map(nat_name),
            "o_year": out["yr"].astype("int64"),
            "profit_cbp": out["profit"].astype("int64"),
            "n": out["n"].astype("int64"),
        })

    return li.map_batches(tag_li, batch_format="pandas") \
        .union(orders.map_batches(tag_orders, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_year, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


NATION_PROFIT_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT) * 100
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
         AS profit_cbp,
       count(*) AS n
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE p_name LIKE '%{Q9_PART_TOKEN}%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# important_part_values (TPC-H Q11 shape): grouped value per part vs a
# GLOBAL scalar subquery threshold. Q11's 0.0001/SF fraction is replaced
# by the scale-free integer-exact gate  2*value*n_parts > 3*total (parts
# worth more than 1.5x the average part; 1.5 keeps the gate non-vacuous
# at sf0.001 where only ~4 suppliers sit in the region). Region-gated suppliers are a
# broadcast mask; per-part values come from Arrow partials + one bounded
# groupby (one row per part); the global total is a second tiny aggregate
# over that per-part table, never a rescan.
# --------------------------------------------------------------------------
Q11_REGION = "EUROPE"


def important_part_values(sf_dir: str):
    """(l_partkey, value_cents) for parts supplied from EUROPE worth
    more than 1.5x the average, value-descending."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    regiont = _pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {str(n): int(k) for k, n in zip(
        regiont["r_regionkey"].to_pylist(), regiont["r_name"].to_pylist())}
    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    nat_in = {int(nk) for nk, rk in zip(nation["n_nationkey"].to_pylist(),
                                        nation["n_regionkey"].to_pylist())
              if int(rk) == rkey[Q11_REGION]}
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    skey = sup["s_suppkey"].to_numpy()
    smask = np.zeros(int(skey.max()) + 1, dtype=bool)
    smask[skey[np.isin(sup["s_nationkey"].to_numpy(),
                       np.array(sorted(nat_in), dtype=np.int64))]] = True
    smask_ref = ray.put(smask)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(smask_ref)
        sk = t["l_suppkey"].to_numpy()
        keep = (sk < len(m)) & m[np.minimum(sk, len(m) - 1)]
        pkv = t["l_partkey"].to_numpy()[keep]
        cents = np.rint(
            t["l_extendedprice"].to_numpy()[keep] * 100).astype("int64")
        g = pa.table({"l_partkey": pa.array(pkv, pa.int64()),
                      "v": pa.array(cents, pa.int64())}) \
            .group_by("l_partkey").aggregate([("v", "sum")])
        return pa.table({"l_partkey": g["l_partkey"], "v": g["v_sum"]})

    per_part = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("v", alias_name="value_cents"))

    tot = per_part.aggregate(Sum("value_cents", alias_name="t"),
                             Count(alias_name="np"))
    total, n_parts = int(tot["t"]), int(tot["np"])

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(t["value_cents"],
                                      pa.scalar(2 * n_parts, pa.int64())),
                          pa.scalar(3 * total, pa.int64()))
        return t.filter(keep)

    return per_part.map_batches(gate, batch_format="pyarrow") \
        .sort(["value_cents", "l_partkey"], descending=[True, False])


IMPORTANT_PART_VALUES_SQL = f"""
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
  GROUP BY 1
), tot AS (SELECT sum(value_cents) AS t, count(*) AS np FROM pv)
SELECT l_partkey, value_cents
FROM pv, tot
WHERE value_cents * np * 2 > 3 * t
ORDER BY value_cents DESC, l_partkey
"""


# --------------------------------------------------------------------------
# part_supplier_counts (TPC-H Q16 shape): COUNT(DISTINCT supplier) per
# part attribute group with a NOT-IN supplier exclusion. The part↔supplier
# relation (no partsupp table) is the distinct (l_partkey, l_suppkey)
# pairs observed in lineitem. Two-level distinct: per-batch pair dedup →
# pair-bucket groupby dedup + attr attach → (attrs, suppkey)-bucket
# groupby dedup + partial counts → tiny combine. Both shuffles ∝ CPUs and
# carry only deduplicated pair rows.
# --------------------------------------------------------------------------
Q16_BRAND_NOT = "Brand#13"
Q16_TYPE_NOT_PREFIX = "PROMO"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)
Q16_BAD_ACCTBAL = 1000.0


def part_supplier_counts(sf_dir: str):
    """(p_brand, p_type, p_size, supplier_cnt) over distinct lineitem
    part-supplier pairs, excluding low-acctbal suppliers."""
    import pyarrow.parquet as _pq

    n_buckets = _n_join_buckets()

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_type",
                                   "p_size"])
    brand = np.asarray(part["p_brand"].to_pylist())
    ptype = np.asarray(part["p_type"].to_pylist())
    size = part["p_size"].to_numpy()
    keep = ((brand != Q16_BRAND_NOT)
            & ~np.char.startswith(ptype, Q16_TYPE_NOT_PREFIX)
            & np.isin(size, np.array(Q16_SIZES)))
    pk = part["p_partkey"].to_numpy()[keep]
    attrs = {int(k): (b, t, int(s)) for k, b, t, s in zip(
        pk, brand[keep], ptype[keep], size[keep])}
    attrs_ref = ray.put(attrs)

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    bad = set(sup.filter(
        pa.compute.less(sup["s_acctbal"], Q16_BAD_ACCTBAL))
        ["s_suppkey"].to_pylist())
    bad_ref = ray.put(bad)
    pkset_ref = ray.put(set(attrs))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        pks = ray.get(pkset_ref)
        badk = ray.get(bad_ref)
        d = df[df["l_partkey"].isin(pks)
               & ~df["l_suppkey"].isin(badk)].drop_duplicates()
        return pd.DataFrame({
            "pk": d["l_partkey"].astype("int64"),
            "sk": d["l_suppkey"].astype("int64"),
            "bucket": ((d["l_partkey"] * 31 + d["l_suppkey"])
                       % n_buckets).astype("int64"),
        })

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        a = ray.get(attrs_ref)
        d = g[["pk", "sk"]].drop_duplicates()
        trip = d["pk"].map(a)
        return pd.DataFrame({
            "p_brand": trip.str[0],
            "p_type": trip.str[1],
            "p_size": trip.str[2].astype("int64"),
            "sk": d["sk"],
            "bucket2": ((d["sk"] * 127 + d["pk"] * 0
                         + trip.str[2]) % n_buckets).astype("int64"),
        })

    def count_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["p_brand", "p_type", "p_size", "sk"]].drop_duplicates()
        out = d.groupby(["p_brand", "p_type", "p_size"],
                        as_index=False).agg(c=("sk", "size"))
        return out.astype({"c": "int64"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["p_brand", "p_type", "p_size"],
                         as_index=False).agg(supplier_cnt=("c", "sum"))
        out = out.sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True])
        return out.astype({"supplier_cnt": "int64",
                           "p_size": "int64"}).reset_index(drop=True)

    return li.map_batches(pair_partial, batch_format="pandas") \
        .groupby("bucket").map_groups(pair_dedup, batch_format="pandas") \
        .groupby("bucket2").map_groups(count_partial,
                                       batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


PART_SUPPLIER_COUNTS_SQL = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_BRAND_NOT}'
  AND p_type NOT LIKE '{Q16_TYPE_NOT_PREFIX}%'
  AND p_size IN {Q16_SIZES!r}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < {Q16_BAD_ACCTBAL})
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# excess_share_suppliers (TPC-H Q20 shape): nested-aggregate semi-join —
# suppliers in one region who shipped MORE than 2x a part's fair
# per-supplier share of a part family (q*ns > 2*tq, integer-exact; the
# availqty > 0.5*shipped correlated subquery stood in by the fair-share
# rule since there is no partsupp table). Shuffle 1 is keyed by partkey
# (group size = that part's supplier fan, ~tens of rows) over per-batch
# (pk, sk, qty) partials; qualifying suppliers are then a bounded
# dimension-sized groupby.
# --------------------------------------------------------------------------
Q20_PART_TOKEN = "widget"
Q20_REGION = "EUROPE"


def excess_share_suppliers(sf_dir: str):
    """(s_suppkey, s_name) of EUROPE suppliers with an over-2x-fair-share
    position in any '%widget%' part."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_name"])
    pk = part.filter(pc.match_substring(part["p_name"], Q20_PART_TOKEN)) \
        ["p_partkey"].to_numpy()
    pmask = np.zeros(int(pk.max()) + 1 if len(pk) else 1, dtype=bool)
    pmask[pk] = True
    pmask_ref = ray.put(pmask)

    regiont = _pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {str(n): int(k) for k, n in zip(
        regiont["r_regionkey"].to_pylist(), regiont["r_name"].to_pylist())}
    nation = _pq.read_table(f"{sf_dir}/nation.parquet")
    nat_in = {int(nk) for nk, rk in zip(nation["n_nationkey"].to_pylist(),
                                        nation["n_regionkey"].to_pylist())
              if int(rk) == rkey[Q20_REGION]}
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name", "s_nationkey"])
    sname = {int(k): str(n) for k, n, nk in zip(
        sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist(),
        sup["s_nationkey"].to_pylist()) if int(nk) in nat_in}
    sname_ref = ray.put(sname)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        m = ray.get(pmask_ref)
        pkv = t["l_partkey"].to_numpy()
        keep = (pkv < len(m)) & m[np.minimum(pkv, len(m) - 1)]
        g = pa.table({
            "pk": pa.array(pkv[keep], pa.int64()),
            "sk": pa.array(t["l_suppkey"].to_numpy()[keep], pa.int64()),
            "q": pa.array(np.rint(t["l_quantity"].to_numpy()[keep])
                          .astype("int64"), pa.int64()),
        }).group_by(["pk", "sk"]).aggregate([("q", "sum")])
        return pa.table({"pk": g["pk"], "sk": g["sk"], "q": g["q_sum"]})

    def fair_share(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("sk", as_index=False).agg(q=("q", "sum"))
        tq = int(per["q"].sum())
        ns = len(per)
        win = per[per["q"].to_numpy() * ns > 2 * tq]
        return pd.DataFrame({"sk": win["sk"].astype("int64")})

    def name_suppliers(df: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(sname_ref)
        d = df[df["sk"].isin(nm)].drop_duplicates("sk")
        return pd.DataFrame({
            "s_suppkey": d["sk"].astype("int64"),
            "s_name": d["sk"].map(nm),
        })

    return li.map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("pk").map_groups(fair_share, batch_format="pandas") \
        .groupby("sk").map_groups(lambda g: g.head(1),
                                  batch_format="pandas") \
        .map_batches(name_suppliers, batch_format="pandas") \
        .sort("s_suppkey")


EXCESS_SHARE_SUPPLIERS_SQL = f"""
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%{Q20_PART_TOKEN}%'
  GROUP BY 1, 2
), pt AS (
  SELECT pk, sum(q) AS tq, count(*) AS ns FROM ps GROUP BY 1
)
SELECT DISTINCT s_suppkey, s_name
FROM ps
JOIN pt USING (pk)
JOIN supplier ON sk = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE q * ns > 2 * tq AND r_name = '{Q20_REGION}'
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# events_late_arrivals: streaming watermark accounting — per event type,
# how many events arrive LATE (event time below the running watermark =
# running max event-time minus allowed lateness W)? Arrival order is the
# derived index arr = event_id XOR 255 (the corpus's event_id order is
# perfectly in-order; XOR-255 shuffles within 256-blocks to model real
# network reordering while staying bijective and oracle-mirrorable), and
# W = 64 average inter-event gaps, computed integer-exact from the span.
#
# The distributed shape is a GLOBAL PREFIX-MAX (the cumulative-sum
# window's max dual, but over the whole stream, not per key): range-
# bucket by arr (dense, skew-free) → pass 1: per-bucket max(ts) partials
# → tiny exclusive scan on the driver (B ∝ CPUs rows) broadcast back →
# pass 2: per-bucket sort + running max seeded by the prior-bucket scan.
# Shuffle ∝ buckets, rows move once.
# --------------------------------------------------------------------------
LATE_W_GAPS = 64


def events_late_arrivals(sf_dir: str):
    """(event_type, n_late, n_total), late = ts below the arrival
    watermark with W = 64 average gaps of allowed lateness."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    stats = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(pc.cast(t["ts"], pa.int64())).as_py()],
                           pa.int64()),
            "hi": pa.array([pc.max(pc.cast(t["ts"], pa.int64())).as_py()],
                           pa.int64()),
            "n": pa.array([len(t)], pa.int64()),
            "amax": pa.array(
                [int(np.max(t["event_id"].to_numpy() ^ 255))], pa.int64()),
        }), batch_format="pyarrow") \
        .repartition(1).map_batches(
            lambda d: pd.DataFrame({"lo": [d["lo"].min()],
                                    "hi": [d["hi"].max()],
                                    "n": [d["n"].sum()],
                                    "amax": [d["amax"].max()]}),
            batch_format="pandas").take(1)[0]
    w_us = (int(stats["hi"]) - int(stats["lo"])) * LATE_W_GAPS \
        // int(stats["n"])
    n_buckets = _n_join_buckets()
    width = int(stats["amax"]) // n_buckets + 1

    def tag(t: pa.Table) -> pa.Table:
        arr = t["event_id"].to_numpy() ^ 255
        return pa.table({
            "arr": pa.array(arr, pa.int64()),
            "us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
            "bucket": pa.array(arr // width, pa.int64()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    # pass 1: per-bucket max event time → exclusive prefix scan (driver
    # side is B rows, ∝ CPUs — never the stream)
    bmax = {int(r["bucket"]): int(r["max(us)"])
            for r in tagged.groupby("bucket").max("us").take_all()}
    prior: dict[int, int] = {}
    run = -(1 << 62)
    for b in sorted(bmax):
        prior[b] = run
        run = max(run, bmax[b])
    prior_ref = ray.put(prior)

    def count_late(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("arr")
        us = g["us"].to_numpy()
        wm = np.maximum.accumulate(
            np.concatenate([[ray.get(prior_ref)[int(g["bucket"].iat[0])]],
                            us[:-1]]))
        late = us < wm - w_us
        out = pd.DataFrame({"event_type": g["event_type"], "late": late})
        res = out.groupby("event_type", as_index=False).agg(
            n_late=("late", "sum"), n_total=("late", "size"))
        return res.astype({"n_late": "int64", "n_total": "int64"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).agg(
            n_late=("n_late", "sum"), n_total=("n_total", "sum"))
        return out.sort_values("event_type").reset_index(drop=True) \
            .astype({"n_late": "int64", "n_total": "int64"})

    return tagged.groupby("bucket") \
        .map_groups(count_late, batch_format="pandas") \
        .repartition(1).map_batches(combine, batch_format="pandas")


EVENTS_LATE_ARRIVALS_SQL = f"""
WITH s AS (
  SELECT (epoch_us(max(ts)) - epoch_us(min(ts))) * {LATE_W_GAPS}
           // count(*) AS w_us
  FROM events
), w AS (
  SELECT event_type, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (ORDER BY xor(event_id, 255)
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT event_type,
       CAST(count(*) FILTER (us < wm - (SELECT w_us FROM s)) AS BIGINT)
         AS n_late,
       count(*) AS n_total
FROM w
GROUP BY 1
ORDER BY 1
"""


def events_windowed_topk(sf_dir: str, k: int = 3,
                         window_s: int = 3600):
    """(window_start, rank, event_type, n) — per-hour top-k event types
    by count: Arrow-native per-batch partial counts (the combiner), one
    (window, type) groupby to total them, then a per-window cut — the
    streaming leaderboard. Deterministic ties on event_type asc; exact
    dual is a window-function query."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(t):
        import pyarrow.compute as pc
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, window_s * 10 ** 6), window_s)
        g = pa.table({"event_type": t["event_type"],
                      "window_start": win}) \
            .group_by(["event_type", "window_start"]) \
            .aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "window_start": g["window_start"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["window_start", "event_type"],
                          as_index=False).agg(n=("n", "sum"))

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "event_type"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g[["window_start", "rank", "event_type", "n"]]

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .map_groups(total, batch_format="pandas") \
        .groupby("window_start").map_groups(cut, batch_format="pandas")


EVENTS_WINDOWED_TOPK_SQL = """
WITH c AS (
  SELECT (epoch_us(ts) // CAST(3600000000 AS BIGINT)) * 3600
           AS window_start,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type ASC) AS rank
  FROM c
)
SELECT window_start, rank, event_type, n FROM r WHERE rank <= 3
"""


def events_decayed_counts(sf_dir: str, half_life_s: int = 86400):
    """(event_type, decayed_count) — exponentially-decayed event counts
    (half-life 1 day) as of the stream's max timestamp: the streaming
    trend signal where old events fade smoothly instead of falling off
    a window edge. Per-batch partials sum 2^((ts - ref)/hl) per type
    (each term ≤ 1, order-independent float math); ref = global max ts
    is computed by a tiny Arrow scan first. Values rounded to 6
    decimals on both sides — the compare is on equal doubles, not on
    float luck."""
    import pyarrow.parquet as _pq
    import pyarrow.compute as pc
    ref_us = int(pc.max(_pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts"])["ts"]).cast(
        pa.int64()).as_py())

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(t):
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        w = np.exp2((us - ref_us) / 1e6 / half_life_s)
        g = pa.table({"event_type": t["event_type"],
                      "w": pa.array(w)}) \
            .group_by(["event_type"]).aggregate([("w", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "w": g["w_sum"]})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).agg(w=("w", "sum"))
        out["decayed_count"] = out["w"].round(6)
        return out[["event_type", "decayed_count"]]

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").map_groups(total, batch_format="pandas")


EVENTS_DECAYED_SQL = """
WITH ref AS (SELECT max(ts) AS mx FROM events)
SELECT event_type,
       round(sum(power(2.0,
             (epoch_us(ts) - epoch_us((SELECT mx FROM ref))) / 1e6
             / 86400.0)), 6) AS decayed_count
FROM events
GROUP BY event_type
"""


def ship_delay_histogram(sf_dir: str):
    """(delay_week, n) — order-to-ship latency distribution: lineitem ⋈
    orders on orderkey (the big-big join, bucketed shuffle ∝ cluster
    CPUs, orderdate dict built per bucket — never a global broadcast),
    delay = l_shipdate − o_orderdate bucketed by week. The supply-chain
    latency histogram every ops dashboard draws; integer-exact oracle."""
    n_buckets = _n_join_buckets()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])

    def tag_li(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["l_orderkey"].astype("int64"),
            "days": pd.to_datetime(df["l_shipdate"]).values
                    .astype("datetime64[D]").astype("int64"),
            "side": np.int8(0),
            "bucket": (df["l_orderkey"] % n_buckets).astype("int64"),
        })

    def tag_od(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["o_orderkey"].astype("int64"),
            "days": pd.to_datetime(df["o_orderdate"]).values
                    .astype("datetime64[D]").astype("int64"),
            "side": np.int8(1),
            "bucket": (df["o_orderkey"] % n_buckets).astype("int64"),
        })

    both = li.map_batches(tag_li, batch_format="pandas").union(
        od.map_batches(tag_od, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        omap = dict(zip(g.loc[g["side"] == 1, "key"],
                        g.loc[g["side"] == 1, "days"]))
        lines = g[g["side"] == 0]
        delay = lines["days"].to_numpy() \
            - lines["key"].map(omap).to_numpy()
        week = (delay // 7).astype("int64")
        out = pd.Series(week).value_counts().reset_index()
        out.columns = ["delay_week", "n"]
        return out

    return both.groupby("bucket") \
        .map_groups(join_bucket, batch_format="pandas") \
        .groupby("delay_week").aggregate(Sum("n", alias_name="n"))


SHIP_DELAY_HISTOGRAM_SQL = """
SELECT CAST(floor(datediff('day', o.o_orderdate, l.l_shipdate) / 7.0)
         AS BIGINT) AS delay_week,
       count(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def events_anomaly_windows(sf_dir: str, window_s: int = 3600):
    """(event_type, window_start, n, is_anomaly) — burst detection by
    z-score: a window is anomalous when its count exceeds that type's
    mean by 2 population standard deviations. Two distributed passes:
    (type, window) counts (Arrow partials), then per-type mean/std over
    the count vector and the flag — all inside one type-group. Output
    carries the BOOLEAN verdict only (no float columns), so the oracle
    compare is exact."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(t):
        import pyarrow.compute as pc
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, window_s * 10 ** 6), window_s)
        g = pa.table({"event_type": t["event_type"],
                      "window_start": win}) \
            .group_by(["event_type", "window_start"]) \
            .aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "window_start": g["window_start"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "window_start"],
                          as_index=False).agg(n=("n", "sum"))

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(dtype=np.float64)
        mu = n.mean()
        sd = n.std()          # population std, ddof=0 — stddev_pop dual
        g = g.copy()
        # threshold rounded to 1e-6 on BOTH sides: numpy and DuckDB
        # double arithmetic agree far beyond that, which NARROWS (does
        # not eliminate) the float-compare risk — a flip needs the two
        # engines' doubles to straddle a 1e-6 rounding boundary that
        # also crosses an integer count, which the synthetic data's
        # count spacing keeps out of reach
        g["is_anomaly"] = g["n"] > round(mu + 2.0 * sd, 6)
        return g[["event_type", "window_start", "n", "is_anomaly"]]

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]) \
        .map_groups(total, batch_format="pandas") \
        .groupby("event_type").map_groups(flag, batch_format="pandas")


EVENTS_ANOMALY_SQL = """
WITH c AS (
  SELECT event_type,
         (epoch_us(ts) // CAST(3600000000 AS BIGINT)) * 3600
           AS window_start,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, window_start, n,
       n > round(avg(n) OVER (PARTITION BY event_type)
           + 2.0 * stddev_pop(n) OVER (PARTITION BY event_type), 6)
         AS is_anomaly
FROM c
"""
