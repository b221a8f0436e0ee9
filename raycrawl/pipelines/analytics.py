"""Operator inventory as Ray Data pipelines over the driver testdata.

Each entry implements one operator family from SURVEY.md §2 against the
TPC-H-ish tables in ``/root/testdata/sf*`` (the crawl-table stand-ins,
FIXTURES.md §6) and is paired with an ANSI-SQL oracle the driver runs
through DuckDB. Column names and dtypes match the oracle exactly; all
float aggregations are computed in integer cents so partial-aggregation
order cannot perturb the value hash.

Registry: ``QUERIES[name] -> fn(sf_dir)``, ``ORACLES[name] -> sql``
(omitted for non-SQL-expressible ops → driver does a rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.textstats import (
    PUNCT_REGEX,
    TOKEN_REGEX,
    TOKEN_REGEX_SQL,
    langid,
    quality_score,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns
    )


# ---------------------------------------------------------------------------
# Queue / frontier analogues (SURVEY §2.5 A1-A6, §2.6 O1/O4, §2.4 J2-J4)
# ---------------------------------------------------------------------------


@query(
    "frontier_queue_depth",
    "SELECT event_type, COUNT(*) AS depth FROM events GROUP BY event_type",
)
def frontier_queue_depth(sf_dir: str):
    """A1 queue-depth counts (reference getInfo.count,
    providers/queuing/inmemorycrawlqueue.js:65-70)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="depth"))


@query(
    "doc_count_by_prefix",
    "SELECT COUNT(*) AS n FROM documents WHERE source LIKE 'src1%'",
)
def doc_count_by_prefix(sf_dir: str):
    """A2 prefix count (reference segmented blob count,
    providers/storage/storageDocStore.js:143-177)."""
    ds = _read(sf_dir, "documents", ["source"])
    n = ds.map_batches(
        lambda t: t.filter(pc.starts_with(t["source"], "src1")),
        batch_format="pyarrow",
    ).count()
    return pa.table({"n": pa.array([n], pa.int64())})


@query(
    "doc_list_by_prefix",
    "SELECT doc_id, source, lang FROM documents WHERE source LIKE 'src2%' "
    "ORDER BY doc_id LIMIT 100",
)
def doc_list_by_prefix(sf_dir: str):
    """A3 metadata projection of matching docs, capped
    (storageDocStore.js:93-129)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])
    return (
        ds.map_batches(
            lambda t: t.filter(pc.starts_with(t["source"], "src2")),
            batch_format="pyarrow",
        )
        .sort("doc_id")
        .limit(100)
    )


@query(
    "peek_topk",
    "SELECT event_id, ts, event_type, user_id FROM events "
    "ORDER BY ts, event_id LIMIT 100",
)
def peek_topk(sf_dir: str):
    """O4 peek N requests in priority order (routes/requests.js:30-44)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "user_id"])
    return ds.sort(["ts", "event_id"]).limit(100)


@query(
    "weighted_queue_order",
    "SELECT event_id, event_type, ts, "
    "CASE event_type WHEN 'error' THEN 10 WHEN 'signup' THEN 3 "
    "WHEN 'purchase' THEN 3 WHEN 'click' THEN 2 ELSE 1 END AS w "
    "FROM events ORDER BY w DESC, ts, event_id LIMIT 200",
)
def weighted_queue_order(sf_dir: str):
    """O1 weighted queue-class scheduling (pop weights,
    lib/crawlerFactory.js:80): priority classes drain by weight rank."""
    weights = {"error": 10, "signup": 3, "purchase": 3, "click": 2}

    def add_w(df: pd.DataFrame) -> pd.DataFrame:
        df["w"] = (
            df["event_type"].map(weights).fillna(1).astype("int32")
        )
        return df

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])
    return (
        ds.map_batches(add_w, batch_format="pandas")
        .sort(["w", "ts", "event_id"], descending=[True, False, False])
        .limit(200)
    )


@query(
    "dedup_first_by_key",
    "SELECT user_id, event_id AS first_event_id, ts AS first_ts FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
    "  ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1",
)
def dedup_first_by_key(sf_dir: str):
    """D2 exact dedup — first request per identity key wins
    (redisRequestTracker.js:17-53)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).head(1)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].values,
                "first_event_id": g["event_id"].values,
                "first_ts": g["ts"].values,
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(first, batch_format="pandas")


@query(
    "upsert_latest",
    "SELECT user_id, event_id AS last_event_id, ts AS last_ts FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
    "  ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1",
)
def upsert_latest(sf_dir: str):
    """D3 last-write-wins upsert by natural key
    (mongodocstore.js:25-32 updateOne upsert)."""

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ascending=False).head(1)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].values,
                "last_event_id": g["event_id"].values,
                "last_ts": g["ts"].values,
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(latest, batch_format="pandas")


@query(
    "etag_join",
    "SELECT c_mktsegment, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS revenue_cents, "
    "COUNT(*) AS n_orders FROM orders JOIN customer "
    "ON o_custkey = c_custkey GROUP BY c_mktsegment",
)
def etag_join(sf_dir: str):
    """J2 etag-lookup join: big fact stream joined against a broadcast
    small side (the documents(url,etag) analogue) — ray.put once, dict
    lookup per batch, partial-aggregate before the tiny final groupby."""
    import ray
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lookup_ref = ray.put(
        dict(
            zip(
                cust.column("c_custkey").to_pylist(),
                cust.column("c_mktsegment").to_pylist(),
            )
        )
    )

    class JoinAgg:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["c_mktsegment"] = df["o_custkey"].map(self.lookup)
            df = df.dropna(subset=["c_mktsegment"])
            cents = np.floor(df["o_totalprice"].values * 100 + 0.5).astype(np.int64)
            part = (
                pd.DataFrame(
                    {"c_mktsegment": df["c_mktsegment"].values, "cents": cents}
                )
                .groupby("c_mktsegment", as_index=False)
                .agg(revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
            )
            return part

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = ds.map_batches(JoinAgg, batch_format="pandas", concurrency=2)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )


@query(
    "anti_join_unseen",
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
    "(SELECT o_custkey FROM orders WHERE o_totalprice > 250000) "
    "ORDER BY c_custkey",
)
def anti_join_unseen(sf_dir: str):
    """J4 anti-join against the seen set (tracker membership test,
    redisRequestTracker.js:22-39): broadcast key set, filter in place."""
    import ray

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    seen = np.unique(
        orders.filter(pc.greater(orders.column("o_totalprice"), 250000.0))
        .column("o_custkey")
        .to_numpy()
    )
    seen_ref = ray.put(seen)

    class AntiJoin:
        def __init__(self):
            self.seen = ray.get(seen_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column("c_custkey").to_numpy()
            idx = np.searchsorted(self.seen, keys)
            idx_c = np.minimum(idx, len(self.seen) - 1)
            mask = ~((idx < len(self.seen)) & (self.seen[idx_c] == keys))
            return t.filter(pa.array(mask))

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return ds.map_batches(
        AntiJoin, batch_format="pyarrow", concurrency=2
    ).sort("c_custkey")


@query(
    "metrics_rollup",
    "SELECT event_type, date_trunc('minute', ts) AS minute, COUNT(*) AS n "
    "FROM events GROUP BY 1, 2",
)
def metrics_rollup(sf_dir: str):
    """A5 per-second op counters rolled up (redis-metrics analogue,
    lib/crawlerFactory.js:264-277)."""
    from ray.data.aggregate import Count

    def add_minute(t: pa.Table) -> pa.Table:
        return t.append_column(
            "minute", pc.floor_temporal(t["ts"], unit="minute")
        )

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    return (
        ds.map_batches(add_minute, batch_format="pyarrow")
        .select_columns(["event_type", "minute"])
        .groupby(["event_type", "minute"])
        .aggregate(Count(alias_name="n"))
    )


@query(
    "rate_limit_violations",
    "SELECT user_id, date_trunc('minute', ts) AS minute, COUNT(*) AS n "
    "FROM events GROUP BY 1, 2 HAVING COUNT(*) > 1",
)
def rate_limit_violations(sf_dir: str):
    """T4 fixed-window rate limiter: windows where a key exceeds its
    budget (inmemoryRateLimiter.js:17-36 `over = count > limit`)."""
    from ray.data.aggregate import Count

    def add_minute(t: pa.Table) -> pa.Table:
        return t.append_column(
            "minute", pc.floor_temporal(t["ts"], unit="minute")
        )

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    grouped = (
        ds.map_batches(add_minute, batch_format="pyarrow")
        .select_columns(["user_id", "minute"])
        .groupby(["user_id", "minute"])
        .aggregate(Count(alias_name="n"))
    )
    return grouped.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    )


@query(
    "deadletter_requeue",
    "SELECT event_id, user_id, ts, 'immediate' AS queue, 0 AS attempt_count "
    "FROM events WHERE event_type = 'error' ORDER BY ts, event_id LIMIT 500",
)
def deadletter_requeue(sf_dir: str):
    """J3/S13 deadletter list + requeue projection
    (routes/deadletters.js:30-38): failed items re-enter the frontier
    on the immediate queue with a reset attempt count."""

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        n = t.num_rows
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "queue": pa.array(["immediate"] * n, pa.string()),
                "attempt_count": pa.array([0] * n, pa.int32()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return ds.map_batches(project, batch_format="pyarrow").sort(
        ["ts", "event_id"]
    ).limit(500)


@query(
    "tpch_q1_pricing",
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
    "* 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_cents, "
    "COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
)
def tpch_q1_pricing(sf_dir: str):
    """Baseline wide aggregate with in-batch partial aggregation
    (combiner); the tiny final combine runs on the driver — SURVEY
    §2.5/§4 pattern."""
    cutoff = pd.Timestamp("1998-09-02")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        charge = np.floor(
            df["l_extendedprice"].values
            * (1 - df["l_discount"].values)
            * (1 + df["l_tax"].values)
            * 100
            + 0.5
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].values,
                "l_linestatus": df["l_linestatus"].values,
                "qty": df["l_quantity"].values.astype(np.int64),
                "charge": charge,
            }
        )
        return out.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False
        ).agg(
            sum_qty=("qty", "sum"),
            sum_charge_cents=("charge", "sum"),
            count_order=("qty", "size"),
        )

    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # ~(blocks x 6) partial rows: the final combine belongs on the
    # driver — a distributed Aggregate on 384 rows costs more in
    # shuffle machinery than it computes (measured 1.35 s of a 2.1 s
    # query)
    out = partials.groupby(
        ["l_returnflag", "l_linestatus"], as_index=False
    ).agg(
        sum_qty=("sum_qty", "sum"),
        sum_charge_cents=("sum_charge_cents", "sum"),
        count_order=("count_order", "sum"),
    )
    return pa.Table.from_pandas(out, preserve_index=False)


@query(
    "top_sources",
    "SELECT source, COUNT(*) AS n FROM documents GROUP BY source "
    "ORDER BY n DESC, source LIMIT 10",
)
def top_sources(sf_dir: str):
    """A1/skew stats: hot-host histogram (the url_host skew the fetch
    partitioner must contain, SURVEY §4)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["source"])
    return (
        ds.groupby("source")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "source"], descending=[True, False])
        .limit(10)
    )


@query(
    "topk_orders_per_status",
    "SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders "
    "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_totalprice DESC, o_orderkey) <= 3",
)
def topk_orders_per_status(sf_dir: str):
    """O4 generalized: top-k per group (per-queue peek)."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)[["o_orderstatus", "o_orderkey", "o_totalprice"]]

    ds = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderkey", "o_totalprice"]
    )
    return ds.groupby("o_orderstatus").map_groups(topk, batch_format="pandas")


@query(
    "events_sessionize",
    "SELECT user_id, COUNT(*) AS n_sessions FROM ("
    "  SELECT user_id, CASE WHEN ts - LAG(ts) OVER "
    "  (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
    "  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "  THEN 1 ELSE 0 END AS new_session FROM events) "
    "WHERE new_session = 1 GROUP BY user_id",
)
def events_sessionize(sf_dir: str):
    """W streaming-window analogue: session counts with a 30-minute gap
    rule, per key (ray_guide 'streaming-shaped workloads' pattern —
    groupby(key).map_groups over ts-sorted groups)."""
    gap = pd.Timedelta(minutes=30)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [int(new.sum())]}
        )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
