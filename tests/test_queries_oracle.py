"""Driver-harness mirror: run every queries() entry at sf0.001 and
compare SQL-backed ones against DuckDB exactly the way the driver does
(row count + column names + order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_all_queries_have_callables(registry):
    queries, oracles = registry
    assert len(queries) >= 66
    assert set(oracles) <= set(queries)
    # every query hash-checks against DuckDB; a regression that
    # silently drops a query to rows-only should fail here
    assert len(oracles) >= 66


@pytest.mark.parametrize(
    "name",
    [
        "frontier_queue_depth", "doc_count_by_prefix", "doc_list_by_prefix",
        "peek_topk", "weighted_queue_order", "dedup_first_by_key",
        "upsert_latest", "etag_join", "anti_join_unseen", "metrics_rollup",
        "rate_limit_violations", "deadletter_requeue", "tpch_q1_pricing",
        "top_sources", "topk_orders_per_status", "events_sessionize",
        "text_token_stats", "lang_agg", "text_exact_dedup", "knn_cosine",
        "label_counts", "multimodal_payload_stats", "quality_scores",
        "embedding_near_dup", "langid_heuristic", "doc_fingerprints",
        "simhash_fingerprints", "ngram_jaccard_topk", "minhash_lsh_dupes",
        "knn_lsh", "knn_ivf", "knn_quantized", "embedding_near_dup_lsh",
        "asof_join_latest_order", "range_join_order_events",
        "window_hopping_counts", "pack_sequences", "dataset_split_hash",
        "decontaminate_overlap", "domain_mix_sample", "repetition_ratio",
        "near_dup_clusters", "cluster_aware_split",
        "term_doc_frequency", "doc_commonness", "importance_sample",
        "token_quantiles_by_lang", "quality_floor_filter",
        "tfidf_topk_terms", "dup_ngram_spans", "boilerplate_span_ratio",
        "dup_ngram_spans_sampled", "lang_confusion_matrix",
        "event_funnel_counts", "orders_trailing_window",
        "stratified_sample_topk", "bm25_search_topk",
        "kmv_distinct_users", "dedup_keep_best",
        "embedding_dup_clusters",
    ],
)
def test_query_matches_oracle(registry, con, name):
    queries, oracles = registry
    got = _normalize(_to_pandas(queries[name](SF_DIR)))
    want = _normalize(con.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_corpus_min_doc_length(registry):
    """The ngram_jaccard_topk oracle's substring trigram sets match the
    kernel's bijective codes only for docs of length >= 3 (shorter docs
    hash the whole text, which SQL cannot mirror) — guard the corpus
    assumption the oracle docstring states."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    assert min(len(x) for x in t.column("text").to_pylist()) >= 3


@pytest.mark.parametrize("name", ["crawl_reachability", "recrawl_incremental"])
def test_flagship_crawl_matches_recursive_cte_oracle(registry, con, name):
    """The flagship crawl's registered oracle strings bake in the
    driver's sf0.01 sidecar path; this mirrors the same comparison at
    sf0.001 through the per-sf SQL generator (the registered string IS
    generator(DRIVER_ORACLE_SF), asserted below)."""
    from raycrawl.pipelines.flagship import (
        _BFS_DEPTH_CAP,
        ensure_oracle_sidecars,
        flagship_oracle_sql,
        recrawl_oracle_sql,
    )

    queries, _ = registry
    ensure_oracle_sidecars(SF_DIR)
    gen = (
        flagship_oracle_sql if name == "crawl_reachability"
        else recrawl_oracle_sql
    )
    got = _normalize(_to_pandas(queries[name](SF_DIR)))
    want = _normalize(con.execute(gen(SF_DIR)).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    if name == "crawl_reachability":
        # the recursion cap must sit far above the graph's eccentricity
        assert got["depth"].max() < _BFS_DEPTH_CAP // 4


def test_registered_flagship_oracles_target_driver_sf(registry):
    from raycrawl.pipelines.flagship import (
        DRIVER_ORACLE_SF,
        flagship_oracle_sql,
        recrawl_oracle_sql,
    )

    _, oracles = registry
    assert oracles["crawl_reachability"] == flagship_oracle_sql(
        DRIVER_ORACLE_SF
    )
    assert oracles["recrawl_incremental"] == recrawl_oracle_sql(
        DRIVER_ORACLE_SF
    )


@pytest.mark.parametrize(
    "name",
    [
        "knn_lsh", "embedding_near_dup_lsh",
    ],
)
def test_rows_only_queries_run_and_are_deterministic(registry, name):
    queries, _ = registry
    a = _normalize(_to_pandas(queries[name](SF_DIR)))
    b = _normalize(_to_pandas(queries[name](SF_DIR)))
    pd.testing.assert_frame_equal(a, b)


def test_event_funnel_order_sensitivity(registry, tmp_path):
    """The driver testdata converts every signed-up user, so the
    funnel's ORDER logic (purchase must follow the first signup,
    strictly) is invisible to the sf-level hash check — pin it on an
    adversarial fixture, and assert the SQL twin agrees on the same
    file (oracle-pair validity on data the driver never shows it)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, 200, "signup"), (1, 100, "purchase"),  # buys BEFORE: no
        (2, 100, "signup"), (2, 200, "purchase"),  # converts
        (3, 100, "purchase"),                       # never signed up
        (4, 100, "signup"),                         # never bought
        (5, 100, "signup"), (5, 100, "purchase"),  # tie: strict >, no
        (6, 300, "signup"), (6, 150, "signup"),
        (6, 200, "purchase"),                       # min signup 150: yes
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    queries, oracles = registry
    got = _normalize(_to_pandas(queries["event_funnel_counts"](str(tmp_path))))
    by_stage = dict(zip(got["stage"], got["n_users"]))
    assert by_stage == {"signup": 5, "signup_then_purchase": 2}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = _normalize(con.execute(oracles["event_funnel_counts"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_quantile_rank_rule_matches_percentile_disc(registry, tmp_path):
    """The quantile operator mirrors percentile_disc as 'value at rank
    ceil(q*n) of the sorted multiset'. The driver corpus only shows a
    few (n, q) pairs — fuzz the rank rule against DuckDB itself on
    seeded random token-count multisets (adversarial n: primes, n=1,
    heavy ties)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    rows_lang, rows_text = [], []
    sizes = [1, 2, 3, 7, 13, 100, 101]
    for li, n in enumerate(sizes):
        counts = rng.integers(1, 6, size=n)  # heavy ties
        for c in counts:
            rows_lang.append(f"l{li}")
            rows_text.append(" ".join(["w"] * int(c)))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows_lang)), pa.int64()),
            "lang": pa.array(rows_lang, pa.string()),
            "text": pa.array(rows_text, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    queries, oracles = registry
    got = _normalize(
        _to_pandas(queries["token_quantiles_by_lang"](str(tmp_path)))
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = _normalize(con.execute(oracles["token_quantiles_by_lang"]).df())
    assert len(got) == len(sizes)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_trailing_window_frame_matches_bruteforce(registry, tmp_path):
    """The composite-key searchsorted frame kernel vs an O(n^2)
    reference AND the DuckDB RANGE twin, on seeded random data with
    same-day peers, multi-order days, and window-boundary day gaps
    (exactly 30 days apart = inside the frame)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n = 300
    cust = rng.integers(0, 12, size=n).astype(np.int64)
    day = rng.integers(0, 70, size=n).astype(np.int64)
    # force boundary cases: several exact 30-day gaps and peers
    day[:6] = [0, 30, 31, 5, 5, 35]
    cust[:6] = [99, 99, 99, 98, 98, 98]
    price = rng.uniform(1, 1000, size=n).round(2)
    t = pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(cust, pa.int64()),
            "o_orderstatus": pa.array(["O"] * n, pa.string()),
            "o_totalprice": pa.array(price, pa.float64()),
            "o_orderdate": pa.array(
                (day * 86_400_000_000).astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(["1"] * n, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))

    queries, oracles = registry
    got = _normalize(
        _to_pandas(queries["orders_trailing_window"](str(tmp_path)))
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    want = _normalize(con.execute(oracles["orders_trailing_window"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # independent O(n^2) reference for one spot-checked frame rule
    cents = np.floor(price * 100 + 0.5).astype(np.int64)
    ref_n = np.array(
        [
            int(
                (
                    (cust == cust[i])
                    & (day >= day[i] - 30)
                    & (day <= day[i])
                ).sum()
            )
            for i in range(n)
        ]
    )
    by_key = got.set_index("o_orderkey").sort_index()
    assert (by_key["window_n"].to_numpy() == ref_n).all()
    ref_c = np.array(
        [
            int(
                cents[
                    (cust == cust[i])
                    & (day >= day[i] - 30)
                    & (day <= day[i])
                ].sum()
            )
            for i in range(n)
        ]
    )
    assert (by_key["window_cents"].to_numpy() == ref_c).all()


def test_asof_join_tie_break_and_left_semantics(registry, tmp_path):
    """The sf data never produces a same-date order tie at the winning
    date nor an event with no qualifying order (measured: 0 of each),
    so the as-of join's tie-break (max o_orderkey) and LEFT semantics
    are invisible to the driver hash check — pin both, plus the
    at-or-before boundary and the cross-key cummax-leak guard, on an
    adversarial fixture; re-check the SQL twin on the same file."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def ts(v):
        return np.int64(v)

    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 5], pa.int64()),
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3, pa.string()),
            "o_totalprice": pa.array([1.0] * 3, pa.float64()),
            "o_orderdate": pa.array(
                np.array([100, 100, 50], "datetime64[us]")
            ),
            "o_orderpriority": pa.array(["1"] * 3, pa.string()),
        }
    )
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(np.array([100, 99, 40, 100], "datetime64[us]")),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["click"] * 4, pa.string()),
            "value": pa.array([0.0] * 4, pa.float64()),
            "props": pa.array([""] * 4, pa.string()),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(events, str(tmp_path / "events.parquet"))

    queries, oracles = registry
    got = _to_pandas(queries["asof_join_latest_order"](str(tmp_path)))
    by_eid = got.set_index("event_id").sort_index()
    # tie at the winning date (100): max o_orderkey (11) wins, and the
    # at-or-before boundary includes an order AT the event's own ts
    assert by_eid.loc[1, "asof_orderkey"] == 11
    # strictly-earlier date wins over nothing
    assert by_eid.loc[2, "asof_orderkey"] == 5
    # LEFT semantics: no qualifying order -> row kept with nulls
    assert pd.isna(by_eid.loc[3, "asof_orderkey"])
    # cross-key leak guard: user 2 must not inherit user 1's orders
    assert pd.isna(by_eid.loc[4, "asof_orderkey"])
    assert len(got) == 4

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = _normalize(con.execute(oracles["asof_join_latest_order"]).df())
    pd.testing.assert_frame_equal(
        _normalize(got), want, check_dtype=False
    )


def test_range_join_window_boundaries(registry, tmp_path):
    """The sf data never lands an event exactly on the range join's
    window bounds (measured: 0 at each) — pin the [inclusive,
    exclusive) semantics on a fixture: an event AT o_orderdate counts,
    an event AT o_orderdate + 7 days does not; twin re-checked on the
    same file."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    day_us = 86_400_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([7], pa.int64()),
            "o_orderstatus": pa.array(["O"], pa.string()),
            "o_totalprice": pa.array([1.0], pa.float64()),
            "o_orderdate": pa.array(
                np.array([100 * day_us], "datetime64[us]")
            ),
            "o_orderpriority": pa.array(["1"], pa.string()),
        }
    )
    ev_ts = [
        100 * day_us,          # exactly at lower bound: COUNTS
        103 * day_us,          # mid-window: counts
        107 * day_us - 1,      # last us of the window: counts
        107 * day_us,          # exactly at upper bound: does NOT
        99 * day_us,           # before the window: does not
    ]
    events = pa.table(
        {
            "event_id": pa.array(range(len(ev_ts)), pa.int64()),
            "ts": pa.array(np.array(ev_ts, "datetime64[us]")),
            "user_id": pa.array([7] * len(ev_ts), pa.int64()),
            "event_type": pa.array(["click"] * len(ev_ts), pa.string()),
            "value": pa.array([0.0] * len(ev_ts), pa.float64()),
            "props": pa.array([""] * len(ev_ts), pa.string()),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(events, str(tmp_path / "events.parquet"))

    queries, oracles = registry
    got = _to_pandas(queries["range_join_order_events"](str(tmp_path)))
    assert len(got) == 1
    assert int(got["n_events"].iloc[0]) == 3

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    want = _normalize(con.execute(oracles["range_join_order_events"]).df())
    pd.testing.assert_frame_equal(
        _normalize(got), want, check_dtype=False
    )


def test_sessionize_gap_boundary(registry, tmp_path):
    """The sf data has no exact 30-minute gap between consecutive
    same-user events (measured: 0), so the sessionizer's strict->
    rule is invisible to the hash check — pin it: a gap of exactly 30
    minutes stays in the SAME session, 30 minutes + 1 us starts a new
    one; twin re-checked on the same file."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    m30 = 30 * 60 * 1_000_000
    ev = [
        (1, 0),               # session 1 start
        (1, m30),             # exactly 30 min later: SAME session
        (1, 2 * m30 + 1),     # 30 min + 1 us after prev: NEW session
        (2, 0),               # single-event user: one session
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(ev)), pa.int64()),
            "ts": pa.array(
                np.array([x[1] for x in ev], "datetime64[us]")
            ),
            "user_id": pa.array([x[0] for x in ev], pa.int64()),
            "event_type": pa.array(["click"] * len(ev), pa.string()),
            "value": pa.array([0.0] * len(ev), pa.float64()),
            "props": pa.array([""] * len(ev), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    queries, oracles = registry
    got = _to_pandas(queries["events_sessionize"](str(tmp_path)))
    by_user = dict(zip(got["user_id"], got["n_sessions"]))
    assert by_user == {1: 2, 2: 1}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = _normalize(con.execute(oracles["events_sessionize"]).df())
    pd.testing.assert_frame_equal(
        _normalize(got), want, check_dtype=False
    )


def test_upsert_and_dedup_timestamp_tie_break(registry, tmp_path):
    """No two same-user events share a timestamp in the sf data
    (measured: 0 groups), so the ts-tie event_id tie-break of BOTH
    keep-first (dedup_first_by_key: min event_id) and last-write-wins
    (upsert_latest: max event_id) was invisible to the hash check —
    pin both on one fixture; twins re-checked on the same file."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = [  # (user, ts, event_id)
        (1, 100, 7), (1, 100, 3),   # tie at the FIRST ts: min id 3 wins first
        (1, 200, 5), (1, 200, 9),   # tie at the LAST ts: max id 9 wins last
        (2, 50, 1),                 # singleton
    ]
    t = pa.table(
        {
            "event_id": pa.array([x[2] for x in ev], pa.int64()),
            "ts": pa.array(np.array([x[1] for x in ev], "datetime64[us]")),
            "user_id": pa.array([x[0] for x in ev], pa.int64()),
            "event_type": pa.array(["click"] * len(ev), pa.string()),
            "value": pa.array([0.0] * len(ev), pa.float64()),
            "props": pa.array([""] * len(ev), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    queries, oracles = registry
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    first = _to_pandas(queries["dedup_first_by_key"](str(tmp_path)))
    by_user = dict(zip(first["user_id"], first["first_event_id"]))
    assert by_user == {1: 3, 2: 1}
    last = _to_pandas(queries["upsert_latest"](str(tmp_path)))
    by_user = dict(zip(last["user_id"], last["last_event_id"]))
    assert by_user == {1: 9, 2: 1}
    for name, got in (("dedup_first_by_key", first), ("upsert_latest", last)):
        want = _normalize(con.execute(oracles[name]).df())
        pd.testing.assert_frame_equal(
            _normalize(got), want, check_dtype=False
        )


def test_topk_per_group_price_tie_at_rank_boundary(registry, tmp_path):
    """No two same-status orders share a price in the sf data, so the
    o_orderkey tie-break at the rank-k boundary was invisible to the
    hash check — pin it: four orders tie at the top price and only
    the three smallest orderkeys survive; twin re-checked on the same
    file."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = pa.table(
        {
            "o_orderkey": pa.array([4, 2, 9, 1, 5], pa.int64()),
            "o_custkey": pa.array([1] * 5, pa.int64()),
            "o_orderstatus": pa.array(["O"] * 5, pa.string()),
            # four-way tie at 100.0 straddling the k=3 boundary
            "o_totalprice": pa.array(
                [100.0, 100.0, 100.0, 100.0, 50.0], pa.float64()
            ),
            "o_orderdate": pa.array(
                np.zeros(5, "datetime64[us]")
            ),
            "o_orderpriority": pa.array(["1"] * 5, pa.string()),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))

    queries, oracles = registry
    got = _to_pandas(queries["topk_orders_per_status"](str(tmp_path)))
    assert sorted(got["o_orderkey"].tolist()) == [1, 2, 4]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    want = _normalize(con.execute(oracles["topk_orders_per_status"]).df())
    pd.testing.assert_frame_equal(
        _normalize(got), want, check_dtype=False
    )


def test_queue_order_ts_tie_break(registry, tmp_path):
    """No two events share a timestamp in the sf data, so the
    event_id tie-break inside the priority orderings (peek_topk and
    weighted_queue_order) was invisible to the hash check — pin it on
    a fixture with same-ts events within and across weight classes;
    twins re-checked on the same file."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = [  # (event_id, ts, type) — error outranks click at any ts
        (9, 100, "click"),
        (2, 100, "click"),   # same (w, ts): id 2 before id 9
        (5, 100, "error"),   # higher weight wins despite same ts
        (7, 50, "error"),    # same weight: earlier ts first
    ]
    t = pa.table(
        {
            "event_id": pa.array([x[0] for x in ev], pa.int64()),
            "ts": pa.array(np.array([x[1] for x in ev], "datetime64[us]")),
            "user_id": pa.array([1] * len(ev), pa.int64()),
            "event_type": pa.array([x[2] for x in ev], pa.string()),
            "value": pa.array([0.0] * len(ev), pa.float64()),
            "props": pa.array([""] * len(ev), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    queries, oracles = registry
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    peek = _to_pandas(queries["peek_topk"](str(tmp_path)))
    assert peek["event_id"].tolist() == [7, 2, 5, 9]
    weighted = _to_pandas(queries["weighted_queue_order"](str(tmp_path)))
    assert weighted["event_id"].tolist() == [7, 5, 2, 9]
    for name, got in (("peek_topk", peek), ("weighted_queue_order", weighted)):
        want = _normalize(con.execute(oracles[name]).df())
        pd.testing.assert_frame_equal(
            _normalize(got), want, check_dtype=False
        )
