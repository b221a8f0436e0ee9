"""The epoch crawl loop: frontier scheduling → fetch/extract → dedup.

Rebuilds the reference crawler's processOne loop
(/root/reference/test/unit/processingTests.js:48-51 pins its observable
behavior: pop → fetch → visit → store → queue children → done/abandon)
as a batch-epoch pipeline (SURVEY §3.5):

    loop epoch e:
      take: weighted per-queue quotas from the shard actors
            (pop weights events 10 / immediate 3 / soon 2 / normal 3 /
             later 2 — reference lib/crawlerFactory.js:80)
      politeness: per-host allowance (rate × epoch window); overflow rows
            deferred with not_before = now + deferDelay
            (reference lib/crawlerFactory.js:74)
      fetch+visit+sink+route: ray.data.Dataset.map_batches actor pool
            (stages/fetch.py) — documents to Parquet, candidate links
            offered to the owning FrontierShard, only failures return
      retry ledger: failed rows re-queued to the 'immediate' queue with
            attempt_count+1 (reference _retryQueue,
            lib/crawlerFactory.js:678); attempts ≥ max → deadletter
            (reference routes/deadletters.js)
      lineage: every shard flushes its admitted rows per epoch
            (delta-store analogue, providers/storage/deltaStore.js)

The driver only ever holds frontier METADATA rows (≤ epoch_budget of
~150-byte url rows — the analogue of the reference's 100-message
prefetch credit, lib/crawlerFactory.js:79); page bodies live entirely
inside the distributed stage. Termination: all shards drained.

``mode='local'`` runs the identical kernels eagerly in-process (the
reference's InMemory crawler mode, lib/crawlerFactory.js:117-130) —
used for the single-loop golden-parity tests and for budget=1 runs
where per-epoch Dataset overhead would dominate.
"""

from __future__ import annotations

import json
import math
import os
from collections import deque
from dataclasses import dataclass, field
from glob import glob

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..corpus import BASE_TS_US
from ..functions.urlnorm import canonicalize_batch
from ..schemas import (
    DEADLETTER_SCHEMA,
    FRONTIER_SCHEMA,
    LINEAGE_SCHEMA,
    METRICS_SCHEMA,
    QUEUE_WEIGHTS,
    QUEUES,
)
from ..stages.fetch import (
    HOSTCOST_TYPE,
    SUMMARY_TYPE,
    CrawlWorkerStage,
    build_fetch_index,
    prepare_corpus,
)
from ..state.frontier import FrontierShardState, create_shards
from ..state.politeness import PolitenessPolicy


@dataclass
class CrawlConfig:
    state_dir: str
    num_shards: int = 4
    epoch_budget: int = 100_000
    max_epochs: int = 100_000
    max_attempts: int = 3
    retry_queue: str = "immediate"
    child_queue: str = "normal"
    host_rate_per_sec: float = 1e9   # politeness budget; tests lower it
    epoch_seconds: float = 1.0
    defer_delay_sec: float = 0.5
    seen_filter: str = "exact"       # 'exact' | 'bloom'
    # frontier spill: max in-memory pending rows PER SHARD; beyond it
    # the coldest (depth, discovery_ts) runs spill to Parquet under
    # state_dir/spill/ and reload as the frontier drains. None = no cap.
    pending_cap: int | None = None
    seen_capacity: int = 1_000_000   # per shard (bloom)
    seen_fpr: float = 1e-3
    mode: str = "ray"                # 'ray' | 'local'
    ray_exec: str = "actors"  # 'pull' (continuous) | 'actors' (epochs)
    fetch_concurrency: int = 8
    fetch_batch_size: int = 2048
    # pull-executor dispatch tier (BASELINE.md "dispatch ceiling" scale
    # path #2): 0 = the driver dispatches every chunk itself (measured
    # ceiling ~74 workers at 4096-url chunks); N > 0 groups the workers
    # under N NodeDispatcher actors (one per node on a real cluster)
    # and the driver dispatches LEASES of ~group_size chunks, cutting
    # its per-work-unit cost by the group factor.
    node_dispatchers: int = 0
    fetcher_cls: type | None = None  # X3 injection; None = TableFetcher
    attenuate: bool = True
    # M5 crawl-scope filter (reference orgList, lib/crawlerFactory.js:62,
    # 633-641): when non-empty, DISCOVERED links are dropped unless
    # their host matches an entry exactly or is a subdomain of one.
    # Seeds are exempt, matching the reference (orgList gates the
    # expansion, not the operator-provided seeds).
    scope_hosts: tuple[str, ...] = ()
    # T6 adaptive compute limiter (reference computeLimiter.js:27-77,
    # charged per fetch at lib/crawlerFactory.js:306-346): each host is
    # budgeted `compute_limit_ms` of fetch-duration OVERAGE (above the
    # rolling-min baseline) per `compute_window_sec` window; an
    # exhausted host is benched until window/4. The sandbox fetch is a
    # deterministic lookup, so duration is proxied as
    # body_bytes / compute_bytes_per_ms; a fetcher that measures real
    # wall time reports it via ``elapsed_ms(row)`` and its cost rows
    # then carry measured microseconds instead (the A7 contract,
    # pinned by test_real_latency_fetcher_feeds_compute_budget).
    # 0 = off.
    compute_limit_ms: float = 0.0
    compute_window_sec: float = 15.0
    compute_bytes_per_ms: float = 1000.0
    # T7/T8 robots half: ingest http://<host>/robots.txt pages from the
    # corpus at engine construction — Crawl-delay throttles the host's
    # politeness allowance, Disallow prefixes drop discovered links in
    # the candidate path (never fetched). Requires epoch mode when any
    # crawl-delay exists (exact politeness windows).
    respect_robots: bool = False
    # T7/T8 multi-identity fetch pool (reference tokenFactory.js:6-29,
    # limitedTokenFactory.js:19-51; caps at lib/crawlerFactory.js:68-69):
    # spec string "value#trait1,trait2;value2#..."; each worker gets its
    # own seeded pool (identity subsets are per-worker on a cluster).
    # token_traits maps request type -> ordered fallback trait sets.
    token_specs: str | None = None
    token_call_cap: int = 30
    token_call_window_sec: float = 1.0
    token_traits: dict = field(default_factory=dict)
    # pin worker i to core i (bench path): prevents OS migrations from
    # thrashing L1/L2 at high worker counts; driver/shards float on the
    # process affinity mask and settle on the remaining cores
    pin_workers: bool = False
    # reserve the first N cores for the driver + shard actors: workers
    # restrict their affinity to the remaining cores so frontier RPCs
    # are not starved by compute-bound workers. 0 = off.
    reserve_cores: int = 0
    # W3 fault tolerance: fetch workers restart up to this many times on
    # actor death (OOM, node loss) and their in-flight process_range
    # calls replay transparently (max_task_retries). Replay is
    # AT-LEAST-ONCE: a partially-completed batch may have flushed some
    # child offers (absorbed by the shards' insert-if-absent dedup) and
    # spooled some document rows (salted per-incarnation part names;
    # duplicates collapse in the last-wins `latest_documents`
    # compaction), so the crawled URL-seen SET is exact under failure —
    # only the docs/offered throughput counters can over-count by the
    # replayed fraction. Post-constructor worker state (live-config
    # deltas like set_track_host_cost) reverts to constructor values on
    # restart. 0 = fail fast (round-2 behavior).
    worker_max_restarts: int = 2
    # simulated-network corpus sharding (stages/corpus_shards.py):
    # number of url_hash-range shards (rounded up to a power of two);
    # 0 = auto (~1 shard per 512 MB of raw corpus). Only the default
    # ray path shards; local mode and injected fetchers keep the plain
    # (table, index) pair.
    corpus_shards: int = 0
    # max corpus shards a fetch worker keeps pinned at once (LRU);
    # None = unbounded (single node: every resolve is a zero-copy
    # plasma mmap, so "all shards" costs address space, not heap).
    # Set on a real cluster to bound per-node corpus footprint.
    corpus_max_resident: int | None = None
    # HARD corpus residency (the documented round-5 locality bound,
    # corpus_shards.py module docstring): route frontier rows by the
    # TOP bits of the u64 url-hash prefix — the corpus shards' range
    # function — instead of mod, and bind each frontier shard's
    # dispatch chunks to a fixed worker group. A worker then only ever
    # touches the corpus shards nested in its frontier range:
    # max(1, C/S) of them, for ANY corpus size, with zero cold-shard
    # re-pulls. Requires a power-of-two num_shards; pull executor
    # (affinity lives in its dispatch loop) without the dispatcher
    # tier (a tier lease fans chunks to any group member — per-NODE
    # residency under the tier needs one group per node, a placement
    # concern the sandbox cannot express). Changes worker visit order
    # (golden-order tests pin the default router), never the crawled
    # set.
    align_corpus_ranges: bool = False
    snapshot_id: str = "s0"
    base_ts_us: int = BASE_TS_US + 86_400_000_000  # crawl clock: corpus ts + 1d


@dataclass
class CrawlResult:
    state_dir: str
    epochs: int
    docs_written: int
    failed: int
    deadlettered: int
    seen_count: int
    seen_digest: str
    metrics: pa.Table

    @property
    def documents_dir(self) -> str:
        return os.path.join(self.state_dir, "documents")

    def documents_table(self) -> pa.Table:
        files = sorted(glob(os.path.join(self.documents_dir, "epoch=*", "*.parquet")))
        if not files:
            from ..schemas import DOCUMENT_SCHEMA

            return DOCUMENT_SCHEMA.empty_table()
        return pa.concat_tables(pq.read_table(f) for f in files)

    def documents_dataset(self):
        import ray.data

        return ray.data.read_parquet(self.documents_dir)

    def deadletters_table(self) -> pa.Table:
        files = sorted(glob(os.path.join(self.state_dir, "deadletters", "*.parquet")))
        if not files:
            return DEADLETTER_SCHEMA.empty_table()
        return pa.concat_tables(pq.read_table(f) for f in files)


def build_frontier_rows(
    specs: list[dict], *, base_ts: int, depth: int = 0
) -> pa.Table:
    """Seed specs ({url, type?, queue?, policy?, payload_etag?}) →
    canonicalized frontier rows (reference seeding:
    routes/requests.js:57-81 + lib/crawlerFactory.js:633-650)."""
    urls = [s["url"] for s in specs]
    norm, digests, hosts = canonicalize_batch(urls)
    n = len(specs)
    return pa.Table.from_arrays(
        [
            pa.array(norm, pa.string()),
            pa.array(digests, pa.binary(20)),
            pa.array(hosts, pa.string()),
            pa.array([s.get("type", "page") for s in specs], pa.string()),
            pa.array([s.get("policy", "default") for s in specs], pa.string()),
            pa.array([s.get("queue", "normal") for s in specs], pa.string()),
            pa.array(
                [int(s.get("depth", depth)) for s in specs], pa.int32()
            ),
            pa.array([base_ts + i for i in range(n)], pa.int64()),
            pa.array([0] * n, pa.int32()),
            pa.array([0] * n, pa.int64()),
            pa.array([s.get("parent_urn", "") for s in specs], pa.string()),
            pa.array([s.get("relation", "") for s in specs], pa.string()),
            pa.array([s.get("payload_etag", "") for s in specs], pa.string()),
            pa.array([s.get("payload_body", "") for s in specs], pa.string()),
        ],
        schema=FRONTIER_SCHEMA,
    )


def _route_holder(cfg: "CrawlConfig"):
    """Duck-typed ``self`` for ``CrawlWorkerStage._shard_split`` on the
    driver: carries the shard count AND the routing mode, so driver-side
    routing (seeds, retries, etag loads, resume replay) matches the
    workers' router bit-for-bit (single-owner invariant) under both the
    default mod router and align_corpus_ranges' range router."""
    bits = cfg.num_shards.bit_length() - 1
    return type(
        "S",
        (),
        {
            "num_shards": cfg.num_shards,
            "range_route": cfg.align_corpus_ranges,
            "_shard_bits": bits if cfg.align_corpus_ranges else 0,
        },
    )()


class NodeDispatcher:
    """Per-node dispatch tier for the pull executor (BASELINE.md
    "dispatch ceiling" scale path #2). The driver sends one LEASE — a
    list of (table_ref, offset, size) chunks — per RPC; this actor fans
    the chunks out to its node-local worker group and returns ONE
    merged result table, so the driver pays O(leases) instead of
    O(chunks). At the measured ~4 ms driver CPU per RPC and 8-16
    workers per group, the single-driver ceiling moves from ~74
    workers to the thousands.

    Concurrency model: created with max_concurrency > 1 so consecutive
    leases OVERLAP — each lease() call immediately queues its chunks
    onto the group's worker actors (Ray actors execute queued calls
    serially), so two in-flight leases reproduce the flat executor's
    per-worker double-buffer without dispatcher-side scheduling state.
    Chunks within a wave are uniform-sized, so rotating round-robin
    placement balances the group. On a real cluster, one dispatcher is
    scheduled per node (placement-group or node-affinity) so worker
    results never leave the node before merging; a dispatcher death is
    a node-sized failure domain handled the way node loss is —
    checkpoint recovery via resume_crawl.
    """

    def __init__(self, workers: list, pin_cpus: tuple = ()) -> None:
        if pin_cpus:
            # share the reserved cores with the shards/driver: an
            # unpinned dispatcher competes with the compute-bound
            # workers for timeslices and its lease hops eat scheduling
            # latency (same rationale as the workers' reserve_cores)
            try:
                os.sched_setaffinity(0, set(pin_cpus))
            except (AttributeError, OSError):  # pragma: no cover
                pass
        self.workers = workers
        # per-worker in-flight chunk counts, shared across the
        # concurrent lease() threads: min-outstanding placement keeps
        # the group balanced when leases overlap (blind round-robin
        # measured ~5% slower at 10M pages — two leases landing chunks
        # on the same worker while a sibling idles)
        import threading

        self._out = [0] * len(workers)
        self._lock = threading.Lock()

    def ping(self) -> bool:
        return True

    def lease(self, chunks: list, cycle: int, clock_us: int) -> pa.Table:
        import ray

        remaining: dict = {}
        for tref, off, size in chunks:
            with self._lock:
                w = min(
                    range(len(self.workers)), key=self._out.__getitem__
                )
                self._out[w] += 1
            ref = self.workers[w].process_range.remote(
                tref, off, size, cycle, clock_us
            )
            remaining[ref] = w
        tables = []
        while remaining:
            done, _ = ray.wait(
                list(remaining), num_returns=1, fetch_local=True
            )
            extra, _ = ray.wait(
                [r for r in remaining if r != done[0]],
                num_returns=len(remaining) - 1,
                timeout=0,
                fetch_local=True,
            )
            done += extra
            with self._lock:
                for r in done:
                    self._out[remaining.pop(r)] -= 1
            tables.extend(ray.get(done))
        return pa.concat_tables(tables)


class CrawlEngine:
    def __init__(self, corpus, cfg: CrawlConfig) -> None:
        """``corpus``: the simulated network — a pa.Table, or (ray
        default path only) a parquet path/dir/list so a corpus larger
        than driver memory never materializes anywhere whole."""
        self.cfg = cfg
        if cfg.align_corpus_ranges:
            if cfg.num_shards & (cfg.num_shards - 1):
                raise ValueError(
                    "align_corpus_ranges requires a power-of-two "
                    f"num_shards, got {cfg.num_shards}"
                )
            if cfg.node_dispatchers > 0:
                raise ValueError(
                    "align_corpus_ranges + dispatcher tier is not "
                    "supported: a lease fans chunks to any group "
                    "member (see CrawlConfig.align_corpus_ranges)"
                )
            if cfg.mode != "ray" or cfg.ray_exec != "pull":
                raise ValueError(
                    "align_corpus_ranges is a pull-executor feature "
                    "(the affinity lives in its dispatch loop); got "
                    f"mode={cfg.mode!r} ray_exec={cfg.ray_exec!r}"
                )
        os.makedirs(cfg.state_dir, exist_ok=True)
        self.docs_dir = os.path.join(cfg.state_dir, "documents")
        self.dead_dir = os.path.join(cfg.state_dir, "deadletters")
        os.makedirs(self.docs_dir, exist_ok=True)
        os.makedirs(self.dead_dir, exist_ok=True)
        # Default ray path: url_hash-range-SHARDED corpus (round-4
        # verdict item 1) — per-shard tables + indexes built by a
        # distributed task wave, resolved on demand by the workers; the
        # driver holds only ObjectRefs. The single-broadcast path
        # survives for mode='local' (one process, nothing to broadcast)
        # and for injected fetcher_cls (instrumented test fetchers take
        # a plain (table, index) — and a REAL injected fetcher is the
        # network itself, lib/crawlerFactory.js:240-262, needing no
        # corpus at all).
        sharded = cfg.mode == "ray" and cfg.fetcher_cls is None
        self.corpus_handle = None
        robots_rows = None
        index = None
        self._fetch_index = None
        if sharded:
            from ..stages.corpus_shards import build_sharded_corpus

            self.corpus = corpus if isinstance(corpus, pa.Table) else None
            self.corpus_handle, robots_rows = build_sharded_corpus(
                corpus,
                cfg.corpus_shards,
                max_resident=cfg.corpus_max_resident,
            )
        else:
            corpus = prepare_corpus(corpus)  # large_binary html, 1 chunk
            self.corpus = corpus
            index = build_fetch_index(corpus)
            # kept for crash recovery: resume_crawl distinguishes
            # corpus-backed suspect docs from payload-backed (event)
            # ones (the sharded path probes shard indexes instead —
            # corpus_membership())
            self._fetch_index = index
        self.politeness = PolitenessPolicy(
            host_rate_per_sec=cfg.host_rate_per_sec,
            epoch_seconds=cfg.epoch_seconds,
            defer_delay_sec=cfg.defer_delay_sec,
        )
        self.robots_rules: dict = {}
        if cfg.respect_robots:
            from ..state.politeness import parse_robots

            if robots_rows is None:
                mask = pc.ends_with(corpus.column("url"), "/robots.txt")
                robots_rows = corpus.filter(mask)
            rows = robots_rows
            for url, body in zip(
                rows.column("url").to_pylist(),
                rows.column("html").to_pylist(),
            ):
                host = url.split("://", 1)[1].split("/", 1)[0].lower()
                rules = parse_robots(body.decode("utf-8", "replace"))
                self.politeness.robots[host] = rules
                if rules.rules:  # Allow/Disallow rules, RFC 9309 match
                    self.robots_rules[host] = rules
        self.compute_budget = None
        self._benched_hosts: dict[str, int] = {}  # host -> bench_until_us
        if cfg.compute_limit_ms > 0:
            from ..state.politeness import ComputeBudget

            self.compute_budget = ComputeBudget(
                limit_ms=cfg.compute_limit_ms,
                window_sec=cfg.compute_window_sec,
            )
        # T11/X5 live config: subsystem option dicts with change hooks;
        # patches queue via patch_config() and land at the next epoch
        # boundary (_apply_config_patches in run()).
        from ..state.liveconfig import RefreshingConfig

        self._live = {
            "crawler": RefreshingConfig(
                {
                    "host_rate_per_sec": cfg.host_rate_per_sec,
                    "defer_delay_sec": cfg.defer_delay_sec,
                    "epoch_budget": cfg.epoch_budget,
                }
            ),
            "fetcher": RefreshingConfig(
                {
                    "concurrency": cfg.fetch_concurrency,
                    "compute_limit_ms": cfg.compute_limit_ms,
                }
            ),
        }
        self._live["crawler"].on_change(self._on_crawler_change)
        self._live["fetcher"].on_change(self._on_fetcher_change)
        # keys the change hooks read unconditionally — a PATCH removing
        # one would crash the hook mid-crawl, so patch_config rejects it
        # up front (the reference rejects bad PATCHes at the route and
        # the crawl continues, routes/config.js)
        self._baseline_keys = {
            sub: frozenset(c.values) for sub, c in self._live.items()
        }
        self._exec_active: str | None = None
        self._pending_patches: list[dict] = []
        self._epoch_callbacks: list = []
        self._cached_counts = None  # per-epoch counts piggybacked on flush
        self._route_refs: list = []     # pull mode: in-flight requeue RPCs
        self._dead_tables: list[pa.Table] = []  # pull mode: deadletter buffer
        self._metrics_rows: list[dict] = []
        # lifecycle event log: append to any prior engine's trace on
        # this state_dir (resume/recrawl post-mortems see the events of
        # the run that died, like the reference's persistent insights)
        self._trace_rows: list[dict] = []
        trace_path = os.path.join(cfg.state_dir, "trace.parquet")
        if os.path.exists(trace_path):
            self._trace_rows = pq.read_table(trace_path).to_pylist()
        # (name, wall second) -> count; see _absorb_persec
        self._persec: dict[tuple[str, int], int] = {}
        self._lineage_rows: list[dict] = []
        self._docs_written = 0
        self._failed = 0
        self._dead = 0

        if cfg.mode == "ray":
            import ray

            if self.corpus_handle is not None:
                # sharded path: workers receive the handle (refs only)
                # and resolve shards lazily inside the fetcher
                self.corpus_ref = self.corpus_handle
                self.index_ref = None
            else:
                # injected-fetcher path: prepared ONCE above so
                # per-actor fetcher wrapping is zero-copy instead of a
                # per-actor concatenation/cast
                self.corpus_ref = ray.put(corpus)
                self.index_ref = ray.put(index)
            self.shards = create_shards(
                cfg.num_shards,
                seen_kind=cfg.seen_filter,
                seen_capacity=cfg.seen_capacity,
                seen_fpr=cfg.seen_fpr,
                state_dir=cfg.state_dir,
                snapshot_id=cfg.snapshot_id,
                pending_cap=cfg.pending_cap,
            )
            self.workers = []
            if cfg.ray_exec in ("actors", "pull"):
                # never request more CPU-reserving actors than the
                # cluster has — a pool larger than the CPU count leaves
                # actors pending forever and the epoch barrier deadlocks
                total_cpus = int(ray.cluster_resources().get("CPU", 1))
                self._total_cpus = total_cpus
                n_workers = max(1, min(cfg.fetch_concurrency, total_cpus))
                self.workers = [
                    self._spawn_worker(wi) for wi in range(n_workers)
                ]
                # Block until every shard and worker has finished its
                # __init__ (workers resolve the corpus ref there).
                # Spawning 30+ actor processes costs seconds of
                # interpreter startup; paying it at construction keeps
                # cold-start out of the crawl itself — on a real
                # cluster this is pool provisioning, like ray.init.
                ray.get(
                    [s.counts.remote() for s in self.shards]
                    + [w.ping.remote() for w in self.workers]
                )
                # incarnation baseline for the checked offer drain
                self._worker_pids = dict(
                    enumerate(
                        ray.get([w.pid.remote() for w in self.workers])
                    )
                )
        else:
            self.shards = [
                FrontierShardState(
                    i,
                    cfg.num_shards,
                    seen_kind=cfg.seen_filter,
                    seen_capacity=cfg.seen_capacity,
                    seen_fpr=cfg.seen_fpr,
                    state_dir=cfg.state_dir,
                    snapshot_id=cfg.snapshot_id,
                    pending_cap=cfg.pending_cap,
                )
                for i in range(cfg.num_shards)
            ]
            self._local_worker = CrawlWorkerStage(
                corpus,
                index,
                self.shards,
                docs_dir=self.docs_dir,
                child_queue=cfg.child_queue,
                attenuate=cfg.attenuate,
                max_attempts=cfg.max_attempts,
                retry_queue=cfg.retry_queue,
                dead_dir=self.dead_dir,
                fetcher_cls=cfg.fetcher_cls,
                scope_hosts=cfg.scope_hosts,
                robots_rules=self.robots_rules,
                track_host_cost=cfg.compute_limit_ms > 0,
                range_route=cfg.align_corpus_ranges,
                token_specs=cfg.token_specs,
                token_call_cap=cfg.token_call_cap,
                token_call_window_sec=cfg.token_call_window_sec,
                token_traits=cfg.token_traits,
            )
        self._trace(
            "engine_start",
            mode=cfg.mode,
            ray_exec=cfg.ray_exec if cfg.mode == "ray" else "",
            num_shards=cfg.num_shards,
            workers=len(getattr(self, "workers", []) or []),
            corpus_shards=(
                self.corpus_handle.num_shards if self.corpus_handle else 0
            ),
            snapshot_id=cfg.snapshot_id,
        )

    def _trace(self, event: str, **detail) -> None:
        """Trace-level lifecycle event (reference mockInsights
        trackTrace/trackEvent, providers/logger/mockInsights.js:20-60):
        buffered on the driver, persisted to state_dir/trace.parquet
        with every metrics flush and at abort time — so a post-mortem
        of a dead crawl sees the events leading up to the failure."""
        import json as _json
        import time as _time

        self._trace_rows.append(
            {
                "ts_us": _time.time_ns() // 1_000,
                "event": event,
                "detail": _json.dumps(detail, sort_keys=True, default=str),
            }
        )

    def _write_trace(self) -> None:
        from ..schemas import TRACE_SCHEMA

        rows = self._trace_rows
        table = (
            pa.Table.from_pylist(rows, schema=TRACE_SCHEMA)
            if rows
            else TRACE_SCHEMA.empty_table()
        )
        tmp = os.path.join(self.cfg.state_dir, ".trace.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.cfg.state_dir, "trace.parquet"))

    def _spawn_worker(self, wi: int):
        """One fetch-worker actor (ray mode). Factored out so the live
        config's pool-resize (the AMQP credit-resize analogue,
        amqp10Queue.js:303-310) can grow the pool mid-crawl."""
        import ray

        cfg = self.cfg
        pin = wi if cfg.pin_workers else None
        if pin is None and cfg.reserve_cores > 0:
            total = getattr(self, "_total_cpus", None) or int(
                ray.cluster_resources().get("CPU", 1)
            )
            if total > cfg.reserve_cores + 1:
                pin = tuple(range(cfg.reserve_cores, total))
        worker_cls = ray.remote(
            num_cpus=1,
            max_restarts=cfg.worker_max_restarts,
            # retry an in-flight call once per allowed restart — bounded
            # by max_restarts, so a poison batch cannot loop forever
            max_task_retries=(-1 if cfg.worker_max_restarts else 0),
        )(CrawlWorkerStage)
        return worker_cls.remote(
            self.corpus_ref,
            self.index_ref,
            self.shards,
            docs_dir=self.docs_dir,
            child_queue=cfg.child_queue,
            attenuate=cfg.attenuate,
            blocking_offers=False,
            flush_each_batch=(cfg.ray_exec == "pull"),
            max_attempts=cfg.max_attempts,
            retry_queue=cfg.retry_queue,
            dead_dir=self.dead_dir,
            fetcher_cls=cfg.fetcher_cls,
            scope_hosts=cfg.scope_hosts,
            robots_rules=self.robots_rules,
            track_host_cost=cfg.compute_limit_ms > 0,
            range_route=cfg.align_corpus_ranges,
            pin_cpu=pin,
            token_specs=cfg.token_specs,
            token_call_cap=cfg.token_call_cap,
            token_call_window_sec=cfg.token_call_window_sec,
            token_traits=cfg.token_traits,
            token_seed=wi,
        )

    def corpus_membership(self, digests: list[bytes]) -> np.ndarray:
        """Found-mask: is each url-hash digest fetchable from the
        corpus? Crash recovery's suspect-doc classification. Sharded
        path: per-shard INDEX probes (bodies never move); legacy paths:
        the driver-held whole-corpus index."""
        if self.corpus_handle is not None:
            return self.corpus_handle.membership(digests)
        from ..stages.fetch import index_lookup

        return index_lookup(self._fetch_index, digests)[0]

    def close(self) -> None:
        """Tear down the actor pools deterministically. Two live ray
        engines deadlock on CPU slots (the second's blocking warm-up in
        ``__init__`` waits for workers the first still holds), so
        benchmarks/scripts that build engines in a loop MUST close the
        previous engine (or let it go fully out of scope) first."""
        if self.cfg.mode != "ray":
            return
        import ray

        for a in (
            list(getattr(self, "workers", []))
            + list(self.shards)
            + list(getattr(self, "_tiers", []))
        ):
            try:
                ray.kill(a, no_restart=True)
            except Exception:
                pass
        self.workers = []
        self.shards = []
        self._tiers = []

    # -- live config (T11/X5; reference routes/config.js:12-50) ------------

    def patch_config(self, patches) -> None:
        """Queue a config PATCH; it lands at the NEXT epoch (or pull
        cycle) boundary so every cycle runs under one consistent
        snapshot. Accepts the reference's flat op list (``[{"op",
        "path", "value"}]``, paths like ``/crawler/host_rate_per_sec``)
        or a convenience dict ``{"crawler": {"host_rate_per_sec": 50}}``.

        Validation is EAGER (the reference rejects an invalid PATCH at
        the route while the crawl continues, routes/config.js): unknown
        subsystems, unsupported ops, malformed paths, and removal of
        hook-read baseline keys raise HERE, so _apply_config_patches —
        which runs mid-crawl — is infallible and a bad request can
        never abort a running crawl or drop sibling patches."""
        if isinstance(patches, dict):
            patches = [
                {"op": "replace", "path": f"/{sub}/{key}", "value": v}
                for sub, vals in patches.items()
                for key, v in vals.items()
            ]
        from ..state.liveconfig import collect_patches

        try:
            grouped = collect_patches(patches)
        except (KeyError, IndexError, TypeError) as exc:
            raise ValueError(f"malformed config patch: {exc!r}") from exc
        for sub, ops in grouped.items():
            if sub not in self._live:
                raise ValueError(f"unknown config subsystem: {sub!r}")
            for op_ in ops:
                op = op_.get("op", "replace")
                if op not in ("add", "replace", "remove"):
                    raise ValueError(f"unsupported patch op: {op!r}")
                key = op_["path"].lstrip("/")
                if not key:
                    raise ValueError(
                        f"patch path names no key in {sub!r}"
                    )
                if op == "remove" and key in self._baseline_keys[sub]:
                    raise ValueError(
                        f"cannot remove baseline config key "
                        f"{sub}/{key} (change hooks depend on it)"
                    )
        self._pending_patches.extend(patches)

    def on_epoch(self, callback) -> None:
        """Register a per-epoch hook ``cb(engine, epoch, stats)`` —
        the monitoring/ops surface tests and dashboards use (the
        reference's change-listener analogue)."""
        self._epoch_callbacks.append(callback)

    def config_snapshot(self) -> dict:
        """GET /config analogue (routes/config.js:20-28)."""
        return {sub: dict(c.values) for sub, c in self._live.items()}

    def _apply_config_patches(self) -> bool:
        """Apply queued patches; returns True when any landed (the pull
        executor re-syncs its shard-side politeness gate on change)."""
        if not self._pending_patches:
            return False
        from ..state.liveconfig import collect_patches

        grouped = collect_patches(self._pending_patches)
        self._pending_patches = []
        for sub, ops in grouped.items():
            if sub not in self._live:
                raise ValueError(f"unknown config subsystem: {sub!r}")
            self._live[sub].apply(ops)
        self._trace("config_patch", subsystems=sorted(grouped))
        return True

    def _sync_pull_politeness(self) -> None:
        """Push the current politeness window config to the frontier
        shards — the pull executor's gate runs inside each shard's
        take() (FrontierShardState.configure_politeness). One pull
        cycle == one logical window (start_refill advances clock_us by
        epoch_us per cycle) and one cycle takes at most
        fetch_batch_size x 4 x pool rows (the refill `want` cap), so an
        allowance at or above that cap can never defer a row: the
        unbounded headline config pushes allowance=None and the shards
        keep their gate-free take fast path."""
        import ray

        pol = self.politeness
        epoch_us = int(self.cfg.epoch_seconds * 1e6)
        cap = self.cfg.fetch_batch_size * 4 * max(1, len(self.workers))
        base = max(1, int(pol.host_rate_per_sec * pol.epoch_seconds))
        overrides = {
            h: pol.allowance(h)
            for h, r in pol.robots.items()
            if r.crawl_delay
        }
        bounded = base < cap or any(v < cap for v in overrides.values())
        ray.get(
            [
                s.configure_politeness.remote(
                    epoch_us=epoch_us,
                    allowance=base if bounded else None,
                    overrides=overrides if bounded else None,
                )
                for s in self.shards
            ]
        )

    def load_etag_index(self, docs: pa.Table) -> None:
        """Install a prior run's (url_hash, etag) map for conditional
        fetches (incremental re-crawl): hash-split once by the workers'
        shard router, one RPC per shard — each shard holds only its
        slice (docs/num_shards rows), exactly how a multi-node cluster
        would hold a 10^10-doc etag store. Shards stamp payload_etag on
        admitted rows; the fetch stage 304s unchanged bodies."""
        splitter = CrawlWorkerStage._shard_split
        holder = _route_holder(self.cfg)
        refs = []
        for sid, sub in splitter(holder, docs):
            hashes = sub.column("url_hash").to_pylist()
            etags = sub.column("etag").to_pylist()
            if self.cfg.mode == "ray":
                refs.append(
                    self.shards[sid].load_etag_index.remote(hashes, etags)
                )
            else:
                self.shards[sid].load_etag_index(hashes, etags)
        if refs:
            import ray

            ray.get(refs)

    def _set_worker_host_cost(self, on: bool) -> None:
        if self.cfg.mode == "ray":
            import ray

            ray.get(
                [w.set_track_host_cost.remote(on) for w in self.workers]
            )
        elif hasattr(self, "_local_worker"):
            self._local_worker.set_track_host_cost(on)

    def _on_crawler_change(self, patches: list[dict]) -> None:
        vals = self._live["crawler"].values
        self.politeness.host_rate_per_sec = float(
            vals["host_rate_per_sec"]
        )
        self.politeness.defer_delay_sec = float(vals["defer_delay_sec"])
        self.cfg.epoch_budget = int(vals["epoch_budget"])

    def _on_fetcher_change(self, patches: list[dict]) -> None:
        vals = self._live["fetcher"].values
        limit = float(vals["compute_limit_ms"])
        if limit > 0:
            from ..state.politeness import ComputeBudget

            if self.compute_budget is None:
                self.compute_budget = ComputeBudget(
                    limit_ms=limit, window_sec=self.cfg.compute_window_sec
                )
                self._set_worker_host_cost(True)
            else:
                self.compute_budget.limit_ms = limit
        elif self.compute_budget is not None:
            self.compute_budget = None
            self._set_worker_host_cost(False)
        # pool resize (credit-resize analogue, amqp10Queue.js:303-310):
        # grow by spawning actors, shrink by killing the tail. Epoch
        # mode only — the pull executor sizes its dispatch state once.
        want = int(vals["concurrency"])
        if self.cfg.mode == "ray" and self.cfg.ray_exec == "actors":
            import ray

            total_cpus = int(ray.cluster_resources().get("CPU", 1))
            want = max(1, min(want, total_cpus))
            have = len(self.workers)
            if want > have:
                new = [self._spawn_worker(wi) for wi in range(have, want)]
                ray.get([w.ping.remote() for w in new])
                pids = getattr(self, "_worker_pids", {})
                for wi, p in zip(
                    range(have, want),
                    ray.get([w.pid.remote() for w in new]),
                ):
                    pids[wi] = p
                self._worker_pids = pids
                self.workers.extend(new)
            elif want < have:
                for w in self.workers[want:]:
                    ray.kill(w, no_restart=True)
                del self.workers[want:]
                pids = getattr(self, "_worker_pids", {})
                for wi in list(pids):
                    if wi >= want:
                        del pids[wi]

    # -- shard RPC helpers (transparent local/ray) -------------------------

    def _call(self, method: str, *args):
        if self.cfg.mode == "ray":
            import ray

            return ray.get(
                [getattr(s, method).remote(*args) for s in self.shards]
            )
        return [getattr(s, method)(*args) for s in self.shards]

    def _route(self, rows: pa.Table, method: str) -> int:
        """Driver-side routing for small row sets (seeds, retries,
        deferrals); bulk candidate routing happens inside the
        distributed stage. Uses the same vectorized splitter as the
        workers (single-owner invariant)."""
        if rows.num_rows == 0:
            return 0
        splitter = CrawlWorkerStage._shard_split
        holder = _route_holder(self.cfg)
        parts = list(splitter(holder, rows))
        if self.cfg.mode == "ray":
            import ray

            return sum(
                ray.get(
                    [
                        getattr(self.shards[sid], method).remote(sub)
                        for sid, sub in parts
                    ]
                )
            )
        return sum(
            getattr(self.shards[sid], method)(sub) for sid, sub in parts
        )

    # -- seeding -----------------------------------------------------------

    def seed(self, specs: list[dict]) -> int:
        rows = build_frontier_rows(specs, base_ts=self.cfg.base_ts_us)
        return self._route(rows, "offer")

    def _seed_parallel(self, specs: list[dict]) -> int:
        """Seed via the worker pool when the list is large and uniform:
        each worker canonicalizes + offers one chunk (seed_chunk),
        preserving global discovery_ts order via per-chunk offsets.
        Falls back to the driver-side seed() for small or mixed lists.
        Cuts the driver's sequential canonicalize+route constant (~2-4 s
        at 80k seeds) to one parallel wave."""
        uniform = (
            len(specs) >= 4096
            and self.workers
            and all(
                s.get("type", "page") == "page"
                and s.get("policy", "default") == "default"
                and s.get("queue", "normal") == "normal"
                and not s.get("payload_etag")
                and not s.get("parent_urn")
                for s in specs
            )
        )
        if not uniform:
            return self.seed(specs)
        import ray

        urls = [s["url"] for s in specs]
        n = len(urls)
        w = len(self.workers)
        chunk = math.ceil(n / w)
        refs = [
            self.workers[i].seed_chunk.remote(
                urls[i * chunk : (i + 1) * chunk],
                self.cfg.base_ts_us + i * chunk,
            )
            for i in range(w)
            if i * chunk < n
        ]
        # fire-and-forget: the crawl loop starts immediately and picks
        # up seeds as their offers land in the shards (the first refill
        # polls counts anyway). Blocking here was a measured ~5 s
        # constant at 60k seeds — identical at every cluster size,
        # exactly the Amdahl term the scaling bar punishes. The refs
        # are settled with the other in-flight routing RPCs.
        self._route_refs.extend(refs)
        return -1

    # -- scheduling --------------------------------------------------------

    def _quotas(
        self, shard_counts: list[dict[str, int]], budget: int | None = None
    ):
        """Weighted split of the epoch budget across queue classes
        (reference QueueSet pop weights, lib/crawlerFactory.js:80),
        then proportional split across shards."""
        totals = {q: sum(c.get(q, 0) for c in shard_counts) for q in QUEUES}
        active = [q for q in QUEUES if totals[q] > 0]
        if not active:
            return None, 0
        if budget is None:
            budget = self.cfg.epoch_budget
        wsum = sum(QUEUE_WEIGHTS[q] for q in active)
        quota: dict[str, int] = {}
        for q in active:
            quota[q] = min(
                totals[q], math.ceil(budget * QUEUE_WEIGHTS[q] / wsum)
            )
        # redistribute leftover budget in priority order (events first)
        leftover = budget - sum(quota.values())
        for q in active:
            if leftover <= 0:
                break
            extra = min(leftover, totals[q] - quota[q])
            quota[q] += extra
            leftover -= extra
        # per-shard proportional quotas
        per_shard = []
        for c in shard_counts:
            sq = {}
            for q in active:
                if totals[q] == 0 or quota[q] == 0:
                    continue
                share = math.ceil(quota[q] * c.get(q, 0) / totals[q])
                if share > 0:
                    sq[q] = share
            per_shard.append(sq)
        return per_shard, sum(totals.values())

    # -- epoch body --------------------------------------------------------

    def _process(self, epoch_table: pa.Table, epoch: int, now_us: int) -> pa.Table:
        # Chunk small enough that the pool load-balances (visit cost per
        # chunk varies with page size / out-degree — static round-robin
        # of batch_size chunks measured ~50% worker utilization at 32
        # CPUs), large enough that per-chunk dispatch overhead stays
        # negligible.
        n = epoch_table.num_rows
        pool = max(1, len(getattr(self, "workers", [])) or self.cfg.fetch_concurrency)
        if self.cfg.mode == "local":
            chunk = self.cfg.fetch_batch_size
            self._local_worker.set_epoch(epoch, now_us)
            return pa.concat_tables(
                self._local_worker(epoch_table.slice(off, chunk))
                for off in range(0, n, chunk)
            )
        import ray

        if self.workers:
            # Persistent actor pool (see CrawlWorkerStage.process) with
            # dynamic dispatch: fixed chunk size of ~n/(pool*4) (guided
            # decreasing chunks were measured WORSE — tiny tail chunks
            # inflate per-chunk kernel overhead 50%), two chunks in
            # flight per worker (double buffer), refill whichever
            # worker finishes first; a worker whose last chunk
            # completes starts draining its buffered frontier offers
            # immediately, overlapping shard-side dedup with the rest
            # of the pool's compute.
            chunk_size = max(
                256,
                min(self.cfg.fetch_batch_size, math.ceil(n / (pool * 4))),
            )
            epoch_ref = ray.put(epoch_table.combine_chunks())
            pos = 0
            inflight: dict = {}  # result ObjectRef -> worker index
            outstanding = [0] * len(self.workers)
            results: list = []
            drain_refs: list = []
            ranges: dict[int, list] = {}  # widx -> [(off, size)] ack window

            def dispatch(widx: int) -> bool:
                nonlocal pos
                if pos >= n:
                    return False
                ref = self.workers[widx].process_range.remote(
                    epoch_ref, pos, chunk_size, epoch, now_us
                )
                ranges.setdefault(widx, []).append((pos, chunk_size))
                pos += chunk_size
                inflight[ref] = widx
                outstanding[widx] += 1
                return True

            for widx in range(len(self.workers)):
                for _ in range(3):
                    dispatch(widx)
            while inflight:
                done, _ = ray.wait(
                    list(inflight), num_returns=1, fetch_local=True
                )
                widx = inflight.pop(done[0])
                outstanding[widx] -= 1
                results.append(done[0])
                if not dispatch(widx) and outstanding[widx] == 0:
                    drain_refs.append(
                        (widx, self.workers[widx].drain_info.remote())
                    )
            self._drain_refs = drain_refs
            # held for the checked drain at the epoch barrier: a pid
            # change between acks means this window's fire-and-forget
            # offers may have died with the old incarnation and must
            # replay (side-effect-only)
            self._epoch_ack = (epoch_ref, ranges, epoch, now_us)
            return pa.concat_tables(ray.get(results))
        # NOTE: an earlier ray_exec='dataset' branch ran this stage via
        # ray.data.from_arrow(chunks).map_batches(CrawlWorkerStage, ...)
        # per epoch. Removed deliberately: (a) Ray Data's schema peek
        # executes a limit-1 prefix of the plan, so the SIDE-EFFECTING
        # stage (offers, retries, deadletter writes) ran twice per
        # epoch — measured as 4x-inflated deadletters; (b) the actor
        # pool is torn down at the end of every Dataset execution and
        # the crawl is iterative. Dataset/map_batches remains the
        # substrate for every non-iterative pipeline in
        # pipelines/analytics.py + textops.py — the crawl's inner loop
        # is exactly the "shared mutable state" case where raw actors
        # are the documented escape hatch.
        # RE-VALIDATED on ray 2.49.2 (probe, 2026-08-17): (a) schema()
        # on a map_batches plan re-executes the stage — a 1000-row
        # side-effecting stage saw 2000 rows under schema()+take_all
        # (take_all alone saw 1000); (b) a concurrency=2 callable-class
        # pool logged 2 __init__ calls on the first execution and a 3rd
        # on re-execution of the same Dataset — pools do not persist.
        # Both reasons for the escape hatch still hold on this release.
        raise ValueError(f"unknown ray_exec mode: {self.cfg.ray_exec!r}")

    def _charge_host_costs(
        self, result: pa.Table, now_us: int
    ) -> tuple[pa.Table, bool]:
        """Split HOSTCOST rows out of a worker result table and charge
        them to the compute budget (T6) — the ONE decode of the cost-row
        unit flag, shared by both executors so they can never charge
        different budgets for the same crawl: unit 1 = fetcher-measured
        microseconds (A7 real-latency contract), 0 = body bytes via the
        proxy rate. Returns (result minus cost rows, whether any host's
        bench_until changed)."""
        hostcost = result.filter(
            pc.equal(result.column("type"), HOSTCOST_TYPE)
        )
        if not hostcost.num_rows:
            return result, False
        result = result.filter(
            pc.not_equal(result.column("type"), HOSTCOST_TYPE)
        )
        changed = False
        for h, v, unit in zip(
            hostcost.column("url_host").to_pylist(),
            hostcost.column("discovery_ts").to_pylist(),
            hostcost.column("attempt_count").to_pylist(),
        ):
            ms = (
                v / 1000.0
                if unit == 1
                else v / self.cfg.compute_bytes_per_ms
            )
            until = self.compute_budget.consume(h, ms, now_us)
            if until is not None and self._benched_hosts.get(h) != until:
                self._benched_hosts[h] = until
                changed = True
        return result, changed

    def _epoch(self, epoch: int, now_us: int) -> dict:
        import time as _time

        _dbg = os.environ.get("RAYCRAWL_TIMING")
        _t0 = _time.perf_counter()
        counts = self._cached_counts
        if counts is None:
            counts = self._call("counts")
        self._cached_counts = None
        per_shard, pending = self._quotas(counts)
        stats = {"pending": pending, "taken": 0, "deferred": 0, "docs": 0,
                 "offered": 0, "admitted": 0, "failed": 0, "unchanged": 0,
                 "deadlettered": 0}
        if pending == 0:
            return stats
        _t1 = _time.perf_counter()
        takes = self._call_take(per_shard, now_us)
        _t2 = _time.perf_counter()
        taken = [t for t in takes if t.num_rows]
        if not taken:
            return stats  # everything deferred; caller advances the clock
        epoch_table = pa.concat_tables(taken)
        # priority sort matters when the epoch is budget-limited (which
        # rows go first) or politeness may defer (who wins the host
        # allowance); when the whole frontier fits and allowances are
        # effectively unlimited, skip the O(n log n) driver sort
        politeness_active = (
            self.politeness.host_rate_per_sec * self.politeness.epoch_seconds
            < epoch_table.num_rows
        )
        if epoch_table.num_rows < pending or politeness_active:
            order = pc.sort_indices(
                epoch_table,
                sort_keys=[
                    ("depth", "ascending"),
                    ("discovery_ts", "ascending"),
                    ("url", "ascending"),
                ],
            )
            epoch_table = epoch_table.take(order)
        stats["taken"] = epoch_table.num_rows

        # T6 compute-limiter bench: rows of a host whose budget was
        # exhausted last epoch defer until its bench_until timestamp
        # (reference exhaust(resetTime), computeLimiter.js:63-66).
        if self._benched_hosts:
            self._benched_hosts = {
                h: u for h, u in self._benched_hosts.items() if u > now_us
            }
        if self._benched_hosts:
            hosts_l = epoch_table.column("url_host").to_pylist()
            bmask = np.array(
                [h in self._benched_hosts for h in hosts_l], dtype=bool
            )
            if bmask.any():
                benched = epoch_table.filter(pa.array(bmask))
                nb = pa.array(
                    [
                        self._benched_hosts[h]
                        for h, m in zip(hosts_l, bmask)
                        if m
                    ],
                    pa.int64(),
                )
                benched = benched.set_column(
                    FRONTIER_SCHEMA.names.index("not_before"),
                    "not_before",
                    nb,
                )
                self._route(benched, "requeue")
                stats["deferred"] += benched.num_rows
                epoch_table = epoch_table.filter(pa.array(~bmask))
                if epoch_table.num_rows == 0:
                    return stats

        # politeness gate: at most rate × window rows per host per epoch.
        # Fast path: when no robots rule throttles a host and the global
        # allowance exceeds the epoch size, no host CAN be deferred —
        # skip the per-host ordinal computation entirely.
        gate_unbounded = (
            not self.politeness.robots
            and self.politeness.host_rate_per_sec
            * self.politeness.epoch_seconds
            >= epoch_table.num_rows
        )
        if gate_unbounded:
            admit = np.ones(epoch_table.num_rows, dtype=bool)
        else:
            hosts = np.asarray(
                epoch_table.column("url_host").to_pylist(), dtype=object
            )
            admit = self.politeness.admit_mask(hosts)
        if not admit.all():
            deferred = epoch_table.filter(pa.array(~admit))
            nb = now_us + int(self.cfg.defer_delay_sec * 1e6)
            deferred = deferred.set_column(
                FRONTIER_SCHEMA.names.index("not_before"),
                "not_before",
                pa.array([nb] * deferred.num_rows, pa.int64()),
            )
            self._route(deferred, "requeue")
            stats["deferred"] = deferred.num_rows
            epoch_table = epoch_table.filter(pa.array(admit))

        _t3 = _time.perf_counter()
        result = self._process(epoch_table, epoch, now_us)
        _t4 = _time.perf_counter()

        if self.compute_budget is not None:
            result, _ = self._charge_host_costs(result, now_us)

        summaries = result.filter(pc.equal(result.column("type"), SUMMARY_TYPE))
        self._absorb_persec(summaries)
        stats["docs"] = int(pc.sum(summaries.column("depth")).as_py() or 0)
        stats["offered"] = int(pc.sum(summaries.column("discovery_ts")).as_py() or 0)
        stats["admitted"] = int(pc.sum(summaries.column("attempt_count")).as_py() or 0)

        rest = result.filter(pc.not_equal(result.column("type"), SUMMARY_TYPE))
        if self.cfg.max_attempts > 0:
            # the retry ledger ran inside the stage (W3/S13): summaries
            # carry failed (status) and deadlettered (not_before) counts;
            # `rest` holds only 304-unchanged rows
            stats["failed"] = int(
                pc.sum(summaries.column("status")).as_py() or 0
            )
            stats["deadlettered"] = int(
                pc.sum(summaries.column("not_before")).as_py() or 0
            )
            self._failed += stats["failed"]
            self._dead += stats["deadlettered"]
            stats["unchanged"] = rest.num_rows
        else:
            failed = rest.filter(pc.equal(rest.column("status"), 404))
            stats["unchanged"] = rest.num_rows - failed.num_rows
            if failed.num_rows:
                stats["failed"] = failed.num_rows
                self._handle_failures(failed, epoch, now_us, stats)

        if self.cfg.mode == "ray" and self.workers:
            # non-blocking offers: the CHECKED drain is the epoch
            # barrier — every shard must have processed its offers
            # before the next take, and a worker that restarted since
            # the last ack replays its window (see drain_info).
            # _process already issued each worker's drain_info the
            # moment its last chunk finished, so most of the wait is
            # overlapped.
            stats["admitted"] = self._checked_epoch_drain()
        self._docs_written += stats["docs"]
        if _dbg:
            _t5 = _time.perf_counter()
            print(
                f"[epoch {epoch}] taken={stats['taken']} docs={stats['docs']} "
                f"counts={_t1-_t0:.2f}s take={_t2-_t1:.2f}s "
                f"sort+polite={_t3-_t2:.2f}s process={_t4-_t3:.2f}s "
                f"post={_t5-_t4:.2f}s",
                flush=True,
            )
        return stats

    def _checked_epoch_drain(self) -> int:
        """Epoch-mode ack point of the at-least-once offer contract
        (mirrors the pull loop's drain_workers): resolve the overlapped
        drain_info refs, and when a worker's pid changed since the last
        ack — it restarted, so buffered / fire-and-forget offers from
        ranges whose results were already delivered died with the old
        process, and Ray's transparent task retry never replays a
        delivered result — re-run that worker's range window for side
        effects only. Replayed results are discarded (counters were
        absorbed once); shard insert-if-absent and the last-wins doc
        compaction make the replay idempotent. Returns summed admits."""
        import ray

        admits = 0
        pairs = getattr(self, "_drain_refs", [])
        self._drain_refs = []
        epoch_ref, ranges, epoch, now_us = getattr(
            self, "_epoch_ack", (None, {}, 0, 0)
        )
        self._epoch_ack = None
        infos = dict(
            zip([w for w, _ in pairs], ray.get([r for _, r in pairs]))
        )
        pids = getattr(self, "_worker_pids", {})
        for _ in range(self.cfg.worker_max_restarts + 2):
            admits += sum(i["admits"] for i in infos.values())
            hit = [
                widx
                for widx, i in infos.items()
                if pids.get(widx) is not None and pids[widx] != i["pid"]
            ]
            for widx, i in infos.items():
                pids[widx] = i["pid"]
            if not hit:
                break
            self._trace("worker_restart", workers=sorted(hit),
                        executor="epochs", epoch=epoch)
            replay = [
                self.workers[widx].process_range.remote(
                    epoch_ref, off, size, epoch, now_us
                )
                for widx in hit
                for off, size in ranges.get(widx, ())
            ]
            ray.get(replay)  # discarded: absorbed once already
            infos = dict(
                zip(
                    hit,
                    ray.get(
                        [self.workers[w].drain_info.remote() for w in hit]
                    ),
                )
            )
        else:
            self._trace("abort", reason="epoch-drain worker restart loop")
            self._write_trace()
            raise RuntimeError(
                "fetch workers kept restarting during the epoch drain; "
                "aborting — resume from the last checkpoint"
            )
        self._worker_pids = pids
        return admits

    def _call_take(self, per_shard, now_us: int):
        if self.cfg.mode == "ray":
            import ray

            return ray.get(
                [
                    s.take.remote(q, now_us)
                    for s, q in zip(self.shards, per_shard)
                ]
            )
        return [s.take(q, now_us) for s, q in zip(self.shards, per_shard)]

    def _handle_failures(
        self,
        failed: pa.Table,
        epoch: int,
        now_us: int,
        stats: dict,
        *,
        sync: bool = True,
    ) -> None:
        """Retry ledger: attempt_count+1 to the retry queue until
        max_attempts, then deadletter (reference W3/S13). With
        sync=False (pull executor) the requeue RPCs are fire-and-forget
        (refs collected in _route_refs, resolved at the next stall) and
        deadletter rows are buffered for a single end-of-run write —
        the per-cycle blocking route + parquet write was a measured
        driver bottleneck."""
        self._failed += failed.num_rows
        attempts = pc.add(failed.column("attempt_count"), 1)
        failed = failed.set_column(
            FRONTIER_SCHEMA.names.index("attempt_count"),
            "attempt_count",
            attempts.cast(pa.int32()),
        )
        retriable_mask = pc.less(attempts, self.cfg.max_attempts)
        retriable = failed.filter(retriable_mask)
        exhausted = failed.filter(pc.invert(retriable_mask))
        if retriable.num_rows:
            names = FRONTIER_SCHEMA.names
            retriable = retriable.set_column(
                names.index("queue"),
                "queue",
                pa.array([self.cfg.retry_queue] * retriable.num_rows, pa.string()),
            ).select(names)
            if sync:
                self._route(retriable, "requeue")
            else:
                splitter = CrawlWorkerStage._shard_split
                holder = _route_holder(self.cfg)
                for sid, sub in splitter(holder, retriable):
                    self._route_refs.append(
                        self.shards[sid].requeue.remote(sub)
                    )
        if exhausted.num_rows:
            dead = exhausted.select(
                FRONTIER_SCHEMA.names + ["error"]
            ).append_column(
                "failed_at", pa.array([now_us] * exhausted.num_rows, pa.int64())
            ).cast(DEADLETTER_SCHEMA)
            if sync:
                path = os.path.join(
                    self.dead_dir, f"epoch={epoch}-{self._dead}.parquet"
                )
                pq.write_table(dead, path)
            else:
                self._dead_tables.append(dead)
            self._dead += exhausted.num_rows
            stats["deadlettered"] = exhausted.num_rows

    # -- run loop ----------------------------------------------------------

    def run(
        self,
        seeds: list[dict] | None = None,
        *,
        start_epoch: int = 0,
        max_urls: int | None = None,
    ) -> CrawlResult:
        """Run the crawl to completion (or ``max_urls``).

        Failure domains: fetch WORKERS restart transparently
        (worker_max_restarts, at-least-once replay). A frontier SHARD
        death is not maskable in-flight (it holds seen-filter + pending
        state), so it surfaces as RayActorError — the on-disk
        checkpoint (admitted spools + WAL-ordered manifest) stays
        consistent, and ``resume_crawl(corpus, cfg)`` on the same
        state_dir converges to the exact same crawl (tested under
        SIGKILL)."""
        cfg = self.cfg
        if cfg.mode == "ray" and cfg.ray_exec == "pull":
            # Politeness under pull runs INSIDE the shards' take()
            # (FrontierShardState.configure_politeness): each pull
            # cycle is one logical window (start_refill advances the
            # clock by epoch_us per cycle), each shard admits its
            # rotating share of the global per-host allowance, so the
            # window semantics stay exact with no driver barrier.
            # Token pools (T7/T8) gate worker-side and compute budgets
            # (T6) charge in absorb() -> shard set_benched, so every
            # politeness-bounded config now gets the fast executor.
            return self._run_pull(seeds, max_urls, start_cycle=start_epoch)
        self._trace(
            "crawl_start", executor="epochs",
            seeds=len(seeds or []), start_epoch=start_epoch,
        )
        if seeds:
            self.seed(seeds)
        epoch = start_epoch
        epoch_us = int(cfg.epoch_seconds * 1e6)
        clock_us = cfg.base_ts_us + epoch * epoch_us
        processed = 0
        while epoch < cfg.max_epochs:
            self._apply_config_patches()  # T11/X5: cycle-boundary patch
            # config heartbeat (see lineage_flush): restarted workers
            # revert live deltas to constructor values; re-pushing per
            # epoch bounds the revert window to one epoch (both
            # directions — a stray revert to ON would also corrupt the
            # engine's non-summary row counting)
            if self.cfg.mode == "ray":
                for w in self.workers:
                    w.set_track_host_cost.remote(
                        self.compute_budget is not None
                    )
            stats = self._epoch(epoch, clock_us)
            for cb in self._epoch_callbacks:
                cb(self, epoch, stats)
            if stats["pending"] == 0:
                break
            if stats["taken"] == 0:
                # all pending rows deferred — idle tick: jump the clock
                # to the earliest not_before (pollingDelay analogue)
                nbs = [x for x in self._call("min_not_before") if x is not None]
                if not nbs:
                    break
                clock_us = max(clock_us + epoch_us, min(nbs))
                epoch += 1
                continue
            self._record_epoch(epoch, stats)
            processed += stats["taken"] - stats["deferred"]
            epoch += 1
            clock_us += epoch_us
            self._write_manifest(epoch - 1, completed=False)
            if max_urls is not None and processed >= max_urls:
                break
        # cumulative shard counters (incl. spill round-trips) as final
        # metric rows — the shards' own ledger, not the driver's
        for name in ("spilled", "unspilled", "bounce"):
            total = sum(
                m.get(name, 0)
                for m in getattr(self, "_last_shard_metrics", [])
            )
            self._metrics_rows.append(
                {"epoch": epoch, "name": name, "value": total}
            )
        self._flush_persec_rows()
        self._trace(
            "crawl_stop", epochs=epoch, docs=self._docs_written,
            failed=self._failed, deadlettered=self._dead,
        )
        metrics = self._metrics_table()
        self._write_tables(metrics)
        seen_counts = self._call("seen_count")
        digests = self._call("seen_digest")
        import hashlib

        overall = hashlib.sha1("".join(digests).encode()).hexdigest()
        self._write_manifest(epoch, completed=True)
        return CrawlResult(
            state_dir=cfg.state_dir,
            epochs=epoch,
            docs_written=self._docs_written,
            failed=self._failed,
            deadlettered=self._dead,
            seen_count=sum(seen_counts),
            seen_digest=overall,
            metrics=metrics,
        )

    # -- continuous (pull) executor ---------------------------------------

    def _run_pull(
        self,
        seeds: list[dict] | None,
        max_urls: int | None,
        start_cycle: int = 0,
    ) -> CrawlResult:
        """Continuous scheduler: no epoch barrier. The driver keeps
        every worker ~2 chunks deep; takes, dispatches, offers
        (flushed per batch by the workers), retries and lineage
        flushes all overlap. The epoch-mode barrier (take → process →
        drain → flush) was measured at ~40-60% worker utilization at
        32 CPUs — the barrier tail plus per-epoch serial phases are
        Amdahl's-law poison for the N→4N scaling criterion.

        Priority is approximate global (each shard's take is exact
        (depth, discovery_ts) order; waves interleave shards), which is
        the documented production ordering (SURVEY §2.9 W7) — exact
        traversal parity stays with the single-threaded local mode.
        The politeness gate must be unbounded here (no robots throttle,
        allowance ≥ wave size); configs that actually rate-limit run in
        epoch mode where the window semantics are exact."""
        import ray
        import time as _time

        _dbg = os.environ.get("RAYCRAWL_TIMING")
        _tm = {"seed": 0.0, "refill": 0.0, "dispatch": 0.0, "wait": 0.0,
               "absorb": 0.0, "fail": 0.0, "stall": 0.0, "final": 0.0,
               "cycles": 0, "chunks": 0, "sweeps": 0, "leases": 0}
        _t = _time.perf_counter()
        cfg = self.cfg
        self._exec_active = "pull"
        self._trace(
            "crawl_start", executor="pull",
            seeds=len(seeds or []), start_cycle=start_cycle,
        )
        self._apply_config_patches()  # patches queued before run()
        self._sync_pull_politeness()
        if seeds:
            self._seed_parallel(seeds)
        _tm["seed"] = _time.perf_counter() - _t
        epoch_us = int(cfg.epoch_seconds * 1e6)
        cycle = start_cycle
        clock_us = cfg.base_ts_us
        chunk = cfg.fetch_batch_size
        pool = self.workers
        # per-worker dispatch depth: each worker keeps DEPTH chunks in
        # flight (double buffer) so a completed chunk never leaves the
        # actor idle for a driver round trip — the 1-deep dispatch was
        # measured as a ~1.7x per-worker utilization gap at 24 workers
        # (completions arrive faster than the driver's turnaround).
        DEPTH = 2
        # dispatch tier (BASELINE.md scale path #2): group the workers
        # under NodeDispatcher actors and dispatch LEASES of ~group
        # chunks — one driver RPC per lease instead of per chunk. The
        # dispatcher's max_concurrency lets consecutive leases overlap,
        # reproducing the per-worker double-buffer one level up.
        tiers: list = []
        group = 1
        lease_n = 1
        depth_cap = DEPTH
        if cfg.node_dispatchers > 0:
            group = max(1, math.ceil(len(pool) / cfg.node_dispatchers))
            # half-group leases at double slot depth: same in-flight
            # chunk budget (2 x group per dispatcher) but 2x finer
            # completion granularity — a lease frees its slot when its
            # SLOWEST chunk finishes, and the measured lease-tail idle
            # at full-group leases was ~12% of wall at 10M pages
            lease_n = max(1, math.ceil(group / 2))
            depth_cap = 2 * DEPTH
            disp_cls = ray.remote(
                num_cpus=0, max_concurrency=depth_cap + 1
            )(NodeDispatcher)
            disp_pin = (
                tuple(range(cfg.reserve_cores))
                if cfg.reserve_cores > 0
                else ()
            )
            tiers = [
                disp_cls.remote(pool[i : i + group], pin_cpus=disp_pin)
                for i in range(0, len(pool), group)
            ]
            ray.get([d.ping.remote() for d in tiers])
        self._tiers = tiers  # close() kills leftovers on error paths
        targets = tiers or pool
        # corpus-range affinity (align_corpus_ranges; tier combination
        # rejected at construction): frontier shard s's chunks go only
        # to its worker group, so each worker's ShardedTableFetcher
        # touches exactly the corpus shards nested in s's hash range —
        # max(1, C/S) of them, zero cold re-pulls (asserted with
        # fetcher_stats in tests/test_corpus_align.py).
        aligned = cfg.align_corpus_ranges
        if aligned:
            S, P = len(self.shards), len(pool)
            shard_workers = [
                [w for w in range(P) if w % S == s]
                if P >= S
                else [s % P]
                for s in range(S)
            ]
            if self.corpus_handle is not None:
                # warm each worker's range slice NOW (fire-and-forget,
                # drained with the other async RPCs): under alignment
                # a worker's corpus shards are known before the first
                # row is taken, so restores/mmaps overlap the seed
                # ramp instead of serializing into the first waves —
                # the spill-pressure cost measured in the 20M-page
                # aligned run (BASELINE.md hard-residency table).
                C = self.corpus_handle.num_shards
                for s in range(S):
                    rng_ = (
                        list(range(s * (C // S), (s + 1) * (C // S)))
                        if C >= S
                        else [s * C // S]
                    )
                    self._route_refs.extend(
                        pool[w].warm_corpus_shards.remote(rng_)
                        for w in shard_workers[s]
                    )
        outstanding = [0] * len(targets)
        inflight: dict = {}  # ref -> (target_idx, n_rows, replay_desc)
        inflight_rows = 0
        # Checked-drain state (the at-least-once offer contract's ack
        # point): offers are fire-and-forget and buffered across ranges
        # for throughput, so a worker death can lose children of ranges
        # whose results already surfaced — and Ray's transparent task
        # retry never replays a DELIVERED result. The driver therefore
        # keeps every returned dispatch descriptor in `unacked` until
        # the next drain wave proves (pid unchanged since the previous
        # wave) that one incarnation both ran the window and acked its
        # offers. On a pid mismatch the window replays side-effect-only
        # (shard insert-if-absent dedups re-offers; duplicate doc parts
        # collapse in the last-wins compaction; the replayed results
        # are DISCARDED so counters are not double-absorbed). Cost off
        # the failure path: holding take-table refs alive for one flush
        # interval (<= ~16 cycles of waves in plasma) and one dict/pid
        # compare per drain — the hot loop itself stays async.
        last_pids: list[int] = ray.get([w.pid.remote() for w in pool])
        unacked: dict[int, list] = {}

        def drain_workers() -> None:
            nonlocal admitted_known, last_pids
            for _ in range(cfg.worker_max_restarts + 2):
                infos = ray.get([w.drain_info.remote() for w in pool])
                admitted_known += sum(i["admits"] for i in infos)
                pids = [i["pid"] for i in infos]
                hit = {
                    (widx // group if tiers else widx)
                    for widx in range(len(pool))
                    if pids[widx] != last_pids[widx]
                }
                last_pids = pids
                if not hit:
                    unacked.clear()
                    return
                self._trace("worker_restart", workers=sorted(hit),
                            executor="pull")
                replay = []
                for tidx in hit:
                    for desc in unacked.get(tidx, ()):
                        if tiers:
                            lease, cyc, ck = desc
                            replay.append(
                                targets[tidx].lease.remote(lease, cyc, ck)
                            )
                        else:
                            tref, off, size, cyc, ck = desc
                            replay.append(
                                targets[tidx].process_range.remote(
                                    tref, off, size, cyc, ck
                                )
                            )
                    unacked.pop(tidx, None)
                ray.get(replay)  # results discarded: absorbed once already
                # loop: ack the replay's own offers and re-verify pids
            self._trace("abort", reason="offer-drain worker restart loop")
            self._write_trace()
            raise RuntimeError(
                "fetch workers kept restarting during offer drain; "
                "aborting — resume from the last checkpoint"
            )
        work_q: deque = deque()  # (take_ref, offset, size)
        failed_tables: list[pa.Table] = []
        last_flushed_cycle = -1
        processed = 0
        docs = offered = admitted_known = unchanged = 0

        last_counts: list[dict[str, int]] | None = None

        def handle_failures_now(stats: dict) -> None:
            if not failed_tables:
                return
            failed = pa.concat_tables(failed_tables)
            failed_tables.clear()
            stats["failed"] = failed.num_rows
            self._handle_failures(failed, cycle, clock_us, stats, sync=False)

        def lineage_flush() -> None:
            """Checkpoint = a CONSISTENT cut, so resume_crawl's
            suspect-window rule ('doc dirs > manifest last_epoch may
            have unflushed children') is airtight:

            1. generation barrier — absorb every in-flight
               process_range (their doc files carry cycle labels
               <= the manifest we are about to write);
            2. drain the workers' async offer RPCs (a completed
               batch's children can otherwise still be in flight to
               the shards and land in the NEXT spool);
            3. flush the shards' admitted spools, THEN advance the
               manifest (WAL order — a manifest ahead of its spools
               made a SIGKILL in that window lose frontier rows,
               measured);
            4. bump the cycle label so every post-checkpoint batch
               writes doc dirs STRICTLY above the manifest.

            Cost: one pipeline drain per flush interval (16 cycles) —
            the bounded-depth pipeline (<= pool x DEPTH chunks) drains
            in one wave, unlike the per-cycle epoch barrier this
            executor exists to avoid."""
            nonlocal last_flushed_cycle, cycle, admitted_known
            nonlocal inflight_rows
            while inflight:
                done, _ = ray.wait(
                    list(inflight), num_returns=len(inflight),
                    fetch_local=True,
                )
                for r in done:
                    tidx, rows, desc = inflight.pop(r)
                    outstanding[tidx] -= 1
                    inflight_rows -= rows
                    unacked.setdefault(tidx, []).append(desc)
                absorb(ray.get(done))
            drain_workers()
            refs = [s.flush_epoch.remote(cycle) for s in self.shards]
            last_flushed_cycle = cycle
            self._ingest_lineage(ray.get(refs), cycle)
            self._write_manifest(cycle, completed=False)
            cycle += 1
            # config heartbeat: a worker that RESTARTED since the last
            # flush re-ran __init__ with its constructor-time config,
            # silently reverting live-patched deltas; re-pushing the
            # current value every flush bounds that revert window to
            # one flush interval (idempotent, fire-and-forget)
            self._route_refs.extend(
                w.set_track_host_cost.remote(
                    self.compute_budget is not None
                )
                for w in pool
            )

        pending_take: list | None = None  # in-flight (meta_ref, table_ref)
        starved = False  # last refill saw an empty frontier; wait for offers

        def start_refill() -> None:
            """Issue one take wave (fire-and-forget). The take RPC round
            trip is ~tens of ms — resolving it synchronously per refill
            was a measured driver bottleneck, so the refs resolve later
            (finish_refill) while workers keep crunching. take_split's
            two-part return keeps the wave's row data in plasma: the
            driver reads only the tiny meta objects and dispatches the
            table refs untouched."""
            nonlocal cycle, clock_us, pending_take, last_counts, starved
            if last_counts is None:
                # async counts-only poll (empty quotas): a synchronous
                # counts round per starvation stutter was measurable
                pending_take = [
                    s.take_split.options(num_returns=2).remote({}, clock_us)
                    for s in self.shards
                ]
                cycle += 1
                clock_us += epoch_us
                return
            pending = sum(sum(c.values()) for c in last_counts)
            queued = sum(item[2] for item in work_q)
            want = chunk * 4 * len(pool) - queued - inflight_rows
            if pending and want > 0:
                per_shard, _ = self._quotas(last_counts, budget=want)
                if per_shard is None:
                    per_shard = [{} for _ in self.shards]
                pending_take = [
                    s.take_split.options(num_returns=2).remote(q, clock_us)
                    for s, q in zip(self.shards, per_shard)
                ]
            else:
                last_counts = None  # force a fresh poll next round
                starved = True
            cycle += 1
            clock_us += epoch_us

        def finish_refill() -> int:
            """Resolve the in-flight take wave's META objects only and
            enqueue (table_ref, offset, size) dispatch chunks — the row
            data stays in plasma; the driver never touches it."""
            nonlocal pending_take, last_counts, processed, starved
            refs = pending_take
            pending_take = None
            metas = ray.get([m for m, _ in refs])
            last_counts = [m["counts"] for m in metas]
            wave = sum(m["num"] for m in metas)
            # adaptive slicing: a small wave (BFS ramp, crawl tail) is
            # split so every worker with spare depth gets a piece — a
            # fixed batch_size slice left 19 of 24 workers idle on the
            # 20k-seed first wave. Under the tier, capacity is counted
            # in CHUNKS (free lease slots x lease_n chunks per lease,
            # capped at the pool) — counting each non-full dispatcher
            # as one lease undercounted an idle pool ~2x and split the
            # ramp wave across only half the workers.
            if tiers:
                free = min(
                    len(pool),
                    sum(
                        lease_n * (depth_cap - o)
                        for o in outstanding
                        if o < depth_cap
                    ),
                )
            else:
                free = min(
                    len(pool),
                    sum(1 for o in outstanding if o < depth_cap),
                )
            eff_chunk = max(
                192, min(chunk, math.ceil(wave / max(1, free)))
            )
            took = 0
            for sid, ((_, table_ref), m) in enumerate(zip(refs, metas)):
                n = m["num"]
                took += n
                for off in range(0, n, eff_chunk):
                    work_q.append(
                        (table_ref, off, min(eff_chunk, n - off), sid)
                    )
            processed += took
            if took == 0:
                starved = True
            return took

        def refill_sync() -> int:
            start_refill()
            return finish_refill() if pending_take is not None else 0

        def absorb(results: list[pa.Table]) -> None:
            nonlocal docs, offered, starved, unchanged
            starved = False  # completions flushed fresh offers to shards
            result = (
                results[0] if len(results) == 1 else pa.concat_tables(results)
            )
            if self.compute_budget is not None:
                # T6 under pull: charge per-host byte cost exactly as the
                # epoch path does; newly-benched hosts push to the shards
                # whose take()-side gate defers their rows until
                # bench_until (fire-and-forget — benching binds from the
                # next take wave, the same next-window semantics epoch
                # mode has).
                result, changed = self._charge_host_costs(result, clock_us)
                if changed:
                    self._benched_hosts = {
                        h: u
                        for h, u in self._benched_hosts.items()
                        if u > clock_us
                    }
                    self._route_refs.extend(
                        s.set_benched.remote(self._benched_hosts)
                        for s in self.shards
                    )
            summaries = result.filter(
                pc.equal(result.column("type"), SUMMARY_TYPE)
            )
            self._absorb_persec(summaries)
            docs += int(pc.sum(summaries.column("depth")).as_py() or 0)
            offered += int(
                pc.sum(summaries.column("discovery_ts")).as_py() or 0
            )
            if self.cfg.max_attempts > 0:
                # retry ledger ran inside the stage; summaries carry the
                # failed / deadlettered counters
                self._failed += int(
                    pc.sum(summaries.column("status")).as_py() or 0
                )
                self._dead += int(
                    pc.sum(summaries.column("not_before")).as_py() or 0
                )
                # with the inline retry ledger only 304s come back
                unchanged += result.num_rows - summaries.num_rows
                return
            rest = result.filter(
                pc.not_equal(result.column("type"), SUMMARY_TYPE)
            )
            failed = rest.filter(pc.equal(rest.column("status"), 404))
            unchanged += rest.num_rows - failed.num_rows
            if failed.num_rows:
                failed_tables.append(failed)

        while True:
            # refill only when the queue is genuinely low — counts/take
            # RPC rounds per completion were measured to starve the pool
            taking = max_urls is None or processed < max_urls
            if (
                pending_take is None
                and taking
                and not starved
                and len(work_q) < 2 * len(pool)
            ):
                # T11/X5: pull-CYCLE boundary — live-config patches land
                # here, exactly as epoch mode applies them per epoch
                # (patch_config already validated them, so this cannot
                # abort the crawl); a landed patch re-syncs the
                # shard-side politeness gate so rate changes bind from
                # the next window
                if self._apply_config_patches():
                    self._sync_pull_politeness()
                _t = _time.perf_counter()
                if failed_tables and (
                    sum(t.num_rows for t in failed_tables) >= chunk * 4
                ):
                    stats = {"deadlettered": 0, "failed": 0}
                    handle_failures_now(stats)
                _t2 = _time.perf_counter()
                _tm["fail"] += _t2 - _t
                start_refill()
                _tm["refill"] += _time.perf_counter() - _t2
                _tm["cycles"] += 1
                if cycle - last_flushed_cycle >= 16:
                    lineage_flush()
            if pending_take is not None:
                _t = _time.perf_counter()
                if not work_q:
                    finish_refill()  # queue dry: block on the take wave
                else:
                    metas = [m for m, _ in pending_take]
                    ready, _ = ray.wait(
                        metas, num_returns=len(metas), timeout=0
                    )
                    if len(ready) == len(metas):
                        finish_refill()
                _tm["refill"] += _time.perf_counter() - _t
            _t = _time.perf_counter()
            while work_q:
                if aligned:
                    # hard-residency affinity: a chunk may only go to
                    # its frontier shard's worker group. Scan for the
                    # first chunk whose group has depth capacity (no
                    # head-of-line block on a busy group; the refill
                    # trigger caps the queue at ~2x pool chunks, so
                    # the scan is tens of items).
                    pick = None
                    for qi, item in enumerate(work_q):
                        w = min(
                            shard_workers[item[3]],
                            key=outstanding.__getitem__,
                        )
                        if outstanding[w] < depth_cap:
                            pick = (qi, w)
                            break
                    if pick is None:
                        break
                    qi, widx = pick
                    take_ref, off, size, _sid = work_q[qi]
                    del work_q[qi]
                    rows = size
                    ref = targets[widx].process_range.remote(
                        take_ref, off, size, cycle, clock_us
                    )
                    desc = (take_ref, off, size, cycle, clock_us)
                    _tm["chunks"] += 1
                    inflight[ref] = (widx, rows, desc)
                    outstanding[widx] += 1
                    inflight_rows += rows
                    continue
                widx = min(
                    range(len(targets)), key=outstanding.__getitem__
                )
                if outstanding[widx] >= depth_cap:
                    break
                if tiers:
                    lease = [
                        work_q.popleft()[:3]
                        for _ in range(min(len(work_q), lease_n))
                    ]
                    rows = sum(s for _, _, s in lease)
                    ref = targets[widx].lease.remote(
                        lease, cycle, clock_us
                    )
                    desc = (lease, cycle, clock_us)
                    _tm["chunks"] += len(lease)
                    _tm["leases"] += 1
                else:
                    take_ref, off, size, _sid = work_q.popleft()
                    rows = size
                    ref = targets[widx].process_range.remote(
                        take_ref, off, size, cycle, clock_us
                    )
                    desc = (take_ref, off, size, cycle, clock_us)
                    _tm["chunks"] += 1
                inflight[ref] = (widx, rows, desc)
                outstanding[widx] += 1
                inflight_rows += rows
            _tm["dispatch"] += _time.perf_counter() - _t
            if inflight:
                # block for one completion, then sweep up everything
                # else already finished — one driver pass per sweep
                _t = _time.perf_counter()
                done, _ = ray.wait(
                    list(inflight), num_returns=1, fetch_local=True
                )
                extra, _ = ray.wait(
                    [r for r in inflight if r != done[0]],
                    num_returns=len(inflight) - 1,
                    timeout=0,
                    fetch_local=True,
                )
                done += extra
                for r in done:
                    tidx, rows, desc = inflight.pop(r)
                    outstanding[tidx] -= 1
                    inflight_rows -= rows
                    unacked.setdefault(tidx, []).append(desc)
                _tm["sweeps"] += 1
                _t2 = _time.perf_counter()
                _tm["wait"] += _t2 - _t
                absorb(ray.get(done))
                _tm["absorb"] += _time.perf_counter() - _t2
                continue
            # pipeline empty: drain worker offer buffers, then re-check
            _t = _time.perf_counter()
            stats = {"deadlettered": 0, "failed": 0}
            handle_failures_now(stats)
            if self._route_refs:
                ray.get(self._route_refs)
                self._route_refs.clear()
            drain_workers()
            last_counts = self._call("counts")
            pending = sum(sum(c.values()) for c in last_counts)
            _tm["stall"] += _time.perf_counter() - _t
            if pending == 0 or (max_urls is not None and processed >= max_urls):
                break
            starved = False
            if refill_sync() == 0:
                # all remaining rows deferred: advance the clock
                nbs = [
                    x
                    for x in self._call("min_not_before")
                    if x is not None
                ]
                if not nbs:
                    break
                clock_us = max(clock_us + epoch_us, min(nbs))
                starved = False

        _t = _time.perf_counter()
        stats = {"deadlettered": 0, "failed": 0}
        handle_failures_now(stats)
        if self._route_refs:
            ray.get(self._route_refs)
            self._route_refs.clear()
        lineage_flush()  # drains inflight + workers itself
        if self._dead_tables:
            pq.write_table(
                pa.concat_tables(self._dead_tables),
                os.path.join(self.dead_dir, "pull-deadletters.parquet"),
            )
            self._dead_tables = []
        self._docs_written = docs
        for name, value in (
            ("fetch", processed),
            ("done", docs),
            ("offered", offered),
            ("push", admitted_known),
            ("abandon", self._failed),
            ("deadletter", self._dead),
            ("unchanged", unchanged),
        ):
            self._metrics_rows.append(
                {"epoch": cycle, "name": name, "value": value}
            )
        # cumulative shard counters (incl. spill round-trips and the
        # shard-side politeness gate's deferrals) as final metric rows —
        # the shards' own ledger, not the driver's
        for name in ("spilled", "unspilled", "bounce", "defer"):
            total = sum(
                m.get(name, 0)
                for m in getattr(self, "_last_shard_metrics", [])
            )
            self._metrics_rows.append(
                {"epoch": cycle, "name": name, "value": total}
            )
        self._flush_persec_rows()
        self._trace(
            "crawl_stop", cycles=cycle, docs=self._docs_written,
            failed=self._failed, deadlettered=self._dead,
        )
        metrics = self._metrics_table()
        self._write_tables(metrics)
        seen_counts = self._call("seen_count")
        digests = self._call("seen_digest")
        import hashlib

        overall = hashlib.sha1("".join(digests).encode()).hexdigest()
        self._write_manifest(cycle, completed=True)
        self._exec_active = None
        for d in tiers:  # per-run actors; workers/shards outlive them
            try:
                ray.kill(d, no_restart=True)
            except Exception:
                pass
        self._tiers = []
        _tm["final"] = _time.perf_counter() - _t
        # driver-loop time budget, readable by tools/dispatch_ceiling.py:
        # every bucket except `wait` is driver work; `wait` is blocked-on-
        # completion idle (fetch_local transfer overlaps worker compute)
        self._pull_timing = dict(_tm)
        if _dbg:
            print(
                "[pull] "
                + " ".join(f"{k}={v:.2f}" for k, v in _tm.items()),
                flush=True,
            )
        return CrawlResult(
            state_dir=cfg.state_dir,
            epochs=cycle,
            docs_written=docs,
            failed=self._failed,
            deadlettered=self._dead,
            seen_count=sum(seen_counts),
            seen_digest=overall,
            metrics=metrics,
        )

    def _ingest_lineage(self, lineage: list[dict], epoch: int) -> None:
        self._last_shard_metrics = [rec["metrics"] for rec in lineage]
        for rec in lineage:
            self._lineage_rows.append(
                {
                    "frontier_epoch": epoch,
                    "shard_id": rec["shard_id"],
                    "filter_snapshot_id": rec["filter_snapshot_id"],
                    "admitted": rec["admitted"],
                    "op_ts": 0,
                }
            )

    # -- bookkeeping -------------------------------------------------------

    def _record_epoch(self, epoch: int, stats: dict) -> None:
        lineage = self._call("flush_epoch", epoch)
        self._cached_counts = [rec["counts"] for rec in lineage]
        self._last_shard_metrics = [rec["metrics"] for rec in lineage]
        for rec in lineage:
            self._lineage_rows.append(
                {
                    "frontier_epoch": epoch,
                    "shard_id": rec["shard_id"],
                    "filter_snapshot_id": rec["filter_snapshot_id"],
                    "admitted": rec["admitted"],
                    "op_ts": 0,
                }
            )
        name_map = {
            "taken": "fetch",
            "docs": "done",
            "failed": "abandon",
            "admitted": "push",
            "deferred": "defer",
            "offered": "offered",
            "unchanged": "unchanged",
            "deadlettered": "deadletter",
        }
        for key, metric in name_map.items():
            self._metrics_rows.append(
                {"epoch": epoch, "name": metric, "value": stats[key]}
            )

    def _absorb_persec(self, summaries: pa.Table) -> None:
        """Per-second counter buckets (reference: redis-metrics with
        timeGranularity 'second', lib/crawlerFactory.js:264-277). Each
        worker summary row stamps its batch-completion wall second
        (relation) and fetched count (parent_urn); accumulating by
        (name, second) gives metrics.parquet a sub-epoch time series an
        operator can watch, alongside the per-epoch totals. Rows are
        emitted with a 'sec:' name prefix and epoch=-1 so consumers
        summing bare counter names never double-count."""
        if summaries.num_rows == 0:
            return
        secs = summaries.column("relation").to_pylist()
        cols = (
            ("fetch", summaries.column("parent_urn").to_pylist()),
            ("done", summaries.column("depth").to_pylist()),
            ("offered", summaries.column("discovery_ts").to_pylist()),
            ("push", summaries.column("attempt_count").to_pylist()),
            ("abandon", summaries.column("status").to_pylist()),
            ("deadletter", summaries.column("not_before").to_pylist()),
        )
        for i, s in enumerate(secs):
            if not s:
                continue
            sec = int(s)
            for name, vals in cols:
                v = int(vals[i] or 0)
                if v:
                    key = (name, sec)
                    self._persec[key] = self._persec.get(key, 0) + v

    def _flush_persec_rows(self) -> None:
        for (name, sec), v in sorted(self._persec.items()):
            self._metrics_rows.append(
                {"epoch": -1, "name": f"sec:{name}", "second": sec,
                 "value": v}
            )
        self._persec = {}

    def _metrics_table(self) -> pa.Table:
        if not self._metrics_rows:
            return METRICS_SCHEMA.empty_table()
        return pa.Table.from_pylist(self._metrics_rows, schema=METRICS_SCHEMA)

    def _write_tables(self, metrics: pa.Table) -> None:
        self._write_trace()
        pq.write_table(
            metrics, os.path.join(self.cfg.state_dir, "metrics.parquet")
        )
        lineage = (
            pa.Table.from_pylist(self._lineage_rows, schema=LINEAGE_SCHEMA)
            if self._lineage_rows
            else LINEAGE_SCHEMA.empty_table()
        )
        pq.write_table(
            lineage, os.path.join(self.cfg.state_dir, "lineage.parquet")
        )

    def _write_manifest(self, last_epoch: int, *, completed: bool) -> None:
        manifest = {
            "last_epoch": last_epoch,
            "completed": completed,
            "snapshot_id": self.cfg.snapshot_id,
            "num_shards": self.cfg.num_shards,
            "seen_filter": self.cfg.seen_filter,
        }
        tmp = os.path.join(self.cfg.state_dir, ".manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.cfg.state_dir, "manifest.json"))


def resume_crawl(corpus: pa.Table, cfg: CrawlConfig) -> CrawlResult:
    """Resume an interrupted crawl from on-disk state (north rule):
    rebuild every shard's URL-seen filter by replaying lineage —
    processed keys (documents + deadletters) are marked seen first,
    then all admitted rows are re-offered: already-processed rows
    bounce off the filter, unprocessed rows re-enter the pending heaps.
    The rebuilt seen set is IDENTICAL to the pre-kill set (asserted in
    tests via seen_digest). Deviation (documented): in-flight retry
    counters and deferrals reset to the admitted-time row state.
    """
    with open(os.path.join(cfg.state_dir, "manifest.json")) as f:
        manifest = json.load(f)
    engine = CrawlEngine(corpus, cfg)

    # Crash-window recovery: the manifest only advances after a cycle's
    # admitted spools are durable (WAL order), so docs under
    # epoch dirs > last_epoch are SUSPECT — they were processed, but the
    # admissions their processing produced (their children) may have
    # died in shard memory. Marking a suspect doc seen would orphan
    # those children forever (nothing else re-offers them). Instead the
    # suspect docs are RE-OFFERED as frontier rows carrying their stored
    # etag: the T9 conditional-fetch path 304s them (no duplicate doc
    # row) while still extracting and offering their children, which
    # bounce off the seen filter when already processed. Deviations on
    # the suspect window only (bounded by the flush cadence): queue
    # resets to child_queue, traversal policy to 'default', and
    # collection-page URNs lose their parent chain (page corpora derive
    # urns from the url, so only entity crawls notice).
    last_epoch = int(manifest["last_epoch"])

    def _doc_epoch(path: str) -> int:
        return int(os.path.basename(os.path.dirname(path)).split("=", 1)[1])

    doc_files = sorted(
        glob(os.path.join(cfg.state_dir, "documents", "epoch=*", "*.parquet"))
    )
    suspect_files = [f for f in doc_files if _doc_epoch(f) > last_epoch]
    processed_files = [
        f for f in doc_files if _doc_epoch(f) <= last_epoch
    ] + sorted(glob(os.path.join(cfg.state_dir, "deadletters", "*.parquet")))
    if processed_files:
        # one vectorized shard split over ALL processed keys (the same
        # uint64-prefix router the workers use), one mark_seen RPC per
        # shard — the earlier per-file per-digest Python loop would
        # take hours at 10^10 keys
        processed = pa.concat_tables(
            pq.read_table(f, columns=["url_hash"])
            for f in processed_files
        ).combine_chunks()
        splitter = CrawlWorkerStage._shard_split
        holder = _route_holder(cfg)
        refs = []
        for sid, sub in splitter(holder, processed):
            digests = sub.column("url_hash").to_pylist()
            if cfg.mode == "ray":
                refs.append(engine.shards[sid].mark_seen.remote(digests))
            else:
                engine.shards[sid].mark_seen(digests)
        if refs:
            import ray

            ray.get(refs)

    if suspect_files:
        # offered BEFORE the admitted-spool replay (_route is
        # synchronous): the etag-carrying suspect row must win the
        # shards' insert-if-absent dedup over its own earlier spooled
        # admission, so the re-visit 304s instead of re-writing the doc
        suspect = pa.concat_tables(
            pq.read_table(
                f, columns=["url", "url_hash", "type", "depth", "etag",
                            "body"]
            )
            for f in suspect_files
        )
        # ADVICE r3 (medium): payload-backed (event-delivered) docs have
        # no corpus row — re-offered as plain fetchable rows they would
        # 404 → deadletter and their unflushed children stay orphaned,
        # exactly the gap this recovery closes for corpus pages. The doc
        # spool persists their payload body, so suspect rows ABSENT from
        # the corpus re-offer with payload_body (zero-fetch) + stored
        # etag: the 304 path re-traverses their children identically.
        in_corpus = engine.corpus_membership(
            suspect.column("url_hash").to_pylist()
        )
        specs = [
            {
                "url": u,
                "type": t,
                "depth": d,
                "queue": cfg.child_queue,
                "payload_etag": e or "",
                "payload_body": "" if inc else (b or ""),
            }
            for u, t, d, e, b, inc in zip(
                suspect.column("url").to_pylist(),
                suspect.column("type").to_pylist(),
                suspect.column("depth").to_pylist(),
                suspect.column("etag").to_pylist(),
                suspect.column("body").to_pylist(),
                in_corpus,
            )
        ]
        engine._route(
            build_frontier_rows(specs, base_ts=cfg.base_ts_us), "offer"
        )

    admitted_files = sorted(
        glob(os.path.join(cfg.state_dir, "admitted", "epoch=*", "*.parquet"))
    )
    for f in admitted_files:
        engine._route(pq.read_table(f), "offer")

    engine._trace(
        "resume", last_epoch=last_epoch,
        suspect_files=len(suspect_files),
        processed_files=len(processed_files),
        admitted_files=len(admitted_files),
    )
    return engine.run(start_epoch=last_epoch + 1)


def recrawl(
    corpus: pa.Table, cfg: CrawlConfig, seeds: list[dict]
) -> CrawlResult:
    """Incremental re-crawl against an existing state_dir (reference
    tracker-TTL + etag store: an expired tracker lets the same URL
    queue again, and the fetcher's etag store turns unchanged bodies
    into 304s — config ttl + githubFetcher etag path). Composition:

    1. a NEW filter snapshot (next snapshot_id) so every URL is
       re-admittable — the documented snapshot analogue of the
       reference's tracker TTL expiry;
    2. the prior run's compacted (url_hash, etag) map is hash-split to
       the frontier shards (load_etag_index) so offered rows carry
       their prior etag;
    3. unchanged bodies 304 (no new document version, children still
       traverse), changed bodies write new versions that
       ``latest_documents`` compaction upserts (D3 last-write-wins).

    The crawl result's ``docs_written`` is exactly the changed-doc
    count; the ``unchanged`` metric carries the 304 count."""
    import dataclasses

    from ..api import latest_documents

    with open(os.path.join(cfg.state_dir, "manifest.json")) as f:
        manifest = json.load(f)
    prior_snap = str(manifest.get("snapshot_id", cfg.snapshot_id))
    digits = "".join(c for c in prior_snap if c.isdigit())
    next_snap = (
        prior_snap.rstrip("0123456789") + str(int(digits) + 1)
        if digits
        else prior_snap + ".1"
    )
    prior = latest_documents(cfg.state_dir)
    # advance the logical clock past the prior run so the new versions'
    # processed_at strictly dominates in last-write-wins compaction
    base_ts = cfg.base_ts_us
    if prior.num_rows:
        base_ts = max(
            base_ts,
            int(pc.max(prior.column("processed_at")).as_py())
            + int(cfg.epoch_seconds * 1e6),
        )
    cfg = dataclasses.replace(
        cfg, snapshot_id=next_snap, base_ts_us=base_ts
    )
    engine = CrawlEngine(corpus, cfg)
    engine._trace(
        "recrawl", prior_snapshot=prior_snap, snapshot=next_snap,
        prior_docs=prior.num_rows,
    )
    if prior.num_rows:
        engine.load_etag_index(prior.select(["url_hash", "etag"]))
    return engine.run(seeds=seeds)
