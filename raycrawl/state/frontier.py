"""Sharded frontier state: URL-seen dedup + priority queues per shard.

Each shard owns `hash(url_hash) % num_shards` of the key space and
serializes every dedup decision for its keys (the lock-free rebuild of
the reference's redlock-guarded tracker,
/root/reference/providers/queuing/redisRequestTracker.js:72-93, whose
concurrency contract — two simultaneous pushes of the same key admit
exactly one — is property-tested in
/root/reference/test/unit/requestTrackerTests.js:359-387).

A shard holds, per queue class (events/immediate/soon/normal/later —
/root/reference/lib/crawlerFactory.js:573-580):
- pending rows as **Arrow tables** with an arrival-sequence column;
  ``take`` is a vectorized eligibility filter + sort by
  ``(depth, discovery_ts, seq)`` (north-star priority order; FIFO
  within a BFS level). No per-row Python in the hot path — an earlier
  heapq-of-tuples implementation made the shard pool the serial
  bottleneck of the whole crawl.
- the insert-if-absent seen filter (see seenfilter.py),
- an admitted-rows spool flushed to Parquet per epoch (the lineage that
  makes resume reproduce the identical URL-seen set — the rebuild of
  the delta store, /root/reference/providers/storage/deltaStore.js:26-31).

Scale note (10^10 frontier): pending tables are columnar and compact
(~150 B/row); beyond memory a deployment would spill the coldest
(queue, depth) runs to Parquet and reload as the frontier drains — the
spool layout already supports it. The Bloom seen filter at 1e9 keys
per shard ≈ 1.2 GB (fpr 1e-3), so 64 shards cover 10^10 URLs.

The plain class is fully testable without Ray; ``create_shards`` wraps
it with ``ray.remote``.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import FRONTIER_SCHEMA, QUEUES
from .seenfilter import make_seen_filter

_SORT_KEYS = [
    ("depth", "ascending"),
    ("discovery_ts", "ascending"),
    ("seq", "ascending"),
]


class FrontierShardState:
    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        seen_kind: str = "exact",
        seen_capacity: int = 1_000_000,
        seen_fpr: float = 1e-3,
        state_dir: str | None = None,
        snapshot_id: str = "s0",
    ) -> None:
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.snapshot_id = snapshot_id
        self.state_dir = state_dir
        self.seen = make_seen_filter(seen_kind, seen_capacity, seen_fpr)
        self._pending: dict[str, list[pa.Table]] = {q: [] for q in QUEUES}
        self._arrival = 0
        self._epoch_admitted: list[pa.Table] = []
        self.metrics = {"push": 0, "bounce": 0, "repush": 0, "take": 0}

    # -- ingest ------------------------------------------------------------

    def _append(self, table: pa.Table) -> int:
        """Stamp arrival sequence (FIFO tiebreak) and append to the
        per-queue pending lists — all vectorized."""
        n = table.num_rows
        if n == 0:
            return 0
        seq = pa.array(
            np.arange(self._arrival, self._arrival + n, dtype=np.int64)
        )
        self._arrival += n
        stamped = table.append_column("seq", seq)
        queues = stamped.column("queue")
        uniq = pc.unique(queues).to_pylist()
        if len(uniq) == 1:
            self._pending.setdefault(uniq[0], []).append(stamped)
        else:
            for q in uniq:
                sub = stamped.filter(pc.equal(queues, q))
                self._pending.setdefault(q, []).append(sub)
        return n

    def offer(self, table: pa.Table) -> int:
        """Dedup-admit candidate rows (insert-if-absent on url_hash);
        admitted rows enter the pending set and the epoch spool.
        Returns the number admitted; the rest are 'bounced'
        (reference queueOutcome='Bounced',
        providers/queuing/redisRequestTracker.js:27)."""
        digests = table.column("url_hash").to_pylist()
        mask = self.seen.add_if_absent(digests)
        admitted = int(mask.sum())
        self.metrics["push"] += admitted
        self.metrics["bounce"] += len(digests) - admitted
        if admitted:
            atable = table.filter(pa.array(mask))
            self._epoch_admitted.append(atable)
            self._append(atable)
        return admitted

    def requeue(self, table: pa.Table) -> int:
        """Re-enqueue rows WITHOUT dedup (retries after failure, deferred
        rows): the reference's abandon→redelivery with attemptCount++
        (providers/queuing/amqpQueue.js:134-144)."""
        n = self._append(table)
        self.metrics["repush"] += n
        return n

    def mark_seen(self, digests: list[bytes]) -> int:
        """Resume replay: record keys as seen without enqueueing."""
        mask = self.seen.add_if_absent(digests)
        return int(mask.sum())

    # -- scheduling --------------------------------------------------------

    def _queue_table(self, queue: str) -> pa.Table | None:
        tables = self._pending.get(queue)
        if not tables:
            return None
        if len(tables) > 1:
            merged = pa.concat_tables(tables).combine_chunks()
            self._pending[queue] = [merged]
            return merged
        return tables[0]

    def counts(self) -> dict[str, int]:
        return {
            q: sum(t.num_rows for t in ts) for q, ts in self._pending.items()
        }

    def min_not_before(self) -> int | None:
        """Smallest not_before among pending rows (drives idle clock
        advance, the reference's pollingDelay analogue)."""
        best = None
        for tables in self._pending.values():
            for t in tables:
                if t.num_rows == 0:
                    continue
                m = pc.min(t.column("not_before")).as_py()
                if m is not None and (best is None or m < best):
                    best = m
        return best

    def take(self, quotas: dict[str, int], now_us: int) -> pa.Table:
        """Pop up to quotas[q] eligible rows (not_before <= now) per
        queue in priority order (depth, discovery_ts, seq); ineligible
        rows are retained. Fully vectorized."""
        out: list[pa.Table] = []
        for queue, quota in quotas.items():
            if quota <= 0:
                continue
            tbl = self._queue_table(queue)
            if tbl is None or tbl.num_rows == 0:
                continue
            elig_mask = pc.less_equal(tbl.column("not_before"), now_us)
            n_elig = int(pc.sum(elig_mask).as_py() or 0)
            if n_elig == 0:
                continue
            elig = tbl.filter(elig_mask)
            inelig = tbl.filter(pc.invert(elig_mask))
            order = pc.sort_indices(elig, sort_keys=_SORT_KEYS)
            k = min(quota, n_elig)
            taken = elig.take(order.slice(0, k))
            rest = elig.take(order.slice(k))
            keep = (
                pa.concat_tables([rest, inelig])
                if inelig.num_rows
                else rest
            )
            self._pending[queue] = [keep] if keep.num_rows else []
            out.append(taken)
        if not out:
            return FRONTIER_SCHEMA.empty_table()
        result = pa.concat_tables(out).select(FRONTIER_SCHEMA.names)
        self.metrics["take"] += result.num_rows
        return result

    def take_with_counts(
        self, quotas: dict[str, int], now_us: int
    ) -> dict[str, Any]:
        """take() plus post-take pending counts in ONE round trip — the
        pull executor's refill path; a separate counts() RPC round per
        refill was a measured driver bottleneck."""
        return {
            "table": self.take(quotas, now_us) if quotas else
            FRONTIER_SCHEMA.empty_table(),
            "counts": self.counts(),
        }

    def take_split(
        self, quotas: dict[str, int], now_us: int
    ) -> tuple[dict[str, Any], pa.Table]:
        """take_with_counts as a (meta, table) pair for
        ``.options(num_returns=2)``: the driver reads ONLY the tiny
        meta object (row count + pending counts) and hands the table's
        ObjectRef straight to the fetch workers — deserializing each
        take wave (tens of MB at full width) on the driver was a
        measured scaling bottleneck at 32 CPUs."""
        t = (
            self.take(quotas, now_us)
            if quotas
            else FRONTIER_SCHEMA.empty_table()
        )
        return {"num": t.num_rows, "counts": self.counts()}, t

    # -- epoch lifecycle / lineage ----------------------------------------

    def flush_epoch(self, epoch: int) -> dict[str, Any]:
        """Persist this epoch's admitted rows to the lineage spool and
        return a lineage record (+ piggybacked pending counts so the
        engine skips a counts() round-trip per epoch)."""
        admitted = 0
        if self._epoch_admitted and self.state_dir:
            table = pa.concat_tables(self._epoch_admitted)
            admitted = table.num_rows
            out_dir = os.path.join(self.state_dir, "admitted", f"epoch={epoch}")
            os.makedirs(out_dir, exist_ok=True)
            tmp = os.path.join(out_dir, f".shard_{self.shard_id}.parquet.tmp")
            pq.write_table(table, tmp)
            os.replace(
                tmp, os.path.join(out_dir, f"shard_{self.shard_id}.parquet")
            )
        elif self._epoch_admitted:
            admitted = sum(t.num_rows for t in self._epoch_admitted)
        self._epoch_admitted = []
        return {
            "frontier_epoch": epoch,
            "shard_id": self.shard_id,
            "filter_snapshot_id": self.snapshot_id,
            "admitted": admitted,
            "metrics": dict(self.metrics),
            "counts": self.counts(),
        }

    def seen_count(self) -> int:
        return len(self.seen)

    def seen_digest(self) -> str:
        return self.seen.digest()

    def pending_total(self) -> int:
        return sum(
            t.num_rows for ts in self._pending.values() for t in ts
        )


def create_shards(
    num_shards: int,
    *,
    seen_kind: str = "exact",
    seen_capacity: int = 1_000_000,
    seen_fpr: float = 1e-3,
    state_dir: str | None = None,
    snapshot_id: str = "s0",
):
    """Spawn the shard actor pool (num_cpus=0 — shards are bookkeeping
    actors that must coexist with the fetch/extract worker pool)."""
    import ray

    cls = ray.remote(num_cpus=0)(FrontierShardState)
    return [
        cls.remote(
            i,
            num_shards,
            seen_kind=seen_kind,
            seen_capacity=seen_capacity,
            seen_fpr=seen_fpr,
            state_dir=state_dir,
            snapshot_id=snapshot_id,
        )
        for i in range(num_shards)
    ]
