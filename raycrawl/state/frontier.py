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
- a priority heap ordered by ``(depth, discovery_ts, seq)`` (north-star
  traversal order; FIFO within a BFS level),
- the insert-if-absent seen filter (see seenfilter.py),
- an admitted-rows spool flushed to Parquet per epoch (the lineage that
  makes resume reproduce the identical URL-seen set — the rebuild of the
  delta store, /root/reference/providers/storage/deltaStore.js:26-31).

Scale note (10^10 frontier): pending rows live in shard heaps; beyond
``max_pending_in_memory`` a production deployment would spill
lowest-priority rows per (queue, depth) bucket to Parquet and reload as
heaps drain — the hook (`_maybe_spill`) is left as a documented stub in
round 1; the seen filter (Bloom) and the admitted spool already scale.

The plain class is fully testable without Ray; ``create_shards`` wraps
it with ``ray.remote``.
"""

from __future__ import annotations

import heapq
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import FRONTIER_SCHEMA, QUEUES
from .seenfilter import make_seen_filter

_COLS = FRONTIER_SCHEMA.names


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
        self._heaps: dict[str, list] = {q: [] for q in QUEUES}
        self._seq = 0
        self._epoch = 0
        self._epoch_admitted: list[pa.Table] = []
        self.metrics = {"push": 0, "bounce": 0, "repush": 0, "take": 0}

    # -- ingest ------------------------------------------------------------

    def _push_rows(self, table: pa.Table, mask: np.ndarray | None) -> int:
        cols = [table.column(c).to_pylist() for c in _COLS]
        pushed = 0
        for i, row in enumerate(zip(*cols)):
            if mask is not None and not mask[i]:
                continue
            queue = row[_COLS.index("queue")]
            heap = self._heaps.get(queue)
            if heap is None:
                heap = self._heaps.setdefault(queue, [])
            depth = row[_COLS.index("depth")]
            ts = row[_COLS.index("discovery_ts")]
            self._seq += 1
            heapq.heappush(heap, (depth, ts, self._seq, row))
            pushed += 1
        return pushed

    def offer(self, table: pa.Table) -> int:
        """Dedup-admit candidate rows (insert-if-absent on url_hash);
        admitted rows enter the pending heaps and the epoch spool.
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
            self._push_rows(atable, None)
        return admitted

    def requeue(self, table: pa.Table) -> int:
        """Re-enqueue rows WITHOUT dedup (retries after failure, deferred
        rows): the reference's abandon→redelivery with attemptCount++
        (providers/queuing/amqpQueue.js:134-144)."""
        n = self._push_rows(table, None)
        self.metrics["repush"] += n
        return n

    def mark_seen(self, digests: list[bytes]) -> int:
        """Resume replay: record keys as seen without enqueueing."""
        mask = self.seen.add_if_absent(digests)
        return int(mask.sum())

    # -- scheduling --------------------------------------------------------

    def counts(self) -> dict[str, int]:
        return {q: len(h) for q, h in self._heaps.items()}

    def min_not_before(self) -> int | None:
        """Smallest not_before among pending rows (drives idle clock
        advance, the reference's pollingDelay analogue)."""
        nb_idx = _COLS.index("not_before")
        best: int | None = None
        for heap in self._heaps.values():
            for item in heap:
                nb = item[3][nb_idx]
                if best is None or nb < best:
                    best = nb
        return best

    def take(self, quotas: dict[str, int], now_us: int) -> pa.Table:
        """Pop up to quotas[q] eligible rows (not_before <= now) per
        queue in priority order (depth, discovery_ts, seq); ineligible
        rows are retained."""
        nb_idx = _COLS.index("not_before")
        taken: list[tuple] = []
        for queue, quota in quotas.items():
            if quota <= 0:
                continue
            heap = self._heaps.get(queue)
            if not heap:
                continue
            stash = []
            got = 0
            while heap and got < quota:
                item = heapq.heappop(heap)
                if item[3][nb_idx] > now_us:
                    stash.append(item)
                    continue
                taken.append(item[3])
                got += 1
            for item in stash:
                heapq.heappush(heap, item)
        self.metrics["take"] += len(taken)
        if not taken:
            return FRONTIER_SCHEMA.empty_table()
        arrays = [
            pa.array([row[i] for row in taken], FRONTIER_SCHEMA.types[i])
            for i in range(len(_COLS))
        ]
        return pa.Table.from_arrays(arrays, schema=FRONTIER_SCHEMA)

    # -- epoch lifecycle / lineage ----------------------------------------

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def flush_epoch(self, epoch: int) -> dict[str, Any]:
        """Persist this epoch's admitted rows to the lineage spool and
        return a lineage record."""
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
        }

    def seen_count(self) -> int:
        return len(self.seen)

    def seen_digest(self) -> str:
        return self.seen.digest()

    def pending_total(self) -> int:
        return sum(len(h) for h in self._heaps.values())


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
