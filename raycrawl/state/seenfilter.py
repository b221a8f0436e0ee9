"""URL-seen filters: insert-if-absent over 20-byte SHA-1 digests.

Reimplements the semantics of the reference's RedisRequestTracker
(/root/reference/providers/queuing/redisRequestTracker.js:17-53: SET NX
— suppress a push while the same key is present) without distributed
locks: each filter instance is owned by exactly one FrontierShard actor,
so all inserts for a given url_hash are serialized by actor ownership
(the rebuild's answer to the tracker's redlock,
redisRequestTracker.js:72-93).

Two implementations:

- ``ExactSeenFilter`` — a Python set of digests. Exact; used for tests
  and small crawls; memory ~70 B/key.
- ``BloomSeenFilter`` — a numpy bit-array Bloom filter deriving its k
  probe indexes from the SHA-1 digest itself (no extra hashing).
  ~1.2 GB per shard at 10^9 keys/shard with fpr 1e-3 ⇒ a 64-shard pool
  covers a 10^10-URL frontier within actor memory (north rule scale).
  False positives drop a URL that was never crawled (documented,
  rate-bounded); false negatives never occur, so the seen-set is a
  superset-free overapproximation compatible with resume replay.

Deviation from the reference, documented per SURVEY §7.4(2): the
tracker's 1 h TTL + removal-on-pop exists to allow re-crawling; this
engine is insert-only per crawl run, with re-crawls starting a new
filter snapshot (``filter_snapshot_id`` in lineage).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class ExactSeenFilter:
    kind = "exact"

    def __init__(self) -> None:
        self._seen: set[bytes] = set()

    def __len__(self) -> int:
        return len(self._seen)

    def add_if_absent(self, digests: list[bytes]) -> np.ndarray:
        """Insert each digest; return bool mask of newly-inserted (first
        occurrence within the batch wins, duplicates report False)."""
        seen = self._seen
        out = np.empty(len(digests), dtype=bool)
        for i, d in enumerate(digests):
            if d in seen:
                out[i] = False
            else:
                seen.add(d)
                out[i] = True
        return out

    def contains(self, digests: list[bytes]) -> np.ndarray:
        seen = self._seen
        return np.fromiter((d in seen for d in digests), dtype=bool,
                           count=len(digests))

    def digest(self) -> str:
        """Order-insensitive SHA-1 over the member set (resume parity)."""
        h = hashlib.sha1()
        for d in sorted(self._seen):
            h.update(d)
        return h.hexdigest()


class BloomSeenFilter:
    kind = "bloom"

    def __init__(self, capacity: int = 1_000_000, fpr: float = 1e-3) -> None:
        m = max(64, int(-capacity * math.log(fpr) / (math.log(2) ** 2)))
        self.num_bits = (m + 63) // 64 * 64
        self.k = max(1, round(self.num_bits / capacity * math.log(2)))
        self._bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        self._count = 0

    def __len__(self) -> int:
        return self._count

    def _indexes(self, digests: list[bytes]) -> np.ndarray:
        """(n, k) probe bit-indexes: h1 + i*h2 mod m over the digest's
        own 128 leading bits (Kirsch–Mitzenmacher double hashing)."""
        raw = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 20)
        h1 = raw[:, :8].copy().view(np.uint64).reshape(-1)
        h2 = raw[:, 8:16].copy().view(np.uint64).reshape(-1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def add_if_absent(self, digests: list[bytes]) -> np.ndarray:
        if not digests:
            return np.zeros(0, dtype=bool)
        # unique-first so in-batch duplicates admit exactly once
        uniq: dict[bytes, int] = {}
        inverse = np.empty(len(digests), dtype=np.int64)
        order: list[bytes] = []
        for i, d in enumerate(digests):
            j = uniq.get(d)
            if j is None:
                j = len(order)
                uniq[d] = j
                order.append(d)
            inverse[i] = j
        idx = self._indexes(order)  # (u, k)
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        bit_mask = np.left_shift(
            np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
        )
        present = (self._bits[byte_idx] & bit_mask) != 0
        was_present = present.all(axis=1)
        new_mask_uniq = ~was_present
        if new_mask_uniq.any():
            nb = byte_idx[new_mask_uniq].reshape(-1)
            nm = bit_mask[new_mask_uniq].reshape(-1)
            np.bitwise_or.at(self._bits, nb, nm)
            self._count += int(new_mask_uniq.sum())
        out = new_mask_uniq[inverse]
        # in-batch duplicates: only the FIRST occurrence reports True
        first_occurrence = np.zeros(len(digests), dtype=bool)
        seen_j: set[int] = set()
        for i, j in enumerate(inverse):
            if j not in seen_j:
                seen_j.add(int(j))
                first_occurrence[i] = True
        return out & first_occurrence

    def contains(self, digests: list[bytes]) -> np.ndarray:
        if not digests:
            return np.zeros(0, dtype=bool)
        idx = self._indexes(digests)
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        bit_mask = np.left_shift(
            np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
        )
        return ((self._bits[byte_idx] & bit_mask) != 0).all(axis=1)

    def digest(self) -> str:
        return hashlib.sha1(self._bits.tobytes()).hexdigest()


def make_seen_filter(kind: str, capacity: int = 1_000_000, fpr: float = 1e-3):
    if kind == "exact":
        return ExactSeenFilter()
    if kind == "bloom":
        return BloomSeenFilter(capacity=capacity, fpr=fpr)
    raise ValueError(f"unknown seen-filter kind: {kind!r}")
