"""Fetch + visit + sink + route: the crawl's one heavy distributed stage.

Design (Ray-Data-first): one ``map_batches`` actor-pool stage does, per
frontier batch —

1. **fetch**: look up each URL's body in the broadcast pages corpus
   (the sandbox's simulated network; a real deployment swaps
   ``TableFetcher`` for an HTTP fetcher with the same interface). The
   corpus Arrow table and its hash index are ``ray.put`` ONCE and read
   zero-copy in each actor's ``__init__`` — never re-shipped per batch.
   Lookup is by the 20-byte ``url_hash`` the frontier rows already
   carry: binary search over a sorted uint64 prefix array + 12-byte
   tail verification (no Python-string comparisons in the hot path).
   Conditional fetch: a row whose ``payload_etag`` matches the body
   etag is a 304 (reference etag path,
   providers/storage/mongodocstore.js:48-60).
2. **visit**: run the visitor map (stages/visitor.py) — extract text +
   child links (pages) or JSON children (GitHub entities).
3. **sink**: write this batch's documents straight to partitioned
   Parquet (``documents/epoch=K/part-<digest>.parquet``, deterministic
   name ⇒ task retries overwrite instead of duplicating).
4. **route**: canonicalize child URLs, pre-dedup within the batch (the
   attenuation window, providers/queuing/attenuatedQueue.js:24-52),
   and offer them to the owning FrontierShard actors by
   ``hash(url_hash) % S`` — candidates never pass through the driver.

Only failures (404 → retry ledger) and 304s return to the driver, plus
one summary row per batch carrying counters, so per-epoch driver
traffic is O(failures), not O(pages). The raw ``html`` never leaves
the stage at all.
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.urlnorm import canonicalize_batch, shard_of
from ..schemas import DOCUMENT_SCHEMA, FRONTIER_SCHEMA
from .visitor import visit

RESULT_SCHEMA = pa.schema(
    list(zip(FRONTIER_SCHEMA.names, FRONTIER_SCHEMA.types))
    + [("status", pa.int32()), ("error", pa.string())]
)

SUMMARY_TYPE = "__summary__"


def build_fetch_index(corpus: pa.Table) -> dict[str, np.ndarray]:
    """One-time (per run) index over the corpus: canonical-url SHA-1 →
    row number. Pure numpy arrays (~28 B/row) so broadcast + per-actor
    deserialization is near-zero-cost. At 10^10 pages this step runs as
    a distributed map_batches + per-shard index instead (the corpus
    would not be a single in-memory table)."""
    _, digests, _ = canonicalize_batch(corpus.column("url").to_pylist())
    raw = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 20)
    h64 = raw[:, :8].copy().view(np.uint64).reshape(-1)
    tail = raw[:, 8:].copy()
    order = np.argsort(h64, kind="stable")
    return {
        "h64": h64[order],
        "tail": tail[order],
        "row": order.astype(np.int64),
    }


def _digests_to_h64_tail(digests: list[bytes]):
    raw = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 20)
    h64 = raw[:, :8].copy().view(np.uint64).reshape(-1)
    return h64, raw[:, 8:]


class TableFetcher:
    """Corpus-backed simulated network: url_hash → page row."""

    def __init__(self, corpus: pa.Table, index: dict[str, np.ndarray]) -> None:
        self._corpus = corpus.combine_chunks()
        self._html = self._corpus.column("html").chunk(0)
        self._lang = self._corpus.column("lang").chunk(0)
        self._ts = self._corpus.column("warc_ts").chunk(0)
        self._h64 = index["h64"]
        self._tail = index["tail"]
        self._row = index["row"]

    def lookup(self, digests: list[bytes]):
        """-> (found_mask, corpus_row_indexes) for a batch of url hashes."""
        if not digests:
            return np.zeros(0, dtype=bool), np.zeros(0, dtype=np.int64)
        h64, tail = _digests_to_h64_tail(digests)
        pos = np.searchsorted(self._h64, h64)
        pos_clip = np.minimum(pos, len(self._h64) - 1)
        found = (
            (pos < len(self._h64))
            & (self._h64[pos_clip] == h64)
            & (self._tail[pos_clip] == tail).all(axis=1)
        )
        return found, self._row[pos_clip]

    def body(self, idx: int) -> bytes:
        return self._html[idx].as_py()

    def lang(self, idx: int) -> str:
        return self._lang[idx].as_py()

    def fetched_at(self, idx: int) -> int:
        return self._ts[idx].value


def etag_of(body: bytes) -> str:
    return hashlib.sha1(body).hexdigest()[:16]


class CrawlWorkerStage:
    """map_batches callable: frontier rows in → failed/unchanged/summary
    rows out (see module docstring).

    ``corpus``/``index`` may be ObjectRefs (ray mode: resolved once per
    actor here in ``__init__``) or in-memory objects (local mode).
    ``shards``: FrontierShard actor handles (ray) or FrontierShardState
    instances (local parity mode — same code path, direct calls).
    """

    def __init__(
        self,
        corpus,
        index,
        shards,
        *,
        docs_dir: str | None,
        child_queue: str = "normal",
        epoch: int = 0,
        now_us: int = 0,
        attenuate: bool = True,
    ) -> None:
        try:
            import ray

            if isinstance(corpus, ray.ObjectRef):
                corpus = ray.get(corpus)
            if isinstance(index, ray.ObjectRef):
                index = ray.get(index)
        except ImportError:  # pragma: no cover
            pass
        self.fetcher = TableFetcher(corpus, index)
        self.shards = shards
        self.num_shards = len(shards)
        self.docs_dir = docs_dir
        self.child_queue = child_queue
        self.epoch = epoch
        self.now_us = now_us
        self.attenuate = attenuate
        self._local = not hasattr(shards[0].offer, "remote")

    def set_epoch(self, epoch: int, now_us: int) -> None:  # local-mode reuse
        self.epoch = epoch
        self.now_us = now_us

    # -- candidate routing -------------------------------------------------

    def _offer(self, frontier_rows: pa.Table) -> int:
        by_shard: dict[int, list[int]] = defaultdict(list)
        for i, d in enumerate(frontier_rows.column("url_hash").to_pylist()):
            by_shard[shard_of(d, self.num_shards)].append(i)
        if self._local:
            return sum(
                self.shards[sid].offer(frontier_rows.take(pa.array(idxs)))
                for sid, idxs in by_shard.items()
            )
        import ray

        refs = [
            self.shards[sid].offer.remote(frontier_rows.take(pa.array(idxs)))
            for sid, idxs in by_shard.items()
        ]
        return sum(ray.get(refs))

    def _build_candidates(
        self, children: list[tuple], depths: list[int]
    ) -> pa.Table:
        """children: (type, url, parent_urn, relation, parent_row)."""
        urls = [c[1] for c in children]
        norm, digests, hosts = canonicalize_batch(urls)
        if self.attenuate:  # in-batch pre-dedup (attenuation window, D1)
            seen: set[bytes] = set()
            keep = [
                i
                for i, d in enumerate(digests)
                if d not in seen and not seen.add(d)
            ]
        else:
            keep = list(range(len(children)))
        n = len(keep)
        return pa.Table.from_arrays(
            [
                pa.array([norm[i] for i in keep], pa.string()),
                pa.array([digests[i] for i in keep], pa.binary(20)),
                pa.array([hosts[i] for i in keep], pa.string()),
                pa.array([children[i][0] for i in keep], pa.string()),
                pa.array(["default"] * n, pa.string()),
                pa.array([self.child_queue] * n, pa.string()),
                pa.array([depths[children[i][4]] + 1 for i in keep], pa.int32()),
                pa.array([self.now_us] * n, pa.int64()),
                pa.array([0] * n, pa.int32()),
                pa.array([0] * n, pa.int64()),
                pa.array([children[i][2] for i in keep], pa.string()),
                pa.array([children[i][3] for i in keep], pa.string()),
                pa.array([""] * n, pa.string()),
            ],
            schema=FRONTIER_SCHEMA,
        )

    def _write_docs(self, doc_rows: dict[str, list]) -> None:
        docs = pa.Table.from_arrays(
            [
                pa.array(doc_rows[name], typ)
                for name, typ in zip(DOCUMENT_SCHEMA.names, DOCUMENT_SCHEMA.types)
            ],
            schema=DOCUMENT_SCHEMA,
        )
        out_dir = os.path.join(self.docs_dir, f"epoch={self.epoch}")
        os.makedirs(out_dir, exist_ok=True)
        part = hashlib.sha1(
            b"".join(doc_rows["url_hash"][:4]) + len(doc_rows["urn"]).to_bytes(4, "big")
        ).hexdigest()[:16]
        tmp = os.path.join(out_dir, f".part-{part}.tmp")
        pq.write_table(docs, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{part}.parquet"))

    # -- the batch body ----------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        types = batch.column("type").to_pylist()
        depths = batch.column("depth").to_pylist()
        parent_urns = batch.column("parent_urn").to_pylist()
        relations = batch.column("relation").to_pylist()
        payload_etags = batch.column("payload_etag").to_pylist()
        url_hashes = batch.column("url_hash").to_pylist()

        found, idxs = self.fetcher.lookup(url_hashes)

        statuses = np.full(len(urls), 404, dtype=np.int32)
        doc_rows: dict[str, list] = defaultdict(list)
        children: list[tuple] = []

        for i in range(len(urls)):
            if not found[i]:
                continue
            row = int(idxs[i])
            body = self.fetcher.body(row)
            etag = etag_of(body)
            if payload_etags[i] and payload_etags[i] == etag:
                statuses[i] = 304  # unchanged — skip reprocess
                continue
            result = visit(
                types[i], urls[i], body,
                parent_urn=parent_urns[i], relation=relations[i],
                child_queue=self.child_queue,
            )
            statuses[i] = 200
            doc_rows["urn"].append(result.urn)
            doc_rows["type"].append(result.doc_type)
            doc_rows["url"].append(urls[i])
            doc_rows["url_hash"].append(url_hashes[i])
            doc_rows["etag"].append(etag)
            doc_rows["fetched_at"].append(self.fetcher.fetched_at(row))
            doc_rows["processed_at"].append(self.now_us)
            doc_rows["depth"].append(depths[i])
            doc_rows["text"].append(result.text)
            doc_rows["body"].append(result.body)
            doc_rows["lang"].append(self.fetcher.lang(row))
            doc_rows["n_links"].append(len(result.children))
            for ch in result.children:
                children.append((ch.type, ch.url, ch.parent_urn, ch.relation, i))

        offered = len(children)  # pre-dedup (golden queued-children counts)
        admitted = self._offer(self._build_candidates(children, depths)) if children else 0

        n_docs = len(doc_rows["urn"])
        if n_docs and self.docs_dir is not None:
            self._write_docs(doc_rows)

        keep_mask = statuses != 200
        kept_status = statuses[keep_mask]
        out = (
            batch.filter(pa.array(keep_mask))
            .append_column("status", pa.array(kept_status, pa.int32()))
            .append_column(
                "error",
                pa.array(
                    ["not found" if s == 404 else "" for s in kept_status],
                    pa.string(),
                ),
            )
        )
        # one summary row per batch: depth←n_docs, discovery_ts←offered,
        # attempt_count←admitted (decoded by the engine)
        summary = pa.Table.from_arrays(
            [
                pa.array([""], pa.string()),
                pa.array([b"\x00" * 20], pa.binary(20)),
                pa.array([""], pa.string()),
                pa.array([SUMMARY_TYPE], pa.string()),
                pa.array([""], pa.string()),
                pa.array([""], pa.string()),
                pa.array([n_docs], pa.int32()),
                pa.array([offered], pa.int64()),
                pa.array([admitted], pa.int32()),
                pa.array([0], pa.int64()),
                pa.array([""], pa.string()),
                pa.array([""], pa.string()),
                pa.array([""], pa.string()),
                pa.array([0], pa.int32()),
                pa.array([""], pa.string()),
            ],
            schema=RESULT_SCHEMA,
        )
        return pa.concat_tables([out, summary])
