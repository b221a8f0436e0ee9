"""Event feed ingestion: the webhook / bus-subscription entry point.

Rebuilds the reference's event path as library calls over Arrow
batches (SURVEY §3.3):
- HMAC-SHA1 signature verification with timing-safe compare
  (/root/reference/routes/webhook.js:27-30, F5/M9)
- EventFormatter: event body → ``event_trigger`` request with the
  payload embedded (etag "1" so the fetch stage treats the body as
  already fetched) and ``_retryQueue='immediate'``
  (/root/reference/lib/crawlerFactory.js:657-681, M2)
- events land on the ``events`` queue whose pop weight (10) preempts
  backfill crawl (/root/reference/lib/crawlerFactory.js:80)

External feeds at scale land as rows appended to an events Parquet
dir; ``ray.data.read_parquet`` per epoch turns them into seed waves
(SURVEY S6/S7).
"""

from __future__ import annotations

import hashlib
import hmac
import json

import pyarrow as pa

MAX_EVENT_BYTES = 5 * 1024 * 1024  # webhook body cap (app.js:26)


def sign_event(secret: str, raw_body: bytes) -> str:
    """Producer-side signature: ``sha1=<hex HMAC>`` (webhook.js:27)."""
    mac = hmac.new(secret.encode("utf-8"), raw_body, hashlib.sha1)
    return "sha1=" + mac.hexdigest()


def verify_signature(secret: str, raw_body: bytes, signature: str) -> bool:
    """Timing-safe check of the ``sha1=...`` header (webhook.js:27-30)."""
    expected = sign_event(secret, raw_body)
    return hmac.compare_digest(expected, signature or "")


def format_event(event: dict, *, now_us: int) -> dict | None:
    """EventFormatter (M2, lib/crawlerFactory.js:657-681): build an
    ``event_trigger`` seed spec from a webhook/bus event body. Returns
    None for events without a usable events_url."""
    body = event.get("body", event)
    repo = body.get("repo") or body.get("repository") or {}
    org = body.get("org") or body.get("organization") or {}
    url = repo.get("events_url") or org.get("events_url")
    if not url:
        return None
    return {
        "url": url,
        "type": "event_trigger",
        "queue": "events",
        # The reference marks event bodies pre-fetched with etag=1
        # (crawlerFactory.js:670); payload_body rides the frontier row
        # and the fetch stage processes it WITHOUT a corpus read.
        "payload_etag": "1",
        "context": {
            "repoType": "private" if repo.get("private") else "public"
        },
        "payload_body": json.dumps(body, sort_keys=True),
        "fetched_at": now_us,
    }


def ingest_events(
    engine,
    raw_events: list[tuple[bytes, str]],
    *,
    secret: str,
    now_us: int,
) -> int:
    """Webhook entry (S6, routes/webhook.js:14-45): verify each
    (raw_body, signature) pair, format, and seed onto the ``events``
    queue. Oversized or unverifiable events are dropped (the reference
    responds 400). Returns the number of events queued."""
    specs = []
    for raw, sig in raw_events:
        if len(raw) > MAX_EVENT_BYTES:
            continue
        if not verify_signature(secret, raw, sig):
            continue
        spec = format_event(json.loads(raw.decode("utf-8")), now_us=now_us)
        if spec is not None:
            # frontier schema carries url/type/queue/payload_etag only;
            # payload_body is dropped — the event URL is re-fetched from
            # the corpus when visited (see format_event)
            specs.append(
                {
                    k: spec[k]
                    for k in ("url", "type", "queue", "payload_etag")
                }
            )
    if not specs:
        return 0
    return engine.seed(specs)


def events_table(events: list[dict], *, now_us: int) -> pa.Table:
    """Bus-subscription path (S7): a batch of already-verified events →
    Arrow table ready for an events Parquet append."""
    specs = [s for s in (format_event(e, now_us=now_us) for e in events) if s]
    return pa.table(
        {
            "url": pa.array([s["url"] for s in specs], pa.string()),
            "type": pa.array([s["type"] for s in specs], pa.string()),
            "queue": pa.array([s["queue"] for s in specs], pa.string()),
            "payload_etag": pa.array(
                [s["payload_etag"] for s in specs], pa.string()
            ),
            "payload_body": pa.array(
                [s["payload_body"] for s in specs], pa.string()
            ),
            "fetched_at": pa.array(
                [s["fetched_at"] for s in specs], pa.int64()
            ),
        }
    )
