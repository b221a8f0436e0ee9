"""Event-feed ingestion (SURVEY S6/S7, M2, M9, F5) and seed loading
(S14): signature verification, event formatting, queue targeting."""

import json

import pyarrow.parquet as pq
import pytest

from raycrawl.sources.events import (
    MAX_EVENT_BYTES,
    events_table,
    format_event,
    ingest_events,
    sign_event,
    verify_signature,
)
from raycrawl.sources.seeds import load_seeds, parse_seed_spec

NOW = 1_700_000_000_000_000


def test_signature_roundtrip_and_tamper():
    body = b'{"x": 1}'
    sig = sign_event("s3cret", body)
    assert sig.startswith("sha1=")
    assert verify_signature("s3cret", body, sig)
    assert not verify_signature("s3cret", body + b" ", sig)
    assert not verify_signature("other", body, sig)
    assert not verify_signature("s3cret", body, "")


def test_format_event_repo_and_org():
    repo_ev = {"repository": {"events_url": "http://h.example.com/r/events",
                              "private": True}}
    spec = format_event(repo_ev, now_us=NOW)
    assert spec["url"] == "http://h.example.com/r/events"
    assert spec["type"] == "event_trigger"
    assert spec["queue"] == "events"          # pop weight 10 preempts
    assert spec["payload_etag"] == "1"        # body pre-fetched
    assert spec["context"]["repoType"] == "private"
    org_ev = {"org": {"events_url": "http://h.example.com/o/events"}}
    assert format_event(org_ev, now_us=NOW)["context"]["repoType"] == "public"
    assert format_event({"zen": "ok"}, now_us=NOW) is None


def test_events_table_layout():
    evs = [
        {"org": {"events_url": f"http://h.example.com/o{i}/events"}}
        for i in range(3)
    ] + [{"zen": "dropped"}]
    t = events_table(evs, now_us=NOW)
    assert t.num_rows == 3
    assert t.column("queue").to_pylist() == ["events"] * 3
    assert json.loads(t.column("payload_body")[0].as_py())


class _FakeEngine:
    def __init__(self):
        self.seeded = []

    def seed(self, specs):
        self.seeded.extend(specs)
        return len(specs)


def test_ingest_events_verifies_and_drops():
    eng = _FakeEngine()
    good = json.dumps(
        {"repository": {"events_url": "http://h.example.com/r/events"}}
    ).encode()
    bad_sig = (good, "sha1=deadbeef")
    no_url = json.dumps({"zen": "ok"}).encode()
    oversized = b"x" * (MAX_EVENT_BYTES + 1)
    n = ingest_events(
        eng,
        [
            (good, sign_event("k", good)),
            bad_sig,
            (no_url, sign_event("k", no_url)),
            (oversized, sign_event("k", oversized)),
        ],
        secret="k",
        now_us=NOW,
    )
    assert n == 1
    assert eng.seeded[0]["queue"] == "events"


def test_seed_spec_parsing(tmp_path):
    assert parse_seed_spec("OrgA; orgb ;") == ["orga", "orgb"]
    f = tmp_path / "seeds.txt"
    f.write_text("OrgA\norgB  orgC\n")
    assert load_seeds({"CRAWLER_ORGS": "x;Y"}) == ["x", "y"]
    assert load_seeds({"CRAWLER_ORGS_FILE": str(f)}) == [
        "orga", "orgb", "orgc"
    ]
    assert load_seeds({}) == []


def test_event_seeds_preempt_backfill(tmp_path, ray_session):
    """End-to-end: an event seeded onto the 'events' queue is crawled
    (weight 10) and its document lands like any page (SURVEY §3.3)."""
    from raycrawl.corpus import corpus_from_documents, seeds_for_corpus
    from raycrawl.pipelines.crawl import CrawlConfig, CrawlEngine

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    corpus = corpus_from_documents(docs, pages_per_doc=4, seed=7)
    cfg = CrawlConfig(
        state_dir=str(tmp_path / "state"), mode="local", num_shards=2
    )
    engine = CrawlEngine(corpus, cfg)
    # event targeting a known corpus URL, entering via the events queue
    target = corpus.column("url")[0].as_py()
    raw = json.dumps(
        {"repository": {"events_url": target}}
    ).encode()
    assert ingest_events(
        engine, [(raw, sign_event("k", raw))], secret="k",
        now_us=engine.cfg.base_ts_us,
    ) == 1
    result = engine.run(seeds=seeds_for_corpus(corpus, 2))
    assert result.docs_written > 0
    urls = result.documents_table().column("url").to_pylist()
    assert target in urls
