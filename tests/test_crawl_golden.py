"""Golden traversal parity with the reference end-to-end test.

Mirrors /root/reference/test/unit/processingTests.js:13-46: seed
org:https://api.github.com/orgs/test into an in-memory single-loop
crawler (here: mode='local', one shard, epoch_budget=1 — one processOne
per epoch) and assert the exact pop order, stored URNs and
queued-children counts (counted pre-dedup, like the reference's
crawler.queue spy).
"""

import os
from glob import glob

import pyarrow.parquet as pq

from raycrawl.corpus import (
    GHGRAPH_EXPECTED_POP_ORDER,
    ghgraph_corpus,
    ghgraph_paginated_corpus,
)
from raycrawl.pipelines.crawl import CrawlConfig, CrawlEngine


def test_ghgraph_golden_pop_order(tmp_path):
    corpus = ghgraph_corpus()
    cfg = CrawlConfig(
        state_dir=str(tmp_path / "state"),
        mode="local",
        num_shards=1,
        epoch_budget=1,
        host_rate_per_sec=1e9,
    )
    engine = CrawlEngine(corpus, cfg)
    result = engine.run(
        seeds=[{"url": "https://api.github.com/orgs/test", "type": "org"}]
    )

    # one document per epoch, in pop order
    steps = []
    metrics = result.metrics.to_pylist()
    offered_by_epoch = {
        m["epoch"]: m["value"] for m in metrics if m["name"] == "offered"
    }
    for k in sorted(
        int(os.path.basename(d).split("=")[1])
        for d in glob(os.path.join(result.documents_dir, "epoch=*"))
    ):
        files = glob(os.path.join(result.documents_dir, f"epoch={k}", "*.parquet"))
        t = pq.read_table(files[0])
        assert t.num_rows == 1
        row = t.to_pylist()[0]
        steps.append((row["type"], row["urn"], offered_by_epoch[k]))

    assert steps == GHGRAPH_EXPECTED_POP_ORDER
    assert result.docs_written == 11
    assert result.deadlettered == 0
    # dedup: user test was offered twice (org child + org member) but
    # admitted/crawled exactly once — seen set = the 11 crawled urls
    assert result.seen_count == 11


def test_ghgraph_urns_complete(tmp_path):
    corpus = ghgraph_corpus()
    cfg = CrawlConfig(
        state_dir=str(tmp_path / "state"),
        mode="local",
        num_shards=2,
        epoch_budget=100,
    )
    result = CrawlEngine(corpus, cfg).run(
        seeds=[{"url": "https://api.github.com/orgs/test", "type": "org"}]
    )
    urns = set(result.documents_table().column("urn").to_pylist())
    assert urns == {urn for _, urn, _ in GHGRAPH_EXPECTED_POP_ORDER}


def test_ghgraph_collection_pagination(tmp_path):
    """Round-2 verdict item 3: an org with >1 page of repos harvests
    ALL pages, each page stored under its page:N URN with the correct
    children count (per-page repos + the next-page request), and every
    repo document lands — nothing truncates at page 1."""
    corpus = ghgraph_paginated_corpus(repos_pages=3, per_page=2)
    cfg = CrawlConfig(
        state_dir=str(tmp_path / "state"),
        mode="local",
        num_shards=2,
        epoch_budget=100,
    )
    result = CrawlEngine(corpus, cfg).run(
        seeds=[{"url": "https://api.github.com/orgs/big", "type": "org"}]
    )
    docs = result.documents_table()
    by_urn = dict(
        zip(docs.column("urn").to_pylist(), docs.column("n_links").to_pylist())
    )
    # all three collection pages present with multi-page URNs
    assert by_urn["urn:org:1:repos:page:1"] == 3  # 2 repos + next page
    assert by_urn["urn:org:1:repos:page:2"] == 3
    assert by_urn["urn:org:1:repos:page:3"] == 2  # last page: no next
    # every repo across every page was harvested (owner child each)
    repo_urns = {u for u in by_urn if u.startswith("urn:repo:")}
    assert repo_urns == {f"urn:repo:{100 + i}" for i in range(1, 7)}
    assert all(by_urn[u] == 1 for u in repo_urns)
    # 1 org + its user + user's empty repos page + empty members/teams
    # pages + 3 repos pages + 6 repos
    assert result.docs_written == 14
    assert result.deadlettered == 0
