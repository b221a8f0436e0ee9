"""Flagship pipeline: full crawl over a corpus derived from testdata.

``crawl_reachability`` is the engine's end-to-end query: derive a
deterministic pages corpus from the driver ``documents`` table
(corpus_from_documents), crawl it from fixed seeds with the sharded
frontier + politeness + dedup stack, and return the harvested documents
table. Iterative + stateful ⇒ not SQL-expressible (rows-only driver
check); its correctness oracle is the BFS-reachability test suite
(tests/test_crawl_pages.py).
"""

from __future__ import annotations

import shutil
import tempfile

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..corpus import corpus_from_documents, seeds_for_corpus
from .analytics import query
from .crawl import CrawlConfig, CrawlEngine


def run_crawl(
    sf_dir: str,
    *,
    pages_per_doc: int = 2,
    num_shards: int = 4,
    fetch_concurrency: int = 4,
    fetch_batch_size: int = 1024,
    epoch_budget: int = 20_000,
    mode: str = "ray",
    seen_filter: str = "exact",
    keep_state: bool = False,
):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    corpus = corpus_from_documents(docs, pages_per_doc=pages_per_doc, seed=42)
    state_dir = tempfile.mkdtemp(prefix="raycrawl_flagship_")
    cfg = CrawlConfig(
        state_dir=state_dir,
        mode=mode,
        num_shards=num_shards,
        epoch_budget=epoch_budget,
        fetch_concurrency=fetch_concurrency,
        fetch_batch_size=fetch_batch_size,
        seen_filter=seen_filter,
        seen_capacity=max(100_000, corpus.num_rows * 2),
    )
    engine = CrawlEngine(corpus, cfg)
    result = engine.run(seeds=seeds_for_corpus(corpus, 4))
    table = result.documents_table()
    if not keep_state:
        shutil.rmtree(state_dir, ignore_errors=True)
    return result, table


@query("crawl_reachability")  # iterative/stateful — rows-only check
def crawl_reachability(sf_dir: str):
    _, table = run_crawl(sf_dir)
    out = table.select(["urn", "url", "depth", "n_links", "lang"])
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


@query("recrawl_incremental")  # iterative/stateful — rows-only check
def recrawl_incremental(sf_dir: str, k: int = 5):
    """Incremental re-crawl end-to-end (reference tracker TTL + etag
    store): crawl a derived corpus, deterministically modify the first
    ``k`` page bodies, ``recrawl()`` the same state_dir — unchanged
    pages 304 against their stored etags, changed pages write a second
    version. Returns one row per harvested url with its stored version
    count (2 for modified+reachable pages, 1 otherwise), sorted by url.
    Iterative + stateful ⇒ rows-only driver check; the exact-count
    oracle is tests/test_crawl_pages.py::
    test_incremental_recrawl_304s_and_upserts."""
    import os
    from glob import glob

    import pyarrow as pa

    from ..stages.extract import extract_text
    from .crawl import recrawl

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    corpus = corpus_from_documents(docs, pages_per_doc=2, seed=42)
    state_dir = tempfile.mkdtemp(prefix="raycrawl_recrawl_")
    try:
        cfg = CrawlConfig(
            state_dir=state_dir,
            mode="ray",
            num_shards=4,
            epoch_budget=20_000,
            fetch_concurrency=4,
            fetch_batch_size=1024,
            seen_capacity=max(100_000, corpus.num_rows * 2),
        )
        seeds = seeds_for_corpus(corpus, 4)
        CrawlEngine(corpus, cfg).run(seeds=seeds)

        htmls = corpus.column("html").to_pylist()
        texts = corpus.column("text").to_pylist()
        for i in range(min(k, len(htmls))):
            htmls[i] = htmls[i].replace(b"<body>", b"<body><p>v2</p>")
            texts[i] = extract_text(htmls[i])
        corpus2 = corpus.set_column(
            corpus.schema.get_field_index("html"),
            "html",
            pa.array(htmls, pa.binary()),
        ).set_column(
            corpus.schema.get_field_index("text"),
            "text",
            pa.array(texts, pa.string()),
        )
        recrawl(corpus2, cfg, seeds)

        files = glob(os.path.join(state_dir, "documents", "epoch=*", "*.parquet"))
        all_docs = pa.concat_tables(
            pq.read_table(f, columns=["url"]) for f in files
        )
        import pyarrow.compute as _pc

        counts = all_docs.group_by("url").aggregate([([], "count_all")])
        counts = counts.rename_columns(["url", "versions"])
        return counts.take(
            _pc.sort_indices(counts, sort_keys=[("url", "ascending")])
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
