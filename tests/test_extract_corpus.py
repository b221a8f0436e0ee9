import numpy as np

from raycrawl.corpus import default_seeds, make_pages_corpus, page_url
from raycrawl.stages.extract import extract_links, extract_text

HTML = (
    b"<html><head><title>T</title><style>.a{}</style></head><body>"
    b"<h1>Head&amp;er</h1><p>one  two</p><!-- hidden -->"
    b'<a href="/rel/x">r</a><a href="http://b.com/y#frag">abs</a>'
    b'<a href="mailto:z@q.com">m</a><a href="http://b.com/y">dup</a>'
    b"<script>var x='<p>no</p>';</script></body></html>"
)


def test_extract_text_deterministic():
    t1 = extract_text(HTML)
    t2 = extract_text(HTML)
    assert t1 == t2
    assert "Head&er" in t1
    assert "one two" in t1           # whitespace collapsed
    assert "hidden" not in t1        # comments stripped
    assert "var x" not in t1         # script stripped
    assert ".a{}" not in t1          # style stripped


def test_extract_links():
    links = extract_links(HTML, "http://a.com/base/page")
    assert links == ["http://a.com/rel/x", "http://b.com/y"]


def test_corpus_deterministic():
    t1 = make_pages_corpus(num_hosts=3, pages_per_host=5, seed=7)
    t2 = make_pages_corpus(num_hosts=3, pages_per_host=5, seed=7)
    assert t1.equals(t2)
    t3 = make_pages_corpus(num_hosts=3, pages_per_host=5, seed=8)
    assert not t1.equals(t3)


def test_corpus_from_documents_chunking_invariant(monkeypatch):
    """Parallel (forked-Pool) generation is byte-identical to the
    sequential build — the per-variant-link kind draws are precomputed
    in the exact order the old scalar loop consumed them, so chunk
    boundaries cannot perturb any column. The Pool path is forced by
    lowering the row-count gate."""
    import pyarrow.parquet as pq

    from raycrawl.corpus import corpus_from_documents

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    seq = corpus_from_documents(docs, pages_per_doc=3, seed=11, processes=1)
    import raycrawl.corpus as c

    monkeypatch.setattr(c, "_PARALLEL_MIN_ROWS", 10)
    par = corpus_from_documents(docs, pages_per_doc=3, seed=11, processes=4)
    assert seq.equals(par)


def test_corpus_text_invariant():
    """The oracle text column IS extract_text(html) — byte-identical."""
    t = make_pages_corpus(num_hosts=3, pages_per_host=5, seed=42)
    for html, text in zip(
        t.column("html").to_pylist(), t.column("text").to_pylist()
    ):
        assert extract_text(html) == text


def test_corpus_links_resolve_to_known_hosts():
    t = make_pages_corpus(num_hosts=4, pages_per_host=6, seed=42)
    urls = set(t.column("url").to_pylist())
    from raycrawl.functions.urlnorm import rfc3986_normalize

    n_links = n_resolved = 0
    for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        for link in extract_links(html, url):
            n_links += 1
            if rfc3986_normalize(link) in urls:
                n_resolved += 1
    assert n_links > 0
    assert n_resolved / n_links > 0.8  # most links resolve (some dangle)
    assert n_resolved < n_links        # but dangling links exist


def test_absolute_href_fast_path_matches_urljoin():
    """The extract_links fast path (skip urljoin for absolute hrefs with
    a non-empty host) must agree with urljoin on every href shape,
    including the empty-netloc forms that DO resolve against the base."""
    from urllib.parse import urljoin

    from hypothesis import given, strategies as st

    base = "http://base.example.com/dir/page"

    def fast(href: str) -> str:
        if href.startswith("http://"):
            p = 7
        elif href.startswith("https://"):
            p = 8
        else:
            p = -1
        if p > 0 and len(href) > p and href[p] not in "/?":
            return href
        return urljoin(base, href)

    cases = [
        "http://c/d", "https://X.Y/p?q=1", "http://", "https://",
        "http:///path", "http://?q", "http://c", "http://c:80/d",
        "/rel", "rel/x", "//proto.example.com/x",
    ]
    for h in cases:
        assert fast(h) == urljoin(base, h), h

    @given(st.text(alphabet="abc:/?.hts", max_size=16))
    def prop(href):
        assert fast(href) == urljoin(base, href)

    prop()


def test_seeds():
    seeds = default_seeds(2)
    assert seeds[0]["url"] == page_url(0, 0)
    assert all(s["queue"] == "normal" for s in seeds)


def test_index_lookup_shared_probe_and_empty_guard():
    """index_lookup is the single corpus-membership definition shared by
    the fetch path and crash recovery; probe hits, misses, and the
    empty-index / empty-batch guards (an empty corpus used to clip the
    searchsorted position to -1)."""
    import pyarrow as pa

    from raycrawl.functions.urlnorm import canonicalize_batch
    from raycrawl.stages.fetch import build_fetch_index, index_lookup

    urls = [page_url(h, p) for h in range(3) for p in range(4)]
    corpus = pa.table({"url": pa.array(urls)})
    index = build_fetch_index(corpus)

    _, digests, _ = canonicalize_batch([urls[5], "http://nope.example.com/x", urls[0]])
    found, rows = index_lookup(index, digests)
    assert found.tolist() == [True, False, True]
    assert urls[rows[0]] == urls[5] and urls[rows[2]] == urls[0]

    # empty batch
    found, rows = index_lookup(index, [])
    assert len(found) == 0 and len(rows) == 0

    # empty index (h64 length 0) must not clip to -1
    empty = {k: v[:0] for k, v in index.items()}
    found, rows = index_lookup(empty, digests)
    assert not found.any() and len(found) == 3


def test_oracle_sidecars_survive_concurrent_cold_writers(tmp_path):
    """ensure_oracle_sidecars must tolerate N processes racing a cold
    cache: per-writer tmp names + atomic replace mean the _OK marker
    can never pin an interleaved parquet. All writers converge on the
    same byte-identical sidecar tables."""
    import multiprocessing
    import shutil

    import pyarrow.parquet as pq

    from raycrawl.pipelines.flagship import _sidecar_dir

    sf = "/root/testdata/sf0.001"
    d = _sidecar_dir(sf, 2, 4)
    shutil.rmtree(d, ignore_errors=True)  # force the cold path
    try:
        with multiprocessing.get_context("spawn").Pool(4) as pool:
            dirs = pool.map(_sidecar_worker, [sf] * 4)
        assert set(dirs) == {d}
        pages = pq.read_table(f"{d}/pages.parquet")
        links = pq.read_table(f"{d}/links.parquet")
        seeds = pq.read_table(f"{d}/seeds.parquet")
        assert pages.num_rows > 0 and links.num_rows > 0
        assert seeds.num_rows == 4
        # every edge endpoint is a known page url
        known = set(pages.column("url").to_pylist())
        assert set(links.column("src_url").to_pylist()) <= known
        assert set(links.column("dst_url").to_pylist()) <= known
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _sidecar_worker(sf: str) -> str:
    from raycrawl.pipelines.flagship import ensure_oracle_sidecars

    return ensure_oracle_sidecars(sf)


def test_write_pages_corpus_dir_matches_in_memory(tmp_path):
    """The streamed dir writer (larger-than-memory corpus path) must
    produce BYTE-IDENTICAL rows in the same order as the in-memory
    builder at the same seed — per-file spans and row-group sub-chunks
    are pure layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl.corpus import corpus_from_documents, write_pages_corpus_dir

    docs = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(
                [f"text {i} about crawling frontiers" for i in range(30)]
            ),
            "lang": pa.array(["en"] * 30),
            "source": pa.array([f"src{i % 3}" for i in range(30)]),
        }
    )
    mem = corpus_from_documents(docs, pages_per_doc=40, seed=9)
    files = write_pages_corpus_dir(
        docs, str(tmp_path / "pages"), pages_per_doc=40, seed=9,
        rows_per_file=500,
    )
    assert len(files) == 3
    disk = pa.concat_tables([pq.read_table(f) for f in files])
    assert mem.equals(disk)
    # idempotent: a rerun skips existing files, same result
    files2 = write_pages_corpus_dir(
        docs, str(tmp_path / "pages"), pages_per_doc=40, seed=9,
        rows_per_file=500,
    )
    assert files2 == files
