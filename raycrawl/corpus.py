"""Deterministic synthetic corpora.

Two corpora, both fully seeded (no wall-clock, no unseeded randomness):

1. ``make_pages_corpus`` — a Common-Crawl-style pages table
   ``(url, warc_ts, html, text, lang)`` per the graft input hint
   (/root/repo/BASELINE.json), embedding a seeded link graph in the
   ``html``. Host popularity is zipf-skewed (hot-host skew for the
   politeness/partitioning paths), a fraction of links dangle (404 →
   deadletter path), a fraction of links are written in non-canonical
   form (RFC-3986 canonicalization path), and many pages are reachable
   via multiple parents (dedup path). The ``text`` column is produced
   by the SAME ``extract_text`` the pipeline uses, so the byte-identical
   per-url invariant holds by construction and is asserted in tests.

2. ``ghgraph_corpus`` — the GitHub-entity fixture graph transcribed from
   the reference's golden end-to-end test
   (/root/reference/test/unit/processingTests.js:111-238), used to
   assert pop-order + queued-children parity (:20-43).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .stages.extract import extract_text

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_WORDS = (
    "crawl frontier queue fetch parse extract link host page document "
    "politeness budget shard filter epoch lineage resume arrow batch "
    "stream block spill shuffle priority depth discovery deadletter"
).split()

_LANGS = ["en", "de", "fr", "es", "en", "en"]


def page_url(host_idx: int, page_idx: int) -> str:
    return f"http://host{host_idx}.example.com/p/{page_idx}"


def _noncanonical_variant(url: str, rng: np.random.Generator) -> str:
    """Rewrite a canonical URL into an equivalent non-canonical form."""
    return _noncanonical_for_kind(url, int(rng.integers(0, 4)))


def _noncanonical_for_kind(url: str, kind: int) -> str:
    """Pure-function body of `_noncanonical_variant` (kind pre-drawn) —
    lets the parallel corpus builder precompute every rng draw and keep
    chunked generation byte-identical to the sequential loop."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if kind == 0:
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if kind == 1:
        return f"{scheme}://{host}:80/{path}"
    if kind == 2:
        return f"{scheme}://{host}/./{path.replace('/', '/../' + path.split('/')[0] + '/', 1)}"
    # percent-encode an unreserved character ('p' -> %70)
    return f"{scheme}://{host}/{path.replace('p', '%70', 1)}"


def make_pages_corpus(
    num_hosts: int = 8,
    pages_per_host: int = 40,
    seed: int = 42,
    out_degree: int = 6,
    dangling_frac: float = 0.04,
    variant_frac: float = 0.10,
    paragraphs: int = 3,
    robots: dict[str, str] | None = None,
) -> pa.Table:
    """Build the deterministic pages table (see module docstring).

    ``robots``: optional {host: robots.txt text} — each entry adds a
    ``http://<host>/robots.txt`` row to the corpus so the engine's
    robots ingestion (CrawlConfig.respect_robots) has something real
    to fetch and parse."""
    rng = np.random.default_rng(seed)
    n = num_hosts * pages_per_host
    # zipf-ish host popularity: weight ~ 1/(rank+1)
    host_w = 1.0 / (np.arange(num_hosts) + 1.0)
    host_w /= host_w.sum()

    urls, tss, htmls, texts, langs = [], [], [], [], []
    idx = 0
    for h in range(num_hosts):
        for p in range(pages_per_host):
            url = page_url(h, p)
            links: list[str] = []
            for _ in range(out_degree):
                r = rng.random()
                if r < dangling_frac:
                    links.append(
                        f"http://host{int(rng.integers(0, num_hosts))}"
                        f".example.com/missing/{int(rng.integers(0, 10**6))}"
                    )
                    continue
                th = int(rng.choice(num_hosts, p=host_w))
                tp = int(rng.integers(0, pages_per_host))
                target = page_url(th, tp)
                if rng.random() < variant_frac:
                    target = _noncanonical_variant(target, rng)
                links.append(target)
            words = rng.choice(len(_WORDS), size=paragraphs * 12)
            paras = []
            for q in range(paragraphs):
                chunk = " ".join(_WORDS[w] for w in words[q * 12 : (q + 1) * 12])
                paras.append(f"<p>{chunk}</p>")
            anchors = "".join(
                f'<a href="{link}">link {j}</a>' for j, link in enumerate(links)
            )
            html = (
                f"<html><head><title>page {h}/{p}</title>"
                f"<style>.x{{color:red}}</style></head>"
                f"<body><h1>Host {h} Page {p}</h1>{''.join(paras)}"
                f"<div>{anchors}</div>"
                f"<script>var t={idx};</script></body></html>"
            ).encode("utf-8")
            urls.append(url)
            tss.append(BASE_TS_US + idx * 1_000_000)
            htmls.append(html)
            texts.append(extract_text(html))
            langs.append(_LANGS[idx % len(_LANGS)])
            idx += 1

    for host, body in (robots or {}).items():
        urls.append(f"http://{host}/robots.txt")
        tss.append(BASE_TS_US + idx * 1_000_000)
        htmls.append(body.encode("utf-8"))
        texts.append(body)
        langs.append("en")
        idx += 1

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def default_seeds(num_seed_hosts: int = 2) -> list[dict]:
    """Seed list: page 0 of the first hosts (reference: CRAWLER_ORGS seeding,
    /root/reference/lib/crawlerFactory.js:633-650)."""
    return [
        {"url": page_url(h, 0), "type": "page", "policy": "default",
         "queue": "normal"}
        for h in range(num_seed_hosts)
    ]


# Page-build context for forked corpus workers: set in the parent
# BEFORE the Pool forks, read copy-on-write by children — the big
# (targets, dangle, kind) arrays are never pickled.
_CHUNK_CTX: tuple | None = None

# below this many pages the fork Pool costs more than it saves
# (tests lower it to force the parallel path on tiny corpora)
_PARALLEL_MIN_ROWS = 100_000


def _build_pages_chunk(span: tuple[int, int]) -> pa.Table:
    """Rows [lo, hi) of the pages corpus from the precomputed draw
    arrays in `_CHUNK_CTX`. Pure function of the context + span, so any
    chunking (including none) yields byte-identical concatenation."""
    lo, hi = span
    (pages_per_doc, doc_ids, texts, langs, sources,
     targets, dangle, variant, kind_at) = _CHUNK_CTX

    def _url(i: int) -> str:
        d, p = divmod(i, pages_per_doc)
        return f"http://{sources[d]}.example.com/doc/{doc_ids[d]}/{p}"

    out_degree = targets.shape[1]
    urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
    for i in range(lo, hi):
        d = i // pages_per_doc
        links = []
        for j in range(out_degree):
            if dangle[i, j]:
                links.append(
                    f"http://{sources[d]}.example.com/missing/{int(targets[i, j])}"
                )
                continue
            target = _url(int(targets[i, j]))
            if variant[i, j]:
                target = _noncanonical_for_kind(target, int(kind_at[i, j]))
            links.append(target)
        anchors = "".join(
            f'<a href="{link}">link {j}</a>' for j, link in enumerate(links)
        )
        html = (
            f"<html><head><title>doc {doc_ids[d]}</title></head>"
            f"<body><h1>{sources[d]}</h1><p>{texts[d]}</p>"
            f"<div>{anchors}</div><script>var d={i};</script></body></html>"
        ).encode("utf-8")
        urls.append(_url(i))
        tss.append(BASE_TS_US + i * 1_000_000)
        htmls.append(html)
        out_texts.append(extract_text(html))
        out_langs.append(langs[d])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def _prepare_pages_ctx(
    docs: pa.Table,
    *,
    pages_per_doc: int,
    out_degree: int,
    seed: int,
    dangling_frac: float,
    variant_frac: float,
) -> int:
    """All rng draws for a pages corpus, up front, into `_CHUNK_CTX`
    (shared by `corpus_from_documents` and `write_pages_corpus_dir`).
    Returns the total page count.

    Link-target popularity ~ zipf over page index mixed with a uniform
    floor (graph model v2). Pure zipf left ~42% of a 3M-page corpus
    with expected in-degree < 1 — unreachable from any seed set — and a
    BFS tail of ~15 levels holding <2k urls each, so the sandbox
    benchmark measured per-level RPC latency instead of throughput.
    Real web frontiers have hub skew AND a fat body: the 80/20
    zipf/uniform mixture keeps hot hubs (max in-degree ~10^5 at 3M
    pages) while giving every page in-degree >= ~1.6 expected, which is
    what a 10^10-URL frontier's per-level population looks like. The
    per-variant-link `kind` draws are a single vectorized
    `integers(0, 4, size=variant.sum())`, which NumPy guarantees
    consumes the PCG64 stream identically to the old per-link scalar
    draws. Seeded + deterministic."""
    global _CHUNK_CTX
    rng = np.random.default_rng(seed)
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    n = len(doc_ids) * pages_per_doc
    w = 1.0 / (np.arange(n) + 1.0)
    w /= w.sum()
    w = 0.8 * w + 0.2 / n
    targets = rng.choice(n, size=(n, out_degree), p=w)
    dangle = rng.random((n, out_degree)) < dangling_frac
    variant = rng.random((n, out_degree)) < variant_frac
    # kinds land on variant-AND-NOT-dangling cells in row-major order —
    # exactly the cells (and the order) the old loop consumed scalar
    # draws in: dangling links `continue` before the variant branch
    draws = variant & ~dangle
    kind_at = np.full((n, out_degree), -1, dtype=np.int8)
    kind_at[draws] = rng.integers(
        0, 4, size=int(draws.sum())
    ).astype(np.int8)
    _CHUNK_CTX = (pages_per_doc, doc_ids, texts, langs, sources,
                  targets, dangle, variant, kind_at)
    return n


def _write_pages_file(job: tuple) -> str:
    """Pool worker for `write_pages_corpus_dir`: build span [lo, hi) in
    bounded sub-chunks and stream them as row groups of ONE parquet
    file — peak worker memory is `step` rows, never the whole span."""
    (lo, hi), step, path = job
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp{os.getpid()}"
    writer = None
    try:
        for a in range(lo, hi, step):
            part = _build_pages_chunk((a, min(a + step, hi)))
            if writer is None:
                writer = pq.ParquetWriter(tmp, part.schema)
            writer.write_table(part)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, path)
    return path


def write_pages_corpus_dir(
    docs: pa.Table,
    out_dir: str,
    *,
    pages_per_doc: int = 1,
    out_degree: int = 8,
    seed: int = 42,
    dangling_frac: float = 0.02,
    variant_frac: float = 0.05,
    rows_per_file: int = 1_500_000,
    processes: int | None = None,
) -> list[str]:
    """The SAME corpus as `corpus_from_documents` (same seed ⇒ same
    rows in the same order), STREAMED to one parquet file per
    `rows_per_file` span — the larger-than-memory path: no process ever
    holds more than a sub-chunk of rows, and the crawl consumes the
    directory via the sharded-corpus path-source (the driver never
    reads a single page). Idempotent per file (reruns skip existing
    files), so a killed generation resumes."""
    global _CHUNK_CTX
    n = _prepare_pages_ctx(
        docs,
        pages_per_doc=pages_per_doc,
        out_degree=out_degree,
        seed=seed,
        dangling_frac=dangling_frac,
        variant_frac=variant_frac,
    )
    os.makedirs(out_dir, exist_ok=True)
    step = min(200_000, rows_per_file)  # sub-chunk rows per row group
    jobs = [
        (
            (lo, min(lo + rows_per_file, n)),
            step,
            os.path.join(out_dir, f"pages-{i:05d}.parquet"),
        )
        for i, lo in enumerate(range(0, n, rows_per_file))
    ]
    try:
        if processes is not None:
            n_proc = processes
        else:
            try:
                n_proc = len(os.sched_getaffinity(0))
            except (AttributeError, OSError):  # pragma: no cover
                n_proc = os.cpu_count() or 4
        n_proc = max(1, min(n_proc, 32, len(jobs)))
        if n_proc == 1:
            for j in jobs:
                _write_pages_file(j)
        else:
            import multiprocessing

            with multiprocessing.get_context("fork").Pool(n_proc) as pool:
                pool.map(_write_pages_file, jobs)
    finally:
        _CHUNK_CTX = None
    return [p for _, _, p in jobs]


def corpus_from_documents(
    docs: pa.Table,
    *,
    pages_per_doc: int = 1,
    out_degree: int = 8,
    seed: int = 42,
    dangling_frac: float = 0.02,
    variant_frac: float = 0.05,
    processes: int | None = None,
) -> pa.Table:
    """Derive a deterministic pages corpus from a driver ``documents``
    table (doc_id, text, lang, source): each doc spawns `pages_per_doc`
    pages on a host named after its source, with page text drawn from
    the doc text and a seeded skewed link graph. Used by the flagship
    entry() / bench so the crawl input derives from /root/testdata.

    Every rng draw happens up front (the per-variant-link `kind` draws
    are a single vectorized `integers(0, 4, size=variant.sum())`, which
    NumPy guarantees consumes the PCG64 stream identically to the old
    per-link scalar draws), so page construction is rng-free and runs
    chunked across a fork Pool — output is byte-identical regardless of
    `processes` (asserted in tests). The 3M-page bench corpus was a
    ~7-minute single-core loop; chunks also bound peak Python-object
    memory (each worker materializes ~n/chunks rows, the parent only
    holds Arrow tables)."""
    n = _prepare_pages_ctx(
        docs,
        pages_per_doc=pages_per_doc,
        out_degree=out_degree,
        seed=seed,
        dangling_frac=dangling_frac,
        variant_frac=variant_frac,
    )
    global _CHUNK_CTX
    try:
        import os

        if processes is not None:
            n_proc = processes
        else:
            # affinity-aware: os.cpu_count() ignores sched_setaffinity,
            # so a bench child pinned to 8 cores would fork 32 workers
            # onto them (ADVICE r3)
            try:
                n_proc = len(os.sched_getaffinity(0))
            except (AttributeError, OSError):  # pragma: no cover
                n_proc = os.cpu_count() or 4
        n_proc = max(1, min(n_proc, 32))
        if n < _PARALLEL_MIN_ROWS or n_proc == 1:
            return _build_pages_chunk((0, n))
        import multiprocessing

        step = max(1, -(-n // (n_proc * 4)))  # ~4 chunks per process
        spans = [(lo, min(lo + step, n)) for lo in range(0, n, step)]
        with multiprocessing.get_context("fork").Pool(n_proc) as pool:
            parts = pool.map(_build_pages_chunk, spans)
        return pa.concat_tables(parts)
    finally:
        _CHUNK_CTX = None


def seeds_for_corpus(corpus: pa.Table, num_seeds: int = 4) -> list[dict]:
    """Seed list = every (n/num_seeds)-th page of the corpus
    (deterministic). Materializes ONLY the sampled rows — to_pylist of
    the full url column cost seconds at millions of pages."""
    n = corpus.num_rows
    step = max(1, n // num_seeds)
    idx = list(range(0, min(n, num_seeds * step), step))[:num_seeds]
    urls = corpus.column("url").take(pa.array(idx, pa.int64())).to_pylist()
    return [
        {"url": u, "type": "page", "policy": "default", "queue": "normal"}
        for u in urls
    ]


# ---------------------------------------------------------------------------
# GitHub-entity golden fixture (transcribed behavior, not copied code).
# ---------------------------------------------------------------------------

_GH = "https://api.github.com"


def ghgraph_corpus() -> pa.Table:
    """13-resource fixture graph mirroring the reference golden corpus
    (/root/reference/test/unit/processingTests.js:111-238)."""
    resources: dict[str, tuple[str, object]] = {
        f"{_GH}/orgs/test": ("org", {
            "id": 1,
            "url": f"{_GH}/orgs/test",
            "repos_url": f"{_GH}/orgs/test/repos",
            "members_url": f"{_GH}/orgs/test/members{{/member}}",
        }),
        f"{_GH}/orgs/test/repos": ("repos", []),
        f"{_GH}/orgs/test/members": ("members", [
            {"url": f"{_GH}/users/test"},
            {"url": f"{_GH}/users/user2"},
        ]),
        f"{_GH}/orgs/test/teams": ("teams", [
            {"url": f"{_GH}/teams/20"},
        ]),
        f"{_GH}/users/test": ("user", {
            "id": 1,
            "url": f"{_GH}/users/test",
            "repos_url": f"{_GH}/users/test/repos",
        }),
        f"{_GH}/users/test/repos": ("repos", []),
        f"{_GH}/users/user2": ("user", {
            "id": 2,
            "url": f"{_GH}/users/user2",
            "repos_url": f"{_GH}/users/user2/repos",
        }),
        f"{_GH}/users/user2/repos": ("repos", []),
        f"{_GH}/teams/20": ("team", {
            "id": 20,
            "members_url": f"{_GH}/teams/20/members{{/member}}",
            "repositories_url": f"{_GH}/teams/20/repos",
        }),
        f"{_GH}/teams/20/repos": ("repos", []),
        f"{_GH}/teams/20/members": ("members", []),
    }
    urls, types, bodies = [], [], []
    for url, (typ, body) in resources.items():
        urls.append(url)
        types.append(typ)
        bodies.append(json.dumps(body).encode("utf-8"))
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([BASE_TS_US + i for i in range(n)],
                                 pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


# True pop order of the reference golden (processingTests.js:20-43) with
# queued-children counts counted BEFORE dedup. Note the reference's own
# step-6 assertion re-checks the stale urn:org:1:repos:page:1 doc — the
# actually-popped request at step 6 is user test's repos page, which is
# what this table records.
GHGRAPH_EXPECTED_POP_ORDER: list[tuple[str, str, int]] = [
    ("org", "urn:org:1", 4),
    ("user", "urn:user:1", 1),
    ("repos", "urn:org:1:repos:page:1", 0),
    ("members", "urn:org:1:members:page:1", 2),
    ("teams", "urn:org:1:teams:page:1", 1),
    ("repos", "urn:user:1:repos:page:1", 0),
    ("user", "urn:user:2", 1),
    ("team", "urn:team:20", 2),
    ("repos", "urn:user:2:repos:page:1", 0),
    ("members", "urn:team:20:members:page:1", 0),
    ("repos", "urn:team:20:repos:page:1", 0),
]


def ghgraph_paginated_corpus(repos_pages: int = 3, per_page: int = 2) -> pa.Table:
    """Entity fixture whose org repos collection spans `repos_pages`
    pages of `per_page` repos each — exercises the multi-page URN
    scheme (urn:org:1:repos:page:N, processingTests.js:28; ghcrawler
    follows the Link header for page 2+, modeled here as the
    {"items", "next"} envelope the visitor understands)."""
    org_url = f"{_GH}/orgs/big"
    resources: dict[str, tuple[str, object]] = {
        org_url: ("org", {
            "id": 1,
            "url": org_url,
            "repos_url": f"{org_url}/repos",
            "members_url": f"{org_url}/members{{/member}}",
        }),
        f"{org_url}/members": ("members", []),
        f"{org_url}/teams": ("teams", []),
        f"{_GH}/users/big": ("user", {
            "id": 1,
            "url": f"{_GH}/users/big",
            "repos_url": f"{_GH}/users/big/repos",
        }),
        f"{_GH}/users/big/repos": ("repos", []),
    }
    rid = 0
    for p in range(1, repos_pages + 1):
        page_u = f"{org_url}/repos" if p == 1 else f"{org_url}/repos?page={p}"
        items = []
        for _ in range(per_page):
            rid += 1
            repo_u = f"{_GH}/repos/big/r{rid}"
            items.append({"url": repo_u})
            resources[repo_u] = ("repo", {
                "id": 100 + rid,
                "url": repo_u,
                "owner": {"url": f"{_GH}/users/big"},
            })
        body: object = {"items": items}
        if p < repos_pages:
            body["next"] = f"{org_url}/repos?page={p + 1}"
        resources[page_u] = ("repos", body)
    urls, types, bodies = [], [], []
    for url, (typ, body) in resources.items():
        urls.append(url)
        types.append(typ)
        bodies.append(json.dumps(body).encode("utf-8"))
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([BASE_TS_US + i for i in range(n)],
                                 pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
