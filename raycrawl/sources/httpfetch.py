"""Real-transport fetcher: HTTP over actual sockets.

The reference's fetcher IS the network (lib/crawlerFactory.js:240-262
wraps requestor.get; test/unit/processingTests.js:93-109 swaps it).
The sandbox default is the corpus-table fetcher; this module is the
production-shaped alternative — every page the engine processes is
GETted from an HTTP origin over a TCP socket, with MEASURED wall time
feeding the A7 latency contract (``elapsed_ms`` → the ComputeBudget's
measured-µs cost rows, unit flag 1) instead of the byte proxy.

``HttpFetcher`` speaks the worker's url-addressed fetcher protocol
(``wants_urls`` / ``lookup_urls``): the worker hands it the batch's
URLs, it issues one GET per non-skipped row (keep-alive connection to
a fixed upstream address, original Host preserved in the Host header —
the shape of a forward proxy / sidecar egress), buffers
(body, lang, fetched_at, elapsed) per batch, and serves the standard
body/bodies/lang/fetched_at accessors from that buffer. 404 → not
found (retry ledger / deadletter path over the wire), 200 → document.

``serve_corpus_http`` is the matching origin: a stdlib
ThreadingHTTPServer over a pages table keyed by (host, path), with
optional per-host injected latency so politeness/compute-budget tests
exercise real delays. Tests bind it to 127.0.0.1:0; a deployment
points ``HttpFetcher.at()`` at its egress proxy instead.
"""

from __future__ import annotations

import http.client
import time

import numpy as np
import pyarrow as pa


class HttpFetcher:
    """Url-addressed fetcher over a keep-alive HTTP connection.

    Injection contract: the engine instantiates ``fetcher_cls(corpus,
    index)`` — both are IGNORED here (the wire is the source of truth).
    Configure the upstream with ``HttpFetcher.at((host, port))``, which
    returns a subclass with the address baked in (pickles by value into
    worker actors).
    """

    wants_urls = True
    upstream: tuple[str, int] | None = None

    @classmethod
    def at(cls, address: tuple[str, int]) -> type:
        return type(
            "HttpFetcherAt", (cls,), {"upstream": tuple(address)}
        )

    def __init__(self, corpus=None, index=None) -> None:
        if self.upstream is None:
            raise ValueError("use HttpFetcher.at((host, port))")
        self._conn: http.client.HTTPConnection | None = None
        # per-batch row buffers (the worker consumes each batch fully
        # before the next lookup): body / lang / fetched_at_us / ms
        self._bodies: list[bytes] = []
        self._langs: list[str] = []
        self._ts: list[int] = []
        self._ms: list[float] = []

    def _connection(self) -> http.client.HTTPConnection:
        if self._conn is None:
            self._conn = http.client.HTTPConnection(
                self.upstream[0], self.upstream[1], timeout=30
            )
        return self._conn

    def _get(self, url: str):
        scheme_rest = url.split("://", 1)
        rest = scheme_rest[1] if len(scheme_rest) == 2 else url
        host, _, path = rest.partition("/")
        conn = self._connection()
        try:
            conn.request(
                "GET", "/" + path, headers={"Host": host}
            )
            resp = conn.getresponse()
            body = resp.read()
        except (http.client.HTTPException, OSError):
            # dead keep-alive (server restart, timeout): one reconnect
            self._conn.close()
            self._conn = None
            conn = self._connection()
            conn.request("GET", "/" + path, headers={"Host": host})
            resp = conn.getresponse()
            body = resp.read()
        return resp, body

    def lookup_urls(self, urls, digests, skip=None):
        n = len(urls)
        found = np.zeros(n, dtype=bool)
        rows = np.zeros(n, dtype=np.int64)
        self._bodies, self._langs, self._ts, self._ms = [], [], [], []
        for i, url in enumerate(urls):
            if skip is not None and skip[i]:
                continue
            t0 = time.perf_counter()
            resp, body = self._get(url)
            ms = (time.perf_counter() - t0) * 1e3
            if resp.status != 200:
                continue
            found[i] = True
            rows[i] = len(self._bodies)
            self._bodies.append(body)
            self._langs.append(resp.headers.get("X-Lang", ""))
            self._ts.append(
                int(resp.headers.get("X-Fetched-At-Us", "0"))
            )
            self._ms.append(ms)
        return found, rows

    # A7 contract: measured wall time per row → the worker's host-cost
    # rows carry real microseconds (unit flag 1), so the ComputeBudget
    # baseline is a true network floor
    def elapsed_ms(self, row: int) -> float:
        return self._ms[int(row)]

    def body(self, idx: int) -> bytes:
        return self._bodies[int(idx)]

    def bodies(self, idx) -> list[bytes]:
        return [self._bodies[int(i)] for i in np.asarray(idx)]

    def lang(self, idx: int) -> str:
        return self._langs[int(idx)]

    def fetched_at(self, idx: int) -> int:
        return self._ts[int(idx)]


def serve_corpus_http(
    corpus: pa.Table,
    latency_ms_by_host: dict[str, float] | None = None,
    address: tuple[str, int] = ("127.0.0.1", 0),
):
    """Start a threading HTTP origin serving ``corpus`` rows keyed by
    (host, path); returns (server, (host, port)). Responses carry the
    row's lang and warc_ts as headers; unknown paths 404. Optional
    per-host sleep injects deterministic network latency. Call
    ``server.shutdown()`` when done."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    pages: dict[tuple[str, str], tuple[bytes, str, int]] = {}
    for url, body, lang, ts_us in zip(
        corpus.column("url").to_pylist(),
        corpus.column("html").to_pylist(),
        corpus.column("lang").to_pylist(),
        # raw epoch-µs, exactly TableFetcher.fetched_at's .value
        corpus.column("warc_ts").cast(pa.int64()).to_pylist(),
    ):
        rest = url.split("://", 1)[1]
        host, _, path = rest.partition("/")
        pages[(host.lower(), "/" + path)] = (body, lang, int(ts_us))
    latency = {
        h.lower(): ms for h, ms in (latency_ms_by_host or {}).items()
    }

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive

        def do_GET(self):  # noqa: N802 (stdlib naming)
            host = (self.headers.get("Host") or "").split(":")[0].lower()
            ms = latency.get(host)
            if ms:
                time.sleep(ms / 1e3)
            hit = pages.get((host, self.path))
            if hit is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body, lang, ts_us = hit
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Lang", lang)
            self.send_header("X-Fetched-At-Us", str(ts_us))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer(address, Handler)
    import threading

    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address
