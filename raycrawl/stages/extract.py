"""Deterministic HTML text + link extraction (the visitor map for `page`).

This is the web-graft analogue of the reference's GitHubProcessor visit
step (wired at /root/reference/lib/crawlerFactory.js:175; semantics
pinned by /root/reference/test/unit/processingTests.js:20-43): given a
fetched body, emit the harvested document plus child crawl requests.

The extractor is THE single source of truth for the per-url ``text``
invariant: the synthetic corpus generator calls ``extract_text`` to
produce the oracle ``text`` column, and the pipeline re-derives it from
``html`` — byte-identical per url by construction, asserted in tests
(north rule).

All regex-based, compiled at import, no external parser dependency:
- drop <script>/<style>/<!-- --> blocks
- <a href="..."> hrefs are the out-links (links inside dropped
  script/style/comment blocks are NOT links — they are never rendered)
- block-level tags become newlines, other tags vanish
- HTML entities unescaped, whitespace collapsed per line, blank lines
  dropped

Text and links come out of ONE fused scan (``extract_page``): the body
is traversed once by a single alternation regex and the kept text is
copied once, instead of the former five passes (script, comment,
block-tag, tag, href), each of which produced a full intermediate copy.
At 32 concurrent workers the extract kernel is memory-bandwidth-bound,
so bytes-touched-per-url — not instructions — set the scaling curve;
the fused scan cut the kernel's byte traffic ~4x (measured in
BASELINE.md's 8->32 scaling section).
"""

from __future__ import annotations

import html as _htmlmod
import re
from urllib.parse import urljoin

# One alternation, ordered most-specific-first; group meanings:
#   g1: script/style tag name (whole block consumed, emitted as b'')
#   g2: block-level tag (emitted as b'\n')
#   g3: href value of an <a> tag (tag consumed, link recorded)
#   no group: comment or any other tag (emitted as b'')
_FUSED_RE = re.compile(
    rb"<(script|style)\b.*?</\1\s*>"
    rb"|<!--.*?-->"
    rb"|</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|"
    rb"footer|blockquote|pre|title)\b[^>]*>"
    rb"""|<a\b[^>]*?\bhref\s*=\s*["']([^"'#]+)[#"'][^>]*>"""
    rb"|<[^>]+>",
    re.S | re.I,
)
_WS_RE = re.compile(r"[ \t\r\f\v]+")

_NEWLINE = b"\n"
_EMPTY = b""


def extract_page(
    html_bytes: bytes, base_url: str, *, want_links: bool = True
) -> tuple[str, list[str]]:
    """Fused single-pass extraction: (visible text, absolute out-links).

    ONE scan of the body builds both outputs; C-level regex skips the
    (dominant) text runs between tags, and per-tag Python work is a
    couple of group tests."""
    hrefs: list[bytes] = []
    parts: list[bytes] = []
    pos = 0
    for m in _FUSED_RE.finditer(html_bytes):
        start = m.start()
        if start > pos:
            parts.append(html_bytes[pos:start])
        pos = m.end()
        g = m.lastindex
        if g == 2:  # block-level tag -> line break
            parts.append(_NEWLINE)
        elif g == 3 and want_links:  # <a href=...>
            hrefs.append(m.group(3))
        # g == 1 (script/style), comments, other tags -> dropped
    if pos == 0:  # no tags at all: avoid the copy entirely
        body = html_bytes
    else:
        parts.append(html_bytes[pos:])
        body = _EMPTY.join(parts)

    text = body.decode("utf-8", errors="replace")
    if "&" in text:  # unescape only when an entity can exist (~15 us saved)
        text = _htmlmod.unescape(text)
    lines = []
    for line in text.split("\n"):
        # collapse runs only when a run can exist: the C-level substring
        # probes skip the regex entirely on already-collapsed text
        # (the overwhelmingly common case — measured 13x on the bench
        # corpus, where the whitespace sub was 90 of 117 us/page)
        if (
            "  " in line or "\t" in line or "\r" in line
            or "\f" in line or "\v" in line
        ):
            line = _WS_RE.sub(" ", line)
        line = line.strip()
        if line:
            lines.append(line)
    out_text = "\n".join(lines)
    if not want_links:
        return out_text, []
    return out_text, _resolve_links(hrefs, base_url)


def _resolve_links(hrefs: list[bytes], base_url: str) -> list[str]:
    """Decode, filter, absolutize and first-occurrence-dedup hrefs."""
    seen: set[str] = set()
    out: list[str] = []
    for hb in hrefs:
        href = hb.decode("utf-8", errors="replace").strip()
        if not href or href.startswith(("javascript:", "mailto:", "data:")):
            continue
        if href.startswith("http://"):
            netloc_at = 7
        elif href.startswith("https://"):
            netloc_at = 8
        else:
            netloc_at = -1
        if netloc_at > 0 and len(href) > netloc_at and href[netloc_at] not in "/?":
            # absolute with a non-empty host: urljoin returns it
            # unchanged, and at ~10 us/call urljoin dominated the visit
            # kernel (measured 79 of 131 us/url). Empty-netloc forms
            # ('http://', 'http:///p', 'http://?q') DO resolve against
            # the base, so they take the slow path — property-tested in
            # tests/test_extract_corpus.py
            absolute = href
        else:
            absolute = urljoin(base_url, href)
        if not absolute.startswith(("http://", "https://")):
            continue
        if absolute not in seen:
            seen.add(absolute)
            out.append(absolute)
    return out


def extract_text(html_bytes: bytes) -> str:
    """Deterministically extract visible text from an HTML byte string."""
    return extract_page(html_bytes, "", want_links=False)[0]


def extract_links(html_bytes: bytes, base_url: str) -> list[str]:
    """Extract absolute out-links from <a href> attributes, in document
    order, de-duplicated within the page (first occurrence wins)."""
    return extract_page(html_bytes, base_url)[1]
