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
- <a href="..."> hrefs are the out-links
- block-level tags become newlines, other tags vanish
- HTML entities unescaped, whitespace collapsed per line, blank lines
  dropped
"""

from __future__ import annotations

import html as _htmlmod
import re
from urllib.parse import urljoin

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_HREF_RE = re.compile(rb"""<a\b[^>]*?\bhref\s*=\s*["']([^"'#]+)[#"']""", re.I)
_BLOCK_TAG_RE = re.compile(
    rb"</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|"
    rb"blockquote|pre|title)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes) -> str:
    """Deterministically extract visible text from an HTML byte string."""
    body = _SCRIPT_RE.sub(b"", html_bytes)
    body = _COMMENT_RE.sub(b"", body)
    body = _BLOCK_TAG_RE.sub(b"\n", body)
    body = _TAG_RE.sub(b"", body)
    text = body.decode("utf-8", errors="replace")
    if "&" in text:  # unescape only when an entity can exist (~15 us saved)
        text = _htmlmod.unescape(text)
    lines = []
    for line in text.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_links(html_bytes: bytes, base_url: str) -> list[str]:
    """Extract absolute out-links from <a href> attributes, in document
    order, de-duplicated within the page (first occurrence wins)."""
    seen: set[str] = set()
    out: list[str] = []
    for m in _HREF_RE.finditer(html_bytes):
        href = m.group(1).decode("utf-8", errors="replace").strip()
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
