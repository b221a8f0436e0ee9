"""Visitor map: fetched body -> (document urn, child crawl requests).

Reimplements the traversal semantics the reference pins in its golden
end-to-end test (/root/reference/test/unit/processingTests.js:13-46 with
fixture corpus :111-238): each entity type maps to a URN plus a fixed
set of child requests —

    org          -> 4 children [user, repos page, members page, teams page]
    user         -> 1 child    [repos page]
    team         -> 2 children [members page, repos page]
    repo         -> 1 child    [owner user]
    repos page   -> one 'repo' per element
    members page -> one 'user' per element
    teams page   -> one 'team' per element
    page (web)   -> one 'page' per extracted <a href> link

Collection pages get URNs of the form ``{parent_urn}:{relation}:page:{n}``
(e.g. ``urn:org:1:teams:page:1`` — processingTests.js:28), i.e. pages are
themselves documents. The child-count numbers above are the queued-
candidate counts BEFORE dedup (the reference's spy counts ``crawler.queue``
calls before the attenuation/tracker suppresses duplicates).

Bodies are JSON strings for GitHub-style entities, raw HTML bytes for
``page``. ``visit`` is pure and deterministic.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

from .extract import extract_page

_TEMPLATE_RE = re.compile(r"\{[^}]*\}")
_PAGE_RE = re.compile(r"[?&]page=(\d+)")

COLLECTION_CHILD_TYPE = {"repos": "repo", "members": "user", "teams": "team"}


def _page_number(url: str) -> int:
    """Collection page number from the `page` query param (GitHub API
    pagination convention); absent -> page 1."""
    m = _PAGE_RE.search(url)
    return int(m.group(1)) if m else 1


@dataclass
class ChildRequest:
    type: str
    url: str
    queue: str = "normal"
    parent_urn: str = ""
    relation: str = ""


@dataclass
class VisitResult:
    urn: str
    doc_type: str
    text: str = ""          # extracted text (pages) — byte-identical invariant
    body: str = ""          # raw JSON body (entities)
    children: list[ChildRequest] = field(default_factory=list)


def _strip_template(url: str) -> str:
    """GitHub URL templates: 'https://x/members{/member}' -> 'https://x/members'."""
    return _TEMPLATE_RE.sub("", url)


def page_urn(canonical_url: str) -> str:
    return "urn:page:" + hashlib.sha1(canonical_url.encode("utf-8")).hexdigest()


def visit(
    req_type: str,
    url: str,
    body: bytes,
    parent_urn: str = "",
    relation: str = "",
    child_queue: str = "normal",
) -> VisitResult:
    """Process one fetched body; emit document identity + children."""
    if req_type in ("page", "event_trigger"):
        # event_trigger (reference lib/crawlerFactory.js:657-681): the
        # event names a URL to crawl with priority; in the pages domain
        # that is a page visit. (Deviation, documented: the reference
        # embeds the pre-fetched body in the request payload; this
        # engine's frontier carries only payload_etag, and the fetch
        # stage re-reads the body from the corpus — equivalent here
        # because fetches are deterministic lookups.)
        text, links = extract_page(body, url)
        urn = page_urn(url)
        children = [
            ChildRequest("page", link, child_queue, urn, "links") for link in links
        ]
        return VisitResult(urn=urn, doc_type="page", text=text, children=children)

    doc = json.loads(body.decode("utf-8"))

    if req_type in COLLECTION_CHILD_TYPE:  # a collection page
        # Multi-page collections (reference URN scheme
        # urn:org:1:repos:page:N, test/unit/processingTests.js:28;
        # ghcrawler follows the Link header for page 2+). The corpus's
        # stand-in for the Link header is a JSON envelope
        # {"items": [...], "next": "<url>?page=N+1"}; a bare JSON list
        # is a single-page collection (page:1, no next). The page
        # number comes from the URL's `page` query param.
        child_type = COLLECTION_CHILD_TYPE[req_type]
        urn = f"{parent_urn}:{req_type}:page:{_page_number(url)}"
        elements, next_url = doc, None
        if isinstance(doc, dict):
            elements = doc.get("items", [])
            next_url = doc.get("next")
        children = [
            ChildRequest(child_type, element["url"], child_queue, urn, req_type)
            for element in elements
            if isinstance(element, dict) and element.get("url")
        ]
        if next_url:
            # next page keeps the SAME type/relation/parent so its urn
            # continues the page:N sequence under the same parent
            children.append(
                ChildRequest(
                    req_type, next_url, child_queue, parent_urn, req_type
                )
            )
        return VisitResult(
            urn=urn, doc_type=req_type, body=json.dumps(doc), children=children
        )

    if req_type == "org":
        urn = f"urn:org:{doc['id']}"
        children = [
            ChildRequest("user", doc["url"].replace("/orgs/", "/users/"),
                         child_queue, urn, "user"),
            ChildRequest("repos", doc["repos_url"], child_queue, urn, "repos"),
            ChildRequest("members", _strip_template(doc["members_url"]),
                         child_queue, urn, "members"),
            ChildRequest("teams", doc["url"] + "/teams", child_queue, urn, "teams"),
        ]
    elif req_type == "user":
        urn = f"urn:user:{doc['id']}"
        children = [
            ChildRequest("repos", doc["repos_url"], child_queue, urn, "repos"),
        ]
    elif req_type == "team":
        urn = f"urn:team:{doc['id']}"
        children = [
            ChildRequest("members", _strip_template(doc["members_url"]),
                         child_queue, urn, "members"),
            ChildRequest("repos", doc["repositories_url"], child_queue, urn, "repos"),
        ]
    elif req_type == "repo":
        urn = f"urn:repo:{doc['id']}"
        children = []
        owner = doc.get("owner")
        if isinstance(owner, dict) and owner.get("url"):
            children.append(
                ChildRequest("user", owner["url"], child_queue, urn, "owner")
            )
    else:
        raise ValueError(f"unknown request type: {req_type!r}")

    return VisitResult(
        urn=urn, doc_type=req_type, body=json.dumps(doc), children=children
    )
