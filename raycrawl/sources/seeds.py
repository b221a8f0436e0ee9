"""Seed-list loading (S14): the reference reads ``CRAWLER_ORGS`` as a
';'-separated lowercased list, or a file split on whitespace
(/root/reference/lib/crawlerFactory.js:633-650). Generalized here to
URL seed lists; org/repo string specs go through the request
rationalizer (api.queue_requests, M1)."""

from __future__ import annotations

import os


def parse_seed_spec(spec: str) -> list[str]:
    """';'-separated env-style list → lowercased entries
    (lib/crawlerFactory.js:636-641)."""
    return [s.strip().lower() for s in spec.split(";") if s.strip()]


def load_seed_file(path: str) -> list[str]:
    """Whitespace-separated seed file (lib/crawlerFactory.js:643-650)."""
    with open(path, "r", encoding="utf-8") as fh:
        return [tok.lower() for tok in fh.read().split() if tok]


def load_seeds(env: dict | None = None) -> list[str]:
    """CRAWLER_ORGS env var wins; CRAWLER_ORGS_FILE is the fallback —
    same precedence as the reference."""
    env = os.environ if env is None else env
    spec = env.get("CRAWLER_ORGS", "")
    if spec:
        return parse_seed_spec(spec)
    path = env.get("CRAWLER_ORGS_FILE", "")
    if path and os.path.exists(path):
        return load_seed_file(path)
    return []
