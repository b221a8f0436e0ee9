"""Live/refreshing configuration: JSON-patch splitting + change hooks.

Reference semantics:
- M8 patch splitter (/root/reference/routes/config.js:41-50): a PATCH
  body is a flat list of ``{op, path, value}`` ops whose path's FIRST
  segment names the subsystem; ops are grouped per subsystem with the
  segment stripped from the path.
- T11 refreshing config (lib/crawlerFactory.js:187-238 + the
  refreshing-config store): each subsystem holds a mutable option dict;
  applying patches mutates it and notifies change listeners, which is
  how running components (queue credit, crawler count) react —
  e.g. the AMQP credit resize at providers/queuing/amqp10Queue.js:303-310.

The rebuild applies patches at crawl cycle boundaries
(CrawlEngine.patch_config): a patch never lands mid-epoch, so every
epoch runs under ONE consistent config snapshot — the deterministic
analogue of the reference's asynchronous pub/sub refresh.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable


def collect_patches(patches: list[dict]) -> dict[str, list[dict]]:
    """M8: group ops by first path segment, strip it from each path
    (routes/config.js:41-50). ``{"op": "replace", "path":
    "/crawler/host_rate_per_sec", "value": 50}`` lands in the
    ``crawler`` group with path ``/host_rate_per_sec``."""
    grouped: dict[str, list[dict]] = defaultdict(list)
    for patch in patches:
        segments = patch["path"].split("/")
        key = segments[1]
        grouped[key].append(
            {**patch, "path": "/" + "/".join(segments[2:])}
        )
    return dict(grouped)


class RefreshingConfig:
    """One subsystem's mutable option dict + change listeners."""

    def __init__(self, values: dict[str, Any] | None = None) -> None:
        self.values: dict[str, Any] = dict(values or {})
        self._listeners: list[Callable[[list[dict]], None]] = []

    def on_change(self, listener: Callable[[list[dict]], None]) -> None:
        self._listeners.append(listener)

    def apply(self, patches: list[dict]) -> None:
        """RFC-6902 subset: add / replace / remove on top-level keys
        (the reference's config stores are flat dicts)."""
        for patch in patches:
            key = patch["path"].lstrip("/")
            op = patch.get("op", "replace")
            if op in ("add", "replace"):
                self.values[key] = patch["value"]
            elif op == "remove":
                self.values.pop(key, None)
            else:
                raise ValueError(f"unsupported patch op: {op!r}")
        for listener in self._listeners:
            listener(patches)
