"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; none
of the callables below (nor the raycrawl library) ever call
``ray.init``/``ray.shutdown``.

- ``entry()``: flagship crawl over a pages corpus derived from
  /root/testdata/sf0.001 — the full frontier/dedup/politeness engine.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  (crawl-operator analogues + training-data ops), each a callable
  ``fn(sf_dir) -> Dataset | pyarrow.Table | pandas.DataFrame``.
- ``oracle_sql()``: a DuckDB twin for EVERY query — including the
  iterative crawl (recursive-CTE BFS over a deterministic sidecar link
  graph) and the approximate ANN paths (seeded hyperplane / k-means
  constants inlined, the whole bucketing/training chain reproduced in
  SQL). Recall floors and executor-level oracles are additionally
  asserted in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _registry():
    # importing registers every @query into the shared registry
    from raycrawl.pipelines import (  # noqa: F401
        analytics,
        flagship,
        linkgraph,
        textops,
    )
    from raycrawl.pipelines.analytics import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from raycrawl.pipelines.flagship import run_crawl

    _, table = run_crawl(
        "/root/testdata/sf0.001", pages_per_doc=1, epoch_budget=5_000
    )
    return table


def queries() -> dict[str, Callable[[str], Any]]:
    q, _ = _registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _registry()
    # the flagship-crawl oracles BFS over a sidecar link graph emitted
    # by corpus derivation; materialize it for the driver's comparison
    # sf now so the oracle never races the query side (idempotent,
    # content-keyed /tmp path, ~1s at sf0.01). Guarded so a missing
    # testdata dir degrades to just the flagship pair failing, not
    # oracle_sql() itself dying for every query.
    import os

    from raycrawl.pipelines.flagship import (
        DRIVER_ORACLE_SF,
        ensure_oracle_sidecars,
    )

    if os.path.isdir(DRIVER_ORACLE_SF):
        ensure_oracle_sidecars(DRIVER_ORACLE_SF)
    return dict(o)
