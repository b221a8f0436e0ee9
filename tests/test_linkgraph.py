"""PageRank over the corpus link graph: oracle parity at sf0.001, a
dense-numpy third implementation, and the dangling-mass arithmetic the
synthetic corpora never exercise (no zero-out-degree page survives an
out_degree=8 derivation)."""

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _normalize(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_frame(result):
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


def test_pagerank_matches_unrolled_cte_oracle(ray_session):
    from raycrawl.pipelines.flagship import ensure_oracle_sidecars
    from raycrawl.pipelines.linkgraph import (
        _pagerank_oracle_sql,
        link_pagerank,
    )

    ensure_oracle_sidecars(SF_DIR)
    got = _normalize(link_pagerank(SF_DIR).to_pandas())
    want = _normalize(
        duckdb.connect().execute(_pagerank_oracle_sql(SF_DIR)).df()
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # probability mass conservation: sum(rank) == 1, so the
    # mean-scaled basis points sum to N * 1e4 up to rounding
    assert abs(got["rank_bp"].sum() - len(got) * 10_000) <= len(got)


def test_pagerank_registered_oracle_targets_driver_sf(ray_session):
    import __ray_entry__ as e
    from raycrawl.pipelines.flagship import DRIVER_ORACLE_SF
    from raycrawl.pipelines.linkgraph import _pagerank_oracle_sql

    oracles = e.oracle_sql()
    assert oracles["link_pagerank"] == _pagerank_oracle_sql(
        DRIVER_ORACLE_SF
    )


def test_pagerank_matches_dense_numpy_reference(ray_session):
    """Independent dense reference over the SAME sidecar graph — locks
    the iteration count and constant placement. An off-by-one in the
    SQL unroll or a swapped alpha/teleport would pass engine-vs-oracle
    only if both sides made the same mistake; a third implementation
    breaks the tie. Tolerance 1 bp: the distributed sum order differs
    from the dense bincount order by ~1e-15 relative."""
    import pyarrow.parquet as pq

    from raycrawl.pipelines.flagship import ensure_oracle_sidecars
    from raycrawl.pipelines.linkgraph import (
        _ALPHA,
        _ITERS,
        _TELEPORT,
        link_pagerank,
    )

    d = ensure_oracle_sidecars(SF_DIR)
    pages = pq.read_table(f"{d}/pages.parquet", columns=["url"])
    links = pq.read_table(f"{d}/links.parquet")
    urls = np.sort(np.asarray(pages.column("url").to_pylist(), dtype=str))
    n = urls.size
    src = np.searchsorted(
        urls, np.asarray(links.column("src_url").to_pylist(), dtype=str)
    )
    dst = np.searchsorted(
        urls, np.asarray(links.column("dst_url").to_pylist(), dtype=str)
    )
    outdeg = np.bincount(src, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(_ITERS):
        d_mass = float(r[outdeg == 0].sum())
        inflow = np.bincount(
            dst, weights=r[src] / outdeg[src], minlength=n
        )
        r = _TELEPORT / n + _ALPHA * (inflow + d_mass / n)
    want_bp = np.floor(r * n * 10000 + 0.5).astype(np.int64)

    got = (
        link_pagerank(SF_DIR)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (got["url"].to_numpy() == urls).all()
    assert (np.abs(got["rank_bp"].to_numpy() - want_bp) <= 1).all()


def test_dangling_mass_update_formula():
    """The d>0 branch of the update (see _new_rank docstring): a
    2-cycle a<->b plus a dangling node c, one iteration by hand."""
    from raycrawl.pipelines.linkgraph import _new_rank

    n = 3
    inv_n = 1.0 / n
    # r0 uniform. a->b and b->a swap their whole rank; c is dangling
    # and redistributes its 1/3 uniformly (damped).
    inflow = np.array([inv_n, inv_n, 0.0])
    r1 = _new_rank(inflow, d_mass=inv_n, tv=inv_n)
    expected = 0.15 / 3 + 0.85 * (inflow + (1 / 3) / 3)
    assert np.allclose(r1, expected, rtol=0, atol=1e-15)
    # mass conserved: teleport + damped(moved mass + dangling mass)
    assert abs(float(r1.sum()) - 1.0) < 1e-12
    # personalized: teleport AND dangling mass land only on seed a
    tv = np.array([1.0, 0.0, 0.0])
    r1p = _new_rank(inflow, d_mass=inv_n, tv=tv)
    assert np.allclose(
        r1p, 0.15 * tv + 0.85 * (inflow + (1 / 3) * tv),
        rtol=0, atol=1e-15,
    )
    assert abs(float(r1p.sum()) - 1.0) < 1e-12


def test_pagerank_seeded_matches_oracle_and_concentrates_on_seeds(
    ray_session,
):
    """Personalized variant: hash-exact vs its unrolled twin at
    sf0.001, unreachable pages score exactly 0, and seed-adjacent mass
    exceeds the uniform variant's (the signal the frontier scheduler
    would consume)."""
    from raycrawl.pipelines.flagship import ensure_oracle_sidecars
    from raycrawl.pipelines.linkgraph import (
        _pagerank_seeded_oracle_sql,
        link_pagerank,
        link_pagerank_seeded,
    )

    ensure_oracle_sidecars(SF_DIR)
    got = _normalize(_to_frame(link_pagerank_seeded(SF_DIR)))
    want = _normalize(
        duckdb.connect().execute(_pagerank_seeded_oracle_sql(SF_DIR)).df()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # mass conservation in mean-scaled bp, same cushion as uniform
    assert abs(got["rank_bp"].sum() - len(got) * 10_000) <= len(got)
    # the seeded mass is concentrated vs uniform: higher peak, pages
    # unreachable from the seeds score EXACTLY 0 (uniform gives every
    # page at least the teleport floor), and the top-10 mass share is
    # strictly larger
    uni = _to_frame(link_pagerank(SF_DIR))
    assert got["rank_bp"].max() > uni["rank_bp"].max()
    assert (got["rank_bp"] == 0).any()
    assert (uni["rank_bp"] > 0).all()
    assert (
        got["rank_bp"].nlargest(10).sum()
        > uni["rank_bp"].nlargest(10).sum()
    )

def test_top_indegree_matches_sidecar_oracle(ray_session):
    from raycrawl.pipelines.flagship import ensure_oracle_sidecars
    from raycrawl.pipelines.linkgraph import (
        _indegree_oracle_sql,
        top_indegree_pages,
    )

    ensure_oracle_sidecars(SF_DIR)
    got = _normalize(_to_frame(top_indegree_pages(SF_DIR)))
    want = _normalize(
        duckdb.connect().execute(_indegree_oracle_sql(SF_DIR)).df()
    )
    assert len(got) == len(want) == 20
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_indegree_registered_oracle_targets_driver_sf(ray_session):
    import __ray_entry__ as e
    from raycrawl.pipelines.flagship import DRIVER_ORACLE_SF
    from raycrawl.pipelines.linkgraph import _indegree_oracle_sql

    assert e.oracle_sql()["top_indegree_pages"] == _indegree_oracle_sql(
        DRIVER_ORACLE_SF
    )
