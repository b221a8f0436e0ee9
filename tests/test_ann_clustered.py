"""The ANN operating points are calibrated on ISOTROPIC embeddings —
the adversarial no-structure case where recall can only be bought with
scanned fraction (BASELINE.md frontier tables). Real embedding corpora
are clustered, and both index families exploit that: this test pins
the 'floor, not ceiling' claim by measuring recall on a synthetic
CLUSTERED corpus with the SAME suite knobs, where both paths must beat
their isotropic operating points by a wide margin while scanning
less. Pure-numpy over the library index classes — no Ray needed."""

import numpy as np

from raycrawl.functions.similarity import IvfIndex, LshIndex

DIM = 64
N = 2000
N_CLUSTERS = 20
QUERIES = 25
K = 10


def _clustered(seed: int = 7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_CLUSTERS, N)
    vecs = centers[assign] + 0.25 * rng.standard_normal((N, DIM))
    # queries: perturbations of existing rows (retrieval-dedup shape)
    q_rows = rng.choice(N, QUERIES, replace=False)
    queries = vecs[q_rows] + 0.05 * rng.standard_normal((QUERIES, DIM))
    return vecs, queries


def _exact_topk(vecs: np.ndarray, queries: np.ndarray) -> set:
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ vn.T
    out = set()
    for qi in range(len(queries)):
        order = np.lexsort((np.arange(len(vecs)), -sims[qi]))[:K]
        out.update((qi, int(j)) for j in order)
    return out


def test_lsh_recall_on_clustered_embeddings_beats_isotropic_point():
    vecs, queries = _clustered()
    exact = _exact_topk(vecs, queries)
    # suite knobs: 8 planes x 32 tables, multiprobe 2 (textops._LSH_*)
    index = LshIndex(DIM, num_planes=8, seed=11, num_tables=32)
    codes = index.codes(vecs)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    hits, scanned = 0, 0
    for qi in range(len(queries)):
        probes = index.probe_codes(queries[qi], multiprobe=2)
        mask = index.candidate_mask(codes, probes)
        cand = np.nonzero(mask)[0]
        scanned += len(cand)
        q = queries[qi] / np.linalg.norm(queries[qi])
        sims = vn[cand] @ q
        order = np.lexsort((cand, -sims))[:K]
        hits += sum((qi, int(cand[j])) in exact for j in order)
    recall = hits / len(exact)
    frac = scanned / (len(queries) * N)
    # isotropic operating point: recall 0.86 at 34% scanned; clustered
    # measures 0.884 at 35% — a real but MODEST gain, because random
    # hyperplanes are data-oblivious (their recall lever is
    # tables/probes, not data structure). Contrast IVF below, whose
    # k-means lists ARE the structure: 0.79 -> 0.96. The pinned claim:
    # clustered >= isotropic, never worse, at comparable scan.
    assert recall >= 0.87, (recall, frac)
    assert frac <= 0.45, frac


def test_ivf_recall_on_clustered_embeddings_beats_isotropic_point():
    vecs, queries = _clustered()
    exact = _exact_topk(vecs, queries)
    # suite knobs: 16 lists, nprobe 8 (textops._IVF_*)
    index = IvfIndex(vecs[:2048], num_lists=16, iters=3, seed=11)
    assign = index.assign(vecs)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    hits, scanned = 0, 0
    for qi in range(len(queries)):
        lists = set(index.probe_lists(queries[qi], nprobe=8).tolist())
        cand = np.nonzero(np.isin(assign, list(lists)))[0]
        scanned += len(cand)
        q = queries[qi] / np.linalg.norm(queries[qi])
        sims = vn[cand] @ q
        order = np.lexsort((cand, -sims))[:K]
        hits += sum((qi, int(cand[j])) in exact for j in order)
    recall = hits / len(exact)
    frac = scanned / (len(queries) * N)
    # isotropic operating point: recall 0.79 at ~50% scanned (recall
    # tracks the scan line when there is nothing to cluster). With
    # cluster structure the probed lists CONTAIN the neighbors:
    # measures 0.96 at the same 50% scan.
    assert recall >= 0.9, (recall, frac)
    assert frac <= 0.6, frac
