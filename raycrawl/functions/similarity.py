"""Similarity search over embedding columns (list<float>).

- ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul of
  the batch's embedding matrix against a BROADCAST query matrix
  (``ray.put`` once, read in every task), emitting per-batch partial
  top-k that a tiny final reduce merges. No shuffle of the embedding
  table.
- ``LshIndex``: random-hyperplane LSH bucketing — the scale path: bucket
  ids computed per batch, candidates searched only within matching
  buckets (recall measured against brute force in tests).

Float discipline: all scores computed in float64 for cross-engine
(numpy vs DuckDB) agreement; ranking ties broken by ascending id.
"""

from __future__ import annotations

import numpy as np


def as_matrix(list_column) -> np.ndarray:
    """Arrow list<float> column/chunk -> (n, d) float64 matrix."""
    import pyarrow as pa

    if isinstance(list_column, pa.ChunkedArray):
        list_column = list_column.combine_chunks()
    flat = list_column.flatten().to_numpy(zero_copy_only=False)
    n = len(list_column)
    return flat.astype(np.float64).reshape(n, -1)


def cosine_topk_partial(
    batch_ids: np.ndarray,
    batch_vecs: np.ndarray,
    query_vecs: np.ndarray,
    k: int,
    exclude_ids: np.ndarray | None = None,
):
    """Per-batch partial result: for each query, the batch's best k
    (score, id) pairs. Returns (q_idx, neighbor_id, score) arrays."""
    bn = batch_vecs / np.linalg.norm(batch_vecs, axis=1, keepdims=True)
    qn = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
    scores = qn @ bn.T  # (q, n)
    q_out, id_out, s_out = [], [], []
    for qi in range(scores.shape[0]):
        row = scores[qi]
        mask = np.ones(len(row), dtype=bool)
        if exclude_ids is not None:
            mask &= batch_ids != exclude_ids[qi]
        idx = np.flatnonzero(mask)
        if len(idx) == 0:
            continue
        take = idx[np.argsort(-row[idx], kind="stable")[:k]]
        q_out.append(np.full(len(take), qi, dtype=np.int64))
        id_out.append(batch_ids[take])
        s_out.append(row[take])
    if not q_out:
        return (np.zeros(0, np.int64),) * 3
    return np.concatenate(q_out), np.concatenate(id_out), np.concatenate(s_out)


def merge_topk(q_idx, ids, scores, num_queries: int, k: int):
    """Merge partial top-k lists -> final (query_idx, neighbor_id, rank).
    Ties: higher score first, then ascending neighbor id."""
    out_q, out_id, out_rank = [], [], []
    for qi in range(num_queries):
        m = q_idx == qi
        cand_ids, cand_scores = ids[m], scores[m]
        order = np.lexsort((cand_ids, -cand_scores))[:k]
        out_q.append(np.full(len(order), qi, dtype=np.int64))
        out_id.append(cand_ids[order])
        out_rank.append(np.arange(1, len(order) + 1, dtype=np.int64))
    return (
        np.concatenate(out_q),
        np.concatenate(out_id),
        np.concatenate(out_rank),
    )


class IvfIndex:
    """IVF (inverted-file) ANN: deterministic k-means centroids; rows
    partition by nearest centroid; queries probe the ``nprobe`` nearest
    lists. The scale path alongside LSH: at 10^10 rows the assignment
    is a partition key (one Parquet dir per list) so a query touches
    only nprobe partitions."""

    def __init__(
        self,
        train_vecs: np.ndarray,
        num_lists: int = 16,
        iters: int = 3,
        seed: int = 11,
    ) -> None:
        rng = np.random.default_rng(seed)
        train = train_vecs / np.linalg.norm(
            train_vecs, axis=1, keepdims=True
        )
        pick = rng.choice(len(train), size=min(num_lists, len(train)),
                          replace=False)
        cents = train[np.sort(pick)]
        for _ in range(iters):  # seeded Lloyd iterations (cosine)
            assign = (train @ cents.T).argmax(axis=1)
            for c in range(len(cents)):
                members = train[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    n = np.linalg.norm(m)
                    if n > 0:
                        cents[c] = m / n
        self.centroids = cents

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        return (vn @ self.centroids.T).argmax(axis=1)

    def probe_lists(self, vec: np.ndarray, nprobe: int = 4) -> np.ndarray:
        v = vec / np.linalg.norm(vec)
        sims = self.centroids @ v
        return np.argsort(-sims, kind="stable")[:nprobe]


class LshIndex:
    """Random-hyperplane LSH: sign-bit bucket codes for cosine ANN.

    ``num_tables`` independent hash tables (the standard recall lever —
    a single table of hyperplane bits has low recall on near-uniform
    embeddings; candidates are the UNION of each table's probed
    buckets). ``codes`` returns an (n, T) int64 matrix."""

    def __init__(
        self,
        dim: int,
        num_planes: int = 12,
        seed: int = 11,
        num_tables: int = 1,
    ) -> None:
        rng = np.random.default_rng(seed)
        self.num_tables = num_tables
        self.planes = rng.standard_normal((num_tables, dim, num_planes))

    def codes(self, vecs: np.ndarray) -> np.ndarray:
        weights = 1 << np.arange(self.planes.shape[2], dtype=np.int64)
        out = np.empty((len(vecs), self.num_tables), dtype=np.int64)
        for t in range(self.num_tables):
            bits = (vecs @ self.planes[t]) > 0
            out[:, t] = (bits.astype(np.int64) * weights).sum(axis=1)
        return out

    def probe_codes(
        self, vec: np.ndarray, multiprobe: int = 1
    ) -> list[set[int]]:
        """Per table: bucket of `vec` plus its lowest-margin single-bit
        flips (multiprobe)."""
        base = self.codes(vec[None, :])[0]
        out: list[set[int]] = []
        for t in range(self.num_tables):
            probes = {int(base[t])}
            if multiprobe:
                margins = np.abs(vec @ self.planes[t])
                for b in np.argsort(margins)[:multiprobe]:
                    probes.add(int(base[t]) ^ (1 << int(b)))
            out.append(probes)
        return out

    def candidate_mask(
        self, codes: np.ndarray, probes: list[set[int]]
    ) -> np.ndarray:
        """Rows of `codes` (n, T) matching ANY table's probe set."""
        mask = np.zeros(len(codes), dtype=bool)
        for t, probe in enumerate(probes):
            mask |= np.isin(codes[:, t], list(probe))
        return mask
