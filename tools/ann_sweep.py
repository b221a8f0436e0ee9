#!/usr/bin/env python
"""ANN operating-point sweep (round-4 verdict item 6): measure the
recall/cost frontier of the LSH and IVF approximate-kNN paths against
exact brute-force cosine on the synthetic embeddings — the same
LshIndex/IvfIndex kernels the pipeline queries use, at the same seeds.

Recall@k = |ANN top-k ∩ exact top-k| / k, averaged over NUM_QUERIES
query vectors (more than the suite's 5, for statistical stability);
cost = mean fraction of the corpus scored per query (the scan the
bucketing is supposed to avoid — 1.0 means the ANN degenerated into
brute force). Pure numpy, single process: the datasets are small and
the sweep wants kernel math, not Ray overhead.

Usage: python tools/ann_sweep.py [sf_dir]   (default /root/testdata/sf0.1)
Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raycrawl.functions.similarity import IvfIndex, LshIndex, as_matrix

K = 10
NUM_QUERIES = 50


def exact_topk(vecs: np.ndarray, q: np.ndarray, qid: int) -> set[int]:
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (q / np.linalg.norm(q))
    sims[qid] = -np.inf  # exclude self
    return set(np.argsort(-sims, kind="stable")[:K].tolist())


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vecs = as_matrix(t.column("embedding"))
    n, dim = vecs.shape
    qids = list(range(min(NUM_QUERIES, n)))
    truth = {qid: exact_topk(vecs, vecs[qid], qid) for qid in qids}
    print(f"embeddings: {n} x {dim} ({sf}), k={K}, queries={len(qids)}\n")

    print("LSH (planes x tables x multiprobe) — seed 11:\n")
    print("| planes | tables | probe | recall@10 | scanned |")
    print("|---|---|---|---|---|")
    for planes in (6, 8, 10):
        for tables in (8, 16, 32):
            for probe in (2, 3, 4):
                index = LshIndex(dim, num_planes=planes, seed=11,
                                 num_tables=tables)
                codes = index.codes(vecs)
                rec, scan = [], []
                for qid in qids:
                    probes = index.probe_codes(vecs[qid], multiprobe=probe)
                    m = index.candidate_mask(codes, probes)
                    m[qid] = False
                    scan.append(m.mean())
                    if not m.any():
                        rec.append(0.0)
                        continue
                    ids = np.nonzero(m)[0]
                    vn = vecs[ids] / np.linalg.norm(
                        vecs[ids], axis=1, keepdims=True
                    )
                    sims = vn @ (vecs[qid] / np.linalg.norm(vecs[qid]))
                    top = ids[np.argsort(-sims, kind="stable")[:K]]
                    rec.append(len(set(top.tolist()) & truth[qid]) / K)
                print(f"| {planes} | {tables} | {probe} "
                      f"| {np.mean(rec):.3f} | {np.mean(scan):.3f} |")

    print("\nIVF (nlist x nprobe) — seed 11, 3 Lloyd iters, train=2048:\n")
    print("| nlist | nprobe | recall@10 | scanned |")
    print("|---|---|---|---|")
    for nlist in (8, 16, 32, 64):
        index = IvfIndex(vecs[:2048], num_lists=nlist, iters=3, seed=11)
        assign = index.assign(vecs)
        for nprobe in (2, 4, 8, 16):
            if nprobe > nlist:
                continue
            rec, scan = [], []
            for qid in qids:
                lists = set(
                    index.probe_lists(vecs[qid], nprobe=nprobe).tolist()
                )
                m = np.isin(assign, list(lists))
                m[qid] = False
                scan.append(m.mean())
                if not m.any():
                    rec.append(0.0)
                    continue
                ids = np.nonzero(m)[0]
                vn = vecs[ids] / np.linalg.norm(
                    vecs[ids], axis=1, keepdims=True
                )
                sims = vn @ (vecs[qid] / np.linalg.norm(vecs[qid]))
                top = ids[np.argsort(-sims, kind="stable")[:K]]
                rec.append(len(set(top.tolist()) & truth[qid]) / K)
            print(f"| {nlist} | {nprobe} "
                  f"| {np.mean(rec):.3f} | {np.mean(scan):.3f} |")


if __name__ == "__main__":
    main()
