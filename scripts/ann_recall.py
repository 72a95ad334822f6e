#!/usr/bin/env python
"""ANN recall@k curves vs brute force (VERDICT r04 next-round #4).

The reference ships a recall-tuned HNSW index (usearch,
/root/reference/src/processing/embedding.rs:68-105); this engine's scale
paths are hyperplane-LSH and IVF, whose recall depends on n_planes /
n_probe. This script measures recall@10 of BOTH against exact brute
force on a deterministic 100k-vector clustered corpus (the sf0.1
embeddings table is 2k rows — too small to separate the curves), plus
the candidate fraction each config scans — the selectivity that IS the
100 TB read saving. Archives one JSON; bench.py renders the newest
archive into BENCH.md.

    python scripts/ann_recall.py --out bench_results/ann_recall_r05.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

DIM = 64            # matches the testdata embeddings table
N_VECS = 100_000
N_CLUSTERS = 128    # mixture components — ANN is meaningless on uniform noise
N_QUERIES = 10
K = 10


def build_corpus(seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    """(corpus, queries): L2-normalized rows from a Gaussian mixture;
    queries are perturbed corpus members (realistic near-match load)."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((N_CLUSTERS, DIM))
    assign = rng.integers(0, N_CLUSTERS, size=N_VECS)
    vecs = cents[assign] + 0.35 * rng.standard_normal((N_VECS, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q_src = rng.choice(N_VECS, size=N_QUERIES, replace=False)
    queries = vecs[q_src] + 0.1 * rng.standard_normal((N_QUERIES, DIM))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return vecs.astype(np.float32), queries.astype(np.float64)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--cpus", default="8")
    args = p.parse_args()

    from pushkind_crawlers_spark.operators import similarity as S
    from pushkind_crawlers_spark.session import get_spark

    spark = get_spark(app="ann-recall", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    vecs, queries = build_corpus()
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(N_VECS, dtype=np.int64),
                      "embedding": list(vecs)}),
        "vec_id long, embedding array<float>",
    ).repartition(int(args.cpus) * 2).persist()
    emb.count()

    def topk_ids(df) -> set:
        return {r["vec_id"] for r in df.collect()}

    # exact baseline per query
    truth, t0 = [], time.time()
    for q in queries:
        truth.append(topk_ids(S.brute_force_topk(emb, list(q), k=K)))
    brute_wall = round((time.time() - t0) / N_QUERIES, 3)

    report = {
        "corpus": {"n": N_VECS, "dim": DIM, "clusters": N_CLUSTERS,
                   "queries": N_QUERIES, "k": K, "seed": 17},
        "brute_force_s_per_query": brute_wall,
        "lsh": [], "ivf": [],
    }

    for n_planes in (6, 8, 10, 12):
        for multiprobe in (0, 1):
            recalls, fracs, t0 = [], [], time.time()
            planes = S.hyperplanes(DIM, n_planes, seed=7)
            sigs = ((vecs.astype(np.float64) @ planes.T) > 0.0) @ (
                1 << np.arange(n_planes, dtype=np.int64))
            for qi, q in enumerate(queries):
                got = topk_ids(S.ann_lsh_topk(
                    emb, list(q), k=K, n_planes=n_planes,
                    multiprobe=multiprobe))
                recalls.append(len(got & truth[qi]) / K)
                qsig = int(((planes @ q) > 0.0) @ (
                    1 << np.arange(n_planes, dtype=np.int64)))
                probes = {qsig} | (
                    {qsig ^ (1 << i) for i in range(n_planes)}
                    if multiprobe >= 1 else set())
                fracs.append(float(np.isin(sigs, list(probes)).mean()))
            report["lsh"].append({
                "n_planes": n_planes, "multiprobe": multiprobe,
                "recall_at_10": round(float(np.mean(recalls)), 3),
                "candidate_fraction": round(float(np.mean(fracs)), 4),
                "s_per_query": round((time.time() - t0) / N_QUERIES, 3),
            })

    # driver-side twin of ann_ivf_topk's training (same sample rule, same
    # seed) to measure the ACTUAL candidate fraction per probe setting —
    # clusters are not uniform, so n_probe/n_centroids would overstate it
    cents = S.kmeans_fit(vecs[:4096].astype(np.float64), 64, seed=11)
    corpus_assign = (
        vecs.astype(np.float64) @ cents.T
        - 0.5 * (cents ** 2).sum(axis=1)[None, :]
    ).argmax(axis=1)
    for n_probe in (1, 2, 4, 8, 16, 64):
        recalls, fracs, t0 = [], [], time.time()
        for qi, q in enumerate(queries):
            got = topk_ids(S.ann_ivf_topk(
                emb, list(q), k=K, n_centroids=64, n_probe=n_probe,
                sample_n=4096))
            recalls.append(len(got & truth[qi]) / K)
            probe_ids = np.argsort(
                ((cents - q[None, :]) ** 2).sum(axis=1))[:n_probe]
            fracs.append(float(np.isin(corpus_assign, probe_ids).mean()))
        report["ivf"].append({
            "n_centroids": 64, "n_probe": n_probe,
            "recall_at_10": round(float(np.mean(recalls)), 3),
            "candidate_fraction": round(float(np.mean(fracs)), 4),
            "s_per_query": round((time.time() - t0) / N_QUERIES, 3),
        })

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"out": args.out,
                      "lsh": report["lsh"][-1], "ivf": report["ivf"][-1]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
