"""ANN quality/efficiency sweep: recall@k and scan fraction vs nprobe.

The exactness story for IVF is measured, not asserted: for each of N held-out
query vectors, compare the IVF top-k (partition-pruned probe + exact rerank)
against the brute-force top-k, at every nprobe in the sweep; report mean
recall@k and the fraction of corpus rows the probe scanned (the cost knob —
at 100 TB the scan fraction IS the query cost, since the probed partitions
are the only bytes read).  Also sweeps the PQ compressed path (ADC
candidates + exact refine) at its refine factors.

Honest caveat baked into the fixture: the synthetic embeddings are near
uniform on the sphere — the ADVERSARIAL case for IVF, where recall can only
track scan fraction (measured sf0.01: nprobe 1/2/4/8 → recall .30/.41/.56/.78
at scan fractions .08/.13/.24/.49 — consistently ~2-4× better than the
random-scan diagonal, which is all the structure uniform data admits; the
PQ path at m=8/ksub=16 measures recall .44/.52/.67/.83 at refine factors
1/2/4/8, the ADC-resolution-vs-refine trade on the same adversarial
vectors).  Real
embedding corpora are heavily clustered, which is what makes IVF's
recall-per-byte steep; the point of this sweep is that the measurement
harness exists and the exact path (nprobe = nlist → recall 1.000) is pinned.

Usage:  python tools/ann_recall.py [sf_dir] [num_clusters] [n_queries]
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from modal_vector_db_spark.harness import load  # noqa: E402
from modal_vector_db_spark.operators.ann import IVFIndex, brute_force_topk  # noqa: E402
from modal_vector_db_spark.session import get_spark  # noqa: E402

K = 10


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--two-level"]
    two_level = "--two-level" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    n_clusters = int(args[1]) if len(args) > 1 else 16
    n_queries = int(args[2]) if len(args) > 2 else 20

    spark = get_spark("ann_recall", shuffle_partitions=16)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    total = emb.count()

    if two_level:
        # hierarchical sweep: same recall/scan-fraction table, fine probes
        # resolved through the coarse level (sqrt split)
        import math

        from modal_vector_db_spark.operators.ann import IVFIndex2L

        k1 = max(2, math.ceil(math.sqrt(n_clusters)))
        k2 = max(1, math.ceil(n_clusters / k1))
        print(f"two-level: k1={k1} coarse x k2={k2} fine")
        ivf = IVFIndex2L.build(emb, k1=k1, k2=k2)
    else:
        ivf = IVFIndex.build(emb, k=n_clusters)
    clustered = ivf.assign(emb).persist()
    clustered.count()
    sizes = {
        r["cluster_id"]: r["n"]
        for r in clustered.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }

    rng = np.random.default_rng(7)
    qrows = emb.orderBy("vec_id").limit(200).collect()
    queries = [
        np.asarray(qrows[i]["embedding"], dtype=np.float64)
        for i in rng.choice(len(qrows), size=n_queries, replace=False)
    ]

    exact_ids = []
    for q in queries:
        top = brute_force_topk(emb, [float(v) for v in q], k=K).collect()
        exact_ids.append({r["vec_id"] for r in top})

    print(f"corpus={total} rows, clusters={n_clusters}, queries={n_queries}, k={K}")
    print(f"{'nprobe':>6} {'recall@10':>10} {'scan_frac':>10}")
    for nprobe in (1, 2, 4, 8, n_clusters):
        recalls, fracs = [], []
        for q, gold in zip(queries, exact_ids):
            got = {
                r["vec_id"]
                for r in ivf.query(clustered, [float(v) for v in q], k=K, nprobe=nprobe).collect()
            }
            recalls.append(len(got & gold) / K)
            probed = ivf.nearest_centroids(q, nprobe)
            fracs.append(sum(sizes.get(c, 0) for c in probed) / total)
        print(f"{nprobe:>6} {np.mean(recalls):>10.3f} {np.mean(fracs):>10.3f}")

    # PQ compressed path: ADC candidates + exact refine vs brute force.
    # (Normalized vectors so squared-L2 order == cosine order, matching the
    # facade's compressed query.)
    from modal_vector_db_spark.operators.pq import PQIndex

    normed = emb.selectExpr(
        "vec_id",
        "transform(cast(embedding as array<double>), "
        "x -> x / greatest(aggregate(cast(embedding as array<double>), 0.0d, "
        "(a, v) -> a + v * v, a -> sqrt(a)), 1e-12)) AS embedding",
    )
    pq = PQIndex.train(normed, m=8)
    codes = pq.encode(normed).persist()
    codes.count()
    qn = [list(np.asarray(q) / (np.linalg.norm(q) or 1.0)) for q in queries]
    print(f"{'refine':>6} {'pq_recall@10':>13}")
    for rf in (1, 2, 4, 8):
        recalls = []
        for q, gold in zip(qn, exact_ids):
            got = {
                r["vec_id"]
                for r in pq.topk(
                    codes, q, k=K, refine_df=normed, refine_factor=rf
                ).collect()
            }
            recalls.append(len(got & gold) / K)
        print(f"{rf:>6} {np.mean(recalls):>13.3f}")

    # Per-partition HNSW (operators/hnsw.py): recall@10 vs the fraction
    # of the corpus whose DISTANCES were actually computed — the graph
    # index's cost axis (IVF pays scan fraction; the graph pays
    # O(ef·log n) evaluations).  Same clusters, all clusters searched.
    from modal_vector_db_spark.operators.hnsw import (
        _build_cluster,
        _normalize,
        hnsw_search_cluster,
    )

    per_cluster = []
    for pdf in clustered.select("cluster_id", "vec_id", "embedding").toPandas().groupby(
        "cluster_id"
    ):
        g = pdf[1].sort_values("vec_id")
        cids = g["vec_id"].to_numpy(dtype=np.int64)
        cx = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]]))
        layers = _build_cluster(cids, cx, m=8, ef_c=64)
        adj = [
            (int(cids[i]), lc, [int(cids[v]) for v in neigh])
            for lc, lay in layers.items()
            for i, neigh in lay.items()
        ]
        per_cluster.append((cids, cx, adj))
    print(f"{'ef':>6} {'hnsw_recall@10':>15} {'evals_frac':>11}")
    for ef in (8, 16, 32, 64, 128):
        recalls, fracs = [], []
        for q, gold in zip(queries, exact_ids):
            qn1 = np.asarray(q) / (np.linalg.norm(q) or 1.0)
            cands: list[tuple[float, int]] = []
            evals = 0
            for cids, cx, adj in per_cluster:
                top, n_ev = hnsw_search_cluster(cids, cx, adj, qn1, K, ef)
                cands.extend(top)
                evals += n_ev
            got = {v for _, v in sorted(cands)[:K]}
            recalls.append(len(got & gold) / K)
            fracs.append(evals / total)
        print(f"{ef:>6} {np.mean(recalls):>15.3f} {np.mean(fracs):>11.3f}")

    # FILTERED beam (round 11): recall@10 among ALLOWED nodes vs ef, at
    # three selectivities — the beam navigates the full graph, only
    # allowed nodes land, and ef doubles geometrically until k matches
    # (or the cluster exhausts), so the question this sweep answers is
    # what the expansion COSTS (evals) and what recall the matched set
    # has vs the exact filtered top-k.
    print(f"{'sel':>6} {'ef':>6} {'filt_recall@10':>15} {'evals_frac':>11}")
    for sel in (3, 10, 30):
        # exact filtered gold per query, from the same per-cluster mats
        golds_f = []
        for q in queries:
            qn1 = np.asarray(q) / (np.linalg.norm(q) or 1.0)
            pairs: list[tuple[float, int]] = []
            for cids, cx, _ in per_cluster:
                mask = cids % sel == 0
                if mask.any():
                    d = 1.0 - cx[mask] @ qn1
                    pairs.extend(zip(d.tolist(), cids[mask].tolist()))
            golds_f.append({v for _, v in sorted(pairs)[:K]})
        for ef in (8, 32, 128):
            recalls, fracs = [], []
            for q, gold in zip(queries, golds_f):
                qn1 = np.asarray(q) / (np.linalg.norm(q) or 1.0)
                cands, evals = [], 0
                for cids, cx, adj in per_cluster:
                    top, n_ev = hnsw_search_cluster(
                        cids, cx, adj, qn1, K, ef, allowed=cids % sel == 0
                    )
                    cands.extend(top)
                    evals += n_ev
                got = {v for _, v in sorted(cands)[:K]}
                recalls.append(len(got & gold) / max(len(gold), 1))
                fracs.append(evals / total)
            print(
                f"{sel:>6} {ef:>6} {np.mean(recalls):>15.3f} "
                f"{np.mean(fracs):>11.3f}"
            )


if __name__ == "__main__":
    main()
