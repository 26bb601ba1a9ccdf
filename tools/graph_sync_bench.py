"""Graph-maintenance economics: what a small insert pays in graph sync.

Reproduces the round-11 BASELINE fixture (32k vectors ×64d, 64 clusters,
facade path) and times, against a LIVE graph index:

  build      — full create_graph_index() (the rebuild everything-else is
               compared to)
  base       — a 50-row insert with NO graph index (the floor)
  localized  — a 50-row insert clustered around one anchor vector
               (touches 1-2 clusters; the common 100 TB batch shape)
  scattered  — a 50-row uniform-random insert (touches ~min(50, nclusters)
               clusters; the adversarial shape)

Round-11 (whole-cluster rebuild as the sync unit): localized ~4.3 s sync,
scattered 32.5 s — approaching the 42.6 s full rebuild.  Round-12
(grow_hnsw: HNSW's native insert into the live per-cluster graphs) is the
fix under test: sync compute should scale with the BATCH, so localized
and scattered should converge toward the same small sync share.

Prints ONE JSON line.  Idle machine for canonical numbers.

Usage: python tools/graph_sync_bench.py [n_vectors] [n_clusters] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modal_vector_db_spark.engine import VectorDB  # noqa: E402
from modal_vector_db_spark.session import get_spark  # noqa: E402

DIM = 64


def _vecs(rng, n):
    return rng.standard_normal((n, DIM)).astype(np.float32)


def _insert(db, tag, vecs):
    metas = [{"tag": tag, "i": i} for i in range(len(vecs))]
    t0 = time.monotonic()
    db.insert(metas, embeddings=list(vecs))
    return time.monotonic() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark("graph-sync-bench", shuffle_partitions=32)
    rng = np.random.default_rng(42)
    out: dict = {"metric": "graph_sync_bench", "n": n, "clusters": k, "batch": batch}

    def mk(name, graph):
        wh = tempfile.mkdtemp(prefix=f"gsb_{name}_")
        db = VectorDB(spark, name, embedding_dim=DIM, warehouse=wh,
                      create_new_table=True)
        base = _vecs(rng, n)
        db.insert([{"seed": i} for i in range(n)], embeddings=list(base))
        db.create_index(num_clusters=k, calibrate=False)
        if graph:
            t0 = time.monotonic()
            db.create_graph_index(calibrate=False)
            out.setdefault("build_s", round(time.monotonic() - t0, 2))
        return db, base

    # floor: same insert, no graph index
    db0, _ = mk("gsb_nograph", graph=False)
    out["base_insert_s"] = round(_insert(db0, "b", _vecs(rng, batch)), 2)

    db, base = mk("gsb_graph", graph=True)
    # localized: anchor + tiny noise — lands in 1-2 clusters
    anchor = base[7]
    local = anchor[None, :] + 0.01 * _vecs(rng, batch)
    out["localized_insert_s"] = round(_insert(db, "loc", local.astype(np.float32)), 2)
    out["localized_sync_s"] = round(out["localized_insert_s"] - out["base_insert_s"], 2)
    # scattered: uniform random — touches ~min(batch, k) clusters
    out["scattered_insert_s"] = round(_insert(db, "sc", _vecs(rng, batch)), 2)
    out["scattered_sync_s"] = round(out["scattered_insert_s"] - out["base_insert_s"], 2)
    # serving still exact after both syncs (full probe + corpus-covering ef)
    q = base[12345 % n]
    exact = db.query(list(map(float, q)), k=5)
    graph = db.query_graph(list(map(float, q)), k=5, nprobe=k, ef_search=max(2048, n))
    out["serving_exact"] = [r.id for r in exact] == [r.id for r in graph]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
