"""Live-model smoke: the reference demo flow (``vdb.py:73-104``) with the
REAL ``SentenceTransformersEmbedder`` (all-MiniLM-L6-v2), end to end.

The standing environment gap (VERDICT rounds 10-12 "Missing #1") is that
``sentence_transformers``/``openai`` are absent here, so the live-model
path of U3/U4 runs zero real inference in CI.  This script makes closing
that gap a ``pip install``, not a build task: on a machine WITH the dep,

    pip install sentence-transformers
    python tools/live_embed_smoke.py

runs bulk-insert-with-precomputed-vectors → embed_field insert →
num_rows → plain KNN → filtered KNN on the reference's own pokemon.json
with the real model, and asserts the demo-flow invariants that do not
depend on the model's exact geometry:

  - num_rows == 898 after both inserts (``vdb.py:88,93``),
  - replayed insert is a no-op (ON CONFLICT semantics, S5),
  - ``query("psychic", k=3)`` returns 3 results ordered by distance with
    parseable metadata (``vdb.py:96-99``),
  - the engine top-3 ids/distances match a driver-side numpy rerank of
    the SAME live embeddings (the model is the oracle for itself —
    exactness of the KNN plan, independent of what the model thinks
    "psychic" means),
  - the filtered query (``vdb.py:102``) only returns Flying pokemon with
    Attack > 50.

Without the dep it exits 0 with a loud SKIP so automation can call it
unconditionally.

When ``OPENAI_API_KEY`` is also set (and the ``openai`` package is
installed), a second probe runs the ``OpenAIEmbedder`` live: one single
embed + one 3-text batch embed, asserting dimensions and the
list-input/batching contract against the real endpoint (U4's only
untested surface) — a few hundred tokens of API usage, nothing stored.
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

POKEMON = "/root/reference/data/pokemon.json"


def main() -> int:
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        print(
            "SKIP: sentence_transformers not installed — "
            "`pip install sentence-transformers` and rerun for the live smoke"
        )
        _openai_probe()  # the two probes gate independently
        return 0

    import numpy as np
    import pandas as pd

    from modal_vector_db_spark.embedders import get_embedder
    from modal_vector_db_spark.engine import VectorDB
    from modal_vector_db_spark.schema import json_to_uuid
    from modal_vector_db_spark.session import get_spark

    spark = get_spark("live-embed-smoke")
    with open(POKEMON) as f:
        records = json.load(f)
    print(f"pokemon records: {len(records)}")

    emb = get_embedder("SentenceTransformersEmbedder", model_name="all-MiniLM-L6-v2")
    dim = emb.get_dimensions()
    print(f"live model loaded: all-MiniLM-L6-v2, dim={dim}")

    with tempfile.TemporaryDirectory(prefix="live_embed_wh_") as wh:
        db = VectorDB(
            spark,
            "pokemon_live",
            embedder_name="SentenceTransformersEmbedder",
            embedder_kwargs={"model_name": "all-MiniLM-L6-v2"},
            embedding_dim=dim,
            create_new_table=True,
            warehouse=wh,
        )
        half = len(records) // 2
        # vdb.py:83,87 — client-side batch embed, insert with vectors
        vecs = [np.asarray(v) for v in emb.embed_batch(
            pd.Series([r["description"] for r in records[:half]])
        )]
        db.insert(records[:half], embeddings=vecs)
        # vdb.py:92 — engine-side embed of metadata[embed_field]
        db.insert(records[half:], embed_field="description")
        n = db.num_rows()
        assert n == len(records), f"num_rows {n} != {len(records)}"
        print(f"num_rows after both inserts: {n}")

        db.insert(records[:50], embed_field="description")
        assert db.num_rows() == len(records), "replayed insert was not a no-op"
        print("replayed insert: no-op (ON CONFLICT semantics hold)")

        # model-as-its-own-oracle: engine top-k must equal a driver-side
        # numpy rerank over the same live embeddings
        def oracle(query_text, k, pred=None):
            q = np.asarray(emb.embed(query_text), dtype=np.float64)
            scored = []
            for r in records:
                if pred and not pred(r):
                    continue
                v = np.asarray(emb.embed(r["description"]), dtype=np.float64)
                cos = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
                scored.append((json_to_uuid(r), 1.0 - cos))
            scored.sort(key=lambda t: (t[1], t[0]))
            return scored[:k]

        got = db.query("psychic", k=3)  # vdb.py:96
        assert len(got) == 3
        assert [r.distance for r in got] == sorted(r.distance for r in got)
        want = oracle("psychic", 3)
        assert [r.id for r in got] == [i for i, _ in want], (
            f"engine top-3 {[r.id for r in got]} != oracle {[i for i, _ in want]}"
        )
        for r, (_, d) in zip(got, want):
            assert abs(r.distance - d) < 1e-5, (r.distance, d)
        print("plain KNN: engine top-3 == live-model numpy oracle")
        for r in got:
            print(f"  {r.metadata['name']['english']:<12} d={r.distance:.4f}")

        filters = {"base.Attack": (">", 50), "type": ("contains", "Flying")}
        got = db.query("rainbow", k=3, filters=filters)  # vdb.py:102
        assert got, "filtered query returned nothing"
        for r in got:
            assert r.metadata["base"]["Attack"] > 50
            assert "Flying" in r.metadata["type"]
        want = oracle(
            "rainbow",
            3,
            pred=lambda r: r.get("base", {}).get("Attack", 0) > 50
            and "Flying" in r.get("type", []),
        )
        assert [r.id for r in got] == [i for i, _ in want]
        print("filtered KNN: predicate holds on every row, ids == oracle")
        for r in got:
            print(
                f"  {r.metadata['name']['english']:<12} "
                f"Attack={r.metadata['base']['Attack']} d={r.distance:.4f}"
            )

    print("LIVE SMOKE PASS: demo flow end-to-end with the real model")
    _openai_probe()
    return 0


def _openai_probe() -> None:
    """Optional U4 live probe — runs only with OPENAI_API_KEY + openai."""
    import os

    if not os.environ.get("OPENAI_API_KEY"):
        print("SKIP (openai probe): OPENAI_API_KEY not set")
        return
    try:
        import openai  # noqa: F401
    except ImportError:
        print("SKIP (openai probe): openai package not installed")
        return
    import numpy as np
    import pandas as pd

    from modal_vector_db_spark.embedders import get_embedder

    emb = get_embedder("OpenAIEmbedder", model_name="text-embedding-3-small")
    v = emb.embed("a single probe sentence")
    assert v.shape == (emb.get_dimensions(),), v.shape
    batch = emb.embed_batch(pd.Series(["alpha", "beta", "gamma"]))
    assert len(batch) == 3
    assert all(len(b) == emb.get_dimensions() for b in batch)
    # list-input form returns a matrix in input order
    mat = emb.embed(["alpha", "zeta"])
    assert np.asarray(mat).shape == (2, emb.get_dimensions())
    print("LIVE SMOKE PASS (openai): single + batched embeds, dims verified")


if __name__ == "__main__":
    sys.exit(main())
