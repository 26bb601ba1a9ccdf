"""Scale smoke: run the heavy pipelines on an N×-replicated corpus to show
near-linear scaling (the 'would this survive 100×?' evidence).

Replicates documents/embeddings N times with distinct ids (union of shifted
copies — no new files needed), then times MinHash-LSH dedup, SimHash dedup,
and exact KNN at 1× and N×.  Linear-ish growth (and unchanged plans) is the
pass criterion; quadratic blowup would show immediately in the LSH
band-bucket sizes.

Usage: python tools/scale_smoke.py [N] [sf_dir]
Prints one JSON line with timings and rows at both scales.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def replicate(df, id_col, n):
    """n shifted copies with disjoint ids (keeps dedup structure: each copy
    is content-identical to the original → planted dups scale with n)."""
    from pyspark.sql import functions as F

    out = None
    for i in range(n):
        c = df.withColumn(id_col, F.col(id_col) + (10_000_000 * i))
        out = c if out is None else out.union(c)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from modal_vector_db_spark.functions.hashing import minhash_signature, simhash64
    from modal_vector_db_spark.functions.text import shingles, tokens
    from modal_vector_db_spark.harness import load, scale_out
    from modal_vector_db_spark.operators.knn import knn
    from modal_vector_db_spark.session import get_spark

    spark = get_spark("scale_smoke", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def timed(tag, scale, fn):
        t0 = time.perf_counter()
        rows = fn()
        results.setdefault(tag, {})[f"x{scale}"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "rows": rows,
        }

    for scale in (1, N):
        docs = scale_out(
            replicate(load(spark, SF_DIR, "documents").select("doc_id", "text"), "doc_id", scale)
        )
        emb = scale_out(
            replicate(load(spark, SF_DIR, "embeddings"), "vec_id", scale)
        )

        def minhash_pairs():
            d = docs.select("doc_id", shingles("text", 3).alias("sh")).withColumn(
                "sig", minhash_signature(F.col("sh"), 8)
            )
            bands = d.select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(3)),
                        lambda i: F.struct(
                            i.alias("band"),
                            F.concat_ws(
                                "_",
                                F.element_at(F.col("sig"), i * 2 + 1).cast("string"),
                                F.element_at(F.col("sig"), i * 2 + 2).cast("string"),
                            ).alias("key"),
                        ),
                    )
                ).alias("bk"),
            ).select("doc_id", "bk.band", "bk.key")
            a, b = bands.alias("a"), bands.alias("b")
            return (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select("a.doc_id", "b.doc_id")
                .distinct()
                .count()
            )

        def simhash_sigs():
            return docs.select(
                "doc_id", simhash64(tokens("text"), 32).alias("sim")
            ).count()

        def warc_extract(scale=scale):
            # crawl-ingest pipeline: WARC walk + HTTP unwrap + BOTH HTML
            # extraction tiers.  Scaling = more FILES (hardlinked shard
            # replicas), the axis a real crawl grows on — 1× is 8 files
            # (underutilizes 32 cores by design), N× is 8N tasks.
            import os
            import tempfile

            from modal_vector_db_spark.functions.html import html_title, html_to_text
            from modal_vector_db_spark.operators.html_extract import extract_html_fields
            from modal_vector_db_spark.queries.web_queries import _warc_fixture_dir
            from modal_vector_db_spark.sources.warc import read_warc

            base = _warc_fixture_dir(spark, SF_DIR)
            d = os.path.join(tempfile.gettempdir(), f"sparkvdb_warcscale_x{scale}")
            if not os.path.isdir(d):
                os.makedirs(d)
                for i in range(scale):
                    for fn in os.listdir(base):
                        os.link(os.path.join(base, fn), os.path.join(d, f"r{i:03d}_{fn}"))
            recs = read_warc(spark, d, types=("response",))
            html = F.col("payload").cast("string")
            base_df = recs.select(
                F.monotonically_increasing_id().alias("doc_id"), html.alias("html")
            )
            cat = base_df.select(
                html_title(F.col("html")).alias("title"),
                html_to_text(F.col("html")).alias("text"),
            )
            par = extract_html_fields(base_df).select("title", "text")
            return cat.unionByName(par).filter(F.length("text") > 0).count()

        def knn_exact():
            qv = [float(x) for x in emb.select("embedding").head()["embedding"]]
            return len(knn(emb, qv, k=10, id_cols=("vec_id",), tie_break="vec_id").collect())

        def srp_pairs():
            # The embedding replicas are ROLLED (cyclic shift per copy), so
            # copies are NOT near-dups of each other — this times the
            # pipeline, not an artificially quadratic pair explosion.  LSH
            # tuning at scale: add sign bits per band as data grows so
            # expected bucket size stays constant (bits ~ 6 + log2(scale));
            # that is the documented knob in operators/ann.py and exactly
            # what the 100 TB deployment would do.
            import math

            from modal_vector_db_spark.operators.ann import cosine_srp_pairs

            rolled = None
            base = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
            for i in range(scale):
                c = base.select(
                    (F.col("vec_id") + 10_000_000 * i).alias("vec_id"),
                    F.concat(
                        F.slice("embedding", i % 64 + 1, 64 - i % 64),
                        F.slice("embedding", 1, i % 64),
                    ).alias("embedding"),
                )
                rolled = c if rolled is None else rolled.union(c)
            bits = 6 + max(0, math.ceil(math.log2(scale)))
            return cosine_srp_pairs(
                scale_out(rolled),
                0.95,
                64,
                num_planes=4 * bits,
                bands=4,
                impl="pandas",  # Arrow matmul — the projection path at scale
                verify_impl="pandas",  # candidate verify dominates once tuned
            ).count()

        def hybrid_rrf():
            from modal_vector_db_spark.functions.distance import cosine_distance, vector_lit
            from modal_vector_db_spark.operators.hybrid import bm25_scores, rrf_fuse

            lex = bm25_scores(docs, ["spark", "merge", "window"])
            qv = [
                float(x)
                for x in load(spark, SF_DIR, "embeddings").select("embedding").head()["embedding"]
            ]
            vec = emb.select(
                F.col("vec_id").alias("doc_id"),
                cosine_distance(F.col("embedding"), vector_lit(qv)).alias("distance"),
            )
            return rrf_fuse(lex, vec, top_n=50, k=10).count()

        def hybrid_batch():
            # Q=8 queries over ONE corpus tokenize + ONE batched vector
            # top-k (operators/hybrid.py:*_multi): wall-clock should track
            # the corpus size like the single-query entry above, NOT Q× —
            # the batching claim under replication.
            from modal_vector_db_spark.operators.ann import brute_force_topk_multi
            from modal_vector_db_spark.operators.hybrid import (
                bm25_scores_multi,
                rrf_fuse_multi,
            )

            terms = ["spark", "merge", "window", "scan", "key", "value", "row", "join"]
            pairs = [(i, t) for i in range(8) for t in (terms[i], terms[(i + 1) % 8])]
            lex = bm25_scores_multi(docs, pairs)
            base_vecs = [
                r["embedding"]
                for r in load(spark, SF_DIR, "embeddings").select("embedding").limit(8).collect()
            ]
            qdf = spark.createDataFrame(
                [(i, [float(x) for x in v]) for i, v in enumerate(base_vecs)],
                "q_id int, q_vec array<double>",
            )
            vec = brute_force_topk_multi(
                emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
                qdf, k=50, id_col="doc_id",
            )
            return rrf_fuse_multi(lex, vec, top_n=50, k=10).count()

        def versioned_ingest():
            # df-native bulk ingest into the manifest-log backend: content
            # ids executor-side, one atomic commit; growth should track the
            # embed+write volume (the O(1)-metadata commit is invariant).
            import tempfile

            from modal_vector_db_spark.engine import VectorDB

            db = VectorDB(
                spark,
                "smoke_ingest",
                embedding_dim=16,
                create_new_table=True,
                warehouse=tempfile.mkdtemp(prefix="smoke_vdb_"),
                versioned=True,
            )
            src = docs.select(F.to_json(F.struct("doc_id")).alias("metadata"))
            db.insert_df(src, embed_field="doc_id")
            return db.num_rows()

        def exact_substr():
            # Content-identical replicas make EVERY span duplicated — the
            # honest worst case for ExactSubstr: the dup-hash aggregate and
            # the positions join both carry the full shingle stream.
            from modal_vector_db_spark.operators.dedup import duplicated_spans

            return duplicated_spans(
                docs, "doc_id", "text", shingle_n=8, min_covered=16
            ).count()

        def minhash_capped_megacluster():
            # The bucket-cap's target shape: ONE near-identical templated
            # cluster that grows with the corpus (boilerplate pages).  All
            # docs share band buckets, so uncapped candidates grow
            # QUADRATICALLY with scale (625→10k docs = 256× the pairs);
            # with the cap the verify stage is O(m) and growth should
            # track data, not data².
            from modal_vector_db_spark.operators.dedup import minhash_lsh_pairs

            template = " ".join(f"boiler{i}" for i in range(40))
            mega = scale_out(
                spark.range(625 * scale).select(
                    F.col("id").alias("doc_id"),
                    F.concat(
                        F.lit(template + " unique"), F.col("id").cast("string")
                    ).alias("text"),
                )
            )
            return minhash_lsh_pairs(
                mega, "doc_id", "text", threshold=0.4, bucket_cap=64
            ).count()

        def jpeg_pixel_decode():
            # the new (round-7) baseline-JPEG decoder: synthesize solid
            # 4:2:0/4:4:4 files executor-side and decode them for real —
            # embarrassingly parallel (no shuffle), so growth must track
            # cores-then-data, never blow up
            import pandas as pd

            import modal_vector_db_spark.operators.multimodal as MM

            MM._ship_by_value()
            from modal_vector_db_spark.operators.jpeg import encode_jpeg_solid

            def _synth(batches):
                for pdf in batches:
                    blobs = []
                    for d in pdf["doc_id"]:
                        dd = int(d) % 100
                        blobs.append(
                            encode_jpeg_solid(
                                16 + dd % 17, 16 + dd % 13,
                                (30 + dd, 118 + dd % 20, 118 + dd % 19),
                                subsampling="420" if dd % 2 else "444",
                            )
                        )
                    yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

            synth = docs.select("doc_id").mapInPandas(
                _synth, "doc_id long, blob binary"
            )
            return (
                MM.extract_pixel_stats(synth)
                .filter(F.col("width").isNotNull())
                .count()
            )

        def bloom_admission():
            # Cross-corpus exact anti-join via the Bloom word-table
            # (operators/bloom.py): admit a batch (half verbatim corpus
            # copies, half new) against the replicated corpus.  The probe
            # batch is never shuffled; the build side pays one partial-agg
            # bit_or shuffle bounded by the FILTER size, so growth should
            # track the corpus scan, never the join's shuffle volume.
            from modal_vector_db_spark.operators.bloom import bloom_anti_join

            batch = docs.filter(F.col("doc_id") % 5 == 2).select(
                (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
            ).union(
                docs.filter(F.col("doc_id") % 5 == 3).select(
                    (F.col("doc_id") + 60_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" nn4")).alias("text"),
                )
            )
            return bloom_anti_join(
                batch, docs.select("text"), ["text"],
                num_bits=1 << 23, num_hashes=5, seed=8,
            ).count()

        def image_dhash_pairs():
            # perceptual image near-dup at scale: plant one 9×8 PNG per
            # doc (pattern keyed on the FULL id, so replicas get DISTINCT
            # images — this times the hash+band+verify pipeline, not a
            # quadratic planted blowup) plus a tweaked twin per 16th doc;
            # decode → dHash → generic hamming banding
            import pandas as pd

            import modal_vector_db_spark.operators.multimodal as MM
            from modal_vector_db_spark.operators.dedup import (
                signature_hamming_pairs,
            )

            MM._ship_by_value()
            enc = MM.encode_png
            base = docs.select("doc_id")
            ids = base.union(
                base.filter(F.col("doc_id") % 16 == 0).select(
                    (F.col("doc_id") + 900_000_000).alias("doc_id")
                )
            )

            M64 = (1 << 64) - 1

            def _cell(b, x, y):
                # splitmix64 finalizer: per-cell values must be genuinely
                # pseudorandom — linear/gradient patterns make near-all-
                # ones dhashes that clump into mega-buckets (measured:
                # a Knuth-multiplicative gradient produced 930k pairs on
                # 5k docs vs ~3k here), and the smoke would then time a
                # quadratic fixture artifact instead of the pipeline
                z = (b * 0x9E3779B97F4A7C15 + x * 0xBF58476D1CE4E5B9
                     + y * 0x94D049BB133111EB) & M64
                z ^= z >> 30
                z = (z * 0xBF58476D1CE4E5B9) & M64
                z ^= z >> 27
                z = (z * 0x94D049BB133111EB) & M64
                return (z ^ (z >> 31)) & 0xFF

            def _plant(batches):
                for pdf in batches:
                    blobs = []
                    for d in pdf["doc_id"]:
                        d = int(d)
                        b = d - 900_000_000 if d >= 900_000_000 else d
                        px = bytearray(
                            _cell(b, x, y)
                            for y in range(8) for x in range(9)
                        )
                        if d >= 900_000_000:
                            px[0] = (px[0] + 128) % 256
                        blobs.append(enc(9, 8, bytes(px), channels=1))
                    yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

            media = ids.mapInPandas(_plant, "doc_id long, blob binary")
            return signature_hamming_pairs(
                MM.extract_image_dhash(media), "doc_id", "dhash",
                bits=64, band_bits=16, hamming_threshold=2,
            ).count()

        def video_dhash_pairs():
            # video near-dup at scale: plant one 2-frame MJPEG AVI per doc
            # (8×8 filler frame 0 never entropy-decoded; middle frame =
            # 72×64 grayscale of DC-only blocks whose values are splitmix64
            # pseudorandom per (id, cell) — same anti-mega-bucket rule as
            # image_dhash_pairs) plus a one-block-perturbed twin per 16th
            # doc; RIFF walk → one-frame JPEG decode → dHash → banding
            import pandas as pd

            import modal_vector_db_spark.operators.avi as AVI
            import modal_vector_db_spark.operators.jpeg as JP
            import modal_vector_db_spark.operators.multimodal as MM
            from modal_vector_db_spark.operators.dedup import (
                signature_hamming_pairs,
            )

            MM._ship_by_value()
            try:
                from pyspark import cloudpickle

                cloudpickle.register_pickle_by_value(AVI)
                cloudpickle.register_pickle_by_value(JP)
            except Exception:
                pass
            enc_avi, enc_blk = AVI.encode_mjpeg_avi, JP.encode_jpeg_blocks

            M64 = (1 << 64) - 1

            def _cell(b, x, y):
                z = (b * 0x9E3779B97F4A7C15 + x * 0xBF58476D1CE4E5B9
                     + y * 0x94D049BB133111EB) & M64
                z ^= z >> 30
                z = (z * 0xBF58476D1CE4E5B9) & M64
                z ^= z >> 27
                z = (z * 0x94D049BB133111EB) & M64
                return (z ^ (z >> 31)) & 0xFF

            base = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id")
            ids = base.union(
                base.filter(F.col("doc_id") % 16 == 1).select(
                    (F.col("doc_id") + 900_000_000).alias("doc_id")
                )
            ).repartition(32)

            def _plant(batches):
                filler = enc_blk(8, 8, [[0] * 64])
                for pdf in batches:
                    blobs = []
                    for d in pdf["doc_id"]:
                        d = int(d)
                        b = d - 900_000_000 if d >= 900_000_000 else d
                        blocks = []
                        for gy in range(8):
                            for gx in range(9):
                                v = _cell(b, gx, gy)
                                if d >= 900_000_000 and gx == 0 and gy == 0:
                                    v = (v + 128) % 256
                                blocks.append([(v - 128) * 8] + [0] * 63)
                        blobs.append(enc_avi(
                            [filler, enc_blk(72, 64, blocks)], 72, 64
                        ))
                    yield pd.DataFrame(
                        {"doc_id": pdf["doc_id"], "blob": blobs}
                    )

            media = ids.mapInPandas(_plant, "doc_id long, blob binary")
            return signature_hamming_pairs(
                AVI.extract_video_dhash(media), "doc_id", "dhash",
                bits=64, band_bits=16, hamming_threshold=2,
            ).count()

        timed("bloom_anti_admission", scale, bloom_admission)
        timed("image_dhash_pairs", scale, image_dhash_pairs)
        timed("video_dhash_pairs", scale, video_dhash_pairs)
        timed("jpeg_pixel_decode", scale, jpeg_pixel_decode)
        timed("minhash_band_pairs", scale, minhash_pairs)
        timed("minhash_capped_megacluster", scale, minhash_capped_megacluster)
        timed("exact_substr_dupspans", scale, exact_substr)
        def warc_cdx_fetch(scale=scale):
            # record-level random access: as the crawl grows 16x, fetching
            # a FIXED set of records must stay flat — the index names the
            # byte ranges, the fetch never scans the corpus.  (The index
            # build itself is the linear pass; it is timed inside too, so
            # this entry's ratio bounds index+fetch, with fetch the claim.)
            import os
            import tempfile

            from modal_vector_db_spark.sources.warc import build_cdx, fetch_records

            d = os.path.join(tempfile.gettempdir(), f"sparkvdb_warcscale_x{scale}")
            cdx = build_cdx(spark, d).filter("warc_type = 'response'")
            wanted = cdx.orderBy("target_uri").limit(50)
            return fetch_records(wanted).count()

        # --- graph index: build scales with data, SERVE stays flat --------
        # The 100 TB deployment grows the CLUSTER COUNT with the corpus
        # (fixed ~250-vector shards here), so a query's nprobe=2 read is
        # constant bytes at any scale and the beam is O(ef·log n) inside
        # each shard — build is the linear pass, serving is the flat one.
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile

        from modal_vector_db_spark.operators.ann import IVFIndex
        from modal_vector_db_spark.operators.hnsw import build_hnsw, hnsw_topk_multi

        gdir = _os.path.join(_tempfile.gettempdir(), f"sparkvdb_graphscale_x{scale}")
        _shutil.rmtree(gdir, ignore_errors=True)

        def graph_build(scale=scale, gdir=gdir):
            src = emb.select("vec_id", "embedding")
            ivf = IVFIndex.build(src, vec_col="embedding", k=8 * scale)
            clustered = ivf.assign(src)
            clustered.write.partitionBy("cluster_id").parquet(
                _os.path.join(gdir, "nodes")
            )
            stored = spark.read.parquet(_os.path.join(gdir, "nodes"))
            build_hnsw(
                stored, id_col="vec_id", m=8, ef_construction=48
            ).write.partitionBy("cluster_id").parquet(_os.path.join(gdir, "adj"))
            ivf.save(_os.path.join(gdir, "centroids"), spark)
            return spark.read.parquet(_os.path.join(gdir, "adj")).count()

        def graph_serve_q8(scale=scale, gdir=gdir):
            nodes = spark.read.parquet(_os.path.join(gdir, "nodes"))
            adj = spark.read.parquet(_os.path.join(gdir, "adj"))
            ivf = IVFIndex.load(_os.path.join(gdir, "centroids"), spark)
            qvs = [
                [float(x) for x in r["embedding"]]
                for r in load(spark, SF_DIR, "embeddings").limit(8).collect()
            ]
            probes = {i: ivf.nearest_centroids(qv, 2) for i, qv in enumerate(qvs)}
            return hnsw_topk_multi(
                adj, nodes, qvs, k=10, ef_search=64,
                probes_per_query=probes, id_col="vec_id",
            ).count()

        timed("graph_index_build", scale, graph_build)
        timed("graph_serve_q8", scale, graph_serve_q8)
        timed("simhash_signatures", scale, simhash_sigs)
        timed("warc_html_extract", scale, warc_extract)
        timed("warc_cdx_fetch", scale, warc_cdx_fetch)
        timed("knn_exact", scale, knn_exact)
        timed("srp_embedding_pairs", scale, srp_pairs)
        timed("hybrid_bm25_rrf", scale, hybrid_rrf)
        timed("hybrid_batch_q8", scale, hybrid_batch)
        timed("versioned_bulk_ingest", scale, versioned_ingest)

    for tag, r in results.items():
        s1, sN = r["x1"]["sec"], r[f"x{N}"]["sec"]
        r["speed_ratio"] = round(sN / max(s1, 1e-9), 1)
        r["data_ratio"] = N
    print(json.dumps({"n": N, "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
