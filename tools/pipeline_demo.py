"""End-to-end training-data pipeline over the fixture corpus — the
user-facing composition of the engine's pieces, runnable as one command:

    raw documents
      → cross-corpus admission (Bloom anti-join vs the previously
        accepted snapshot — exact result, probe never shuffled)
      → near-dup removal (MinHash-LSH pairs → connected components →
        keep-one-per-cluster)
      → benchmark decontamination (8-gram shingle overlap vs a broadcast
        eval set)
      → quality gate (Catalyst-only signals: quality_score, repetition,
        language) + PII redaction
      → token-budget sequence packing exported as training shards
        (one parquet directory per shard)
      → versioned snapshot of the final corpus (manifest log: auditable,
        time-travelable, stats-pruned)

Every stage is a Catalyst plan (LSH banding shuffles O(rows×bands), never
pairs; the quality gate is one scan; packing is windowed within hash
buckets) — the same code is the 100 TB pipeline, just with more executors.

Usage: python tools/pipeline_demo.py [sf_dir] [out_dir]
Prints ONE JSON line of per-stage counts.  Also importable:
``run_pipeline(spark, sf_dir, out_dir)`` (smoke-tested in
``tests/test_pipeline_ops.py``).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    quality_min: float = 0.3,
    tokens_per_shard: int = 4096,
    eval_modulus: int = 97,
) -> dict:
    from modal_vector_db_spark.functions.text import (
        dup_ngram_frac,
        gopher_keep,
        quality_score,
        redact_pii,
    )
    from modal_vector_db_spark.operators.dedup import (
        decontaminate,
        deduplicate,
        remove_duplicated_spans,
        minhash_lsh_pairs,
    )
    from modal_vector_db_spark.operators.layout import write_training_shards
    from modal_vector_db_spark.sources import versioned as vcat

    stats: dict = {}
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stats["input_docs"] = docs.count()

    # -1. CRAWL FRONT-END (round 9): the corpus as it actually arrives —
    # WARC files.  Walk the planted fixture crawl (mixed plain +
    # per-record-gzip shards), unwrap HTTP, extract text through the
    # parser tier, normalize URLs as the stage-zero dedup key, and rank
    # the link graph (crawl-prioritization signal).  Counts only — the
    # downstream stages keep consuming the parquet corpus so their
    # numbers stay comparable across rounds.
    from modal_vector_db_spark.functions.url import url_normalize
    from modal_vector_db_spark.operators.html_extract import extract_html_fields
    from modal_vector_db_spark.operators.pagerank import pagerank
    from modal_vector_db_spark.queries.web_queries import _warc_fixture_dir
    from modal_vector_db_spark.sources.warc import read_warc

    crawl = read_warc(spark, _warc_fixture_dir(spark, sf_dir), types=("response",))
    pages = crawl.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)\?", 1).cast("long").alias("doc_id"),
        url_normalize("target_uri").alias("url"),
        F.col("payload").cast("string").alias("html"),
    )
    fields = extract_html_fields(pages, passthrough=("url",)).persist()
    stats["crawl_pages"] = fields.count()
    stats["crawl_urls"] = fields.select("url").distinct().count()
    edges = (
        fields.select("doc_id", F.explode("links").alias("href"))
        .select(
            F.col("doc_id").alias("src"),
            # nav/tag furniture links don't address documents (try_cast:
            # a non-matching href extracts '' — NULL, not an ANSI error)
            F.regexp_extract("href", r"/doc/(\d+)$", 1).try_cast("long").alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    ranks = pagerank(edges, iters=3)
    top = ranks.orderBy(F.col("rank").desc(), F.col("node")).limit(10).collect()
    stats["crawl_rank_top10_mass"] = round(sum(r["rank"] for r in top), 6)
    fields.unpersist()

    # 0. cross-corpus admission (Bloom anti-join): drop documents whose
    # text already exists in the previously-accepted snapshot (here: a
    # simulated prior corpus — every 5th doc).  At 100 TB the prior
    # corpus's exact key set no longer broadcasts; the bit-packed word
    # table does, the incoming crawl is never shuffled, and the exact
    # verify runs over bloom candidates only — result identical to a
    # plain left-anti join (operators/bloom.py).
    from modal_vector_db_spark.operators.bloom import bloom_anti_join

    prior = docs.filter(F.col("doc_id") % 5 == 0).select("text")
    docs = bloom_anti_join(
        docs, prior, ["text"], num_bits=1 << 20, num_hashes=5, seed=3
    )
    stats["after_admission"] = docs.count()

    # 1. near-dup removal — pairs from banded LSH, clusters kept-one.
    # Persist: the LSH self-join + iterative connected components is the
    # pipeline's dominant cost, and every later stage (counts, shard
    # write, snapshot) would otherwise re-execute it from the raw scan.
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    deduped = deduplicate(docs, pairs, "doc_id").persist()
    stats["after_dedup"] = deduped.count()

    # 1b. SEMANTIC near-dup leg (SemDeDup): cluster-blocked cosine over
    # the aligned embeddings table — removes paraphrase-level dups the
    # lexical LSH can't see; oversized clusters hub-star JVM-side
    from modal_vector_db_spark.operators.dedup import semdedup_keep

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sem_kept = semdedup_keep(
        emb, "vec_id", num_clusters=8, eps=0.0005, cluster_cap=50_000
    ).select(F.col("vec_id").alias("doc_id"))
    deduped = deduped.join(sem_kept, "doc_id", "left_semi")
    stats["after_semdedup"] = deduped.count()

    # 2. decontamination — the "benchmark" here is a slice of real docs
    # (stand-in for an eval set; at scale: the actual benchmark files)
    benchmark = docs.filter(F.col("doc_id") % eval_modulus == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    clean = decontaminate(deduped, benchmark, "doc_id", "text")
    stats["after_decontamination"] = clean.count()

    # 2b. intra-corpus exact substring removal (Lee et al. ExactSubstr):
    # verbatim spans repeated >= 2 times keep only their first occurrence
    clean = remove_duplicated_spans(
        clean, "doc_id", "text", shingle_n=8, min_covered=16
    )

    # 3. quality gate + PII redaction — one codegen scan, no shuffle.
    # The gate stacks the composite score, the Gopher repetition signal,
    # and the Gopher document rules (word count floor lowered to the
    # fixture's doc sizes; at corpus scale use the paper's default 50).
    gated = (
        clean.withColumn("q", quality_score("text"))
        .withColumn("rep", dup_ngram_frac("text"))
        .filter(
            (F.col("q") >= quality_min)
            & (F.col("rep") < 0.5)
            # fixture corpus is synthetic word soup, not English prose:
            # lower the word floor to its doc sizes and the stop-word rule
            # to 1 (it contains 'the' but not the rest of the required set)
            & gopher_keep("text", min_words=10, min_stops=1)
        )
        .withColumn("text", redact_pii("text"))
        .drop("q", "rep")
    ).persist()
    stats["after_quality_gate"] = gated.count()

    # 3b. TRAINED quality model (fastText-style): bootstrap weak labels
    # from the heuristic score's extremes (top band positive, bottom band
    # negative), train hashed-ngram logistic regression, score the gated
    # corpus — the production pattern where a cheap heuristic seeds a
    # learned classifier that then generalizes past it
    from modal_vector_db_spark.operators.quality import (
        score_quality,
        train_quality_classifier,
    )

    scored_src = clean.withColumn("q", quality_score("text"))
    # label bands from the OBSERVED score distribution (a fixed absolute
    # band can be empty on an unfamiliar corpus): top/bottom ~30%
    lo, hi = scored_src.stat.approxQuantile("q", [0.3, 0.7], 0.01)
    pos = scored_src.filter(F.col("q") >= hi).select("text")
    neg = scored_src.filter(F.col("q") <= lo).select("text")
    if hi > lo and pos.limit(1).count() and neg.limit(1).count():
        model = train_quality_classifier(
            pos, neg, num_features=1 << 14, max_iter=20
        )
        qrow = score_quality(model, gated).agg(
            F.round(F.avg("quality_score"), 4).alias("m")
        ).head()
        stats["classifier_mean_score_kept"] = float(qrow["m"])

    # 4. token-budget packing → training shards (one directory per shard)
    shard_dir = os.path.join(out_dir, "shards")
    write_training_shards(
        gated, shard_dir, tokens_per_shard=tokens_per_shard, buckets=8
    )
    stats["n_shards"] = sum(
        1 for e in os.listdir(shard_dir) if e.startswith("shard=")
    )

    # 5. media curation leg: synthesize thumbnails for the surviving docs'
    # (demo-planted) images through the REAL stdlib codec — pixel-stat
    # gate (reject near-constant images: px_max - px_min < 8) then
    # nearest-neighbor resize to 8×4 — the image-quality step of a
    # multimodal corpus build, Arrow-batched end to end
    import modal_vector_db_spark.operators.multimodal as MM

    MM._ship_by_value()

    # (a deliberately DIFFERENT gradient than the driver-checked pixels
    # arm in queries/multimodal_queries.py — that one's formula is welded
    # to its closed-form oracle and stays inline next to it)
    def _plant(batches):
        import pandas as pd

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                dd = int(d) % 100
                px = bytes(
                    (x * 3 + y * 5 + c * 11 + dd) % 256
                    for y in range(8)
                    for x in range(16)
                    for c in range(3)
                )
                blobs.append(MM.encode_png(16, 8, px, channels=3))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    # persist: the gate and the resize both read `media` inside one
    # action — without it the 500 PNG encodes run twice AND the two
    # limit(500) evaluations could select different doc sets if the
    # upstream cache were evicted (silent undercount)
    media = (
        gated.select("doc_id")
        .limit(500)
        .mapInPandas(_plant, "doc_id long, blob binary")
    ).persist()
    try:
        pstats = MM.extract_pixel_stats(media)
        keep_ids = pstats.filter(
            (F.col("px_max") - F.col("px_min")) >= 8
        ).select("doc_id")
        thumbs = MM.resize_image(media.join(keep_ids, "doc_id"), 8, 4)
        stats["thumbnails"] = thumbs.filter("resized").count()

        # 5a. PERCEPTUAL image dedup: dHash over the real decodes → the
        # same generic hamming banding the text SimHash path uses →
        # keep-one-per-near-dup-cluster.  The planted gradients repeat
        # every 100 doc_ids, so duplicate images exist by construction —
        # a silently-dead leg cannot report fewer drops than that.
        from modal_vector_db_spark.operators.dedup import (
            signature_hamming_pairs,
        )

        ihashes = MM.extract_image_dhash(media)
        ipairs = signature_hamming_pairs(
            ihashes, "doc_id", "dhash",
            bits=64, band_bits=16, hamming_threshold=2,
        )
        doomed = ipairs.select(F.col("id_b").alias("doc_id")).distinct()
        stats["image_near_dups_dropped"] = doomed.count()
        stats["unique_images"] = (
            ihashes.join(doomed, "doc_id", "left_anti").count()
        )
    finally:
        media.unpersist()

    # 5c. video curation leg: plant 3-frame MJPEG AVIs for a sample of
    # surviving docs and sample every second frame through the REAL
    # container walk + JPEG decode (operators/avi.py) — skipped frames
    # are never entropy-decoded, the 1-in-N economics of video curation
    from modal_vector_db_spark.operators.avi import (
        encode_mjpeg_avi,
        extract_video_frame_stats,
    )
    from modal_vector_db_spark.operators.jpeg import encode_jpeg_solid

    def _plant_avi(batches):
        import pandas as pd

        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                dd = int(d) % 100
                frames = [
                    encode_jpeg_solid(16, 8, (40 + (dd + 9 * f) % 90,
                                              120 + f, 125 + f))
                    for f in range(3)
                ]
                blobs.append(encode_mjpeg_avi(frames, 16, 8, fps=5))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    vids = gated.select("doc_id").limit(100).mapInPandas(
        _plant_avi, "doc_id long, blob binary"
    )
    vstats = extract_video_frame_stats(vids, every_n=2)
    stats["video_frames_sampled"] = vstats.filter(
        F.col("frame_idx").isNotNull()
    ).count()

    # 5b. tokenizer leg: train BPE merges on the final corpus (ONE corpus
    # pass for word counts, bounded driver merge loop) and tokenize it —
    # the artifact + token budget the training run actually consumes
    from modal_vector_db_spark.operators.bpe import apply_bpe, train_bpe

    merges = train_bpe(gated, "text", num_merges=200, max_words=100_000)
    tok = apply_bpe(gated, merges, "text")
    trow = tok.agg(F.sum("n_tokens").alias("t")).head()
    stats["bpe_merges"] = len(merges)
    stats["bpe_total_tokens"] = int(trow["t"] or 0)

    # 6. versioned snapshot — auditable, time-travelable final corpus
    vcat.overwrite(gated, "corpus_final", out_dir, stats_cols=["doc_id"])
    stats["snapshot_rows"] = vcat.manifest_row_count("corpus_final", out_dir)
    stats["snapshot_version"] = vcat.current_version("corpus_final", out_dir)
    gated.unpersist()
    deduped.unpersist()
    return stats


def main() -> None:
    from modal_vector_db_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipeline_")
    spark = get_spark("pipeline-demo", shuffle_partitions=32)
    print(json.dumps(run_pipeline(spark, sf_dir, out_dir)))


if __name__ == "__main__":
    main()
