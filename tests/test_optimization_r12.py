"""Focused pins for the round-12 optimization rewrites of operator
internals:

- ``_capped_pair_frame`` moved from a bands-self-join (+ sizes pass when
  capped) to ONE groupBy + in-bucket pair generation from the sorted
  member array — these tests pin the new shape's semantics against an
  independent brute-force reference (pair set, ordering, hub-star
  fallback, payload echo).
- the ``synth=`` fusion hook on the media extract operators must be
  OUTPUT-IDENTICAL to the unfused two-step (synth mapInPandas → extract
  mapInPandas) it replaced.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _reference_pairs(rows, bucket_cap):
    """Brute-force reference: rows = [(id, band, key, payload)] → the
    multiset of (id_a, id_b, payload_a, payload_b) the operator must
    emit (pair per shared (band, key), id_a < id_b; hub-star from the
    bucket's min id when the bucket exceeds the cap)."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for rid, band, key, pay in rows:
        buckets[(band, key)].append((rid, pay))
    out = []
    for members in buckets.values():
        members.sort()
        if bucket_cap is not None and len(members) > bucket_cap:
            hub = members[0]
            out.extend(
                (hub[0], m[0], hub[1], m[1]) for m in members[1:]
            )
        else:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = members[i], members[j]
                    out.append((a[0], b[0], a[1], b[1]))
    return sorted(out)


@pytest.mark.parametrize("bucket_cap", [None, 3])
def test_capped_pair_frame_matches_brute_force(spark, bucket_cap):
    from modal_vector_db_spark.operators.dedup import _capped_pair_frame

    rng = random.Random(7)
    rows = []
    for rid in range(60):
        pay = rng.randrange(1 << 20)
        for band in range(3):
            # few distinct keys per band → a mix of singleton, small and
            # oversized (> cap) buckets
            rows.append((rid, band, str(rng.randrange(6)), pay))
    # one row per (band, key, id) — dedupe collisions from the generator
    rows = list({(r[0], r[1], r[2]): r for r in rows}.values())
    bands = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "doc_id long, band int, key string, sim long",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["sim_a"], r["sim_b"])
        for r in _capped_pair_frame(
            bands, "doc_id", payload=("sim",), bucket_cap=bucket_cap
        ).collect()
    )
    # the reference keys payload by id, so (id, payload) must be stable
    pay_by_id = {r[0]: r[3] for r in rows}
    ref = _reference_pairs(
        [(r[0], r[1], r[2], pay_by_id[r[0]]) for r in rows], bucket_cap
    )
    assert got == ref
    # invariants the downstream components/verify stages rely on
    assert all(a < b for a, b, _, _ in got)


def test_capped_pair_frame_no_payload_and_singletons(spark):
    from modal_vector_db_spark.operators.dedup import _capped_pair_frame

    bands = spark.createDataFrame(
        [(1, 0, "x"), (2, 0, "x"), (3, 0, "y")],  # one pair + a singleton
        "doc_id long, band int, key string",
    )
    got = sorted(
        (r["id_a"], r["id_b"]) for r in _capped_pair_frame(bands, "doc_id").collect()
    )
    assert got == [(1, 2)]  # singleton buckets emit nothing


def test_synth_fusion_identical_to_two_step(spark):
    """extract_pixel_stats(df, synth=s) must equal
    extract_pixel_stats(df.mapInPandas(s, ...)) row-for-row — the fusion
    is an execution-shape change only."""
    import modal_vector_db_spark.operators.multimodal as MM

    MM._ship_by_value()
    encode_png = MM.encode_png

    def _synth(batches):
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                dd = int(d) % 50
                px = bytes((x + 3 * y + dd) % 256 for y in range(4) for x in range(5))
                blobs.append(encode_png(5, 4, px, channels=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    two_step = MM.extract_pixel_stats(
        ids.mapInPandas(_synth, "doc_id long, blob binary")
    )
    fused = MM.extract_pixel_stats(ids, synth=_synth)
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(two_step.collect(), key=key) == sorted(fused.collect(), key=key)


def test_hash_extract_synth_fusion_identical(spark):
    import modal_vector_db_spark.operators.multimodal as MM

    MM._ship_by_value()
    encode_png = MM.encode_png

    def _synth(batches):
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                dd = int(d) % 30
                px = bytes((dd * 7 + 11 * x + 29 * y) % 256 for y in range(8) for x in range(9))
                blobs.append(encode_png(9, 8, px, channels=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    two_step = MM.extract_image_dhash(
        ids.mapInPandas(_synth, "doc_id long, blob binary")
    )
    fused = MM.extract_image_dhash(ids, synth=_synth)
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(two_step.collect(), key=key) == sorted(fused.collect(), key=key)
