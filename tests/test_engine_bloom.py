"""Maintained Bloom-filter sidecar (engine.py `__bloom`): the
both-sides-huge membership primitive as a STANDING table artifact —
insert/update paths append delta words, readers fold with bit_or, and
the superset contract makes bloom_admit byte-identical to the exact
anti-join.  The pinned bloom_merge union property, now end-to-end."""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F

from modal_vector_db_spark.engine import VectorDB
from modal_vector_db_spark.operators import bloom as B


def _db(spark, tmp_path, versioned, name="bloomt"):
    wh = str(tmp_path / f"wh_{uuid.uuid4().hex[:8]}")
    return VectorDB(
        spark, name, embedding_dim=8, warehouse=wh,
        create_new_table=True, versioned=versioned,
    )


def _metas(lo, hi):
    return [{"text": f"doc number {i}", "n": i} for i in range(lo, hi)]


def _folded(db):
    return {(r["word_idx"], r["word"]) for r in db.bloom_words().collect()}


def _rebuilt(db, meta_field=None):
    meta = db._read_bloom_meta()
    keys = db._bloom_key(db.items(), meta)
    return {
        (r["word_idx"], r["word"])
        for r in B.bloom_build(
            keys, ["_bk"], meta["num_bits"], meta["num_hashes"], meta["seed"]
        ).collect()
    }


@pytest.mark.parametrize("versioned", [False, True], ids=["plain", "versioned"])
def test_append_maintained_filter_equals_rebuilt(spark, tmp_path, versioned):
    """create filter -> N appends -> folded words == a fresh bloom_build
    over the live corpus keys (the bloom_merge property end-to-end, on
    both backends)."""
    db = _db(spark, tmp_path, versioned)
    db.insert(_metas(0, 20), embed_field="text")
    db.create_bloom_filter(expected_items=200)
    db.insert(_metas(20, 50), embed_field="text")
    db.insert(_metas(50, 80), embed_field="text")
    assert _folded(db) == _rebuilt(db)


def test_bloom_admit_matches_exact_anti_join(spark, tmp_path):
    """Admission over the CONTENT-ID key: unseen content passes, seen
    content (any insert batch, any arrival order) is rejected — equal to
    the exact anti-join against the corpus id set."""
    from modal_vector_db_spark.schema import json_to_uuid

    db = _db(spark, tmp_path, versioned=False)
    db.insert(_metas(0, 10), embed_field="text")
    db.create_bloom_filter(expected_items=100)
    db.insert(_metas(10, 40), embed_field="text")

    probe_metas = _metas(35, 60)  # overlap [35,40) + unseen [40,60)
    rows = [(json_to_uuid(m), m["text"]) for m in probe_metas]
    batch = spark.createDataFrame(rows, "cid string, text string")
    got = {r["cid"] for r in db.bloom_admit(batch, "cid").collect()}
    want = {
        r["cid"]
        for r in batch.join(
            db.items().select(F.col("id").alias("cid")), "cid", "left_anti"
        ).collect()
    }
    assert got == want
    assert len(want) == 20  # [40,60) really is unseen


def test_field_keyed_filter_and_update_superset(spark, tmp_path):
    """A metadata-field-keyed filter: update() re-keys rows and changes
    field values — the patched values must be IN the filter (appended
    before the commit), old values may remain as stale-superset bits;
    bloom_admit stays exact throughout."""
    db = _db(spark, tmp_path, versioned=False)
    db.insert([{"text": f"t{i}", "lang": "en"} for i in range(8)],
              embed_field="text")
    db.create_bloom_filter(field="text", expected_items=100)
    db.update({"lang": "en"}, {"text": "patched value"})
    batch = spark.createDataFrame(
        [("patched value",), ("never seen",)], "text string"
    )
    got = {r["text"] for r in db.bloom_admit(batch, "text").collect()}
    assert got == {"never seen"}
    # and the words hold a BIT-superset of a fresh rebuild (old keys
    # linger as extra bits; compare per-word under a 64-bit mask)
    m64 = (1 << 64) - 1
    folded = {i: w & m64 for i, w in _folded(db)}
    for i, w in _rebuilt(db):
        w &= m64
        assert folded.get(i, 0) & w == w, i


def test_replay_append_is_idempotent(spark, tmp_path):
    """The crash-replay contract: re-running a sync with the same batch
    adds zero information to the folded filter."""
    db = _db(spark, tmp_path, versioned=False)
    db.insert(_metas(0, 10), embed_field="text")
    db.create_bloom_filter(expected_items=100)
    before = _folded(db)
    batch = db.items().limit(5)
    db._sync_bloom_for_append(batch)
    db._sync_bloom_for_append(batch)
    assert _folded(db) == before


def test_guards_and_drop_paths(spark, tmp_path):
    db = _db(spark, tmp_path, versioned=True)
    db.insert(_metas(0, 5), embed_field="text")
    with pytest.raises(ValueError, match="no bloom filter"):
        db.bloom_words()
    with pytest.raises(ValueError, match="no bloom filter"):
        db.bloom_admit(spark.range(1).select(F.lit("x").alias("v")), "v")
    with pytest.raises(ValueError, match="BOTH num_bits"):
        db.create_bloom_filter(num_bits=1024)
    db.create_bloom_filter(expected_items=50)
    clash = spark.range(1).select(
        F.lit("x").alias("v"), F.lit(True).alias("_bloom_hit")
    )
    with pytest.raises(ValueError, match="reserved"):
        db.bloom_admit(clash, "v")
    # rollback drops the filter (restored rows could predate it)
    db.insert(_metas(5, 8), embed_field="text")
    from modal_vector_db_spark.sources import versioned as vcat

    head = vcat.current_version("bloomt", db.warehouse)
    db.insert(_metas(8, 12), embed_field="text")
    db.rollback(head)
    assert db._read_bloom_meta() is None
    assert not os.path.exists(db._bloom_meta_path())


def test_load_from_parquet_drops_filter(spark, tmp_path):
    db = _db(spark, tmp_path, versioned=False)
    db.insert(_metas(0, 5), embed_field="text")
    db.create_bloom_filter(expected_items=50)
    src = str(tmp_path / "src.parquet")
    db.items().write.parquet(src)
    db.load_from_parquet(src, build_index=False)
    assert db._read_bloom_meta() is None
