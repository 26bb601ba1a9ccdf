"""Data model: the ``items`` table schema + deterministic content ids.

Reference table: ``CREATE TABLE items (id UUID PRIMARY KEY, metadata JSON,
embedding FLOAT[dim])`` (``duckvdb.py:32``).  Spark mapping (SURVEY §1.1):

- ``id``        → StringType (UUID text); uniqueness enforced by the write
                  path (anti-join, see ``engine.VectorDB.insert``), not a
                  constraint.
- ``metadata``  → StringType holding JSON text — store-as-text,
                  extract-on-read, exactly like the reference
                  (``vdb.py:51``, ``duckvdb.py:120``).  Deliberately NOT
                  inferred into a struct so heterogeneous rows coexist.
- ``embedding`` → ArrayType(FloatType).  Fixed dim is a convention validated
                  at ingest (``duckvdb.py:19,32``), not a per-row type.
"""

from __future__ import annotations

import json
import uuid
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

ITEMS_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("metadata", StringType(), nullable=True),
        StructField("embedding", ArrayType(FloatType()), nullable=True),
    ]
)


def canonical_json(metadata: dict[str, Any]) -> str:
    """Canonical (sort_keys) JSON used for deterministic ids.

    Mirrors ``utils.py:8``: ``json.dumps(json_obj, sort_keys=True)``.
    """
    return json.dumps(metadata, sort_keys=True)


def json_to_uuid(metadata: dict[str, Any]) -> str:
    """Deterministic content id: ``uuid.uuid5(NAMESPACE_DNS, canonical_json)``.

    Same mechanism as reference ``utils.py:6-9`` (called from
    ``duckvdb.py:50``) — duplicate *content* hashes to the same id, which is
    what makes the reference's ``ON CONFLICT (id) DO NOTHING`` insert
    idempotent (``duckvdb.py:57-61``).

    DELIBERATE DIVERGENCE, not exact id parity: the reference pipeline
    (``vdb.py:51`` → ``duckvdb.py:50``) stringifies metadata first (original
    key order) and then uuid5-hashes ``json.dumps(<that string>)`` — so two
    dicts with the same keys in different order get DIFFERENT reference ids.
    We hash the canonical (sort_keys) JSON of the dict itself, treating
    key-order-permuted metadata as the same content.  Consequence: ids do
    not interchange with reference-produced data; dedup here is
    key-order-insensitive (strictly more deduplication than the reference).
    """
    return str(uuid.uuid5(uuid.NAMESPACE_DNS, canonical_json(metadata)))


def stringify_metadata(metadata: dict[str, Any]) -> str:
    """Client-side stringify, mirroring ``vdb.py:51`` (no sort_keys)."""
    return json.dumps(metadata)
