"""``VectorDB`` — the public facade, API-parity with ``ModalVectorDB``.

Reference surface (``vdb.py:19-68``):

    ModalVectorDB(name, embedder_name, embedding_dim, embedder_kwargs=None,
                  create_new_table=False)
    .insert(metadatas, embeddings=None, embed_field=None)
    .query(query, k=10, filters=None) -> list[Result]
    .num_rows() -> int

plus engine-level ``load_from_parquet`` / ``create_index``
(``duckvdb.py:37-45``).

Write path (S4+S5): the reference's ``INSERT … ON CONFLICT (id) DO NOTHING``
(``duckvdb.py:57-61``) is a left-anti join in disguise — we implement it as
exactly that: batch-internal ``dropDuplicates(id)`` then ``left_anti`` against
existing ids, then an atomic Parquet append.  At 100 TB the conflict set is
computed as ``existing LEFT SEMI (broadcast batch)`` over the id column only
— the base table is scanned once, column-pruned, never shuffled — and that
(≤ |batch|) set is the broadcast build side of the final anti-join.  See
``_idempotent_append``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.embedders import embed_udf, get_embedder
from modal_vector_db_spark.engine_bloom import BloomFilterMixin
from modal_vector_db_spark.engine_graph import GraphIndexMixin
from modal_vector_db_spark.engine_ivf import IvfIndexMixin
from modal_vector_db_spark.engine_text import TextIndexMixin
from modal_vector_db_spark.operators.filters import compile_filters
from modal_vector_db_spark.operators.knn import knn
from modal_vector_db_spark.schema import ITEMS_SCHEMA, json_to_uuid, stringify_metadata
from modal_vector_db_spark.sources import catalog


@dataclass
class Result:
    """Query result row — parity with reference ``duckvdb.py:9-13``."""

    id: str
    metadata: dict
    distance: float


class VectorDB(IvfIndexMixin, TextIndexMixin, BloomFilterMixin, GraphIndexMixin):
    """Spark-native vector DB with the reference's public API.

    The index machinery lives in four cohesive mixins (``engine_ivf`` /
    ``engine_text`` / ``engine_bloom`` / ``engine_graph``) — a review-cost
    split only: every method runs as ``VectorDB`` and the public API is
    unchanged."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        embedder_name: str = "HashingEmbedder",
        embedding_dim: int = 64,
        embedder_kwargs: Optional[dict] = None,
        create_new_table: bool = False,
        warehouse: str | None = None,
        write_mode: str = "anti_join",
        versioned: bool = False,
        stats_fields: Optional[dict | Sequence[str]] = None,
        id_fields: Optional[Sequence[str]] = None,
    ) -> None:
        if id_fields is not None and (
            not id_fields or not all(isinstance(f, str) and f for f in id_fields)
        ):
            raise ValueError(
                f"id_fields must be a non-empty sequence of field names, got {id_fields!r}"
            )
        if write_mode not in ("anti_join", "merge"):
            raise ValueError(f"write_mode must be 'anti_join' or 'merge', got {write_mode!r}")
        if versioned and write_mode == "merge":
            raise ValueError(
                "versioned=True uses the manifest-log layout; Delta MERGE "
                "(write_mode='merge') manages its own log — pick one"
            )
        if stats_fields and not versioned:
            raise ValueError(
                "stats_fields needs VectorDB(versioned=True): per-file "
                "min/max live in the manifest log, which the plain catalog "
                "does not keep"
            )
        self.spark = spark
        self.name = name
        self.warehouse = warehouse
        self.embedding_dim = embedding_dim
        self.embedder_name = embedder_name
        self.embedder_kwargs = embedder_kwargs or {}
        self.write_mode = write_mode
        self.versioned = versioned
        # Table-level content-identity declaration: when set, ids hash only
        # this metadata SUBSET (uuid5 of its canonical JSON) on EVERY path
        # that keys content — insert, insert_df, update's re-key, crawl
        # ingest — so volatile provenance fields (capture dates, fetch
        # metadata) stay stored but outside identity.  None = the
        # reference's whole-document identity.  Persisted in the sidecar:
        # mixed identities in one table would break idempotency silently.
        self.id_fields: tuple[str, ...] | None = tuple(id_fields) if id_fields else None
        # Base-table storage backend: the plain directory catalog, or the
        # manifest-log layout (``sources/versioned.py`` — atomic commits,
        # time travel, rollback, vacuum).  The derived __ivf layout follows
        # the base's backend (see _index_write_kwargs below); the tiny
        # centroid/PQ-codebook tables stay plain — rebuildable single-writer
        # artifacts, not primary data.
        from modal_vector_db_spark.sources import versioned as versioned_catalog

        self._cat = versioned_catalog if versioned else catalog
        # Declared stats fields (the Delta generated/stats-columns pattern):
        # each metadata field listed here is materialized at write time as a
        # top-level ``_s_<field>`` column whose per-file min/max land in the
        # manifest — delete()/update()/query() with an eq/range filter on
        # that field then prune FILES from the manifest alone
        # (:meth:`_derive_prune_bounds`).  Declared dtype must match the
        # filter compiler's probe cast ("double" for numeric probes,
        # "string" for string probes — ``operators/filters.py:_typed``), or
        # the bound is silently not derived (pruning is an optimization;
        # correctness never depends on it).  A plain sequence declares every
        # field "string".
        self._stats_fields = self._normalize_stats_fields(stats_fields)
        # Versioned writes record per-file row counts in the manifest
        # (stats_cols=[]: rows only), which turns num_rows() into an
        # O(metadata) read of the commit log; declared stats fields add
        # their materialized columns' min/max.
        self._write_kwargs = (
            {"stats_cols": [self._stats_colname(f) for f in self._stats_fields]}
            if versioned
            else {}
        )
        # Derived __ivf layout backend: on a versioned table the INDEX lives
        # on the manifest log too — its appends become OCC commits (safe
        # under concurrent CAS inserts, round-4 verdict gap #2), its row
        # count comes from its own manifest (O(metadata) consistency
        # probes), and a sidecar stamp records which base version it
        # reflects.  Centroids / PQ codebooks stay tiny plain-catalog
        # tables: they are single-writer build artifacts.
        self._index_write_kwargs = {"stats_cols": []} if versioned else {}
        self._index_mut_kwargs = (
            {"stats_cols": [], "partition_by": ["cluster_id"]} if versioned else {}
        )
        # __text follows the same backend rule as __ivf: manifest-logged on
        # versioned tables (immutable postings snapshots are what make the
        # time-travel ledger possible), plain parquet dirs otherwise.
        self._text_write_kwargs = (
            {"stats_cols": [], "partition_by": ["bucket"]}
            if versioned
            else {"partition_by": ["bucket"]}
        )
        self._text_mut_kwargs = (
            {"stats_cols": [], "partition_by": ["bucket"]} if versioned else {}
        )
        # one consistency probe per handle lifetime (see _load_ivf)
        self._ivf_probed = False
        # (marker_stat_key, IVFIndex2L) — per-handle two-level index cache
        # so repeated queries reuse the fine-centroid shard cache
        self._ivf2l_cache = None
        # Driver-side embedder for single-query embeds (U6, vdb.py:63) —
        # same registry the executors use (U2, vdb.py:22-27).
        self._embedder = get_embedder(embedder_name, dim=embedding_dim, **self.embedder_kwargs)
        if create_new_table:
            self._cat.drop_table(name, warehouse)  # duckvdb.py:26-28
            self._drop_meta()
            # a fresh table must not inherit derived index tables built
            # from the dropped incarnation's data
            self._drop_index_tables()
            self._drop_bloom_filter()
        else:
            # Config sidecar guard: a handle whose dim disagrees with the
            # table's recorded config would compute cosine over
            # different-length arrays — zip_with pads with NULL, so every
            # distance silently becomes NULL and ranking is garbage.  The
            # reference never hits this only because its FLOAT[dim] column
            # type errors at insert; we validate at the handle boundary.
            self._check_meta()

    # -- table-config sidecar ---------------------------------------------
    def _meta_path(self) -> str:
        return catalog.db_path(self.name, self.warehouse) + "__vdbmeta.json"

    def _write_meta(self) -> None:
        """Record the table's embedder configuration beside the table dir
        (underscore-free sibling file: survives directory swaps, ignored by
        every reader).  Written on every successful write op — idempotent,
        one tiny local file."""
        os.makedirs(os.path.dirname(self._meta_path()), exist_ok=True)
        with open(self._meta_path(), "w") as f:
            json.dump(
                {
                    "embedder_name": self.embedder_name,
                    "embedding_dim": self.embedding_dim,
                    "embedder_kwargs": json.loads(
                        json.dumps(self.embedder_kwargs, default=str, sort_keys=True)
                    ),
                    "stats_fields": self._stats_fields,
                    "id_fields": list(self.id_fields) if self.id_fields else None,
                },
                f,
            )

    def _drop_meta(self) -> None:
        try:
            os.remove(self._meta_path())
        except FileNotFoundError:
            pass

    def _check_meta(self) -> None:
        try:
            with open(self._meta_path()) as f:
                meta = json.load(f)
        except (FileNotFoundError, ValueError):
            return  # pre-sidecar table / foreign writer: nothing to check
        if not self._cat.table_exists(self.name, self.warehouse):
            # orphan sidecar (failed first insert, out-of-band drop): there
            # is no data to protect — inert, overwritten by the next write
            return
        # kwargs are part of embedder identity (e.g. model_name): same
        # class + same dim + different model is still the wrong space
        mine = json.loads(json.dumps(self.embedder_kwargs, default=str, sort_keys=True))
        if (
            meta.get("embedding_dim") != self.embedding_dim
            or meta.get("embedder_name") != self.embedder_name
            or meta.get("embedder_kwargs", {}) != mine
        ):
            raise ValueError(
                f"table {self.name!r} was created with "
                f"{meta.get('embedder_name')}(dim={meta.get('embedding_dim')}, "
                f"kwargs={meta.get('embedder_kwargs')}); this handle says "
                f"{self.embedder_name}(dim={self.embedding_dim}, kwargs={mine}) "
                "— construct with the table's config, or migrate it with "
                "reembed(), or start over with create_new_table=True"
            )
        # Stats-field declarations are part of the STORED SCHEMA (every file
        # carries the materialized _s_ columns): a handle writing with a
        # different declaration would drift the files' schemas and poison
        # manifest pruning with rows whose stats columns disagree with their
        # metadata.
        if meta.get("stats_fields", {}) != self._stats_fields:
            raise ValueError(
                f"table {self.name!r} declares stats_fields="
                f"{meta.get('stats_fields', {})}; this handle says "
                f"{self._stats_fields} — construct with the table's "
                "declaration, or migrate it with declare_stats_fields(), or "
                "start over with create_new_table=True"
            )
        # identity declarations must match: two handles keying content on
        # different subsets would silently break the anti-join idempotency
        mine_idf = list(self.id_fields) if self.id_fields else None
        if meta.get("id_fields") != mine_idf:
            raise ValueError(
                f"table {self.name!r} declares id_fields="
                f"{meta.get('id_fields')}; this handle says {mine_idf} — "
                "construct with the table's declaration or start over with "
                "create_new_table=True"
            )

    # -- declared stats fields (manifest data skipping) --------------------
    @staticmethod
    def _normalize_stats_fields(stats_fields) -> dict:
        """``{"ts": "double", "doc_id": "string"}`` (or a plain sequence —
        every field "string").  Dtypes are restricted to the two the filter
        compiler's probe casts produce (``operators/filters.py:_typed``):
        "double" (numeric probes) and "string" (string probes).  Anything
        else would record min/max in an order the compiled predicate does
        not compare in — unsound to prune on."""
        if not stats_fields:
            return {}
        if not isinstance(stats_fields, dict):
            stats_fields = {f: "string" for f in stats_fields}
        out: dict = {}
        for field, dtype in stats_fields.items():
            if not field or not isinstance(field, str):
                raise ValueError(f"stats field name must be a non-empty str, got {field!r}")
            if dtype not in ("string", "double"):
                raise ValueError(
                    f"stats field {field!r}: dtype must be 'string' or "
                    f"'double' (the filter compiler's probe casts), got {dtype!r}"
                )
            out[field] = dtype
        cols = [VectorDB._stats_colname(f) for f in out]
        if len(set(cols)) != len(cols):
            raise ValueError(
                f"stats fields {sorted(out)} collide after column-name "
                "sanitization ('.' becomes '_') — rename one"
            )
        return out

    @staticmethod
    def _stats_colname(field: str) -> str:
        """Materialized column name for a declared stats field (dots are not
        valid in parquet column names)."""
        return "_s_" + field.replace(".", "_")

    def _with_stats_cols(self, df: DataFrame) -> DataFrame:
        """Materialize every declared stats field as a top-level column with
        EXACTLY the filter compiler's extraction+cast expression
        (``json_path(...)`` / ``.cast("double")``), so per-file footer
        min/max are computed over the same values the compiled predicate
        compares — the soundness invariant manifest pruning rests on.
        Idempotent (pre-existing stats columns are recomputed)."""
        if not self._stats_fields:
            return df
        from modal_vector_db_spark.operators.filters import json_path

        present = [c for c in df.columns if c.startswith("_s_")]
        if present:
            df = df.drop(*present)
        for field, dtype in self._stats_fields.items():
            col = json_path("metadata", field)
            if dtype == "double":
                col = col.cast("double")
            df = df.withColumn(self._stats_colname(field), col)
        return df

    #: filter ops that imply a one-sided/point bound on the probed field
    _BOUND_KIND = {">": "lo", ">=": "lo", "<": "hi", "<=": "hi", "=": "eq", "==": "eq"}

    def _derive_prune_bounds(self, filters: Optional[dict]) -> list[tuple]:
        """Filter dict → manifest ``between`` bounds over the DECLARED stats
        columns — the bridge that makes file skipping reachable from the
        public filter DSL.

        Only terms whose pruning is provably implied by the compiled
        predicate derive a bound: top-level (AND-conjoined) eq/range terms,
        recursing through ``$and``; ``$or``/``$not`` terms derive nothing
        (their matches are not confined to any one term's range — sibling
        AND terms still prune).  A probe whose Python type does not match
        the field's declared dtype derives nothing either: the recorded
        min/max would order differently from the predicate's cast
        (``sources/versioned.py:_range_excludes`` documents why cross-type
        pruning is unsound).  Strict ``>``/``<`` reuse the closed-interval
        overlap test — conservative, never wrong."""
        if not self._stats_fields or not filters:
            return []
        bounds: list[tuple] = []
        for key, value in filters.items():
            if key == "$and" and isinstance(value, list):
                for sub in value:
                    if isinstance(sub, dict):
                        bounds.extend(self._derive_prune_bounds(sub))
                continue
            if key.startswith("$"):
                continue
            dtype = self._stats_fields.get(key)
            if dtype is None:
                continue

            def _typed_ok(p):
                if isinstance(p, bool):
                    return None
                if dtype == "double" and isinstance(p, (int, float)):
                    return float(p)
                if dtype == "string" and isinstance(p, str):
                    return p
                return None

            # round-12 ops derive real bounds: between → its own interval,
            # in → [min, max] of the list (sound: every match lies inside)
            if (
                isinstance(value, tuple)
                and len(value) == 2
                and value[0] == "between"
                and isinstance(value[1], (tuple, list))
                and len(value[1]) == 2
            ):
                lo, hi = _typed_ok(value[1][0]), _typed_ok(value[1][1])
                if lo is not None and hi is not None:
                    bounds.append((self._stats_colname(key), lo, hi))
                continue
            if (
                isinstance(value, tuple)
                and len(value) == 2
                and value[0] == "in"
                and isinstance(value[1], (list, tuple))
                and value[1]
            ):
                vals = [_typed_ok(v) for v in value[1]]
                if all(v is not None for v in vals):
                    bounds.append((self._stats_colname(key), min(vals), max(vals)))
                continue
            if isinstance(value, tuple) and len(value) == 2:
                # non-str ops are malformed — leave the loud rejection to
                # compile_filters (which every caller also runs); deriving
                # no bound here is always sound
                kind = self._BOUND_KIND.get(value[0]) if isinstance(value[0], str) else None
                probe = value[1]
            elif not isinstance(value, (tuple, list, dict)) and value is not None:
                kind, probe = "eq", value
            else:
                continue
            if kind is None or isinstance(probe, bool):
                continue
            if dtype == "double" and isinstance(probe, (int, float)):
                probe = float(probe)
            elif not (dtype == "string" and isinstance(probe, str)):
                continue  # probe type ≠ declared order: no sound bound
            col = self._stats_colname(key)
            if kind == "eq":
                bounds.append((col, probe, probe))
            elif kind == "lo":
                bounds.append((col, probe, None))
            else:
                bounds.append((col, None, probe))
        return bounds

    def _filtered_source(
        self, filters: Optional[dict], version: int | None = None
    ) -> DataFrame:
        """:meth:`items`, file-pruned from manifest stats when ``filters``
        keys a declared stats field — the read-side twin of the pruned
        mutation path: a selective query on a 100 TB table lists and scans
        only the admitted files.  Exact row filtering still happens on top
        (the bound is a FILE filter); falls back to the full scan whenever
        no bound is derivable.  ``version``: the same read AS OF that
        commit (time travel; an empty version serves the empty frame).
        Versions that predate a :meth:`declare_stats_fields` migration
        carry no stats for the declared columns — the manifest keeps every
        file, pruning is only ever an optimization."""
        if version is not None:
            from modal_vector_db_spark.sources import versioned as vcat

            bounds = self._derive_prune_bounds(filters) or None
            try:
                df = vcat.scan(
                    self.spark, self.name, self.warehouse,
                    version=version, between=bounds,
                )
            except FileNotFoundError:  # empty at this version
                return self.spark.createDataFrame([], ITEMS_SCHEMA)
            return df.select(*[f.name for f in ITEMS_SCHEMA.fields])
        bounds = self._derive_prune_bounds(filters) if self.versioned else []
        if not bounds or not self._cat.table_exists(self.name, self.warehouse):
            return self.items()
        from modal_vector_db_spark.sources import versioned as vcat

        df = vcat.scan(self.spark, self.name, self.warehouse, between=bounds)
        return df.select(*[f.name for f in ITEMS_SCHEMA.fields])

    def declare_stats_fields(self, stats_fields: dict | Sequence[str]) -> int:
        """Adopt (or change) the stats-field declaration on an EXISTING
        table: one copy-on-write rewrite materializes the ``_s_`` columns
        into every file and records their min/max in the manifest, then the
        sidecar and this handle switch to the new declaration.  Returns the
        row count rewritten.  (New tables declare at construction; this is
        the migration path — the one full-corpus pass that makes every
        later mutation file-pruned.)"""
        self._require_versioned()
        new = self._normalize_stats_fields(stats_fields)
        old_fields, old_kwargs = self._stats_fields, self._write_kwargs
        self._stats_fields = new
        self._write_kwargs = {"stats_cols": [self._stats_colname(f) for f in new]}
        try:
            if not self._cat.table_exists(self.name, self.warehouse):
                self._write_meta()
                return 0
            # read raw and re-project: clearing a declaration (new = {})
            # must still strip the OLD _s_ columns out of the rewrite
            df = self._with_stats_cols(
                self._cat.read_table(self.spark, self.name, self.warehouse).select(
                    *[f.name for f in ITEMS_SCHEMA.fields]
                )
            )
            from modal_vector_db_spark.sources import versioned as vcat

            pre_head = vcat.current_version(self.name, self.warehouse) or 0
            n = self._cat.replace_table(
                df, self.name, self.warehouse, **self._write_kwargs
            )
            # stats columns are a storage detail: ids + text unchanged,
            # so the text-index ledger must absorb this commit too
            self._text_ledger_mark_unchanged(pre_head + 1)
            self._write_meta()
            return n
        except BaseException:
            self._stats_fields, self._write_kwargs = old_fields, old_kwargs
            raise

    # -- S1: scan ----------------------------------------------------------
    def items(self) -> DataFrame:
        if not self._cat.table_exists(self.name, self.warehouse):
            return self.spark.createDataFrame([], ITEMS_SCHEMA)
        df = self._cat.read_table(self.spark, self.name, self.warehouse)
        if self._stats_fields:
            # public schema stays the reference's (id, metadata, embedding);
            # the materialized stats columns are a storage detail
            df = df.select(*[f.name for f in ITEMS_SCHEMA.fields])
        return df

    # -- S4 + S5: idempotent insert ---------------------------------------
    def _identity_dict(self, m: dict) -> dict:
        """The metadata (subset) that defines a row's content identity —
        the whole document, or the declared ``id_fields`` projection."""
        if self.id_fields is None:
            return m
        return {k: m.get(k) for k in self.id_fields}

    def insert(
        self,
        metadatas: Sequence[dict],
        embeddings: Optional[Sequence[np.ndarray]] = None,
        embed_field: Optional[str] = None,
    ) -> None:
        """Write a batch; duplicate *content* is silently skipped.

        Mirrors ``vdb.py:48-59`` + ``duckvdb.py:47-61``: deterministic
        uuid5 ids from canonical JSON; embeddings either supplied, or
        computed from ``metadata[embed_field]`` (``vdb.py:56``) else the
        whole stringified JSON (``vdb.py:54``).
        """
        ids = [json_to_uuid(self._identity_dict(m)) for m in metadatas]
        meta_strs = [stringify_metadata(m) for m in metadatas]
        if embeddings is not None:
            # Fixed dim is a table-level convention Spark's ArrayType cannot
            # enforce per row (SURVEY §1.1) — validate at the ingest boundary
            # like the reference's FLOAT[dim] column type would.
            for idx, e in enumerate(embeddings):
                if len(e) != self.embedding_dim:
                    raise ValueError(
                        f"embedding {idx} has dim {len(e)}, table dim is "
                        f"{self.embedding_dim}"
                    )
            rows = [
                (i, m, [float(x) for x in np.asarray(e, dtype=np.float32)])
                for i, m, e in zip(ids, meta_strs, embeddings)
            ]
            batch = self.spark.createDataFrame(rows, ITEMS_SCHEMA)
        else:
            texts = [
                str(m.get(embed_field)) if embed_field else s
                for m, s in zip(metadatas, meta_strs)
            ]
            src = self.spark.createDataFrame(
                list(zip(ids, meta_strs, texts)), "id string, metadata string, _text string"
            )
            udf = embed_udf(self.embedder_name, dim=self.embedding_dim, **self.embedder_kwargs)
            batch = src.withColumn("embedding", udf("_text")).drop("_text")
        self._idempotent_append(batch)

    def insert_df(
        self,
        df: DataFrame,
        embed_field: Optional[str] = None,
        id_fields: Optional[Sequence[str]] = None,
    ) -> None:
        """Distributed bulk ingest — the production twin of :meth:`insert`.

        ``insert`` takes driver-side ``list[dict]`` for reference API parity
        (``vdb.py:48-59``), which caps a batch at driver memory; this path
        takes a DataFrame with a ``metadata`` column of JSON text (and
        optionally an ``embedding array<float>`` column), so a 100 TB ingest
        is executor-parallel end to end — ids, embeddings, and the anti-join
        write all happen distributed, nothing materializes on the driver.

        Content ids are computed executor-side from the PARSED metadata
        (uuid5 of canonical sort-keys JSON — same rule as :meth:`insert`, so
        the same content arriving through either path, with any JSON key
        order, dedups to one row).  ``id_fields`` narrows the hashed
        subset: a crawl ingest keys on (url, title, text) so a re-crawl of
        identical content under a NEW capture date still dedups — volatile
        provenance fields stay in the stored metadata but outside the
        identity.  Without an ``embedding`` column, vectors
        are computed by the registry's Arrow-batched embedder UDF from
        ``metadata[embed_field]`` (or the re-serialized metadata JSON — the
        same whole-document convention as :meth:`insert`).  Rows whose
        ``embedding`` has the wrong dimension fail the task — ingest
        validation, like the reference's FLOAT[dim] column type."""
        if "metadata" not in df.columns:
            raise ValueError("insert_df needs a 'metadata' column of JSON text")
        if id_fields is None:
            id_fields = self.id_fields  # the table-level declaration
        elif self.id_fields is not None and tuple(id_fields) != self.id_fields:
            raise ValueError(
                f"insert_df id_fields={tuple(id_fields)} conflicts with the "
                f"table's declared identity {self.id_fields} — mixed "
                "identities in one table break idempotency"
            )
        elif self.id_fields is None:
            # A per-call subset key on an UNDECLARED table would let two
            # identity schemes coexist (plain insert keys on the whole
            # document; this call keys on the subset) and update() would
            # re-key with whole-document identity — silent duplicate rows
            # on the next re-ingest.  So the first subset-keyed ingest
            # PROMOTES the subset to the table-level declaration — but only
            # while the table is still empty; once whole-doc-keyed rows
            # exist the narrowing is refused.
            if self._cat.table_exists(self.name, self.warehouse) and self.items().head(1):
                raise ValueError(
                    f"insert_df id_fields={tuple(id_fields)} on table "
                    f"{self.name!r}, which has no id_fields declaration and "
                    "already contains whole-document-keyed rows — mixed "
                    "identities break idempotency.  Declare "
                    f"VectorDB(id_fields={tuple(id_fields)}) at table "
                    "creation (create_new_table=True) instead"
                )
            self.id_fields = tuple(id_fields)
            id_fields = self.id_fields
            # persist NOW (not just via the write path's _write_meta): the
            # append re-runs _check_meta, which must see the promoted
            # declaration, not a stale id_fields=null sidecar
            self._write_meta()
        has_emb = "embedding" in df.columns
        dim = self.embedding_dim
        out_schema = "id string, metadata string" + (
            ", embedding array<float>" if has_emb else ", _text string"
        )
        src = df.select(
            *(["metadata", "embedding"] if has_emb else ["metadata"])
        )

        def _prep(batches):
            # stdlib-only closure (see _apply_patch): executors need no
            # package import to re-key content.
            import json as _json
            import uuid as _uuid

            for pdf in batches:
                metas = [
                    _json.loads(s) if s is not None else {} for s in pdf["metadata"]
                ]
                out = pdf.copy()
                keyed = (
                    metas
                    if id_fields is None
                    else [{k: m.get(k) for k in id_fields} for m in metas]
                )
                out["id"] = [
                    str(_uuid.uuid5(_uuid.NAMESPACE_DNS, _json.dumps(m, sort_keys=True)))
                    for m in keyed
                ]
                if has_emb:
                    bad = [
                        i
                        for i, e in enumerate(out["embedding"])
                        if e is None or len(e) != dim
                    ]
                    if bad:
                        e0 = out["embedding"][bad[0]]
                        raise ValueError(
                            f"embedding at batch offset {bad[0]} has dim "
                            f"{'NULL' if e0 is None else len(e0)}, table dim is {dim}"
                        )
                else:
                    out["_text"] = [
                        str(m.get(embed_field))
                        if embed_field
                        else _json.dumps(m)
                        for m in metas
                    ]
                cols = ["id", "metadata"] + (["embedding"] if has_emb else ["_text"])
                yield out[cols]

        batch = src.mapInPandas(_prep, schema=out_schema)
        if not has_emb:
            udf = embed_udf(self.embedder_name, dim=dim, **self.embedder_kwargs)
            batch = batch.withColumn("embedding", udf("_text")).drop("_text")
        self._idempotent_append(batch)

    def _idempotent_append(self, batch: DataFrame) -> None:
        """The anti-join write protocol (S5).

        ``ON CONFLICT DO NOTHING`` ⇒ batch-internal dedup + left-anti join vs
        the existing id set.  Spark can only broadcast the RIGHT (build) side
        of a left-anti join — and the right side here is the EXISTING id set,
        which at 100 TB would be a fact-sized shuffle per insert batch if
        used whole.  So the conflict set is computed first with the sides
        flipped: ``existing LEFT SEMI (broadcast batch)`` scans only the
        (column-pruned) id column of the base table, broadcasts the small
        batch, and yields at most |batch| conflicting ids.  That tiny set is
        then the broadcast build side of the final anti-join.  Net: the base
        table is scanned once (id column only) and never shuffled, both
        joins broadcast the small side.  Single-writer semantics, same as
        the reference's one DB container; ``write_mode="merge"`` swaps this
        for a Delta Lake MERGE (:meth:`_merge_append`) for concurrent
        writers.
        """
        # Re-validate the sidecar at the WRITE boundary, not only at
        # construction: a handle built while the table did not yet exist
        # skipped the constructor check, and if another handle has since
        # created the table with a different embedder config, blindly
        # overwriting the sidecar below would append wrong-geometry vectors
        # — the exact failure the sidecar guard exists to prevent.
        self._check_meta()
        self._write_meta()
        if self.write_mode == "merge":
            self._merge_append(batch)
            return
        # Every stored row must carry stats columns consistent with its
        # metadata: footer min/max skip NULLs, so a row written WITHOUT them
        # would not widen its file's recorded range and a later pruned
        # mutation could skip a file that contains matches.
        batch = self._with_stats_cols(batch.dropDuplicates(["id"]))
        if self.versioned:
            # The manifest log enables the stronger protocol: a native CAS
            # MERGE that is content-idempotent under CONCURRENT writers.
            self._versioned_cas_append(batch)
            return
        if self._cat.table_exists(self.name, self.warehouse):
            conflicts = (
                self.items()
                .select("id")
                .join(F.broadcast(batch.select("id")), "id", "left_semi")
            )
            batch = batch.join(F.broadcast(conflicts), "id", "left_anti")
        # The batch feeds the base-table append AND (when an IVF layout
        # exists) the index append; persist avoids recomputing the anti-join
        # for the second write.  ORDER IS CORRECTNESS, not style: the batch's
        # plan anti-joins against the CURRENT base table, and a cache miss
        # (eviction, executor loss) re-executes that plan — if the base
        # append ran first, the re-read would see the batch's own ids already
        # present and the recomputed batch would be EMPTY (observed: index
        # silently missing every post-index insert).  Writing __ivf first
        # makes any recompute read the still-unmodified base and yield
        # identical rows.  A failure BETWEEN the two appends leaves __ivf
        # rows whose base rows are missing — and use_index=True queries serve
        # id/metadata straight from __ivf, so those phantoms ARE visible
        # until the caller replays the insert (the crashed write never
        # acknowledged, so replay is the contract): on replay the base
        # anti-join re-admits the rows while the __ivf-side anti-join below
        # skips the already-present index rows, reconverging both tables
        # with no duplicates.  :meth:`reconcile_index` is the explicit
        # repair for an abandoned (never-replayed) batch.
        has_index = (
            catalog.table_exists(self.name + "__ivf", self.warehouse)
            or catalog.table_exists(self.name + "__text", self.warehouse)
            or self._read_bloom_meta() is not None
        )
        if has_index:
            batch = batch.persist()
        try:
            # bloom words first — superset-safe under any later failure
            # (see the maintained-Bloom section comment)
            self._sync_bloom_for_append(batch)
            ivf_rows = self._sync_index_for_append(batch)
            # same before-base ordering and replay anti-join as __ivf; a
            # crash between leaves postings whose docs are absent — invisible
            # in results (the fused top-k inner-joins the base) and healed by
            # the insert replay contract
            self._sync_text_index_for_append(batch)
            # graph maintenance rides the SAME assigned frame (before-base
            # like __ivf: a crash leaves the epoch pin ahead of the base —
            # loudly stale — and the replay anti-join converges the retry)
            self._sync_graph_for_append(ivf_rows)
            self._cat.append(batch, self.name, self.warehouse, **self._write_kwargs)
        finally:
            if has_index:
                batch.unpersist()


    def _versioned_cas_append(self, batch: DataFrame) -> None:
        """Content-idempotent insert under CONCURRENT writers, natively on
        the manifest log — no delta-spark needed.  The classic race: two
        writers compute their dedup anti-join against the same snapshot,
        miss each other's rows, and double-insert identical content.  The
        CAS loop closes it:

        1. observe head version ``v`` — an IMMUTABLE file list;
        2. anti-join the batch against exactly that snapshot (the plan
           reads pinned paths, so even a cache-missed recompute is stable);
        3. commit pinned to ``v`` (``versioned.append(expected_head=v)``,
           the O_EXCL slot claim as compare-and-swap);
        4. on ``ConcurrentWriteError`` (another writer took ``v+1``),
           re-run from 1 against the new head — the re-run's anti-join now
           sees the racer's rows and drops the overlap.

        Two writers inserting overlapping content therefore land EXACTLY
        one copy of every distinct row: the multi-writer generalization of
        the reference's ``ON CONFLICT (id) DO NOTHING`` (duckvdb.py:57-61),
        with the same semantics Delta's MERGE gets from optimistic
        concurrency.  A lost race costs one restage (the orphaned staged
        files age out via vacuum)."""
        from modal_vector_db_spark.sources import versioned as vcat

        last_err: Exception | None = None
        for _ in range(16):
            head = vcat.current_version(self.name, self.warehouse) or 0
            pinned = batch
            m_head = (
                vcat._read_manifest(self.name, self.warehouse, head) if head else {}
            )
            if m_head.get("files"):
                # Re-inserting content whose id sits in the merge-on-read
                # mask would append a row the mask instantly hides (and
                # skew the logical count): fold the mask into a real
                # rewrite first, then retry against the new head.  One
                # broadcast semi probe, only when a mask exists at all.
                if m_head.get("tombstones"):
                    tomb = vcat._tombstone_ids(
                        self.spark, self.name, self.warehouse, m_head
                    )
                    col = m_head.get("tombstone_col", "id")
                    hit = (
                        tomb.select(F.col(col).alias("id"))
                        .join(F.broadcast(batch.select("id")), "id", "left_semi")
                        .limit(1)
                        .count()
                    )
                    if hit:
                        self._fold_tombstones()
                        continue
                existing = vcat.read_table(
                    self.spark, self.name, self.warehouse, version=head
                )
                conflicts = existing.select("id").join(
                    F.broadcast(batch.select("id")), "id", "left_semi"
                )
                pinned = batch.join(F.broadcast(conflicts), "id", "left_anti")
            pinned = pinned.persist()
            try:
                # bloom words BEFORE the CAS attempt — the opposite order
                # from __ivf/__text, because the bloom contract is superset
                # not exact: a lost race or a crash here leaves extra bits
                # (absorbed by the exact verify), while words appended
                # after a commit could be LOST by a crash — a false
                # negative the filter must never produce.  Retried
                # attempts re-append; idempotent under the bit_or fold.
                self._sync_bloom_for_append(pinned)
                vcat.append(
                    pinned,
                    self.name,
                    self.warehouse,
                    expected_head=head,
                    **self._write_kwargs,
                )
            except vcat.ConcurrentWriteError as e:
                last_err = e
                continue
            else:
                # Index sync AFTER the commit — the opposite order from the
                # plain path, and correct here because `pinned`'s plan reads
                # only version-`head`'s IMMUTABLE files: a cache miss
                # recomputes identical rows no matter what has since been
                # committed.  Consequences: a retry that lost its race never
                # touches the index (no duplicate/phantom rows from racing
                # attempts), a CAS loop that gives up leaves the index
                # unchanged, and a crash between the commit and this append
                # leaves the index MISSING the new rows (under-recall until
                # the next indexed query's consistency probe auto-repairs —
                # strictly less harmful than serving phantoms).  The __ivf
                # layout is itself a versioned table here, so concurrent
                # writers' index appends serialize through its own OCC
                # commit slots — the CAS contract now covers BOTH tables.
                ivf_rows = self._sync_index_for_append(pinned, base_version=head + 1)
                # text postings sync after the commit, like __ivf here: a
                # crash leaves the lexical channel missing the new docs
                # (marginal under-ranking) until the next insert or rebuild
                self._sync_text_index_for_append(pinned, base_version=head + 1)
                # graph maintenance after the commit too; the epoch pin is
                # totals-verified at a stable head, so racing writers
                # converge and a crash leaves a loudly-stale pin
                self._sync_graph_for_append(ivf_rows, base_version=head + 1)
                return
            finally:
                pinned.unpersist()
        raise vcat.ConcurrentWriteError(
            f"table {self.name!r}: insert lost 16 consecutive head races"
        ) from last_err


    def _merge_append(self, batch: DataFrame) -> None:
        """Multi-writer upsert: Delta Lake ``MERGE … WHEN NOT MATCHED THEN
        INSERT`` — the ACID generalization of ``ON CONFLICT DO NOTHING``
        (reference ``duckvdb.py:57-61``) for CONCURRENT writers.

        The anti-join default computes the conflict set against a snapshot,
        so two simultaneous batches can both miss each other's rows and
        double-insert; Delta's optimistic concurrency control serializes
        the two MERGE commits instead (the loser retries against the
        winner's snapshot), giving idempotency under concurrency.  Gated on
        the optional ``delta-spark`` package (absent in this environment —
        ``tests/test_engine.py`` pins both the clear failure here and, when
        the package IS importable, the concurrent-batch semantics)."""
        try:
            from delta.tables import DeltaTable  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "write_mode='merge' requires the delta-spark package "
                "(Delta Lake MERGE is the ACID multi-writer upsert); install "
                "delta-spark and enable the Delta SQL extension"
            ) from e
        batch = batch.dropDuplicates(["id"])
        # same before-commit ordering as the other insert paths — extra
        # bits under a lost MERGE race, never missing ones
        self._sync_bloom_for_append(batch)
        path = catalog.db_path(self.name, self.warehouse)
        if not DeltaTable.isDeltaTable(self.spark, path):
            batch.write.format("delta").mode("append").save(path)
            return
        (
            DeltaTable.forPath(self.spark, path)
            .alias("t")
            .merge(batch.alias("b"), "t.id = b.id")
            .whenNotMatchedInsertAll()
            .execute()
        )

    # -- flagship read path ------------------------------------------------
    def _query_vec(self, query: str | Sequence[float]) -> list[float]:
        """Embed text driver-side, or validate a PRECOMPUTED vector's
        dimension — the query-side twin of the ingest boundary's dim
        check (a wrong-length probe would NULL every scan distance via
        zip_with padding and 'return' k arbitrary rows)."""
        if isinstance(query, str):
            return [float(v) for v in self._embedder.embed(query)]
        qv = [float(v) for v in np.asarray(query, dtype=np.float64)]
        if len(qv) != self.embedding_dim:
            raise ValueError(
                f"query vector has dim {len(qv)}, table dim is "
                f"{self.embedding_dim}"
            )
        return qv

    def query(
        self,
        query: str | Sequence[float],
        k: int = 10,
        filters: Optional[dict] = None,
        as_dataframe: bool = False,
        use_index: bool = False,
        nprobe: int | None = None,
        compressed: bool = False,
        refine_factor: int = 4,
        version: int | None = None,
    ) -> list[Result] | DataFrame:
        """Filtered KNN (``vdb.py:61-64`` + ``duckvdb.py:103-120``).

        ``query`` may be text (embedded driver-side, U6) or a precomputed
        vector.  ``as_dataframe=True`` returns the lazy DataFrame — the
        idiomatic Spark surface; default collects to ``Result`` rows for
        reference parity.

        ``use_index=True`` probes the IVF layout written by
        :meth:`create_index` — mirroring the reference, where only a table
        loaded through ``load_from_parquet`` has the (approximate) HNSW index
        and the default path stays exact brute force (``duckvdb.py:37-45``).
        The scan then prunes to the ``nprobe`` nearest cluster partitions.

        ``version`` (versioned tables): time-travel query — exact KNN over
        the table AS OF that commit, still manifest-stats-pruned when the
        filter keys a declared stats field.  Composes with ``use_index``
        when the stamp history holds a VERIFIED (base → ``__ivf``) version
        pair for that commit (every insert sync records one,
        :meth:`_stamp_ivf_version`): the probe then reads the index
        manifest AS OF that pair's index version — same file-list pruning,
        zero extra cost.  Head centroids are valid for any historical probe
        because rebuilds reset the history with the index.  A version with
        no verified pair (pre-index commits, raced syncs, post-mutation
        rebuilds) fails loudly instead of serving the wrong snapshot.
        """
        if compressed and not use_index:
            raise ValueError("compressed=True requires use_index=True (build with create_index(pq_m=...))")
        ivf_version: int | None = None
        if version is not None:
            self._require_versioned()
            if use_index:
                ivf_version = self._ivf_version_for_base(version)
                if ivf_version is None:
                    raise ValueError(
                        f"no verified index snapshot for version {version} of "
                        f"table {self.name!r}: the stamp history maps only "
                        "commits whose index sync verified, and mutations/"
                        "rebuilds reset it — run the exact path (omit "
                        "use_index)"
                    )
        qv = self._query_vec(query)
        if use_index:
            ivf_table, ivf = self._load_ivf()
            nprobe = self._resolve_nprobe(nprobe)
            probes = ivf.nearest_centroids(qv, nprobe)
            src = self._read_ivf_probes(probes, version=ivf_version).filter(
                F.col("cluster_id").isin(probes)
            )
            if compressed:
                # IVF+PQ: ADC over the code column inside the probed
                # partitions picks k·refine_factor candidates, then the
                # exact cosine top-k below runs on just those rows.
                # FILTER PUSHDOWN (pre-ADC): the compiled predicate applies
                # to the probed-partition scan BEFORE candidate selection,
                # so candidates are drawn from the FILTERED set — a
                # selective filter can no longer empty the top-k by eating
                # the whole unfiltered candidate budget (the FAISS
                # "pre-filtered ANN" shape).  The candidate scan reads
                # (id, pq_code) plus only the filter's metadata column —
                # column pruning still does the compression win; the
                # remaining approximation is the IVF probe, as designed.
                from modal_vector_db_spark.operators.pq import PQIndex

                cb_path = catalog.db_path(self.name + "__pq_codebooks", self.warehouse)
                pq = PQIndex.load(cb_path, self.spark)
                qn = np.asarray(qv, dtype=np.float64)
                qn = qn / (np.linalg.norm(qn) or 1.0)
                adc_src = src
                if filters:
                    adc_src = adc_src.filter(compile_filters(filters))
                cand = (
                    pq.adc_scores(adc_src.select("id", "pq_code"), qn)
                    .orderBy(F.col("adc_distance").asc_nulls_last(), F.col("id").asc())
                    .limit(k * refine_factor)
                    .select("id")
                )
                src = src.join(F.broadcast(cand), "id", "left_semi")
        else:
            # file-pruned from manifest stats when the filter keys a
            # declared stats field (no-op otherwise)
            src = self._filtered_source(filters, version=version)
        out = knn(
            src,
            qv,
            k=k,
            filters=filters,
            distinct=True,  # template parity: SELECT DISTINCT (duckvdb.py:111)
            # Deterministic tie-break on id (the reference orders by distance
            # alone, so equal-distance boundaries are engine-nondeterministic;
            # we pin them so results are reproducible across runs/engines).
            tie_break="id",
        )
        if as_dataframe:
            return out
        return [
            Result(id=r["id"], metadata=json.loads(r["metadata"]), distance=r["distance"])
            for r in out.collect()
        ]


    def query_batch(
        self,
        queries: Sequence[str | Sequence[float]],
        k: int = 10,
        filters: Optional[dict] = None,
        use_index: bool = False,
        nprobe: int | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Top-k for MANY queries in ONE job — the re-ranking/evaluation
        shape where per-query round-trips dominate (N calls to
        :meth:`query` schedule N jobs; this schedules one).  Strings are
        embedded driver-side via the registry embedder, mixed freely with
        precomputed vectors.  Returns a DataFrame (q_id, id, metadata,
        distance) with q_id = the query's position in ``queries``; per-query
        top-k is planned as a Partial-mode WindowGroupLimit, so each corpus
        partition ships at most Q×k rows into the shuffle
        (``operators/ann.py:brute_force_topk_multi``).

        ``use_index=True``: batched ANN over the IVF layout — the scan
        prunes to the UNION of every query's ``nprobe`` nearest cluster
        partitions, and a broadcast (q_id, cluster_id) join restricts each
        query to ITS probed clusters (``operators/ann.py:ivf_topk_multi``)
        — one job, partition-pruned, instead of Q index queries.

        ``version``: time-travel batch — top-k AS OF that commit (same
        contract as :meth:`query`: versioned tables only; composes with
        ``use_index`` via the verified stamp history, failing loudly for
        commits with no verified index snapshot)."""
        if not queries:
            raise ValueError("query_batch needs at least one query")
        ivf_version: int | None = None
        if version is not None:
            self._require_versioned()
            if use_index:
                ivf_version = self._ivf_version_for_base(version)
                if ivf_version is None:
                    raise ValueError(
                        f"no verified index snapshot for version {version} of "
                        f"table {self.name!r}: the stamp history maps only "
                        "commits whose index sync verified, and mutations/"
                        "rebuilds reset it — run the exact path (omit "
                        "use_index)"
                    )
        qvecs = []
        for q in queries:
            qvecs.append(self._query_vec(q))
        if use_index:
            from modal_vector_db_spark.operators.ann import ivf_topk_multi

            ivf_table, ivf = self._load_ivf()
            nprobe = self._resolve_nprobe(nprobe)
            probe_rows = [
                (i, int(c), qv)
                for i, qv in enumerate(qvecs)
                for c in ivf.nearest_centroids(qv, nprobe)
            ]
            probes = self.spark.createDataFrame(
                probe_rows, "q_id int, cluster_id int, q_vec array<double>"
            )
            probed_clusters = sorted({c for _, c, _ in probe_rows})
            src = self._read_ivf_probes(probed_clusters, version=ivf_version).filter(
                F.col("cluster_id").isin(probed_clusters)
            )
            if filters:
                src = src.filter(compile_filters(filters))
            out = ivf_topk_multi(src, probes, k=k, id_col="id")
        else:
            from modal_vector_db_spark.operators.ann import brute_force_topk_multi

            qdf = self.spark.createDataFrame(
                list(enumerate(qvecs)), "q_id int, q_vec array<double>"
            )
            src = self._filtered_source(filters, version=version)
            if filters:
                src = src.filter(compile_filters(filters))
            out = brute_force_topk_multi(src, qdf, k=k, id_col="id")
        # The (Q×k)-row result is the build side of the metadata join —
        # hint it explicitly (consistent with the insert/conflict paths)
        # rather than relying on AQE to notice it is tiny.
        return F.broadcast(out).join(src.select("id", "metadata"), "id").select(
            "q_id", "id", "metadata", F.round("distance", 6).alias("distance")
        )

    def query_hybrid(
        self,
        query: str,
        k: int = 10,
        filters: Optional[dict] = None,
        *,
        text_field: str = "text",
        top_n: int = 50,
        k0: int = 60,
        as_dataframe: bool = False,
        version: int | None = None,
        use_text_index: bool = False,
        use_index: bool = False,
        use_graph_index: bool = False,
        nprobe: int | None = None,
        ef_search: int | None = None,
    ) -> list[Result] | DataFrame:
        """Hybrid retrieval (extension beyond the reference's vector-only
        template): BM25 over ``metadata[text_field]`` fused with the cosine
        channel by reciprocal-rank fusion
        (:mod:`modal_vector_db_spark.operators.hybrid`).

        The returned ``Result.distance`` carries the FUSED score — higher is
        better (unlike :meth:`query`, where lower distance is better).
        ``filters`` (same DSL as :meth:`query`) restrict BOTH channels before
        scoring, so the fused top-k is exact over the filtered corpus.
        ``version``: time-travel — both channels score the table AS OF that
        commit (versioned tables only).

        ``use_text_index=True``: the lexical channel reads the materialized
        inverted index (:meth:`create_text_index`) — only the query terms'
        bucket partitions are scanned, never the corpus text.  Scores are
        expression-identical to the scan path (integer-valued inputs, one
        shared contribution expression).  Mutually exclusive with
        ``filters`` (postings carry no metadata — the calibration stats
        would be over the wrong corpus) and with ``version`` (the index
        mirrors the head).

        ``use_index=True``: the VECTOR channel probes the IVF layout
        (``nprobe`` nearest cluster partitions) instead of scanning the
        corpus — with ``use_text_index=True`` too, the interactive-search
        shape where NO channel touches the corpus (the base is read only
        for the ≤k fused rows' metadata).  APPROXIMATE like every IVF
        query: rows outside the probed clusters can't rank; ``nprobe`` =
        ``num_clusters`` recovers the exact result.  Composes with
        ``version`` via the verified stamp history (same contract as
        :meth:`query`); ``use_text_index`` stays head-only.

        ``use_graph_index=True``: the vector channel beam-searches the
        HNSW graph (:meth:`query_graph` internals — O(ef·log n) distance
        evaluations per probed cluster instead of a full-partition scan;
        ``ef_search`` resolves explicit > calibrated > 64) — the
        interactive serving shape.  Approximate like the graph path;
        full probe + corpus-covering ``ef_search`` recovers the IVF
        channel's result exactly (test-pinned).  Filters compose via the
        filtered beam.  Mutually exclusive with ``use_index`` and
        head-only (the graph epoch mirrors the head)."""
        from modal_vector_db_spark.functions.distance import cosine_distance, vector_lit
        from modal_vector_db_spark.operators.hybrid import bm25_scores, rrf_fuse

        terms = [t for t in query.lower().split() if t]
        if not terms:
            raise ValueError("query_hybrid needs a non-empty text query")
        if use_graph_index and use_index:
            raise ValueError(
                "use_graph_index and use_index are mutually exclusive — "
                "pick ONE vector channel"
            )
        if use_graph_index and version is not None:
            raise ValueError(
                "use_graph_index=True is head-only: the graph epoch mirrors "
                "the head commit (run the scan/IVF path for time travel)"
            )
        if version is not None:
            self._require_versioned()
        src = self._filtered_source(filters, version=version)
        if filters:
            src = src.filter(compile_filters(filters))
        if use_text_index:
            if filters:
                raise ValueError(
                    "use_text_index=True cannot apply filters: postings carry "
                    "no metadata and the BM25 calibration stats cover the "
                    "WHOLE corpus — use the scan path for filtered hybrid"
                )
            if version is not None and not self.versioned:
                raise ValueError(
                    "use_text_index=True with version= requires a versioned "
                    "table (the snapshot ledger lives on the manifest log)"
                )
            from modal_vector_db_spark.operators.hybrid import (
                bm25_from_postings,
                term_buckets,
            )

            # version=N → the verified ledger pair for N (raises loudly if
            # none); open mutation window → the last verified head pair;
            # otherwise live head stats + head postings
            pv, n_cal, dl_cal, buckets = self._resolve_text_index_read(
                version, text_field
            )
            postings = self._read_text_buckets(
                term_buckets(terms, buckets), version=pv
            )
            lex = bm25_from_postings(
                postings,
                terms,
                n=n_cal,
                avgdl=dl_cal / max(n_cal, 1.0),
                id_col="id",
                buckets=buckets,
            )
        else:
            # THE _text_docs projection (never inlined: postings must
            # tokenize what the scan tokenizes)
            lex = bm25_scores(self._text_docs(src, text_field), terms, id_col="id")
        qv = [float(v) for v in self._embedder.embed(query)]
        if use_graph_index:
            # graph beam as the vector channel: top_n candidates per the
            # rrf contract; the ≤top_n result is tiny, the fuse broadcasts
            vec = self._graph_topk_df(
                [qv], top_n, ef_search, nprobe, filters
            ).select("id", "distance")
        elif use_index:
            ivf_version: int | None = None
            if version is not None:
                ivf_version = self._ivf_version_for_base(version)
                if ivf_version is None:
                    raise ValueError(
                        f"no verified index snapshot for version {version} of "
                        f"table {self.name!r} — run the scan path (omit "
                        "use_index)"
                    )
            ivf_table, ivf = self._load_ivf()
            nprobe = self._resolve_nprobe(nprobe)
            probes = ivf.nearest_centroids(qv, nprobe)
            vsrc = self._read_ivf_probes(probes, version=ivf_version).filter(
                F.col("cluster_id").isin(probes)
            )
            if filters:
                vsrc = vsrc.filter(compile_filters(filters))
            vec = vsrc.select(
                "id", cosine_distance(F.col("embedding"), vector_lit(qv)).alias("distance")
            )
        else:
            vec = src.select(
                "id", cosine_distance(F.col("embedding"), vector_lit(qv)).alias("distance")
            )
        fused = rrf_fuse(lex, vec, id_col="id", top_n=top_n, k=k, k0=k0)
        # fused is <= k rows: hint explicitly rather than relying on AQE
        # to notice it is tiny (the query_batch rule)
        out = F.broadcast(fused).join(src.select("id", "metadata"), "id").select(
            "id", "metadata", F.col("score").alias("distance")
        )
        if as_dataframe:
            return out
        rows = sorted(out.collect(), key=lambda r: (-r["distance"], r["id"]))
        return [
            Result(id=r["id"], metadata=json.loads(r["metadata"]), distance=r["distance"])
            for r in rows
        ]

    def query_hybrid_batch(
        self,
        queries: Sequence[str],
        k: int = 10,
        filters: Optional[dict] = None,
        *,  # filters is the last positional — an old positional top_n
        # must fail loudly, not silently bind as a filter dict
        top_n: int = 50,
        k0: int = 60,
        text_field: str = "text",
        use_text_index: bool = False,
        use_index: bool = False,
        use_graph_index: bool = False,
        nprobe: int | None = None,
        ef_search: int | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Hybrid retrieval for MANY text queries in ONE job — the
        evaluation/re-ranking shape where per-query round-trips dominate.
        Returns a DataFrame (q_id, id, metadata, distance) with q_id = the
        query's position and distance = the RRF score (DESC-better, the
        :meth:`query_hybrid` convention).

        Why batching is the scale win here: every corpus-side BM25
        quantity (tf, df, dl, n, avgdl) is query-independent, so the
        lexical channel costs ONE corpus tokenize+aggregate — or, with
        ``use_text_index=True``, ONE postings read pruned to the UNION of
        all queries' term buckets — no matter how many queries ride on it
        (``operators/hybrid.py:bm25_scores_multi``); the vector channel is
        the batched brute-force / IVF top-k (one job for Q queries,
        ``operators/ann.py``); fusion ranks within q_id-partitioned
        windows (WindowGroupLimit — each partition ships ≤ top_n rows per
        query).  Per-query rows are bit-identical to :meth:`query_hybrid`
        (test-pinned).

        ``filters`` / ``use_index`` / ``use_graph_index`` / ``version``
        compose exactly as on :meth:`query_hybrid`: the same DSL
        restricts BOTH channels before scoring for every query in the
        batch (verified stamp history; the graph channel is head-only
        and exclusive with ``use_index``; ``use_text_index`` is
        head-only and filter-free — postings carry no metadata)."""
        from modal_vector_db_spark.functions.distance import cosine_distance, vector_lit
        from modal_vector_db_spark.operators.hybrid import (
            bm25_from_postings_multi,
            bm25_scores_multi,
            rrf_fuse_multi,
        )

        if not queries:
            raise ValueError("query_hybrid_batch needs at least one query")
        per_q = [[t for t in q.lower().split() if t] for q in queries]
        empties = [i for i, ts in enumerate(per_q) if not ts]
        if empties:
            # the single-query twin raises for these; silently returning
            # vector-only rows for SOME q_ids would hide caller bugs
            raise ValueError(
                f"query_hybrid_batch needs non-empty text queries; "
                f"queries at positions {empties} have no terms"
            )
        pairs = sorted({(i, t) for i, ts in enumerate(per_q) for t in ts})
        if use_graph_index and use_index:
            raise ValueError(
                "use_graph_index and use_index are mutually exclusive — "
                "pick ONE vector channel"
            )
        if use_graph_index and version is not None:
            raise ValueError(
                "use_graph_index=True is head-only: the graph epoch mirrors "
                "the head commit (run the scan/IVF path for time travel)"
            )
        if version is not None:
            self._require_versioned()
        src = self._filtered_source(filters, version=version)
        if filters:
            src = src.filter(compile_filters(filters))
        if use_text_index:
            if filters:
                raise ValueError(
                    "use_text_index=True cannot apply filters: postings carry "
                    "no metadata and the BM25 calibration stats cover the "
                    "WHOLE corpus — use the scan path for filtered hybrid"
                )
            if version is not None and not self.versioned:
                raise ValueError(
                    "use_text_index=True with version= requires a versioned "
                    "table (the snapshot ledger lives on the manifest log)"
                )
            from modal_vector_db_spark.operators.hybrid import term_buckets

            pv, n_cal, dl_cal, buckets = self._resolve_text_index_read(
                version, text_field
            )
            all_terms = sorted({t for _, t in pairs})
            postings = self._read_text_buckets(
                term_buckets(all_terms, buckets), version=pv
            )
            lex = bm25_from_postings_multi(
                postings,
                pairs,
                n=n_cal,
                avgdl=dl_cal / max(n_cal, 1.0),
                id_col="id",
                buckets=buckets,
            )
        else:
            # same rule as query_hybrid: the ONE _text_docs projection
            lex = bm25_scores_multi(self._text_docs(src, text_field), pairs, id_col="id")
        qvecs = [[float(v) for v in self._embedder.embed(q)] for q in queries]
        if use_graph_index:
            vec = self._graph_topk_df(
                qvecs, top_n, ef_search, nprobe, filters
            ).select("q_id", "id", "distance")
        elif use_index:
            from modal_vector_db_spark.operators.ann import ivf_topk_multi

            ivf_version: int | None = None
            if version is not None:
                ivf_version = self._ivf_version_for_base(version)
                if ivf_version is None:
                    raise ValueError(
                        f"no verified index snapshot for version {version} of "
                        f"table {self.name!r} — run the scan path (omit "
                        "use_index)"
                    )
            ivf_table, ivf = self._load_ivf()
            nprobe = self._resolve_nprobe(nprobe)
            probe_rows = [
                (i, int(c), qv)
                for i, qv in enumerate(qvecs)
                for c in ivf.nearest_centroids(qv, nprobe)
            ]
            probes = self.spark.createDataFrame(
                probe_rows, "q_id int, cluster_id int, q_vec array<double>"
            )
            probed_clusters = sorted({c for _, c, _ in probe_rows})
            vsrc = self._read_ivf_probes(probed_clusters, version=ivf_version).filter(
                F.col("cluster_id").isin(probed_clusters)
            )
            if filters:
                vsrc = vsrc.filter(compile_filters(filters))
            vec = ivf_topk_multi(vsrc, probes, k=top_n, id_col="id")
        else:
            from modal_vector_db_spark.operators.ann import brute_force_topk_multi

            qdf = self.spark.createDataFrame(
                list(enumerate(qvecs)), "q_id int, q_vec array<double>"
            )
            vec = brute_force_topk_multi(src, qdf, k=top_n, id_col="id")
        fused = rrf_fuse_multi(lex, vec, id_col="id", top_n=top_n, k=k, k0=k0)
        return F.broadcast(fused).join(src.select("id", "metadata"), "id").select(
            "q_id", "id", "metadata", F.col("score").alias("distance")
        )

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """Maintenance: merge the one-file-per-insert-batch fragmentation the
        append committer accumulates (``sources/catalog.py:compact``).
        Returns the new file count.  Run from a maintenance window — the
        write path is single-writer by contract.  On a versioned table this
        is just another commit (``replace``): readers of older versions keep
        their small files until :meth:`vacuum`."""
        self._require_rewritable()
        if self.versioned:
            import math

            from modal_vector_db_spark.sources import versioned as vcat

            df = self.items()
            # Size the target from the CURRENT version's files only — data/
            # also holds older versions' and failed commits' files, and
            # counting those would overstate live bytes and over-split the
            # compacted output after deletes/overwrites.
            base = catalog.db_path(self.name, self.warehouse)
            total = sum(
                os.path.getsize(os.path.join(base, rel))
                for rel in vcat.resolve_files(self.name, self.warehouse)
            )
            n_files = max(1, math.ceil(total / target_file_bytes))
            pre_head = vcat.current_version(self.name, self.warehouse) or 0
            vcat.replace_table(
                self._with_stats_cols(df.repartition(n_files)),
                self.name,
                self.warehouse,
                **self._write_kwargs,
            )
            # ids + text unchanged by compaction: keep the text-index
            # snapshot ledger contiguous (replace_table is head-pinned,
            # so our commit is pre_head + 1); the graph epoch re-pins for
            # the same reason — content identical, only the layout moved
            self._text_ledger_mark_unchanged(pre_head + 1)
            self._graph_mark_unchanged(pre_head, pre_head + 1)
            return n_files
        return catalog.compact(self.spark, self.name, self.warehouse, target_file_bytes)

    #: merge-on-read delete threshold: a mask must stay broadcast-tiny (it
    #: anti-joins onto EVERY read until folded) — past this, the eager
    #: file-pruned rewrite is the cheaper total cost
    _TOMBSTONE_MAX_IDS = 10_000

    def _fold_tombstones(self) -> bool:
        """Fold the merge-on-read delete mask into a real rewrite: masked
        rows are physically removed, the new manifest carries no
        tombstones (``sources/versioned.py:rewrite_where`` with a
        match-nothing predicate — only the masked rows' files rewrite).
        Logical content is unchanged, so the text-index ledger and graph
        epoch absorb the commit like a compaction.  Called from
        maintenance windows (:meth:`compact` folds implicitly via its
        logical-view rewrite; :meth:`maintain_index` calls this) and by
        the insert CAS loop when a batch re-inserts a masked id.  Returns
        True when a fold commit landed."""
        if not self.versioned:
            return False
        from modal_vector_db_spark.sources import versioned as vcat

        head = vcat.current_version(self.name, self.warehouse) or 0
        if not head or not vcat._read_manifest(
            self.name, self.warehouse, head
        ).get("tombstones"):
            return False
        out: dict = {}
        vcat.rewrite_where(
            self.spark, self.name, F.lit(True), self.warehouse,
            out=out, **self._write_kwargs,
        )
        v = out.get("version")
        if v is not None:
            # ids + text logically unchanged: the ledgers absorb the
            # commit exactly like compact()'s layout-only rewrite
            self._text_ledger_mark_unchanged(int(v))
            self._graph_mark_unchanged(head, int(v))
            return True
        return False

    def optimize_zorder(self, fields: Sequence[str], num_files: int = 16) -> int:
        """Delta's ``OPTIMIZE ZORDER BY`` through the facade: rewrite the
        table clustered along a Morton curve over the given DECLARED stats
        fields (``stats_fields``), so their per-file min/max ranges become
        tight and every later stats-pruned ``delete``/``update``/``query``
        on them touches few files — the maintenance op that turns declared
        stats from "recorded" into "selective".  ``"id"`` may be clustered
        too (a top-level column).  Versioned tables only; just another
        commit — time travel to the pre-optimize layout still works, and
        the ``__ivf`` stamp re-verifies via row totals on the next indexed
        query.  Returns the new head version."""
        self._require_versioned()
        from modal_vector_db_spark.sources import versioned as vcat

        cols = []
        for f in fields:
            if f == "id":
                cols.append("id")
            elif f in self._stats_fields:
                cols.append(self._stats_colname(f))
            else:
                raise ValueError(
                    f"optimize_zorder field {f!r} is not a declared stats "
                    f"field (declared: {sorted(self._stats_fields)}); "
                    "declare it first (stats_fields= / declare_stats_fields) "
                    "— clustering a column whose range is never recorded "
                    "cannot make any read cheaper"
                )
        new_v = vcat.optimize_zorder(
            self.spark,
            self.name,
            cols,
            self.warehouse,
            num_files=num_files,
            # keep EVERY declared stats range recorded, not just the
            # clustered subset — other fields' pruning must survive
            stats_cols=self._write_kwargs.get("stats_cols", []),
        )
        # layout-only rewrite: ids + text unchanged, ledger stays
        # contiguous; graph epoch re-pins (the compact() rule)
        self._text_ledger_mark_unchanged(new_v)
        self._graph_mark_unchanged(new_v - 1, new_v)
        return new_v

    # -- versioned-table surface (manifest log, sources/versioned.py) ------
    def _require_versioned(self) -> None:
        if not self.versioned:
            raise ValueError("this operation needs VectorDB(versioned=True)")

    def history(self) -> list[dict]:
        """Commit log of the base table, oldest first (version/op/n_files)."""
        self._require_versioned()
        from modal_vector_db_spark.sources import versioned as vcat

        return vcat.history(self.name, self.warehouse)

    def read_version(self, version: int) -> DataFrame:
        """Time travel: the table exactly as of ``version``."""
        self._require_versioned()
        from modal_vector_db_spark.sources import versioned as vcat

        return vcat.read_table(self.spark, self.name, self.warehouse, version=version)

    def rollback(self, version: int) -> int:
        """Restore ``version`` as the new head (a NEW commit — history stays
        append-only, so the undo is itself auditable).  Derived index tables
        are projections of the abandoned head and are dropped; call
        :meth:`create_index` to rebuild against the restored data."""
        self._require_versioned()
        from modal_vector_db_spark.sources import versioned as vcat

        v = vcat.rollback(self.name, version, self.warehouse)
        self._drop_index_tables()
        # a restored older version can hold keys the filter never saw
        # (deleted before the filter was created) — the one path to a
        # false negative, so rebuild-loudly
        self._drop_bloom_filter()
        return v


    def clone(self, new_name: str, version: int | None = None) -> "VectorDB":
        """Fork this table (at ``version``, default head) into a new
        versioned ``VectorDB`` with the same embedder configuration —
        hardlinked data, independent commit log (``sources/versioned.py:
        clone_table``).  Derived indexes are not cloned (rebuild on the
        fork if needed)."""
        self._require_versioned()
        from modal_vector_db_spark.sources import versioned as vcat

        vcat.clone_table(self.name, new_name, self.warehouse, version)
        # Stamp the fork's sidecar BEFORE constructing its handle: a stale
        # sidecar from a past (out-of-band-dropped) table of the same name
        # must not reject the freshly-cloned fork's own configuration.
        import shutil as _shutil

        fork_meta = catalog.db_path(new_name, self.warehouse) + "__vdbmeta.json"
        try:
            _shutil.copyfile(self._meta_path(), fork_meta)
        except FileNotFoundError:
            # pre-sidecar source: clear any stale fork sidecar instead
            if os.path.exists(fork_meta):
                os.remove(fork_meta)
        fork = VectorDB(
            self.spark,
            new_name,
            embedder_name=self.embedder_name,
            embedding_dim=self.embedding_dim,
            embedder_kwargs=self.embedder_kwargs,
            warehouse=self.warehouse,
            versioned=True,
            stats_fields=self._stats_fields,
        )
        fork._write_meta()
        return fork

    def vacuum(self, keep_versions: int = 3, orphan_grace_s: float = 3600.0) -> int:
        """Delete data files referenced only by versions older than the last
        ``keep_versions`` (those versions stop being rollback targets).
        Unreferenced orphans (failed commits) younger than ``orphan_grace_s``
        are kept — they may be a live writer's staged files (Delta's VACUUM
        retention-age guard).  Returns files removed."""
        self._require_versioned()
        from modal_vector_db_spark.sources import versioned as vcat

        n = vcat.vacuum(self.name, self.warehouse, keep_versions, orphan_grace_s)
        # the versioned __ivf layout accumulates its own commit history —
        # vacuum it on the same retention policy
        if vcat.table_exists(self.name + "__ivf", self.warehouse):
            n += vcat.vacuum(
                self.name + "__ivf", self.warehouse, keep_versions, orphan_grace_s
            )
            # prune stamp-history pairs pointing at vacuumed versions on
            # EITHER log: indexed time travel to them then fails with the
            # canonical "no verified index snapshot" error up front instead
            # of a manifest-read error mid-plan.  The keep PREDICATE is
            # evaluated against the re-read meta INSIDE the lock — a pair
            # recorded by a concurrent writer between a pre-lock read and
            # the rewrite must survive (versions are monotone, so anything
            # NEWER than the post-vacuum listing is alive by construction).
            bkeep = set(vcat.versions(self.name, self.warehouse))
            ikeep = set(vcat.versions(self.name + "__ivf", self.warehouse))
            bmax, imax = max(bkeep, default=0), max(ikeep, default=0)

            def _ivf_alive(b: str, i) -> bool:
                return (int(b) in bkeep or int(b) > bmax) and (
                    int(i) in ikeep or int(i) > imax
                )

            with self._ivf_meta_lock():
                meta = self._read_ivf_meta()
                hist = meta.get("history", {})
                kept = {b: i for b, i in hist.items() if _ivf_alive(b, i)}
                if kept != hist:
                    self._write_ivf_meta({**meta, "history": kept})
        # the versioned graph tables accumulate one commit PER INSERT now
        # that maintenance is incremental — same retention policy; no
        # ledger to prune (the graph epoch pins the head only, so old
        # versions are never read targets)
        for suffix in ("__hnsw", "__hnsw_nodes"):
            if vcat.table_exists(self.name + suffix, self.warehouse):
                n += vcat.vacuum(
                    self.name + suffix, self.warehouse, keep_versions,
                    orphan_grace_s,
                )
        # the versioned __text postings log gets the same retention; ledger
        # entries whose postings (or base) version was vacuumed are pruned
        # so time travel to them fails with the canonical "no verified
        # text-index snapshot" error up front
        if vcat.table_exists(self.name + "__text", self.warehouse):
            n += vcat.vacuum(
                self.name + "__text", self.warehouse, keep_versions, orphan_grace_s
            )
            # same in-lock predicate rule as the __ivf prune above: a pair
            # a concurrent writer records between the version listing and
            # the locked rewrite references versions NEWER than the listing
            # (monotone), so the > max escape keeps it — filtering by
            # membership in a pre-lock keyset would silently drop it
            bkeep = set(vcat.versions(self.name, self.warehouse))
            tkeep = set(vcat.versions(self.name + "__text", self.warehouse))
            bmax, tmax = max(bkeep, default=0), max(tkeep, default=0)

            def _text_alive(b: str, e) -> bool:
                return (int(b) in bkeep or int(b) > bmax) and (
                    int(e[0]) in tkeep or int(e[0]) > tmax
                )

            with self._text_meta_lock():
                cur = self._read_text_meta()
                if cur is not None and cur.get("history"):
                    kept = {
                        b: e
                        for b, e in cur["history"].items()
                        if _text_alive(b, e)
                    }
                    if kept != cur["history"]:
                        cur["history"] = kept
                        self._write_text_meta(cur)
        return n

    def sql(self, query: str) -> DataFrame:
        """Spark SQL over this DB's table, registered as a temp view named
        after the DB (the reference drives everything through SQL strings
        against its ``items`` table; this is the equivalent escape hatch,
        minus the injection-prone string splicing — the view is read-only
        and filters still belong in :meth:`query`'s compiled DSL).

        Example::

            db.sql(f"SELECT count(*) FROM {db.name} "
                   "WHERE get_json_object(metadata, '$.lang') = 'en'")
        """
        self.items().createOrReplaceTempView(self.name)
        return self.spark.sql(query)

    def _require_rewritable(self) -> None:
        """Mutation/maintenance paths rewrite the table directory with
        plain parquet files; on a ``write_mode='merge'`` table that
        destroys the Delta log (the swap carries no ``_delta_log``), and
        the NEXT insert would silently blind-append — duplicating content
        the MERGE mode exists to dedup.  Fail loudly instead."""
        if self.write_mode == "merge":
            raise ValueError(
                "delete/update/compact/reembed rewrite the table directory "
                "with plain parquet, which would destroy the Delta log a "
                "write_mode='merge' table depends on (the next MERGE "
                "append degrades to a blind append and duplicates "
                "content) — run mutations through Delta itself or use the "
                "default write_mode"
            )

    def delete(self, filters: dict, tombstone: bool | None = None) -> int:
        """Remove every row matching ``filters`` (same DSL as :meth:`query`);
        returns the count removed.  The takedown/right-to-erasure operation
        a training-data store needs and the reference lacks.

        Two physical strategies (versioned tables):

        - MERGE-ON-READ (default for matches ≤ ``_TOMBSTONE_MAX_IDS``): the
          matched ids land in a tombstone mask on the manifest
          (``sources/versioned.py:tombstone``) — ZERO base-file rewrites,
          the Delta deletion-vector shape.  A takedown of 100 ids scattered
          across 100 large files costs one tiny id-file write; reads
          anti-join the broadcast mask; :meth:`compact`/
          :meth:`maintain_index` (or any replace-shaped commit) FOLD the
          mask into a real rewrite.  The derived stores (``__ivf``/text/
          graph/bloom) still shrink eagerly — they are partition-local
          rewrites and keeping them exact is what keeps every totals-based
          consistency pin working.
        - EAGER (plain tables, large deletes, or ``tombstone=False``): a
          FILE-PRUNED copy-on-write rewrite (``rewrite_where``): one
          column-pruned scan finds which files contain matches, only those
          are rewritten, untouched files carry forward by reference.

        ``tombstone=True`` forces merge-on-read regardless of size
        (versioned only — raises on a plain table); ``False`` forces eager;
        ``None`` picks by the threshold.

        Rows where the predicate is NULL (e.g. the filtered key is absent
        from a row's metadata) are KEPT — a delete must never remove rows it
        cannot positively match.  ``filters`` must be non-empty: clearing a
        table is ``create_new_table=True``, not an accidental match-all."""
        self._require_rewritable()
        if not filters:
            raise ValueError(
                "delete() requires non-empty filters; to clear the table, "
                "construct with create_new_table=True"
            )
        if tombstone and not self.versioned:
            raise ValueError(
                "tombstone=True (merge-on-read delete) needs "
                "VectorDB(versioned=True): the mask lives on the manifest "
                "log — plain tables delete eagerly"
            )
        if not self._cat.table_exists(self.name, self.warehouse):
            return 0
        keep = ~F.coalesce(compile_filters(filters), F.lit(False))
        ivf_name = self.name + "__ivf"
        has_index = self._cat.table_exists(ivf_name, self.warehouse)
        # ONE protected region from the first derived-store write to the
        # base commit (same rule as update()): a failure anywhere after a
        # derived store was touched drops the now-suspect derived tables —
        # a diverged __ivf or a shrunk-postings index missing live docs
        # must not survive the base keeping its rows.
        try:
            # Keep the IVF layout consistent BEFORE rewriting the base
            # (both rewrites read only their own directory; a stale index
            # would keep returning deleted rows to use_index=True
            # queries).  The predicate compiles over the metadata column,
            # present in both.
            if has_index:
                self._cat.rewrite_where(
                    self.spark, ivf_name, keep, self.warehouse,
                    **self._index_mut_kwargs,
                )
            # Graph shrink rides the same derived-stores-first window:
            # unpin the epoch, file-pruned-rewrite __hnsw_nodes, rebuild
            # only the clusters that lost rows; the epoch re-pins after
            # the base commit (takedown-sized deletes keep the graph
            # incrementally — the __text shrink contract).
            graph_stash = self._graph_delete_begin(keep)
            # Text postings shrink BEFORE the base rewrite (derived stores
            # first): takedown-sized deletes keep the index incrementally —
            # only a mass delete forces a rebuild
            # (:meth:`_shrink_text_postings`).  The snapshot-ledger window
            # opens first: a half-shrunk postings state must never be
            # recorded as (or served for) a verified version.
            pred = F.coalesce(compile_filters(filters), F.lit(False))
            self._begin_text_mutation()
            text_delta = self._shrink_text_postings(
                self._filtered_source(filters).filter(pred)
            )
            pre_head = 0
            if self.versioned:
                from modal_vector_db_spark.sources import versioned as vcat

                pre_head = vcat.current_version(self.name, self.warehouse) or 0
            removed = None
            committed_v: int | None = None
            if self.versioned and tombstone is not False:
                from modal_vector_db_spark.sources import versioned as vcat

                # merge-on-read: matched ids from the LOGICAL view (already
                # masked ids can never re-match, so the mask stays
                # duplicate-free — the count-arithmetic contract)
                ids = self._filtered_source(filters).filter(pred).select("id")
                v, n = vcat.tombstone(
                    ids,
                    self.name,
                    self.warehouse,
                    id_col="id",
                    max_ids=None if tombstone else self._TOMBSTONE_MAX_IDS,
                    expected_head=pre_head,
                )
                if v is not None or n == 0:
                    removed = n
                    committed_v = v
                # else: over threshold — fall through to the eager rewrite
            if removed is None:
                # Manifest data skipping (declared stats fields): the
                # touched-file discovery scan itself reads only files whose
                # recorded range can contain matches — at 100 TB a takedown
                # keyed to a stats field reads its slice, not the corpus.
                kw = dict(self._write_kwargs)
                bounds = self._derive_prune_bounds(filters) if self.versioned else []
                if bounds:
                    kw["prune_between"] = bounds
                if self.versioned:
                    # writer-side commit handle: an eager rewrite that only
                    # FOLDS a pending tombstone mask removes 0 rows by this
                    # predicate yet still commits — the ledger arithmetic
                    # below must see the real head, not pre_head (review
                    # finding: the miss poisoned the text snapshot ledger)
                    kw["out"] = (out := {})
                removed = self._cat.rewrite_where(
                    self.spark, self.name, keep, self.warehouse, **kw
                )
                if self.versioned:
                    committed_v = out.get("version")
        except Exception:
            self._recover_index_after_failed_base_commit()
            raise
        if has_index:
            self._stamp_ivf_version()
        self._graph_delete_finish(graph_stash)
        head_after = committed_v if committed_v is not None else pre_head
        if text_delta is None:
            if removed:
                # mass delete: stale postings would be invisible in results
                # (the fused top-k inner-joins the base) but would poison
                # the BM25 calibration — rebuild-loudly
                self._drop_text_index()
            else:
                self._end_text_mutation(head_after, 0, 0)
        else:
            # a no-match delete commits no new base version; a fold-only
            # commit (removed==0 but a version landed) still advances it
            self._end_text_mutation(head_after, *text_delta)
        return removed

    def update(
        self,
        filters: dict,
        patch: dict,
        embed_field: Optional[str] = None,
    ) -> int:
        """Patch the metadata of every row matching ``filters`` (same DSL as
        :meth:`query`); returns the number of rows matched.

        Content-addressed semantics: the id IS the content hash (uuid5 of
        the canonical metadata JSON, ``schema.py``), so an update necessarily
        re-keys the row — this is a delete+insert expressed as ONE atomic
        file-pruned copy-on-write rewrite (``sources/catalog.py:
        replace_where``).  If a
        patched row's new content equals another surviving row's content the
        two COLLAPSE into one (the same ``ON CONFLICT DO NOTHING`` rule the
        insert path applies — a content-addressed store never holds two rows
        with identical content).  A ``patch`` value of ``None`` removes the
        key.  Rows where the filter predicate is NULL are NOT matched (same
        positive-match rule as :meth:`delete`).

        ``embed_field``: when given, matched rows are re-embedded from the
        PATCHED ``metadata[embed_field]`` via the table's embedder (the
        insert-path convention, ``vdb.py:56``); when ``None`` the existing
        embedding is preserved — the metadata-only relabel case.

        The patch/re-id step runs as one Arrow-batched ``mapInPandas`` pass
        over ONLY the matched rows (heterogeneous JSON text must round-trip
        through real JSON objects — the same boundary where the embedders
        live); unmatched rows stream through untouched, JVM-side.  An IVF
        layout, if present, is rewritten in the same call: old entries for
        matched rows removed, patched rows re-assigned to their nearest
        centroid (and re-encoded when a PQ codebook exists).  A text index
        is maintained incrementally for relabel-sized updates (a relabel
        is a delete+insert to the index too: old postings shrink, patched
        rows re-add through the replay-safe insert sync); mass updates
        drop it for rebuild.
        """
        self._require_rewritable()
        if not filters:
            raise ValueError("update() requires non-empty filters")
        if not patch:
            raise ValueError("update() requires a non-empty patch")
        if not self._cat.table_exists(self.name, self.warehouse):
            return 0
        pred = F.coalesce(compile_filters(filters), F.lit(False))
        # The matched scan is file-pruned from manifest stats when the
        # filter keys a declared stats field; the conflict probe below must
        # NOT be — content collisions can live in any file, so it reads the
        # full (id-column-pruned) surviving set.
        matched = self._filtered_source(filters).filter(pred)
        keep = self.items().filter(~pred)
        # Count first: a no-match filter returns before any patch plan,
        # index rewrite, or persist is even constructed (this is also the
        # ONE count scan the mutation path schedules — everything after
        # reports from parquet footers).
        n_matched = matched.count()
        if n_matched == 0:
            return 0
        # Replace-shaped mutation: rows re-key and may re-embed, which the
        # graph epoch's count/version pins cannot see on PLAIN tables (a
        # count-preserving update would pass the rows check while the graph
        # serves stale vectors) — invalidate loudly; rebuild is explicit.
        self._invalidate_graph_index()
        patch_items = dict(patch)  # plain dict → picklable task closure
        idf = list(self.id_fields) if self.id_fields else None  # closure-safe
        want_text = embed_field is not None
        out_schema = "id string, metadata string, embedding array<float>" + (
            ", _text string" if want_text else ""
        )

        def _apply_patch(batches):
            # Self-contained on purpose: executors in a consumer deployment
            # may not have this package on their sys.path (UDF closures ship
            # by value, but captured module-level functions ship by
            # REFERENCE to their module) — so the id/stringify logic of
            # schema.json_to_uuid/stringify_metadata is inlined via stdlib
            # only.  Kept in lockstep by test_update_metadata_only's
            # `aid == json_to_uuid(am)` assertion.
            import json as _json
            import uuid as _uuid

            for pdf in batches:
                metas = []
                for s in pdf["metadata"]:
                    m = _json.loads(s) if s is not None else {}
                    for k, v in patch_items.items():
                        if v is None:
                            m.pop(k, None)
                        else:
                            m[k] = v
                    metas.append(m)
                out = pdf[["id", "metadata", "embedding"]].copy()
                out["metadata"] = [_json.dumps(m) for m in metas]
                # re-key with the TABLE's identity (the declared id_fields
                # subset when set) — re-keying on the whole document would
                # orphan the subset identity crawl ingest keys on, so a
                # later re-ingest of identical content would duplicate
                out["id"] = [
                    str(_uuid.uuid5(_uuid.NAMESPACE_DNS, _json.dumps(
                        {k: m.get(k) for k in idf} if idf else m, sort_keys=True
                    )))
                    for m in metas
                ]
                if want_text:
                    out["_text"] = [str(m.get(embed_field)) for m in metas]
                yield out

        updated = matched.mapInPandas(_apply_patch, schema=out_schema)
        if want_text:
            udf = embed_udf(self.embedder_name, dim=self.embedding_dim, **self.embedder_kwargs)
            updated = updated.withColumn("embedding", udf("_text")).drop("_text")
        # Same conflict protocol as _idempotent_append: batch-internal dedup,
        # then drop new ids already present in the surviving set (the
        # conflict set is computed small-side so the big table never
        # shuffles).
        updated = updated.dropDuplicates(["id"])
        conflicts = keep.select("id").join(
            F.broadcast(updated.select("id")), "id", "left_semi"
        )
        updated = updated.join(F.broadcast(conflicts), "id", "left_anti")
        # The patched batch feeds the conflict probe, the index rewrite, and
        # the base rewrite — persist so the matched-scan + Arrow patch pass
        # runs once, not once per consumer.  (Correctness never depends on
        # the cache: every plan reads only not-yet-swapped directories.)
        updated = updated.persist()
        text_pinned = None
        try:
            # ONE protected region from the first derived-store write to
            # the base commit: if ANY step fails after a derived store was
            # touched (__ivf replace, text shrink, the checkpoint, the
            # base rewrite), the recovery helper drops the now-suspect
            # derived tables — text index included — instead of leaving a
            # silently inconsistent one behind (review finding: the text
            # shrink used to sit outside the except that covered only the
            # base rewrite).
            try:
                # Rewrite the IVF layout FIRST: its plan reads __ivf + the
                # (still unswapped) base table; the base rewrite below
                # reads only the base.
                ivf_name, ivf = self._load_ivf(require=False)
                if ivf is not None:
                    assigned = self._encode_pq_if_present(ivf.assign(updated))
                    # Open the mutation window BEFORE the replace: an
                    # update is count-preserving, so in the window between
                    # this __ivf rewrite and the base commit a concurrent
                    # reader's stamp probe would see EQUAL totals over
                    # DIVERGED content and record history[old_base] =
                    # patched_ivf — time-traveled indexed reads of the old
                    # snapshot would then silently serve patched vectors.
                    # The flag makes that probe fail closed (no stamp).
                    self._begin_ivf_mutation()
                    # File-pruned like the base rewrite: only cluster-
                    # partition files containing matched rows restage;
                    # `assigned` carries cluster_id (+ pq_code), so
                    # replacements land in their partition dirs.
                    self._cat.replace_where(
                        self.spark, ivf_name, pred, assigned, self.warehouse,
                        **self._index_mut_kwargs,
                    )
                # Text postings: an update is a delete+insert to the index
                # too — shrink the matched rows' postings BEFORE the base
                # rewrite (same ordering as delete; mass updates fall back
                # to drop-and-rebuild), re-add the patched rows through
                # the replay-safe insert sync after the commit.  The sync
                # runs AFTER the swap, so the batch it reads must be
                # pinned NOW: a cache-evicted recompute of `updated` would
                # re-scan the already-mutated base (the plain backend
                # swaps directories; same rule as the insert path's
                # pinned sync batch).
                has_text = self._cat.table_exists(
                    self.name + "__text", self.warehouse
                )
                if has_text:
                    self._begin_text_mutation()
                text_delta = (
                    self._shrink_text_postings(matched) if has_text else None
                )
                if has_text and text_delta is not None:
                    text_pinned = updated.localCheckpoint(eager=True)
                pre_head = 0
                if self.versioned:
                    from modal_vector_db_spark.sources import versioned as vcat

                    pre_head = vcat.current_version(self.name, self.warehouse) or 0
                # File-pruned copy-on-write (both backends): only files
                # that CONTAIN matched rows are rewritten — the
                # replacement set is touched.filter(~pred) ∪ updated,
                # untouched files carry forward by reference (versioned:
                # re-listed in the manifest; plain: hardlinked) — a
                # one-row relabel never rewrites the corpus.  The conflict
                # set above was computed over the FULL surviving set, so
                # cross-file content collisions still drop.
                # Bloom: an update RE-KEYS content ids and may change the
                # filter's field value — append the patched rows' keys
                # BEFORE the commit (superset-safe under commit failure;
                # the removed old keys stay as stale-superset bits)
                self._sync_bloom_for_append(updated)
                kw = dict(self._write_kwargs)
                bounds = (
                    self._derive_prune_bounds(filters) if self.versioned else []
                )
                if bounds:
                    # sound for the REMOVAL side (matched rows lie inside
                    # the bound by implication); the patched replacement
                    # rows land in newly-staged files regardless
                    kw["prune_between"] = bounds
                self._cat.replace_where(
                    self.spark, self.name, pred,
                    self._with_stats_cols(updated), self.warehouse,
                    **kw,
                )
            except Exception:
                # drops __ivf artifacts AND the text index in both its
                # branches — rebuild-loudly, never a diverged index
                self._recover_index_after_failed_base_commit()
                raise
            if ivf is not None:
                # clears mutation_pending under the lock, THEN stamps the
                # now-consistent (base, __ivf) head pair
                self._end_ivf_mutation()
            if has_text:
                if text_delta is None:
                    self._drop_text_index()  # mass update: rebuild-loudly
                else:
                    # old postings are gone; the anti-join inside the sync
                    # skips rows that COLLAPSED into surviving content, so
                    # postings and stats land exactly once.  The replace
                    # was OCC-pinned, so OUR commit is pre_head+1; the
                    # re-add syncs it, then the window close folds the
                    # decrement and records the verified pair (or poisons
                    # tracking if a writer raced past — never guesses).
                    self._sync_text_index_for_append(
                        text_pinned, base_version=pre_head + 1
                    )
                    self._end_text_mutation(pre_head + 1, *text_delta)
            return n_matched
        finally:
            if text_pinned is not None:
                text_pinned.unpersist()
            updated.unpersist()


    def reembed(
        self,
        embedder_name: str | None = None,
        embedding_dim: int | None = None,
        embedder_kwargs: Optional[dict] = None,
        embed_field: Optional[str] = None,
    ) -> int:
        """The embedding-model migration: recompute EVERY row's vector with
        a (possibly different) registry embedder, in one executor-parallel
        Arrow-batched pass, committed as ONE atomic replace.  The operation
        a store hits the day the embedding model upgrades — the reference
        would require dump + re-insert through the driver.

        Text per row follows the insert-path convention (``vdb.py:54-56``):
        ``metadata[embed_field]`` when given, else the stored canonical
        metadata JSON.  Ids and metadata are UNCHANGED (content ids hash
        metadata only — a model upgrade must not re-key the corpus).
        Derived IVF/PQ layouts are dropped: their centroids/codebooks live
        in the OLD geometry (call :meth:`create_index` after).  The
        instance's embedder/dim switch to the new configuration so
        subsequent queries embed in the new space.  Returns rows
        re-embedded."""
        self._require_rewritable()
        new_name = embedder_name or self.embedder_name
        new_dim = embedding_dim or self.embedding_dim
        new_kwargs = embedder_kwargs if embedder_kwargs is not None else self.embedder_kwargs
        # validate the configuration driver-side before any work
        new_embedder = get_embedder(new_name, dim=new_dim, **new_kwargs)
        if not self._cat.table_exists(self.name, self.warehouse):
            self.embedder_name, self.embedding_dim = new_name, new_dim
            self.embedder_kwargs, self._embedder = new_kwargs, new_embedder
            self._write_meta()
            return 0
        df = self.items()
        if embed_field:
            # EXACT insert-path parity (vdb.py:56's ``str(m.get(field))``):
            # booleans render 'True', dict/list values their Python repr,
            # a missing key the string 'None', and dotted KEYS stay literal
            # keys — a JSONPath probe diverges on every one of those, so
            # the text comes from the parsed metadata in an Arrow pass
            # (stdlib-only closure, same rule the update() patch pass uses).
            field = str(embed_field)

            def _texts(batches):
                import json as _json

                for pdf in batches:
                    out = pdf[["id", "metadata"]].copy()
                    out["_text"] = [
                        str((_json.loads(s) if s is not None else {}).get(field))
                        for s in pdf["metadata"]
                    ]
                    yield out

            src = df.mapInPandas(_texts, "id string, metadata string, _text string")
            text = F.col("_text")
        else:
            src = df  # whole-document convention: the stored canonical JSON
            text = F.col("metadata")
        udf = embed_udf(new_name, dim=new_dim, **new_kwargs)
        out = src.select("id", "metadata", udf(text).alias("embedding"))
        # Crash-window ordering: invalidate the guards BEFORE the commit.
        # A death anywhere between here and the final _write_meta leaves NO
        # sidecar (handles construct unchecked — pre-sidecar behavior) and
        # NO index — never a sidecar or index that LIES about the data,
        # which is the failure the sidecar exists to prevent.
        self._drop_meta()
        # old-geometry centroids/codebooks are garbage; the TEXT index is
        # not — ids and metadata text are unchanged by a model migration,
        # so postings and calibration stats stay exactly valid
        self._drop_index_tables(keep_text=True)
        pre_head = 0
        if self.versioned:
            from modal_vector_db_spark.sources import versioned as vcat

            pre_head = vcat.current_version(self.name, self.warehouse) or 0
        n = self._cat.replace_table(
            self._with_stats_cols(out), self.name, self.warehouse, **self._write_kwargs
        )
        # ids + text unchanged ⇒ the HEAD postings are exactly valid for
        # the re-embedded commit too (replace_table is head-pinned, so OUR
        # commit is pre_head+1; the mark's head check fails closed on races)
        self._text_ledger_mark_unchanged(pre_head + 1)
        self.embedder_name, self.embedding_dim = new_name, new_dim
        self.embedder_kwargs, self._embedder = new_kwargs, new_embedder
        self._write_meta()  # future handles validate against the NEW config
        return n

    def explain(
        self,
        query: str | Sequence[float],
        k: int = 10,
        filters: Optional[dict] = None,
        **kwargs: Any,
    ) -> str:
        """The executed physical plan for :meth:`query`'s DataFrame (same
        arguments) as a string — the tuning surface the reference never had
        (its DuckDB EXPLAIN was unreachable through the API).  Read it for:
        scan `ReadSchema` (column pruning), `PushedFilters`, and
        `TakeOrderedAndProject` (bounded-heap top-k, never a global sort);
        with ``use_index=True``, `PartitionFilters` on the probed
        ``cluster_id`` partitions."""
        from modal_vector_db_spark.plans.inspect import executed_plan

        df = self.query(query, k=k, filters=filters, as_dataframe=True, **kwargs)
        return executed_plan(df)


    # -- A1 ----------------------------------------------------------------
    def num_rows(self) -> int:
        """``SELECT COUNT(*)`` (``duckvdb.py:122-123``).  On a versioned
        table this is answered from the commit log's per-file row counts —
        O(manifest), no scan, no job — falling back to a real count when
        any file lacks recorded stats (e.g. rows written by a caller that
        bypassed the facade)."""
        if self.versioned:
            from modal_vector_db_spark.sources import versioned as vcat

            n = vcat.manifest_row_count(self.name, self.warehouse)
            if n is not None:
                return n
        return self.items().count()

    def profile(self) -> DataFrame:
        """Table statistics in ONE scan (extension beyond the reference's
        ``num_rows``): per-column row/null counts, approximate NDV, and
        min/max — the inputs to layout decisions (bucket counts, pruning
        ranges) and to monitoring ingest health (id NDV ≈ rows iff the
        idempotent-insert contract is holding)."""
        from modal_vector_db_spark.operators.sketches import column_profile

        return column_profile(self.items(), ["id", "metadata"])

    def est_dup_rate(self, rsd: float = 0.01) -> float:
        """HLL estimate of the metadata duplicate rate in one scan — the
        sizing probe to run BEFORE a full dedup pass (~0 means the dedup
        shuffle can be skipped).  By construction of the uuid5 content ids,
        committed rows are already content-unique, so this measures drift
        only if rows were bulk-loaded around the idempotent-insert path."""
        from modal_vector_db_spark.operators.sketches import dup_rate_estimate

        if not self._cat.table_exists(self.name, self.warehouse):
            return 0.0
        row = dup_rate_estimate(self.items(), ["metadata"], rsd).head()
        return float(row["est_dup_rate"])

    # -- S2 + X1 -----------------------------------------------------------
    def load_from_parquet(
        self,
        parquet_path: str,
        build_index: bool = True,
        build_graph_index: bool = False,
    ) -> None:
        """Bulk load (``duckvdb.py:43-45``).  Unlike the reference's plain
        ``CREATE TABLE`` (which crashes if the table exists — SURVEY §8 bug
        #6), this is an explicit overwrite.

        ``build_graph_index=True`` additionally builds the per-partition
        HNSW serving graph over the fresh IVF layout — the closest analog
        of the reference's bulk-load flow, where ``load_from_parquet`` IS
        what creates the HNSW index (``duckvdb.py:37-45``).  Opt-in: the
        graph build is the expensive O(n·ef·log n) pass and batch
        analytics on the IVF layout alone doesn't need it."""
        if build_graph_index and not build_index:
            # argument validation BEFORE any destructive step — raising
            # after the overwrite would have already destroyed the
            # existing corpus and every derived index (review finding)
            raise ValueError(
                "build_graph_index=True requires build_index=True (the "
                "IVF cluster layout is the graph's sharding)"
            )
        df = self.spark.read.parquet(parquet_path)
        # ingest validation at the bulk boundary too (insert/insert_df
        # reject wrong-dim vectors; a silent wrong-dim bulk load would
        # NULL every scan distance via zip_with padding)
        bad = df.filter(F.size("embedding") != self.embedding_dim).count()
        if bad:
            raise ValueError(
                f"load_from_parquet: {bad} rows have embedding dim != "
                f"{self.embedding_dim} (table dim)"
            )
        self._check_meta()  # same write-boundary guard as _idempotent_append
        self._write_meta()
        self._drop_text_index()  # overwrite replaces the corpus wholesale
        self._drop_bloom_filter()  # new corpus = keys the filter never saw
        # stale __ivf/PQ would SERVE the old corpus's rows under
        # use_index=True when build_index=False and row counts happen to
        # match (reconcile short-circuits on totals) — drop them too
        self._drop_index_tables(keep_text=True)
        self._cat.overwrite(
            self._with_stats_cols(df.select(*[f.name for f in ITEMS_SCHEMA.fields])),
            self.name,
            self.warehouse,
            **self._write_kwargs,
        )
        if build_index:
            self.create_index()
        if build_graph_index:
            self.create_graph_index()

    def load_from_warc(
        self,
        warc_path: str,
        *,
        glob: str = "*.warc*",
        text_tier: str = "parser",
        embed_field: str = "text",
        on_error: str = "skip",
    ) -> None:
        """Crawl ingest — the :meth:`load_from_parquet` analog for corpora
        that arrive as WARC crawls rather than parquet (the usual case for
        web-scale training data).  Executor-parallel end to end: WARC
        record walk (``sources/warc.py``; file-per-task, type filter
        pushed into the walker), HTML text extraction (``text_tier`` picks
        the stdlib-``HTMLParser`` walk ``'parser'`` — default, handles
        markup outside the regex subset — or the pure-Catalyst chain
        ``'catalyst'``), URL normalization as the ``url`` metadata key,
        then the distributed embed+insert path of :meth:`insert_df`.

        APPENDS with content-id idempotency (re-ingesting the same crawl
        segment, or two segments sharing a page, dedups through the same
        anti-join as every insert) — unlike ``load_from_parquet``'s
        explicit overwrite, because crawls arrive segment by segment.
        Pages with no extractable text are dropped; non-HTML responses
        are filtered on the HTTP Content-Type."""
        from modal_vector_db_spark.operators.html_extract import crawl_pages_to_metadata
        from modal_vector_db_spark.sources.warc import read_warc

        recs = read_warc(
            self.spark, warc_path, glob=glob, types=("response",), on_error=on_error
        )
        # identity = the content (url/title/text), NOT the capture date —
        # a re-crawl of an unchanged page must dedup (see insert_df).  A
        # table-level id_fields declaration wins (and makes update()
        # re-keys coherent with crawl identity — declare
        # VectorDB(id_fields=("url","title","text")) for crawl tables
        # that will be patched)
        self.insert_df(
            crawl_pages_to_metadata(recs, text_tier),
            embed_field=embed_field,
            id_fields=self.id_fields or ("url", "title", "text"),
        )


