"""Filter-compiler branch queries (P3–P10, SURVEY §2.2.1).

Each query builds a JSON ``metadata`` column on the fly from the
``documents`` fixture (``to_json(struct(...))`` — same store-as-text model
as the reference, ``vdb.py:51``), applies the dict-DSL compiler, and
returns matching ``doc_id``s.  The DuckDB oracle filters the underlying
columns directly, so a pass proves the whole JSON round-trip + compiler
branch, not just SQL echoing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.harness import load, register
from modal_vector_db_spark.operators.filters import compile_filters, compile_where


def _with_metadata(docs: DataFrame) -> DataFrame:
    """documents + a nested JSON metadata column:
    {lang, source, n_chars, words:[...], base:{n_chars}, is_long:bool,
    pair:[lang, source]}"""
    meta = F.to_json(
        F.struct(
            F.col("lang"),
            F.col("source"),
            F.col("n_chars"),
            F.split(F.col("text"), " ").alias("words"),
            F.struct(F.col("n_chars")).alias("base"),
            (F.col("n_chars") > 250).alias("is_long"),
            F.array(F.col("lang"), F.col("source")).alias("pair"),
        )
    )
    return docs.withColumn("metadata", meta)


def _q(filters: dict):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = _with_metadata(load(spark, sf_dir, "documents"))
        return docs.filter(compile_filters(filters)).select("doc_id")

    return fn


# P6: bare string equality (intended semantics; reference bug #2 fixed)
register(
    "filter_eq_str",
    oracle="SELECT doc_id FROM documents WHERE lang = 'en'",
)(_q({"lang": "en"}))

# P6: bare numeric equality (duckvdb.py:99)
register(
    "filter_eq_num",
    oracle="SELECT doc_id FROM documents WHERE n_chars = 128",
)(_q({"n_chars": 128}))

# P6: bare bool equality
register(
    "filter_eq_bool",
    oracle="SELECT doc_id FROM documents WHERE (n_chars > 250) = true",
)(_q({"is_long": True}))

# P4+P5: dotted JSON path + theta op (the demo's base.Attack > 50 shape,
# vdb.py:102)
register(
    "filter_nested_theta",
    oracle="SELECT doc_id FROM documents WHERE n_chars > 300",
)(_q({"base.n_chars": (">", 300)}))

# P5: remaining whitelisted theta ops in one conjunction
register(
    "filter_theta_ops",
    oracle="""
    SELECT doc_id FROM documents
    WHERE n_chars >= 100 AND n_chars < 400 AND lang != 'zh'
    """,
)(_q({"n_chars": (">=", 100), "base.n_chars": ("<", 400), "lang": ("!=", "zh")}))

# P5: <= and string theta compare
register(
    "filter_theta_lte",
    oracle="SELECT doc_id FROM documents WHERE n_chars <= 150 AND lang <= 'es'",
)(_q({"n_chars": ("<=", 150), "lang": ("<=", "es")}))

# P5: LIKE passthrough (whitelisted, not spliced)
register(
    "filter_like",
    oracle="SELECT doc_id FROM documents WHERE source LIKE 'src1%'",
)(_q({"source": ("like", "src1%")}))

# P8: array membership — list_contains analog (duckvdb.py:80-89)
register(
    "filter_contains",
    oracle="SELECT doc_id FROM documents WHERE list_contains(string_split(text, ' '), 'spark')",
)(_q({"words": ("contains", "spark")}))

# P7: semantic list equality (reference bug #3 fixed)
register(
    "filter_eq_list",
    oracle="SELECT doc_id FROM documents WHERE lang = 'en' AND source = 'src0'",
)(_q({"pair": ["en", "src0"]}))

# P9: conjunction of heterogeneous branches (duckvdb.py:101)
register(
    "filter_conjunction",
    oracle="""
    SELECT doc_id FROM documents
    WHERE lang = 'en' AND n_chars > 200 AND list_contains(string_split(text, ' '), 'join')
    """,
)(_q({"lang": "en", "base.n_chars": (">", 200), "words": ("contains", "join")}))

# P9: empty filters → 1=1 (duckvdb.py:106)
register(
    "filter_empty_match_all",
    oracle="SELECT doc_id FROM documents",
)(_q({}))


# P10: DSL #2 — field__op over top-level columns (utils.py:11-60)
@register(
    "filter_dsl2",
    oracle="""
    SELECT doc_id FROM documents
    WHERE n_chars BETWEEN 100 AND 300 AND lang IN ('en', 'fr') AND source = 'src3'
    """,
)
def filter_dsl2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cond = compile_where(
        {"n_chars__between": (100, 300), "lang__in": ["en", "fr"], "source": "src3"}
    )
    return docs.filter(cond).select("doc_id")
