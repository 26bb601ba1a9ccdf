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


def _branch_union(spark: SparkSession, sf_dir: str, branches: list[tuple[str, dict]]) -> DataFrame:
    """Run each dict-DSL filter branch over the same metadata'd documents
    and emit the tagged (branch, doc_id) matches — one registered query per
    compiler FAMILY, one tagged arm per compiler BRANCH, so the driver's
    hash gate still verifies every branch independently (a wrong branch
    changes that tag's id set and flips the hash).

    Shape (round-12 optimization, guide §2.4): ONE scan evaluating every
    branch predicate per row (a when(pred, tag) array filtered to its
    non-null tags, exploded), instead of the previous one-scan-per-branch
    union — the before-plan showed 40 Scan+Filter+Project branches over
    the same file, each re-serializing the to_json(metadata) column just
    to test one predicate.  Emitted (branch, doc_id) sets are identical;
    total predicate evaluations are identical (every branch tested every
    row before too); the JSON metadata is now built once per row instead
    of once per row PER BRANCH, and at scale the 40 table passes become
    one."""
    docs = _with_metadata(load(spark, sf_dir, "documents"))
    tags = F.array(
        *[
            F.when(compile_filters(filters), F.lit(tag))
            for tag, filters in branches
        ]
    )
    return docs.select(
        F.explode(F.filter(tags, lambda t: t.isNotNull())).alias("branch"),
        "doc_id",
    )


#: P4/P5/P6 — scalar equality + dotted JSON paths + whitelisted theta ops.
#: One arm per original fine-grained query (driver-green names in round 1).
_SCALAR_BRANCHES: list[tuple[str, dict]] = [
    # P6: bare string equality (intended semantics; reference bug #2 fixed)
    ("eq_str", {"lang": "en"}),
    # P6: bare numeric equality (duckvdb.py:99)
    ("eq_num", {"n_chars": 128}),
    # P6: bare bool equality
    ("eq_bool", {"is_long": True}),
    # P4+P5: dotted JSON path + theta op (the demo's base.Attack > 50 shape,
    # vdb.py:102)
    ("nested_theta", {"base.n_chars": (">", 300)}),
    # P5: remaining whitelisted theta ops in one conjunction
    ("theta_ops", {"n_chars": (">=", 100), "base.n_chars": ("<", 400), "lang": ("!=", "zh")}),
    # P5: <= and string theta compare
    ("theta_lte", {"n_chars": ("<=", 150), "lang": ("<=", "es")}),
    # P5: LIKE passthrough (whitelisted, not spliced)
    ("like", {"source": ("like", "src1%")}),
    # round-12: ("in", [...]) set membership on a JSON path — string and
    # numeric probes (the coercion rule is probe-typed, like every theta op)
    ("in_str", {"lang": ("in", ["en", "fr"])}),
    ("in_num", {"base.n_chars": ("in", [128, 256, 384])}),
    # round-12: ("between", (lo, hi)) inclusive range — numeric and string
    ("between_num", {"n_chars": ("between", (100, 300))}),
    ("between_str", {"lang": ("between", ("de", "es"))}),
]

_SCALAR_ORACLE = """
    SELECT 'eq_str' AS branch, doc_id FROM documents WHERE lang = 'en'
    UNION ALL
    SELECT 'eq_num', doc_id FROM documents WHERE n_chars = 128
    UNION ALL
    SELECT 'eq_bool', doc_id FROM documents WHERE (n_chars > 250) = true
    UNION ALL
    SELECT 'nested_theta', doc_id FROM documents WHERE n_chars > 300
    UNION ALL
    SELECT 'theta_ops', doc_id FROM documents
    WHERE n_chars >= 100 AND n_chars < 400 AND lang != 'zh'
    UNION ALL
    SELECT 'theta_lte', doc_id FROM documents WHERE n_chars <= 150 AND lang <= 'es'
    UNION ALL
    SELECT 'like', doc_id FROM documents WHERE source LIKE 'src1%'
    UNION ALL
    SELECT 'in_str', doc_id FROM documents WHERE lang IN ('en', 'fr')
    UNION ALL
    SELECT 'in_num', doc_id FROM documents WHERE n_chars IN (128, 256, 384)
    UNION ALL
    SELECT 'between_num', doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300
    UNION ALL
    SELECT 'between_str', doc_id FROM documents WHERE lang BETWEEN 'de' AND 'es'
"""


def filter_scalar_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter compiler, scalar families (P4 json paths, P5 theta ops,
    P6 scalar equality, plus the round-12 ``in``/``between`` ops):
    11 tagged branches in one union."""
    return _branch_union(spark, sf_dir, _SCALAR_BRANCHES)


#: P7/P8/P9 list + composition families, and P9's empty-filter match-all.
_LIST_BRANCHES: list[tuple[str, dict]] = [
    # P8: array membership — list_contains analog (duckvdb.py:80-89)
    ("contains", {"words": ("contains", "spark")}),
    # P7: semantic list equality (reference bug #3 fixed)
    ("eq_list", {"pair": ["en", "src0"]}),
    # P9: conjunction of heterogeneous branches (duckvdb.py:101)
    ("conjunction", {"lang": "en", "base.n_chars": (">", 200), "words": ("contains", "join")}),
    # P9: empty filters → 1=1 (duckvdb.py:106)
    ("empty_match_all", {}),
]

_LIST_ORACLE = """
    SELECT 'contains' AS branch, doc_id FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
    UNION ALL
    SELECT 'eq_list', doc_id FROM documents WHERE lang = 'en' AND source = 'src0'
    UNION ALL
    SELECT 'conjunction', doc_id FROM documents
    WHERE lang = 'en' AND n_chars > 200 AND list_contains(string_split(text, ' '), 'join')
    UNION ALL
    SELECT 'empty_match_all', doc_id FROM documents
    UNION ALL
    SELECT 'dsl2', doc_id FROM documents
    WHERE n_chars BETWEEN 100 AND 300 AND lang IN ('en', 'fr') AND source = 'src3'
"""


def filter_lists_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter compiler, list/composition families (P7 list equality,
    P8 contains, P9 conjunction + empty-match-all) plus DSL #2's
    ``field__op`` compiler (P10, utils.py:11-60) as a fifth arm."""
    base = _branch_union(spark, sf_dir, _LIST_BRANCHES)
    docs = load(spark, sf_dir, "documents")
    dsl2 = docs.filter(
        compile_where(
            {"n_chars__between": (100, 300), "lang__in": ["en", "fr"], "source": "src3"}
        )
    ).select(F.lit("dsl2").alias("branch"), "doc_id")
    return base.union(dsl2)


#: Boolean combinators ($or / $and / $not — round-5 extension; the reference
#: DSL is AND-only, duckvdb.py:101).  All fields probed here are present in
#: every row, so three-valued-logic edge cases stay with the Hypothesis
#: dual-engine suite (tests/test_filters.py) and these arms pin the COMPILED
#: SQL shape against a hand-written oracle.
_COMB_BRANCHES: list[tuple[str, dict]] = [
    ("or", {"$or": [{"lang": "de"}, {"n_chars": (">", 400)}]}),
    ("not", {"$not": {"lang": "en"}}),
    # mixed nesting: plain term AND ($not OR range) — the q19-style shape
    ("or_nested", {"source": ("like", "src%"),
                   "$or": [{"$not": {"lang": "en"}}, {"base.n_chars": ("<", 120)}]}),
    ("and_comb", {"$and": [{"lang": ("!=", "fr")},
                           {"$or": [{"n_chars": ("<", 100)}, {"n_chars": (">", 450)}]}]}),
]

_COMB_ORACLE = """
    SELECT 'or' AS branch, doc_id FROM documents WHERE lang = 'de' OR n_chars > 400
    UNION ALL
    SELECT 'not', doc_id FROM documents WHERE NOT (lang = 'en')
    UNION ALL
    SELECT 'or_nested', doc_id FROM documents
    WHERE source LIKE 'src%' AND ((NOT (lang = 'en')) OR n_chars < 120)
    UNION ALL
    SELECT 'and_comb', doc_id FROM documents
    WHERE lang != 'fr' AND (n_chars < 100 OR n_chars > 450)
"""


def filter_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean combinator family: 4 tagged $or/$and/$not arms."""
    return _branch_union(spark, sf_dir, _COMB_BRANCHES)


@register(
    "filter_coverage",
    oracle=_SCALAR_ORACLE + "\n    UNION ALL\n" + _LIST_ORACLE + "\n    UNION ALL\n" + _COMB_ORACLE,
)
def filter_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL filter-compiler families in one driver-checked union — 20 tagged
    arms (P4 json paths, P5 theta ops, P6 scalar equality, P7 list
    equality, P8 contains, P9 conjunction/empty-match-all, P10 field__op
    DSL #2, the $or/$and/$not combinators, plus the round-12
    ``in``/``between`` path ops): a wrong compiler branch changes that
    tag's id set and flips the hash."""
    return (
        filter_scalar_theta(spark, sf_dir)
        .union(filter_lists_dsl(spark, sf_dir))
        .union(filter_combinators(spark, sf_dir))
    )
