"""Metadata filter compilers — both reference DSLs → Catalyst ``Column``.

DSL #1 (primary, reference ``duckvdb.py:63-101`` ``format_filters``):
a dict whose keys are (dotted) JSON paths into the ``metadata`` JSON column
and whose values are:

  - bare scalar          → equality           {"species": "Seed"}
  - bare list            → array equality     {"type": ["Grass","Poison"]}
  - ("contains", v)      → array membership   {"type": ("contains","Flying")}
  - (op, v) theta tuple  → comparison         {"base.Attack": (">", 50)}
  - ("in", [v, ...])     → set membership     {"lang": ("in", ["en","fr"])}
  - ("between", (lo,hi)) → inclusive range    {"base.HP": ("between", (30, 60))}

``in``/``between`` (round-12 extension): without them, "field in
[a,b,c]" on a metadata path needs an ``$or`` chain — the first filter a
real user writes.  Both coerce by probe type like every theta op; an
empty ``in`` list matches nothing on both engines (SQL ``IN ()`` is not
even parseable, so the compiler short-circuits to false).

All terms are AND-conjoined (``duckvdb.py:101``); empty dict matches all
(``1=1``, ``duckvdb.py:106``).

Boolean composition (extension — the reference DSL is AND-only,
``duckvdb.py:101``, which forces disjunctive predicates into hand-written
SQL strings, the injection surface the compiled DSL exists to avoid):

  - ``{"$or":  [f1, f2, ...]}`` → any sub-filter dict matches
  - ``{"$and": [f1, f2, ...]}`` → all sub-filter dicts match (for nesting
    inside ``$or``; top-level keys are already conjoined)
  - ``{"$not": f}``             → sub-filter dict does not match

Sub-filters are full DSL dicts, composed recursively; ``$``-keys mix freely
with plain terms (all AND-joined at their level).  NULL semantics follow
SQL three-valued logic on BOTH engines (a row where the sub-predicate is
NULL is not matched by ``$not`` either — filters only ever match on
positive evidence, the same rule ``delete()`` documents).

DSL #2 (reference ``utils.py:11-60`` ``build_where_clause`` — dead code there,
implemented here because it documents intended capability): Django-style
``field__op`` keys over top-level columns with ops ``eq`` (default), ``gt``,
``gte``, ``lt``, ``lte``, ``in``, ``between`` (inclusive).

Deliberate divergences from the reference (SURVEY §8, both are reference
bugs we do not copy):

  1. No SQL-string splicing: the reference f-strings user values/operators
     into SQL (injection surface, ``duckvdb.py:90-99``).  We only ever build
     ``Column`` expressions, and the theta-operator set is whitelisted.
  2. String equality works: the reference emits ``field = 'Seed'`` which
     DuckDB rejects at runtime (bare word is invalid JSON).  We implement the
     intended semantics (compare the extracted string).
  3. List equality is semantic: the reference compares compact JSON text vs
     ``json.dumps`` text (always false for multi-element lists).  We compare
     parsed arrays.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Whitelisted theta operators (reference passes arbitrary strings through —
#: ``duckvdb.py:75,90-92`` — which we refuse).
_THETA_OPS = {
    "=": lambda c, v: c == v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "like": lambda c, v: c.like(v),
}


def json_path(metadata: Column | str, key: str) -> Column:
    """Dotted key → JSON path extraction.

    ``"base.Attack"`` → ``get_json_object(metadata, '$.base.Attack')`` —
    the composition ``json_extract(json_extract(m,'base'),'Attack')`` of the
    reference (``duckvdb.py:66-72``) collapses to one JSONPath.
    ``get_json_object`` returns NULL for missing paths, matching DuckDB.
    """
    m = F.col(metadata) if isinstance(metadata, str) else metadata
    return F.get_json_object(m, "$." + key)


def _typed(extracted: Column, probe: Any) -> Column:
    """Cast the extracted JSON string per the Python type of the probe value —
    the reference's coercion rule (type of the probe, not the data;
    ``duckvdb.py:80-99``)."""
    if isinstance(probe, bool):
        return extracted.cast("boolean")
    if isinstance(probe, (int, float)):
        return extracted.cast("double")
    return extracted  # str compares as string (get_json_object unquotes)


def _array_of(probe_list: list) -> str:
    """Element type for array casts, chosen by probe element type —
    mirrors ``duckvdb.py:83-89`` (str→VARCHAR[], int→INTEGER[],
    float→DOUBLE[], other→VARCHAR[])."""
    if probe_list and isinstance(probe_list[0], bool):
        return "array<boolean>"
    if probe_list and isinstance(probe_list[0], int):
        return "array<long>"
    if probe_list and isinstance(probe_list[0], float):
        return "array<double>"
    return "array<string>"


def _term(metadata: Column, key: str, value: Any) -> Column:
    extracted = json_path(metadata, key)
    if isinstance(value, tuple):
        op, v = value
        if op == "contains":
            # duckvdb.py:80-89: list_contains(field::JSON::VARCHAR[], v)
            arr = F.from_json(extracted, _array_of([v]))
            return F.array_contains(arr, F.lit(v))
        if op in ("=", "==") and isinstance(value[1], list):
            return _array_eq(extracted, v)
        if op == "in":
            if not isinstance(v, (list, tuple)):
                raise ValueError(f"'in' takes a list of values, got {v!r}")
            vals = list(v)
            if not vals:
                return F.lit(False)  # empty IN-list matches nothing
            return _typed(extracted, vals[0]).isin(vals)
        if op == "between":
            if not isinstance(v, (list, tuple)) or len(v) != 2:
                raise ValueError(f"'between' takes (lo, hi), got {v!r}")
            lo, hi = v
            # inclusive on both bounds — the DSL #2 utils.py:44-48 rule
            return _typed(extracted, lo).between(F.lit(lo), F.lit(hi))
        if op not in _THETA_OPS:
            raise ValueError(f"unsupported filter operator: {op!r}")
        if op == "like":
            return extracted.like(str(v))
        return _THETA_OPS[op](_typed(extracted, v), F.lit(v))
    if isinstance(value, list):
        # duckvdb.py:77-79,97-98 — semantic equality (reference bug #3 fixed)
        return _array_eq(extracted, value)
    if value is not None and not isinstance(value, (str, bool, int, float)):
        # Reject malformed terms (e.g. dict values) at the API boundary with
        # the DSL's failure shape, instead of a deep Spark literal error.
        raise ValueError(
            f"unsupported filter value for {key!r}: {type(value).__name__} "
            "(expected scalar, list, or (op, value) tuple)"
        )
    # bare scalar equality (duckvdb.py:95-96,99)
    return _typed(extracted, value) == F.lit(value)


def _array_eq(extracted: Column, probe: list) -> Column:
    arr = F.from_json(extracted, _array_of(probe))
    return arr == F.array(*[F.lit(v) for v in probe])


def _clause_list(key: str, value: Any) -> list[dict]:
    if (
        not isinstance(value, list)
        or not value
        or not all(isinstance(v, dict) for v in value)
    ):
        raise ValueError(
            f"{key} takes a non-empty list of filter dicts, got {value!r}"
        )
    return value


def _compile_term(m: Column, key: str, value: Any) -> Column:
    if key == "$or":
        return reduce(
            lambda a, b: a | b, [_conj(m, s) for s in _clause_list(key, value)]
        )
    if key == "$and":
        return reduce(
            lambda a, b: a & b, [_conj(m, s) for s in _clause_list(key, value)]
        )
    if key == "$not":
        if not isinstance(value, dict):
            raise ValueError(f"$not takes a filter dict, got {value!r}")
        return ~_conj(m, value)
    if key.startswith("$"):
        raise ValueError(f"unsupported filter combinator: {key!r}")
    return _term(m, key, value)


def _conj(m: Column, filters: dict[str, Any]) -> Column:
    if not filters:
        return F.lit(True)
    return reduce(
        lambda a, b: a & b, [_compile_term(m, k, v) for k, v in filters.items()]
    )


def compile_filters(filters: dict[str, Any] | None, metadata: Column | str = "metadata") -> Column:
    """DSL #1 dict → one AND-conjoined boolean Column (``lit(True)`` when
    empty, the ``1=1`` of ``duckvdb.py:106``); ``$or``/``$and``/``$not``
    keys compose sub-filter dicts recursively (see module docstring)."""
    m = F.col(metadata) if isinstance(metadata, str) else metadata
    if not filters:
        return F.lit(True)
    return _conj(m, filters)


# ---------------------------------------------------------------------------
# DSL #2: field__op over top-level columns (utils.py:11-60)
# ---------------------------------------------------------------------------

_DSL2_OPS = {
    "eq": lambda c, v: c == F.lit(v),
    "gt": lambda c, v: c > F.lit(v),
    "gte": lambda c, v: c >= F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "lte": lambda c, v: c <= F.lit(v),
    "in": lambda c, v: c.isin(list(v)),
    "between": lambda c, v: c.between(F.lit(v[0]), F.lit(v[1])),  # inclusive, utils.py:44-48
}


def compile_where(filters: dict[str, Any] | None) -> Column:
    """DSL #2 (``field__op``) → boolean Column over top-level columns.

    ``{"price__gte": 10, "status__in": ["a","b"], "size": 5}`` →
    ``(price >= 10) AND (status IN ('a','b')) AND (size = 5)``.
    Matches ``build_where_clause`` (``utils.py:11-60``): missing ``__op``
    suffix defaults to ``eq``; empty dict matches all (``utils.py:20``).
    """
    if not filters:
        return F.lit(True)
    terms = []
    for key, value in filters.items():
        field, _, op = key.partition("__")
        op = op or "eq"
        if op not in _DSL2_OPS:
            raise ValueError(f"unsupported filter suffix: __{op}")
        terms.append(_DSL2_OPS[op](F.col(field), value))
    return reduce(lambda a, b: a & b, terms)


# ---------------------------------------------------------------------------
# Oracle transliteration (DuckDB SQL) — used by the correctness harness to
# express the *same intended semantics* (not the reference's buggy SQL).
# ---------------------------------------------------------------------------


def _sql_quote(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def filters_to_duckdb_sql(filters: dict[str, Any] | None, metadata_expr: str = "metadata") -> str:
    """DuckDB WHERE fragment with the same semantics as
    :func:`compile_filters` (for golden tests / the oracle harness),
    including the ``$or``/``$and``/``$not`` combinators (parenthesized —
    SQL's three-valued logic matches Spark's, so NULL sub-predicates
    behave identically under NOT/OR on both engines)."""
    if not filters:
        return "1=1"
    parts = []
    for key, value in filters.items():
        if key == "$or":
            subs = _clause_list(key, value)
            parts.append(
                "(" + " OR ".join(f"({filters_to_duckdb_sql(s, metadata_expr)})" for s in subs) + ")"
            )
            continue
        if key == "$and":
            subs = _clause_list(key, value)
            parts.append(
                "(" + " AND ".join(f"({filters_to_duckdb_sql(s, metadata_expr)})" for s in subs) + ")"
            )
            continue
        if key == "$not":
            if not isinstance(value, dict):
                raise ValueError(f"$not takes a filter dict, got {value!r}")
            parts.append(f"(NOT ({filters_to_duckdb_sql(value, metadata_expr)}))")
            continue
        if key.startswith("$"):
            raise ValueError(f"unsupported filter combinator: {key!r}")
        path_parts = key.split(".")
        ext = metadata_expr
        for p in path_parts:
            ext = f"json_extract({ext}, '{p}')"
        ext_str = f"json_extract_string({metadata_expr}, '$.{key.replace('.', '.')}')"
        if isinstance(value, tuple):
            op, v = value
            if op == "contains":
                parts.append(f"list_contains({ext}::JSON::VARCHAR[], {_sql_quote(v)})")
            elif op in ("=", "==") and isinstance(v, list):
                parts.append(_sql_array_eq(ext, v))
            elif op == "in":
                vals = list(v) if isinstance(v, (list, tuple)) else None
                if vals is None:
                    raise ValueError(f"'in' takes a list of values, got {v!r}")
                if not vals:
                    parts.append("1=0")  # empty IN-list matches nothing
                else:
                    lits = ", ".join(_sql_quote(x) for x in vals)
                    if isinstance(vals[0], str):
                        parts.append(f"{ext_str} IN ({lits})")
                    elif isinstance(vals[0], bool):
                        parts.append(f"({ext})::BOOLEAN IN ({lits})")
                    else:
                        parts.append(f"({ext})::DOUBLE IN ({lits})")
            elif op == "between":
                if not isinstance(v, (list, tuple)) or len(v) != 2:
                    raise ValueError(f"'between' takes (lo, hi), got {v!r}")
                lo, hi = v
                rng = f"BETWEEN {_sql_quote(lo)} AND {_sql_quote(hi)}"
                if isinstance(lo, str):
                    parts.append(f"{ext_str} {rng}")
                elif isinstance(lo, bool):
                    parts.append(f"({ext})::BOOLEAN {rng}")
                else:
                    parts.append(f"({ext})::DOUBLE {rng}")
            else:
                if isinstance(v, str):
                    parts.append(f"{ext_str} {op} {_sql_quote(v)}")
                elif isinstance(v, bool):
                    # must precede the numeric branch (bool ⊂ int in Python);
                    # mirrors _typed()'s boolean cast — JSON true/false casts
                    # to BOOLEAN, never to DOUBLE
                    parts.append(f"({ext})::BOOLEAN {op} {_sql_quote(v)}")
                else:
                    parts.append(f"({ext})::DOUBLE {op} {_sql_quote(v)}")
        elif isinstance(value, list):
            parts.append(_sql_array_eq(ext, value))
        elif isinstance(value, str):
            parts.append(f"{ext_str} = {_sql_quote(value)}")
        elif isinstance(value, bool):
            parts.append(f"({ext})::BOOLEAN = {_sql_quote(value)}")
        else:
            parts.append(f"({ext})::DOUBLE = {_sql_quote(value)}")
    return " AND ".join(parts)


def _sql_array_eq(ext: str, probe: list) -> str:
    if probe and isinstance(probe[0], (int, float)) and not isinstance(probe[0], bool):
        cast = "DOUBLE[]"
    else:
        cast = "VARCHAR[]"
    lits = ", ".join(_sql_quote(v) for v in probe)
    return f"{ext}::JSON::{cast} = [{lits}]::{cast}"
