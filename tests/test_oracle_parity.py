"""The local mirror of the driver's correctness gate: every registered query
with an oracle must hash-match DuckDB at sf0.001 (driver runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match

import __spark_entry__ as E

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        assert len(sdf) >= 0  # weak rows-only check (non-SQL-expressible op)
        return
    odf = duck.execute(_ORACLES[name]).fetchdf()
    assert_frames_match(sdf, odf, name)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["kind", "vec_id", "distance"]
