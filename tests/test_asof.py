"""Unit tests for the as-of join operator: boundary semantics that the
events-fixture e2e oracle check can't isolate."""

from __future__ import annotations

import datetime as dt

from modal_vector_db_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_basic_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(30)), (2, _ts(10))], "user long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(20), 200.0), (2, _ts(50), 999.0)],
        "user long, ts timestamp, v double",
    )
    got = {
        (r["user"], r["ts"].minute): r["v_r"]
        for r in asof_join(left, right, on="ts", by="user").collect()
    }
    assert got[(1, 10)] == 100.0   # only the :05 row precedes :10
    assert got[(1, 30)] == 200.0   # :20 is the latest prior
    assert got[(2, 10)] is None    # right row at :50 is in the future


def test_asof_simultaneous_right_visible(spark):
    """A right row at exactly left.ts matches (<=, DuckDB ASOF parity)."""
    left = spark.createDataFrame([(1, _ts(10))], "user long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "user long, ts timestamp, v double")
    [r] = asof_join(left, right, on="ts", by="user").collect()
    assert r["v_r"] == 7.0


def test_asof_keeps_all_left_rows(spark):
    left = spark.createDataFrame(
        [(i, _ts(i)) for i in range(1, 6)], "user long, ts timestamp"
    )
    right = spark.createDataFrame([], "user long, ts timestamp, v double")
    assert asof_join(left, right, on="ts", by="user").count() == 5


# ---------------------------------------------------------------------------
# Property-based: random (user, ts) sets must match pandas merge_asof — an
# independent third implementation of the semantics (the registered query
# already cross-checks DuckDB's ASOF JOIN).
# ---------------------------------------------------------------------------
try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _pairs = st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 59)), min_size=0, max_size=12
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(lpairs=_pairs, rpairs=_pairs)
    def test_asof_matches_pandas_merge_asof(spark, lpairs, rpairs):
        import pandas as pd

        # unique (user, ts) on the right: equal-timestamp right rows are an
        # ambiguous tie in ANY asof implementation (value undefined)
        rpairs = sorted({(u, m) for (u, m) in rpairs})
        left = spark.createDataFrame(
            [(u, _ts(m)) for (u, m) in lpairs] or [(99, _ts(0))],
            "user long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(u, _ts(m), float(u * 100 + m)) for (u, m) in rpairs] or [(98, _ts(0), 0.0)],
            "user long, ts timestamp, v double",
        )
        got = {
            (r["user"], r["ts"]): r["v_r"]
            for r in asof_join(left, right, on="ts", by="user").collect()
        }
        lp = pd.DataFrame(
            [(u, _ts(m)) for (u, m) in lpairs] or [(99, _ts(0))], columns=["user", "ts"]
        ).sort_values(["ts", "user"], kind="stable")
        rp = pd.DataFrame(
            [(u, _ts(m), float(u * 100 + m)) for (u, m) in rpairs] or [(98, _ts(0), 0.0)],
            columns=["user", "ts", "v"],
        ).sort_values(["ts", "user"], kind="stable")
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="user", direction="backward", allow_exact_matches=True
        )
        for row in want_df.itertuples(index=False):
            want_v = None if pd.isna(row.v) else row.v
            assert got[(row.user, row.ts.to_pydatetime())] == want_v, (row, got)

except ImportError:  # pragma: no cover
    pass
