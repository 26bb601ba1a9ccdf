from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="session")
def spark():
    from modal_vector_db_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN (duckdb NULLs surface as NaN)
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def normalize(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_frames_match(sdf_pandas, odf_pandas, name=""):
    assert len(sdf_pandas) == len(odf_pandas), (
        f"{name}: rowcount spark={len(sdf_pandas)} duck={len(odf_pandas)}"
    )
    assert sorted(c.lower() for c in sdf_pandas.columns) == sorted(
        c.lower() for c in odf_pandas.columns
    ), f"{name}: column mismatch"
    sn, on = normalize(sdf_pandas), normalize(odf_pandas)
    assert sn == on, f"{name}: value mismatch; first diff: " + str(
        next(((a, b) for a, b in zip(sn, on) if a != b), None)
    )
