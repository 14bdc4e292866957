"""Local mirror of the driver's correctness gate.

For every registered query with an oracle: run the Spark DataFrame and the
DuckDB SQL on the same sf0.01 parquet, then compare column names,
row counts, and order-insensitive values. Mirrors the driver contract in
__spark_entry__.py (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_MEDIUM


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple(str(v) for v in t))


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck_con():
    con = _duck(SF_DIR_MEDIUM)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck_con, name):
    sdf = QUERIES[name](spark, SF_DIR_MEDIUM)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rows(spark_cols, spark_rows)
    b = _rows(duck_cols, duck_rows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"spark={a[i]} duck={b[i]}" for i in mism
    )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR_MEDIUM)
    assert df.columns
    # replicate the driver's canonicalization: collect to pandas and
    # sort by every column — this is what crashed round 1 on array-typed
    # result columns (pandas cannot hash list cells), so every registered
    # query must survive it, not just return rows
    pdf = df.toPandas()
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns))
