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


def _spark_kind(dt) -> str:
    """Map a Spark DataType to a pandas dtype.kind-like letter."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "M"
    return "O"


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

    # Driver-faithful dtype check: the driver hashes pandas cell
    # representations, so a DuckDB HUGEINT sum materializing as float64
    # (8570.0) vs Spark int64 (8570) is a hash mismatch even though the
    # values compare equal in Python. Catch int-vs-float kind divergence
    # per column (the round-2 bug class) before the value comparison.
    duck_pdf = duck_con.execute(ORACLES[name]).fetchdf()
    spark_kinds = {
        f.name: _spark_kind(f.dataType) for f in sdf.schema.fields
    }
    for col in duck_pdf.columns:
        dk = duck_pdf[col].dtype.kind  # 'i','u','f','O','M','b'
        sk = spark_kinds.get(col)
        int_f_clash = ({dk, sk} == {"f", "i"}) or ({dk, sk} == {"f", "u"})
        assert not int_f_clash, (
            f"{name}.{col}: oracle pandas dtype kind {dk!r} vs spark "
            f"{sk!r} — DuckDB HUGEINT/float widening will break the "
            f"driver value hash; CAST the oracle expression to BIGINT"
        )

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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_schema_is_scalar(spark, name):
    """Structural gate over the WHOLE registry (oracled + rows-only):
    no registered query may return an array/map/struct column. The
    driver's canonicalizer sorts the pandas result by every column and
    pandas cannot hash list cells — this crashed kg_child_gather in
    round 1 and skeleton_region_nations in round 2. Schema-only: no job
    runs for most queries."""
    from pyspark.sql import types as T

    df = QUERIES[name](spark, SF_DIR_MEDIUM)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — the driver "
            f"canonicalizer crashes on non-scalar columns; array_join / "
            f"to_json it before returning"
        )


def test_oracle_sums_are_cast():
    """Static gate: every SUM( in every oracle must be wrapped in an
    outer CAST( — DuckDB SUM over integers returns HUGEINT, which pandas
    materializes as float64 and breaks the driver value hash (round-2
    corpus_stats_top_sources / sessionize_events). list_sum HOFs are
    fine (they stay inside float math)."""
    import re

    bad = []
    for qname, sql in ORACLES.items():
        for m in re.finditer(r"(?<![A-Za-z0-9_])SUM\s*\(", sql, re.I):
            pre = sql[: m.start()].rstrip()
            if not pre.upper().endswith("CAST("):
                bad.append((qname, sql[m.start() : m.start() + 50]))
    assert not bad, f"uncast SUM() in oracles (HUGEINT hazard): {bad}"
