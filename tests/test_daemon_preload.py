"""The preload-fork worker daemon (session.py spark.python.daemon.module).

Optimization-round change: workers are forked from a daemon that has
already imported pandas / numpy / this package, so a fresh worker starts
executing user code immediately instead of paying ~0.6 s of imports
(concurrency-stretched on a cold session's first Python stage). These
tests pin (1) that the session actually runs on the custom daemon,
(2) that forked workers inherit the preloaded modules, and (3) that a
pandas UDF through the preloaded path computes correct values — i.e. the
daemon swap changed nothing semantically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T


def test_session_uses_preload_daemon(spark):
    assert (
        spark.conf.get("spark.python.daemon.module")
        == "blarify_spark.daemon_preload"
    )


def test_workers_inherit_preloaded_modules(spark):
    @F.pandas_udf(T.StringType())
    def mods(s: pd.Series) -> pd.Series:
        import sys as _sys

        wanted = (
            "pandas",
            "numpy",
            "blarify_spark.ref.triples",
            "blarify_spark.functions.udfs",
        )
        have = ",".join(m for m in wanted if m in _sys.modules)
        return pd.Series([have] * len(s))

    rows = (
        spark.range(0, 8, 1, 4)
        .select(mods(F.col("id").cast("int")).alias("m"))
        .distinct()
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["m"] == (
        "pandas,numpy,blarify_spark.ref.triples,blarify_spark.functions.udfs"
    )


def test_pandas_udf_values_through_preload_daemon(spark):
    @F.pandas_udf(T.LongType())
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1

    total = (
        spark.range(0, 1000, 1, 4)
        .select(plus_one("id").alias("x"))
        .agg(F.sum("x"))
        .collect()[0][0]
    )
    assert total == sum(range(1, 1001))


def test_preload_module_is_import_safe():
    # Importing the daemon module on the driver must not start a manager
    # loop or require a JVM — the __main__ guard is the only entry point.
    import importlib

    import blarify_spark.daemon_preload as dp

    importlib.reload(dp)
    assert hasattr(dp, "manager")
