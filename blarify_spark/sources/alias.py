"""Broadcast alias dictionary — the entity-linking index.

The Spark restatement of blarify's SCIP index source: a protobuf file
loaded once into inverted symbol->occurrence maps
(reference: blarify/code_references/scip_helper.py:362-465). Here the
index is a small DataFrame broadcast to every executor; the hand-built
hash maps become Catalyst broadcast-hash-join probes. At 10^12-document
scale the dictionary (10^6-10^8 aliases) still fits executor memory
after column pruning; beyond that the join degrades gracefully to
shuffle-hash on the alias key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from blarify_spark import corpus

ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
        T.StructField("ctx_tokens", T.ArrayType(T.StringType()), False),
        T.StructField("ctx_embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def alias_dict(spark: SparkSession) -> DataFrame:
    rows = [
        (
            r["alias"],
            r["entity_id"],
            r["canonical_name"],
            r["prior"],
            r["ctx_tokens"],
            r["ctx_embedding"],
        )
        for r in corpus.alias_rows()
    ]
    return spark.createDataFrame(rows, schema=ALIAS_SCHEMA)
