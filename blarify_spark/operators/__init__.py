"""Operator library: the relational/query surface of the engine.

Each module registers named queries with DuckDB oracle twins via
blarify_spark.operators.registry — the driver contract surface
(SURVEY.md §2.6, /root/repo/__spark_entry__.py).
"""
