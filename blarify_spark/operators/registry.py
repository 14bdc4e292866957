"""Query registry: name -> (spark_fn, oracle_sql | None).

Conventions that make the driver's order-insensitive value-hash compare
deterministic across Spark and DuckDB:

* every computed/aggregate column is aliased IDENTICALLY in both
* double sums/avgs go through DECIMAL casts (exact arithmetic, immune to
  partition-order float association) and come back as DOUBLE
* every top-k has a total deterministic ORDER BY (unique tie-break key)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def _with_shipping(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a query so any external driver's session gets the package
    shipped to its Python workers before UDFs run."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from blarify_spark.session import ensure_workers_can_import

        ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: _with_shipping(q.fn) for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle}


def _load_all() -> None:
    """Import every operator module so its @register calls run."""
    import blarify_spark.operators.dedup  # noqa: F401
    import blarify_spark.operators.kg_queries  # noqa: F401
    import blarify_spark.operators.multimodal  # noqa: F401
    import blarify_spark.operators.relational  # noqa: F401
    import blarify_spark.operators.similarity  # noqa: F401
    import blarify_spark.operators.textstats  # noqa: F401
