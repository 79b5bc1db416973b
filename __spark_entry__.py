"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship coverage-diff query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-checkable oracles (see osm_coverage_spark.registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_coverage_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: ALKIS-vs-OSM missing addresses at sf0.001."""
    return registry.QUERIES["coverage_missing"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE)
