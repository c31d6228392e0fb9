"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001.
queries()     -> one callable per implemented operator from SURVEY.md §2
                 plus the LLM-pipeline operator suite (dedup, similarity,
                 text analysis).
oracle_sql()  -> DuckDB-equivalent ANSI SQL for EVERY registered query
                 (357/357; 0 rows-only).  Hash-seeded sketches are oracled
                 via portable md5-derived hashes (value-exact) or
                 exact-jaccard/top-k recall checks; multimodal decode via
                 closed-form BMP/PCM payload oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tabsdata_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
