"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (co-mention knowledge-graph edges over the
                extraction chain) at sf0.001.
queries()     — operator registry from SURVEY.md §2 (extraction chain,
                dedup, text analysis, relational/temporal/vector ops).
oracle_sql()  — exact DuckDB equivalents (rehearsed value-identical in
                tests/test_queries_oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arkhammirror_spark.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: mock-NER mentions → noise filter → co-mention edge build."""
    return QUERIES["comention_edges"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
