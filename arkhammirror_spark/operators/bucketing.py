"""Bucketed tables for co-located joins.

At 10^12 rows the repeated join key of the engine is the document key
(url / doc_id): mentions ⋈ entities, chunks ⋈ docs, edges ⋈ mentions…
Re-shuffling a petabyte table on every join is the single biggest avoidable
cost, so the storage layout should pre-co-locate: write both sides bucketed
by the join key into the same bucket count, and Spark's bucketed scan joins
them with ZERO Exchange — each task reads bucket i of both sides.

This is the parquet/warehouse analogue of the Iceberg `bucket(N, key)`
partition transform the production deployment would use (catalog.py seam).

tests/test_bucketing.py asserts the join plan is Exchange-free and results
match the shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed parquet table.

    Sorting within buckets upgrades SortMergeJoin to skip its sort step and
    makes per-bucket predicate scans sequential.

    Filter-only consumers (e.g. an IVF probe's `list_id IN (...)` over
    materialized inverted lists) get FILE-level bucket pruning
    (SelectedBucketsCount in the scan) — but only with
    `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`, since the
    planner otherwise disables bucketed scans when nothing consumes the
    bucketing's output partitioning; the pushed IN-filter still prunes at
    row-group granularity either way."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    prefer_merge: bool = True,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned without
    an Exchange on either side when bucket counts match.

    `prefer_merge` pins the sort-merge strategy: it is what a
    petabyte-x-petabyte bucketed join planner picks anyway, and on small
    inputs it stops Catalyst from choosing a broadcast join that bypasses
    the bucketed scan (broadcast is fine when one side is genuinely small —
    then co-location is moot and callers pass prefer_merge=False)."""
    left = spark.table(left_table)
    if prefer_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
