"""Bucketed co-located joins: plan must be Exchange-free, results identical
to the shuffled join."""

import pytest

from pyspark.sql import functions as F

from arkhammirror_spark.operators.bucketing import co_located_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("f"),
    )
    mentions = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("doc_id"),
        F.concat(F.lit("m"), F.col("id")).alias("mention"),
    )
    write_bucketed(docs, "bkt_docs", ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(mentions, "bkt_mentions", ["doc_id"], 8, sort_cols=["doc_id"])
    yield docs, mentions
    spark.sql("DROP TABLE IF EXISTS bkt_docs")
    spark.sql("DROP TABLE IF EXISTS bkt_mentions")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    joined = co_located_join(spark, "bkt_docs", "bkt_mentions", ["doc_id"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # zero shuffle on either side


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    docs, mentions = bucketed_tables
    got = sorted(
        map(tuple, co_located_join(spark, "bkt_docs", "bkt_mentions", ["doc_id"]).collect())
    )
    exp = sorted(map(tuple, docs.join(mentions, "doc_id").collect()))
    assert got == exp
    assert len(got) == 6000
