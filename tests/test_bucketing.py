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


def test_ivf_lists_materialize_bucketed_and_prune(spark, tmp_path):
    """The IVF scale story end to end: fit once, materialize the inverted
    lists BUCKETED BY list_id, and verify a probe's list_id IN (...) filter
    prunes buckets at the SCAN (SelectedBucketsCount < total) — repeated
    ANN queries then touch ~n_probe/n_lists of the storage, no re-fit,
    no full scan. This is the parquet analogue of pgvector's ivfflat
    index scan (vectors.py:469-548)."""
    import random

    from pyspark.sql import functions as F

    from arkhammirror_spark.operators.bucketing import write_bucketed
    from arkhammirror_spark.operators.similarity import fit_ivf, ivf_probe

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    centers, assigned = fit_ivf(emb, n_clusters=8)

    spark.sql("DROP TABLE IF EXISTS ivf_lists_test")
    # a crashed earlier run can leave the warehouse dir without a catalog
    # entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
    import shutil

    shutil.rmtree("spark-warehouse/ivf_lists_test", ignore_errors=True)
    write_bucketed(assigned, "ivf_lists_test", ["list_id"], 8,
                   sort_cols=["list_id"])
    lists = spark.table("ivf_lists_test")

    qv = rows[3][1]
    # the planner auto-disables bucketed scans when no operator consumes
    # the bucketing's output partitioning; a probe-only scan must force it
    # to get FILE-level bucket pruning (row-group pruning via the pushed
    # IN-filter happens regardless)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        out = ivf_probe(lists, centers, qv, k=5, n_probe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    assert "SelectedBucketsCount" in plan, plan[:2000]
    import re as _re

    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))
    # probe over the materialized table ≡ probe over the in-memory frame
    direct = ivf_probe(assigned, centers, qv, k=5, n_probe=2)
    assert [r["vec_id"] for r in out.collect()] == [
        r["vec_id"] for r in direct.collect()
    ]
    spark.sql("DROP TABLE IF EXISTS ivf_lists_test")


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    docs, mentions = bucketed_tables
    got = sorted(
        map(tuple, co_located_join(spark, "bkt_docs", "bkt_mentions", ["doc_id"]).collect())
    )
    exp = sorted(map(tuple, docs.join(mentions, "doc_id").collect()))
    assert got == exp
    assert len(got) == 6000


def test_ivf_filtered_probe_prunes_before_distance(spark, tmp_path):
    """Payload-filtered ANN (vectors.py:856-934, filter arm :920-925):
    the metadata predicate AND the probe's list_id IN (...) both reach
    the parquet scan of the materialized inverted lists — file-level
    bucket pruning (SelectedBucketsCount < total) plus PushedFilters on
    the payload column — so filtered-out rows never reach the cosine
    projection. Results must equal the brute-force filtered top-k."""
    import random
    import re as _re
    import shutil

    from pyspark.sql import functions as F

    from arkhammirror_spark.operators.bucketing import write_bucketed
    from arkhammirror_spark.operators.similarity import (
        brute_force_topk, fit_ivf, ivf_probe,
    )

    rng = random.Random(23)
    base = [rng.gauss(0, 1) for _ in range(8)]
    rows = []
    for i in range(240):
        if i < 12:  # planted clones of the query direction
            v = [x + 0.001 * i * ((j + i) % 5 - 2) for j, x in enumerate(base)]
        else:
            v = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, v, f"cat{i % 3}"))
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>, category: string"
    )
    centers, assigned = fit_ivf(emb, n_clusters=8, carry_cols=["category"])

    spark.sql("DROP TABLE IF EXISTS ivf_lists_filt_test")
    shutil.rmtree("spark-warehouse/ivf_lists_filt_test", ignore_errors=True)
    write_bucketed(assigned, "ivf_lists_filt_test", ["list_id"], 8,
                   sort_cols=["list_id"])
    lists = spark.table("ivf_lists_filt_test")

    pred = F.col("category") == "cat1"
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        out = ivf_probe(lists, centers, base, k=4, n_probe=3, predicate=pred)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan[:2000]
    pushed = _re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "category" in pushed.group(1), plan[:2000]

    # filtered probe ≡ brute-force top-k over the filtered pool: the
    # cat1 clones (1,4,7,10) are within 1% of the query direction, so
    # they are the exact filtered top-4 AND share the query's inverted
    # list for any KMeans init
    exp = brute_force_topk(
        emb.where(pred), base, k=4
    ).collect()
    got = out.collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exp]
    assert all(r["vec_id"] % 3 == 1 and r["vec_id"] < 12 for r in got)

    # score_threshold arm (:927-930): at 0.9 only the clones survive
    thr = ivf_probe(lists, centers, base, k=50, n_probe=8,
                    predicate=pred, score_threshold=0.9)
    assert sorted(r["vec_id"] for r in thr.collect()) == [1, 4, 7, 10]
    spark.sql("DROP TABLE IF EXISTS ivf_lists_filt_test")
