"""Knowledge-graph co-mention edges + degrees — the flagship native query.

Spark restatement of the reference's co-occurrence SQL
(arkham-shard-graph/builder.py:240-265): self-join mentions on the document
key with an ordered pair predicate, COUNT(DISTINCT doc), ARRAY_AGG(DISTINCT
doc), HAVING count ≥ min, ORDER BY count DESC LIMIT n — plus edge weight
min(1, count/10) (builder.py:420-432) and node degrees (builder.py:439-456).

Scale notes:
- mentions are deduped to distinct (doc, name) pairs BEFORE the self-join —
  output-identical (the agg counts distinct docs) and it collapses the join
  input by the per-doc mention multiplicity, which is what explodes at 100 TB;
- the join shuffles both sides on the doc key (the pipeline pre-partitions by
  url hash so this is a local co-partitioned join under AQE);
- ORDER BY+LIMIT compiles to TakeOrderedAndProject (no global sort);
  deterministic tiebreak on the pair names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def comention_edges(
    mentions: DataFrame,
    doc_col: str = "url",
    min_count: int = 2,
    limit: int | None = 1000,
) -> DataFrame:
    pairs = mentions.select(
        F.col(doc_col).alias("doc"), F.lower(F.col("text")).alias("name")
    ).distinct()

    a = pairs.alias("a")
    b = pairs.alias("b")
    edges = (
        a.join(b, F.col("a.doc") == F.col("b.doc"))
        .where(F.col("a.name") < F.col("b.name"))
        .groupBy(
            F.col("a.name").alias("entity_a"),
            F.col("b.name").alias("entity_b"),
        )
        .agg(
            F.countDistinct(F.col("a.doc")).alias("co_occurrence_count"),
            F.sort_array(F.collect_set(F.col("a.doc"))).alias("document_ids"),
        )
        .where(F.col("co_occurrence_count") >= min_count)
        .withColumn(
            "weight",
            F.least(F.lit(1.0), F.col("co_occurrence_count") / F.lit(10.0)),
        )
    )
    ordered = edges.orderBy(
        F.desc("co_occurrence_count"), F.asc("entity_a"), F.asc("entity_b")
    )
    return ordered.limit(limit) if limit else ordered


def node_degrees(edges: DataFrame) -> DataFrame:
    """Degree per node from the edge list (builder.py:439-456)."""
    ends = edges.select(F.col("entity_a").alias("name")).unionAll(
        edges.select(F.col("entity_b").alias("name"))
    )
    return ends.groupBy("name").agg(F.count(F.lit(1)).alias("degree"))
