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
    include_doc_ids: bool = True,
) -> DataFrame:
    # Join-free formulation of the reference SQL: first aggregate each doc's
    # DISTINCT entity names into one sorted array (one shuffle, map-side
    # combinable), then explode the i<j combinations natively. Output is
    # identical to the self-join + COUNT(DISTINCT) form — each (a, b, doc)
    # appears exactly once, so count(*) ≡ COUNT(DISTINCT doc) — but the plan
    # has two shuffles instead of four and no join at all. Per-doc entity
    # counts are bounded (documents are bounded size), so the combination
    # explosion is O(m²) with small m, inside one task.
    per_doc = mentions.groupBy(F.col(doc_col).alias("doc")).agg(
        F.sort_array(F.collect_set(F.lower(F.col("text")))).alias("names")
    )
    n = F.size("names")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("names"), i + 1, n - i),
                lambda y: F.struct(
                    F.element_at(F.col("names"), i).alias("entity_a"),
                    y.alias("entity_b"),
                ),
            ),
        )
    )
    exploded = per_doc.where(n >= 2).select(
        "doc", F.explode(pair_structs).alias("p")
    ).select("doc", "p.entity_a", "p.entity_b")

    aggs = [F.count(F.lit(1)).alias("co_occurrence_count")]
    if include_doc_ids:
        aggs.append(F.sort_array(F.collect_list(F.col("doc"))).alias("document_ids"))
    edges = (
        exploded.groupBy("entity_a", "entity_b")
        .agg(*aggs)
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


def comention_edges_from_name_sets(
    docs: DataFrame,
    names_col: str = "_names",
    doc_col: str = "url",
    min_count: int = 2,
    limit: int | None = 1000,
    include_doc_ids: bool = False,
) -> DataFrame:
    """Edge build from per-doc sorted-distinct name arrays (the fused extract
    already produced them): the per-doc groupBy disappears entirely — one
    narrow pair explosion feeding a tiny partial-aggregated count. Output is
    identical to ``comention_edges`` over the exploded mentions."""
    n = F.size(names_col)
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col(names_col), i + 1, n - i),
                lambda y: F.struct(
                    F.element_at(F.col(names_col), i).alias("entity_a"),
                    y.alias("entity_b"),
                ),
            ),
        )
    )
    exploded = (
        docs.where(n >= 2)
        .select(F.col(doc_col).alias("doc"), F.explode(pair_structs).alias("p"))
        .select("doc", "p.entity_a", "p.entity_b")
    )
    aggs = [F.count(F.lit(1)).alias("co_occurrence_count")]
    if include_doc_ids:
        aggs.append(F.sort_array(F.collect_list(F.col("doc"))).alias("document_ids"))
    edges = (
        exploded.groupBy("entity_a", "entity_b")
        .agg(*aggs)
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
