"""Entity linking + canonical merge.

Reference lineage:
- E12 linker (arkham-shard-parse/linkers/entity_linker.py:30-147): exact
  match → fuzzy (a stub returning no-match in the reference) → create-new.
  Spark restatement: one left join per strategy, confidence 1.0 for exact;
  the fuzzy tier is implemented (Levenshtein ≤ 2 on lowercase, best match by
  smallest distance then name) as the documented extension point the
  reference left open ("In production: Use Levenshtein distance").
- merge_canonicals (arkham-frame/services/entities.py:899-959): relink
  mentions of merged entities and union alias arrays → groupBy + array_union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def link_mentions(
    mentions: DataFrame,
    canonical: DataFrame,
    mention_text: str = "text",
    canon_name: str = "name_lower",
    canon_id: str = "canonical_id",
    fuzzy_max_dist: int = 2,
) -> DataFrame:
    """Attach (canonical_id, link_confidence, link_reason) to each mention."""
    m = mentions.withColumn("_mlow", F.lower(F.col(mention_text)))
    c = canonical.select(
        F.col(canon_name).alias("_clow"), F.col(canon_id).alias("_cid")
    )

    exact = m.join(F.broadcast(c), m["_mlow"] == c["_clow"], "left").select(
        *mentions.columns,
        F.col("_mlow"),
        F.col("_cid").alias("_exact_id"),
    )

    unmatched = exact.where(F.col("_exact_id").isNull()).drop("_exact_id")
    matched = exact.where(F.col("_exact_id").isNotNull()).select(
        *mentions.columns,
        F.col("_exact_id").alias("canonical_id"),
        F.lit(1.0).alias("link_confidence"),
        F.lit("exact_match").alias("link_reason"),
    )

    fz = unmatched.join(
        F.broadcast(c),
        F.levenshtein(F.col("_mlow"), F.col("_clow")) <= fuzzy_max_dist,
        "left",
    ).withColumn("_dist", F.levenshtein(F.col("_mlow"), F.col("_clow")))
    w = Window.partitionBy(*[F.col(x) for x in mentions.columns]).orderBy(
        F.asc_nulls_last("_dist"), F.asc("_clow")
    )
    fuzzy = (
        fz.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            *mentions.columns,
            F.col("_cid").alias("canonical_id"),
            F.when(F.col("_cid").isNotNull(), 1.0 - F.col("_dist") / 10.0)
            .otherwise(0.0)
            .alias("link_confidence"),
            F.when(F.col("_cid").isNotNull(), "fuzzy_match")
            .otherwise("no_match")
            .alias("link_reason"),
        )
    )
    return matched.unionByName(fuzzy)


def merge_canonicals(canonical: DataFrame) -> DataFrame:
    """Merge canonical entities sharing (lower(name), entity_type): union
    aliases, sum mention counts (entities.py:899-959 semantics)."""
    return (
        canonical.groupBy(
            F.lower(F.col("name")).alias("name_lower"), F.col("entity_type")
        )
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(F.col("aliases"))))
            ).alias("aliases"),
            F.sum("mention_count").alias("mention_count"),
            F.min("canonical_id").alias("canonical_id"),
        )
    )
