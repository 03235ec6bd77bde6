"""Anomaly detection — z-score operators, fully native.

Reference lineage (arkham-shard-anomalies/detector.py):
- A1 content anomaly :64-137 — embedding distance vs corpus mean/std;
- A2 statistical anomaly :139-209 — per-metric corpus mean/std, flag
  |z| > threshold, confidence = min(1, z/5);
- A3 metadata anomaly :321-383 — same pattern on metadata numerics.

The reference computes corpus stats per request in Python; here it's one
groupBy().agg(avg, stddev) reused via broadcast join — the canonical Spark
two-pass pattern. stddev is sample stddev (numpy default in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zscore_anomalies(
    df: DataFrame,
    metrics: list[str],
    id_col: str = "doc_id",
    group_col: str | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose |z| exceeds threshold on any metric; one row per (id, metric)."""
    stacked = None
    for m in metrics:
        part = df.select(
            F.col(id_col),
            *( [F.col(group_col)] if group_col else [] ),
            F.lit(m).alias("metric"),
            F.col(m).cast("double").alias("value"),
        )
        stacked = part if stacked is None else stacked.unionAll(part)

    keys = ([group_col] if group_col else []) + ["metric"]
    stats = stacked.groupBy(*keys).agg(
        F.avg("value").alias("corpus_mean"),
        F.stddev_samp("value").alias("corpus_std"),
    )

    joined = stacked.join(F.broadcast(stats), keys)
    z = F.abs((F.col("value") - F.col("corpus_mean")) / F.col("corpus_std"))
    return (
        joined.where(F.col("corpus_std") > 0)
        .withColumn("z_score", z)
        .where(F.col("z_score") > threshold)
        .withColumn("confidence", F.least(F.lit(1.0), F.col("z_score") / 5.0))
        .withColumn(
            # _calculate_severity (detector.py:397-406): >= 2t critical,
            # >= 1.5t high, >= t medium, else low — emitted rows satisfy
            # z > t so the low branch never fires here, kept for parity
            "severity",
            F.when(F.col("z_score") >= 2 * threshold, "critical")
            .when(F.col("z_score") >= 1.5 * threshold, "high")
            .when(F.col("z_score") >= threshold, "medium")
            .otherwise("low"),
        )
    )


def text_stat_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """_calculate_text_stats (detector.py:384-395) as native columns:
    word_count (whitespace-run split, Python str.split semantics),
    sentence_count (period split, empties INCLUDED — len(text.split('.'))
    counts dots + 1), avg_word_length, avg_sentence_length
    (words/sentences), char_count."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0
    )
    word_count = F.size(words).cast("double")
    sentence_count = F.size(F.split(F.col(text_col), r"\.", -1)).cast(
        "double"
    )
    total_word_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    return docs.select(
        F.col(id_col),
        word_count.alias("word_count"),
        sentence_count.alias("sentence_count"),
        F.when(word_count > 0, total_word_len / word_count)
        .otherwise(F.lit(0.0)).alias("avg_word_length"),
        (word_count / sentence_count).alias("avg_sentence_length"),
        F.length(F.col(text_col)).cast("double").alias("char_count"),
    )


TEXT_STAT_METRICS = [
    "word_count", "sentence_count", "avg_word_length",
    "avg_sentence_length", "char_count",
]


def statistical_anomalies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 3.0,
) -> DataFrame:
    """detect_statistical_anomalies (detector.py:139-209) corpus-wide:
    the reference's exact five text stats z-scored against the corpus,
    severity per _calculate_severity."""
    return zscore_anomalies(
        text_stat_metrics(docs, id_col, text_col),
        TEXT_STAT_METRICS,
        id_col=id_col,
        threshold=threshold,
    )


def embedding_anomalies(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 3.0,
) -> DataFrame:
    """A1: distance from the corpus centroid, z-scored (detector.py:64-137).

    Centroid via element-wise avg (posexplode + groupBy(pos)); distance is a
    native zip_with/aggregate fold — no UDF.
    """
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    centroid = (
        v.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("c"))
        .orderBy("pos")
        .agg(F.collect_list("c").alias("centroid"))
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    with_dist = v.crossJoin(F.broadcast(centroid)).select(
        F.col(id_col), dist.alias("dist")
    )
    stats = with_dist.agg(
        F.avg("dist").alias("mean_d"), F.stddev_samp("dist").alias("std_d")
    )
    return (
        with_dist.crossJoin(F.broadcast(stats))
        .where(F.col("std_d") > 0)
        .withColumn("z_score", F.abs((F.col("dist") - F.col("mean_d")) / F.col("std_d")))
        .where(F.col("z_score") > threshold)
        .withColumn("confidence", F.least(F.lit(1.0), F.col("z_score") / 5.0))
        .select(id_col, "dist", "z_score", "confidence")
    )
