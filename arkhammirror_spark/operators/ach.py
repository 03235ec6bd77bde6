"""ACH (Analysis of Competing Hypotheses) consistency-matrix scoring as a
groupBy + window — the reference computes it per matrix in driver Python
(arkham-shard-ach/arkham_shard_ach/scoring.py:20-129); here the ratings
table scores EVERY matrix in one pass, so a corpus of matrices scales like
any keyed aggregation.

Reference semantics (scoring.py + models.py):
- rating symbols ++/+/N/-/-- -> scores 2/1/0/-1/-2; N/A is skipped
  entirely (zero weight, models.py:33-48);
- inconsistency_count = count of '-' and '--' ratings (scoring.py:100-105);
- consistency_score = plain sum of rating scores (scoring.py:98);
- weighted_score = sum(score * evidence.credibility * evidence.relevance *
  rating.confidence) / sum(evidence.credibility * evidence.relevance)
  (scoring.py:107-114);
- normalized = ((weighted + 2) / 4) * 100, or 50 when nothing rated
  (scoring.py:112-119);
- rank: ascending inconsistency_count, then descending weighted_score
  (scoring.py:44-50); hypothesis id breaks residual ties deterministically
  (the reference relies on list order).

Numeric discipline: credibility / relevance / confidence arrive as CENTI
integers (0-100) so both aggregation sums are exact BIGINT; the two float
divisions are written as the same IEEE expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RATING_SCORES = {"++": 2, "+": 1, "N": 0, "-": -1, "--": -2}


def rating_score_col(rating_col):
    return (
        F.when(rating_col == "++", 2)
        .when(rating_col == "+", 1)
        .when(rating_col == "N", 0)
        .when(rating_col == "-", -1)
        .when(rating_col == "--", -2)
    )


def ach_scores(ratings: DataFrame) -> DataFrame:
    """(matrix_id, hypothesis_id, evidence_id, rating,
    cred_centi, rel_centi, conf_centi) ->
    (matrix_id, hypothesis_id, consistency_score, inconsistency_count,
    weighted_score, normalized_score, evidence_count, rank).

    evidence_count counts ALL ratings incl. N/A (scoring.py:127);
    everything else skips N/A rows."""
    from pyspark.sql import Window

    applicable = F.col("rating") != "N/A"
    score = rating_score_col(F.col("rating"))
    # numerator in 1e-6 units, denominator in 1e-4 units — both BIGINT
    num = F.when(
        applicable, score * F.col("cred_centi") * F.col("rel_centi") * F.col("conf_centi")
    ).otherwise(F.lit(0))
    den = F.when(
        applicable, F.col("cred_centi") * F.col("rel_centi")
    ).otherwise(F.lit(0))
    agg = ratings.groupBy("matrix_id", "hypothesis_id").agg(
        F.sum(F.when(applicable, score).otherwise(0)).alias("consistency_score"),
        F.sum(
            F.when(applicable & score.isin(-1, -2), 1).otherwise(0)
        ).alias("inconsistency_count"),
        F.sum(num).alias("wnum"),
        F.sum(den).alias("wden"),
        F.count(F.lit(1)).alias("evidence_count"),
    )
    weighted = F.when(
        F.col("wden") > 0,
        F.col("wnum").cast("double") / (F.col("wden").cast("double") * F.lit(100.0)),
    ).otherwise(F.lit(0.0))
    normalized = F.when(
        F.col("wden") > 0,
        (F.col("weighted_score") + F.lit(2.0)) / F.lit(4.0) * F.lit(100.0),
    ).otherwise(F.lit(50.0))
    scored = agg.withColumn("weighted_score", weighted).withColumn(
        "normalized_score", normalized
    )
    w = Window.partitionBy("matrix_id").orderBy(
        F.asc("inconsistency_count"), F.desc("weighted_score"),
        F.asc("hypothesis_id"),
    )
    return scored.withColumn("rank", F.row_number().over(w)).select(
        "matrix_id", "hypothesis_id", "consistency_score",
        "inconsistency_count", "weighted_score", "normalized_score",
        "evidence_count", "rank",
    )


def diagnosticity(ratings: DataFrame, min_variance: float = 0.5) -> DataFrame:
    """Evidence whose ratings VARY across hypotheses is diagnostic
    (scoring.py:131-182): population variance of the rating scores per
    evidence row, kept when > min_variance and rated against >= 2
    hypotheses. Returns (matrix_id, evidence_id, variance, mean_consistency,
    rating_count) — variance computed from exact integer sums
    (E[x^2] - E[x]^2 with one float division each)."""
    applicable = ratings.where(F.col("rating") != "N/A")
    score = rating_score_col(F.col("rating"))
    agg = applicable.groupBy("matrix_id", "evidence_id").agg(
        F.sum(score).alias("s1"),
        F.sum(score * score).alias("s2"),
        F.count(F.lit(1)).alias("rating_count"),
    ).where(F.col("rating_count") >= 2)
    n = F.col("rating_count").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    return (
        agg.select(
            "matrix_id",
            "evidence_id",
            var.alias("variance"),
            mean.alias("mean_consistency"),
            "rating_count",
        )
        .where(F.col("variance") > min_variance)
    )
