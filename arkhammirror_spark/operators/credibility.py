"""Credibility scoring — the deterministic math of the reference's
credibility shard as Catalyst column arithmetic (the LLM checklist-filling
path is out of scope per SURVEY; the scoring itself is pure math).

Reference semantics:
- factor-weighted assessment score: shard.py:641-646
  (int(sum(score*weight)/sum(weight))) with the level thresholds of
  models.py:100-112 (<=20 unreliable / <=40 low / <=60 medium / <=80 high /
  else verified).
- deception checklist score: models.py:354-391 — only ASSESSED indicators
  (strength != none) count; strength map none/weak/moderate/strong/
  conclusive -> 0/25/50/75/100, each scaled by indicator confidence;
  int(total / (n_assessed*100) * 100).
- overall deception score: models.py:447-473 — completed checklists
  weighted MOM .35 / EVE .25 / MOSES .25 / POP .15, normalized over the
  completed subset, int(); risk thresholds models.py:475-486.

Numeric discipline: weights and confidences are carried as CENTI integers
(0-100) so every aggregation is an order-independent BIGINT sum; the only
float ops are the final divisions, written as the same IEEE expression on
both engines. int() truncation is floor for these non-negative scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# strength name -> 0-100 score (models.py:368-374)
STRENGTH_SCORES = {"none": 0, "weak": 25, "moderate": 50, "strong": 75,
                   "conclusive": 100}
# checklist weights in centi (models.py:449-454)
CHECKLIST_WEIGHTS_CENTI = {"mom": 35, "eve": 25, "moses": 25, "pop": 15}


def credibility_level(score_col):
    """models.py:100-112 thresholds."""
    return (
        F.when(score_col <= 20, "unreliable")
        .when(score_col <= 40, "low")
        .when(score_col <= 60, "medium")
        .when(score_col <= 80, "high")
        .otherwise("verified")
    )


def deception_risk_level(score_col):
    """models.py:475-486 thresholds."""
    return (
        F.when(score_col <= 20, "minimal")
        .when(score_col <= 40, "low")
        .when(score_col <= 60, "moderate")
        .when(score_col <= 80, "high")
        .otherwise("critical")
    )


def factor_weighted_scores(factors: DataFrame) -> DataFrame:
    """(source_id, factor_type, weight_centi, score) ->
    (source_id, cred_score, cred_level).

    int(sum(score*weight)/sum(weight)) with weights as centi ints: both
    sums are exact BIGINT, the division is one double op, floor == int()
    for non-negative scores (shard.py:641-646)."""
    agg = factors.groupBy("source_id").agg(
        F.sum(F.col("score") * F.col("weight_centi")).alias("wsum"),
        F.sum("weight_centi").alias("wtot"),
    )
    return agg.select(
        "source_id",
        F.expr("wsum div wtot").cast("int").alias("cred_score"),
    ).withColumn("cred_level", credibility_level(F.col("cred_score")))


def checklist_scores(indicators: DataFrame) -> DataFrame:
    """(source_id, checklist, strength_score 0-100, conf_centi 50-100) ->
    (source_id, checklist, score).

    models.py:354-391: assessed = strength_score > 0; total =
    sum(strength*conf); score = int(total / (n_assessed*100) * 100). With
    conf in centi the sum is BIGINT-exact; the float expression mirrors
    int((total/100) / (n*100) * 100) = floor(total_centi / (n*100)) for
    the non-negative case — computed as exact integer floor division so
    there is nothing to drift."""
    assessed = indicators.where(F.col("strength_score") > 0)
    agg = assessed.groupBy("source_id", "checklist").agg(
        F.sum(F.col("strength_score") * F.col("conf_centi")).alias("total_centi"),
        F.count(F.lit(1)).alias("n_assessed"),
    )
    return agg.select(
        "source_id",
        "checklist",
        F.expr("total_centi div (n_assessed * 100)").cast("int").alias("score"),
    )


def credibility_trend(assessments: DataFrame) -> DataFrame:
    """(source_id, seq, score) -> per-source history aggregate: the
    reference's get_credibility_history math (shard.py:560-592). seq 0 is
    the MOST RECENT assessment (the reference's list order).

    trend: with >= 3 assessments, recent = mean of seq 0-2, older = mean
    of the last 3 by seq; improving when recent > older + 10, declining
    when recent < older - 10, else volatile when the population variance
    of ALL scores exceeds 400, else stable (< 3 assessments -> stable).

    Numeric discipline: means compare via 3x-scaled integer sums (the
    +-10 thresholds become +-30 on sums — exact BIGINT, no float mean);
    the variance test n*sum(s^2) - (sum s)^2 > 400*n^2 is the float
    definition cleared of denominators — exact BIGINT again, so the
    DuckDB mirror cannot drift. Reported avg_score is one double division
    rounded to 6."""
    from pyspark.sql import Window

    w = Window.partitionBy("source_id")
    with_n = assessments.withColumn("_n", F.count(F.lit(1)).over(w))
    agg = with_n.groupBy("source_id").agg(
        F.max("_n").alias("n_assessments"),
        F.sum("score").alias("_s1"),
        F.sum(F.col("score") * F.col("score")).alias("_s2"),
        F.sum(F.when(F.col("seq") <= 2, F.col("score")).otherwise(0)).alias(
            "_recent3"
        ),
        F.sum(
            F.when(F.col("seq") >= F.col("_n") - 3, F.col("score")).otherwise(0)
        ).alias("_older3"),
        F.max(F.when(F.col("seq") == 0, F.col("score"))).alias("latest_score"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )
    n = F.col("n_assessments")
    var_num = n * F.col("_s2") - F.col("_s1") * F.col("_s1")  # n^2 * variance
    trend = F.when(n < 3, "stable").otherwise(
        F.when(F.col("_recent3") > F.col("_older3") + 30, "improving")
        .when(F.col("_recent3") < F.col("_older3") - 30, "declining")
        .when(var_num > 400 * n * n, "volatile")
        .otherwise("stable")
    )
    return agg.select(
        "source_id",
        "n_assessments",
        F.round(F.col("_s1").cast("double") / n.cast("double"), 6).alias(
            "avg_score"
        ),
        "latest_score",
        "min_score",
        "max_score",
        trend.alias("score_trend"),
    )


def deception_overall(per_checklist: DataFrame) -> DataFrame:
    """(source_id, checklist in {mom,pop,moses,eve}, score) ->
    (source_id, deception_score, risk_level).

    models.py:447-473 with all four checklists completed: weighted sum in
    centi weights is BIGINT-exact; overall = int(weighted/100) = integer
    floor division."""
    w = CHECKLIST_WEIGHTS_CENTI
    weight_col = (
        F.when(F.col("checklist") == "mom", w["mom"])
        .when(F.col("checklist") == "eve", w["eve"])
        .when(F.col("checklist") == "moses", w["moses"])
        .otherwise(w["pop"])
    )
    agg = per_checklist.groupBy("source_id").agg(
        F.sum(weight_col * F.col("score")).alias("wsum"),
        F.sum(weight_col).alias("wtot"),
    )
    return agg.select(
        "source_id",
        F.expr("wsum div wtot").cast("int").alias("deception_score"),
    ).withColumn("risk_level", deception_risk_level(F.col("deception_score")))
