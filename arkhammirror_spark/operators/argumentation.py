"""ACH matrix -> argumentation graph (Dung-style statuses) as DataFrame
algebra — re-expresses ArgumentationBuilder.build_from_ach_matrix and
_calculate_argument_status (arkham-shard-graph/argumentation.py:97-260)
over a whole CORPUS of matrices in one keyed pass (the reference builds
one matrix at a time in driver Python).

Numeric discipline: rating confidence arrives as centi ints, so
net_score = sum(strength * confidence) is an exact BIGINT in centi
units with one final float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .ach import rating_score_col


def argument_edges(ratings: DataFrame) -> DataFrame:
    """Ratings -> support/attack/neutral edges (argumentation.py:165-195):
    N/A ratings are skipped (no relationship); strength is the rating
    score; edge_type by sign. Input: (matrix_id, hypothesis_id,
    evidence_id, rating, conf_centi)."""
    strength = rating_score_col(F.col("rating"))
    edge_type = (
        F.when(strength > 0, "supports")
        .when(strength < 0, "attacks")
        .otherwise(F.lit("neutral"))
    )
    return ratings.where(F.col("rating") != "N/A").select(
        "matrix_id",
        F.concat(F.lit("ev_"), F.col("evidence_id")).alias("source"),
        F.concat(F.lit("hyp_"), F.col("hypothesis_id")).alias("target"),
        edge_type.alias("edge_type"),
        strength.cast("double").alias("strength"),
        F.col("rating").alias("rating_value"),
        (F.col("conf_centi").cast("double") / F.lit(100.0)).alias(
            "confidence"
        ),
    )


def hypothesis_nodes(
    hypotheses: DataFrame, scores: DataFrame
) -> DataFrame:
    """Hypothesis nodes with score annotations (argumentation.py:135-150):
    confidence = normalized score, is_lead = rank-1 hypothesis.
    hypotheses: (matrix_id, hypothesis_id, title); scores: ach_scores
    output."""
    lead = Window.partitionBy("matrix_id")
    s = scores.select(
        "matrix_id", "hypothesis_id", "normalized_score",
        "consistency_score", "rank",
    ).withColumn("min_rank", F.min("rank").over(lead))
    return (
        hypotheses.join(s, ["matrix_id", "hypothesis_id"], "left")
        .select(
            "matrix_id",
            F.concat(F.lit("hyp_"), F.col("hypothesis_id")).alias(
                "node_id"
            ),
            F.lit("hypothesis").alias("node_type"),
            F.col("title").alias("label"),
            F.col("normalized_score").alias("confidence"),
            "consistency_score",
            "rank",
            # a hypothesis absent from the scores frame (no ratings at
            # all) is never the lead — the reference's lookup default
            F.coalesce(
                F.col("rank") == F.col("min_rank"), F.lit(False)
            ).alias("is_lead"),
        )
    )


def evidence_nodes(evidence: DataFrame) -> DataFrame:
    """Evidence nodes (argumentation.py:152-163): label is the
    description truncated to 100 chars with an ellipsis when longer.
    evidence: (matrix_id, evidence_id, description, evidence_type,
    source, cred_centi)."""
    d = F.col("description")
    label = F.when(
        F.length(d) > 100, F.concat(F.substring(d, 1, 100), F.lit("..."))
    ).otherwise(d)
    return evidence.select(
        "matrix_id",
        F.concat(F.lit("ev_"), F.col("evidence_id")).alias("node_id"),
        F.lit("evidence").alias("node_type"),
        label.alias("label"),
        (F.col("cred_centi").cast("double") / F.lit(100.0)).alias(
            "credibility"
        ),
        "evidence_type",
        "source",
    )


def argument_statuses(ratings: DataFrame) -> DataFrame:
    """_calculate_argument_status (argumentation.py:210-260) per
    hypothesis: support/attack edge counts (neutral edges count toward
    NEITHER tally nor the net score), net = sum(strength * confidence)
    over support+attack edges, then the acceptance ladder — pure attacks
    absent + any support -> accepted; pure supports absent + any attack
    -> rejected; else by net score vs +/-1; else undecided. Hypotheses
    with only neutral (or no) edges land in `undecided` with zero
    counts, exactly like the reference loop."""
    strength = rating_score_col(F.col("rating"))
    applicable = (F.col("rating") != "N/A") & (strength != 0)
    agg = ratings.groupBy("matrix_id", "hypothesis_id").agg(
        F.sum(
            F.when(applicable & (strength > 0), 1).otherwise(0)
        ).alias("support_count"),
        F.sum(
            F.when(applicable & (strength < 0), 1).otherwise(0)
        ).alias("attack_count"),
        F.sum(
            F.when(
                applicable, strength * F.col("conf_centi")
            ).otherwise(F.lit(0))
        ).alias("net_centi"),
    )
    net = F.col("net_centi").cast("double") / F.lit(100.0)
    status = (
        F.when(
            (F.col("attack_count") == 0) & (F.col("support_count") > 0),
            "accepted",
        )
        .when(
            (F.col("support_count") == 0) & (F.col("attack_count") > 0),
            "rejected",
        )
        .when(net > 1.0, "accepted")
        .when(net < -1.0, "rejected")
        .otherwise(F.lit("undecided"))
    )
    return agg.select(
        "matrix_id",
        F.concat(F.lit("hyp_"), F.col("hypothesis_id")).alias("node_id"),
        status.alias("status"),
        "support_count",
        "attack_count",
        net.alias("net_score"),
    )
