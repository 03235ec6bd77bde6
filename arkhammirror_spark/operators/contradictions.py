"""Contradiction detection (CD1) — native Spark restatement.

Reference lineage: arkham-shard-contradictions/detector.py —
candidate pairing by similarity (embedding cosine when available, else word
Jaccard, :147-176, :419-446) and heuristic verification (:272-334):
- negation patterns: (not,is) (no,yes) (never,always) ("did not",did) across
  the pair → DIRECT contradiction, confidence = similarity × 0.8;
- numeric mismatch: both claims contain numbers, the lists differ, and the
  number-masked texts have word-Jaccard > 0.7 → NUMERIC contradiction,
  confidence = similarity × 0.7.

The reference compares all O(n²) claim pairs in Python; here candidates are
generated with the same word-Jaccard via a shared-token join (scales with a
block/LSH swap — see operators.dedup) and verification is pure column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUM_RE = r"\b\d+(?:,\d{3})*(?:\.\d+)?\b"

NEGATION_PAIRS = [
    (r"\bnot\b", r"\bis\b"),
    (r"\bno\b", r"\byes\b"),
    (r"\bnever\b", r"\balways\b"),
    (r"\bdid not\b", r"\bdid\b"),
]


def _word_set(col):
    return F.array_distinct(
        F.filter(F.split(F.lower(col), r"\s+"), lambda w: F.length(w) > 0)
    )


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def candidate_claim_pairs(
    claims: DataFrame,
    id_col: str = "claim_id",
    text_col: str = "claim_text",
    threshold: float = 0.5,
) -> DataFrame:
    """Claim pairs with word-Jaccard ≥ threshold (the keyword candidate path,
    detector.py:432-446), via shared-token join instead of O(n²) scan."""
    toks = claims.select(
        F.col(id_col).alias("cid"),
        F.col(text_col).alias("ctext"),
        _word_set(F.col(text_col)).alias("ws"),
    )
    ex = toks.select("cid", F.explode("ws").alias("w"))
    shared = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.w") == F.col("b.w")) & (F.col("a.cid") < F.col("b.cid")))
        .groupBy(F.col("a.cid").alias("id_a"), F.col("b.cid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    a = toks.select(
        F.col("cid").alias("id_a"), F.col("ctext").alias("text_a"), F.size("ws").alias("sz_a")
    )
    b = toks.select(
        F.col("cid").alias("id_b"), F.col("ctext").alias("text_b"), F.size("ws").alias("sz_b")
    )
    return (
        shared.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "similarity",
            F.col("n_shared") / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")),
        )
        .where(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "text_a", "text_b", "similarity")
    )


def verify_contradictions(pairs: DataFrame) -> DataFrame:
    """Heuristic verification over candidate pairs (detector.py:272-334)."""
    ta = F.lower(F.col("text_a"))
    tb = F.lower(F.col("text_b"))

    # the reference scans ordered (doc_a claim, doc_b claim) pairs so its
    # check is one-directional (detector.py:290); our pairs are unordered
    # (id_a < id_b) so we take the symmetric closure
    negation = F.lit(False)
    for neg, pos in NEGATION_PAIRS:
        negation = negation | (ta.rlike(neg) & tb.rlike(pos)) | (
            tb.rlike(neg) & ta.rlike(pos)
        )

    nums_a = F.regexp_extract_all(ta, F.lit(_NUM_RE), F.lit(0))
    nums_b = F.regexp_extract_all(tb, F.lit(_NUM_RE), F.lit(0))
    masked_a = _word_set(F.regexp_replace(ta, _NUM_RE, "NUM"))
    masked_b = _word_set(F.regexp_replace(tb, _NUM_RE, "NUM"))
    numeric = (
        (F.size(nums_a) > 0)
        & (F.size(nums_b) > 0)
        & (nums_a != nums_b)
        & (_jaccard(masked_a, masked_b) > 0.7)
    )

    return (
        pairs.withColumn(
            "contradiction_type",
            F.when(negation, "direct").when(numeric, "numeric").otherwise(None),
        )
        .where(F.col("contradiction_type").isNotNull())
        .withColumn(
            "confidence",
            F.when(F.col("contradiction_type") == "direct", F.col("similarity") * 0.8)
            .otherwise(F.col("similarity") * 0.7),
        )
        .withColumn(
            "severity",
            F.when(F.col("contradiction_type") == "direct", "high").otherwise("medium"),
        )
    )


def detect_contradictions(
    claims: DataFrame,
    id_col: str = "claim_id",
    text_col: str = "claim_text",
    threshold: float = 0.5,
) -> DataFrame:
    return verify_contradictions(
        candidate_claim_pairs(claims, id_col, text_col, threshold)
    )
