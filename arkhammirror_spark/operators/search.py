"""Search & ranking operators — fully native Spark (no Python in the plan).

Reference lineage (arkham-shard-search):
- BM25: engines/keyword.py:14-125 — tokenizer = lowercase ``\\b\\w+\\b``,
  len>1, stopword set; Robertson–Spärck-Jones IDF
  log((N − n + 0.5)/(n + 0.5) + 1); k1=1.5, b=0.75; scores normalized so the
  best hit is 1.0 (keyword.py:334-338).
- Regex search + presets: engines/regex.py:13-73.
- Hybrid merge: engines/hybrid.py:13-81 — weighted sum of normalized
  semantic + keyword scores; weights by embedding dims
  (384→0.5, 768→0.6, ≥1024→0.7 semantic).
- Re-rankers: ranking.py:15-216 — exact-match boost, recency boost.

The reference BM25 runs a SQL LIKE prefilter then re-ranks in Python per row
(keyword.py:272-331); here the whole thing is one aggregation + join + column
arithmetic, so Catalyst keeps it in WholeStageCodegen and corpus statistics
become one shuffle instead of N queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BM25_K1 = 1.5
BM25_B = 0.75

STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "or", "that",
    "the", "to", "was", "were", "will", "with", "this", "they",
    "but", "have", "had", "what", "when", "where", "who", "which",
]

REGEX_PRESETS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone_us": r"\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "url": r"https?://[^\s<>\"]+",
    "credit_card": r"\b(?:\d[ -]?){13,16}\b",
}


def tokenize_col(text):
    """Tokenizer ≡ keyword.py:51-64: lowercase \\b\\w+\\b, len>1, no stopwords."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(r"\b\w+\b"), F.lit(0))
    return F.filter(
        toks,
        lambda t: (F.length(t) > 1) & ~t.isin(*STOPWORDS),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    normalize: bool = True,
) -> DataFrame:
    """BM25 over a document table for a fixed query; returns (id, score)."""
    toks = docs.select(
        F.col(id_col), tokenize_col(F.col(text_col)).alias("tokens")
    ).withColumn("doc_len", F.size("tokens").cast("double"))

    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avg_len")
    )

    terms = (
        toks.select(F.col(id_col), "doc_len", F.explode("tokens").alias("term"))
        .where(F.col("term").isin(*[t.lower() for t in query_terms]))
        .groupBy(id_col, "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    df_counts = terms.groupBy("term").agg(
        F.countDistinct(id_col).alias("doc_freq")
    )

    scored = (
        terms.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("doc_freq") + 0.5)
                / (F.col("doc_freq") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("doc_len") / F.col("avg_len"))
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("raw_score"))
    )
    if not normalize:
        return scored.select(id_col, F.col("raw_score").alias("score"))
    mx = scored.agg(F.max("raw_score").alias("mx"))
    return scored.crossJoin(F.broadcast(mx)).select(
        id_col,
        F.when(F.col("mx") > 0, F.col("raw_score") / F.col("mx"))
        .otherwise(0.0)
        .alias("score"),
    )


def regex_search(
    docs: DataFrame,
    pattern: str | None = None,
    preset: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All matches of a pattern/preset per document (engines/regex.py)."""
    if preset:
        pattern = REGEX_PRESETS[preset]
    if not pattern:
        raise ValueError("pattern or preset required")
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).alias("match_text"),
    )


def hybrid_weights(dimensions: int | None) -> tuple[float, float]:
    """(semantic_weight, keyword_weight) by embedding dims (hybrid.py:13-48)."""
    if dimensions is None:
        return 0.6, 0.4
    if dimensions <= 384:
        return 0.5, 0.5
    if dimensions <= 768:
        return 0.6, 0.4
    return 0.7, 0.3


def hybrid_merge(
    semantic: DataFrame,
    keyword: DataFrame,
    id_col: str = "doc_id",
    dimensions: int | None = None,
) -> DataFrame:
    """Weighted full-outer merge of (id, score) frames (hybrid.py:51-81)."""
    sw, kw = hybrid_weights(dimensions)
    s = semantic.select(F.col(id_col), F.col("score").alias("sem"))
    k = keyword.select(F.col(id_col), F.col("score").alias("kw"))
    return s.join(k, id_col, "full_outer").select(
        id_col,
        (
            F.coalesce(F.col("sem"), F.lit(0.0)) * sw
            + F.coalesce(F.col("kw"), F.lit(0.0)) * kw
        ).alias("hybrid_score"),
        F.coalesce(F.col("sem"), F.lit(0.0)).alias("semantic_score"),
        F.coalesce(F.col("kw"), F.lit(0.0)).alias("keyword_score"),
    )


def exact_match_boost(
    results: DataFrame, query: str, text_lookup: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    boost: float = 1.5, score_col: str = "score",
) -> DataFrame:
    """ranking.py exact-match booster: multiply score when the literal query
    string occurs in the document text."""
    hit = text_lookup.select(
        F.col(id_col),
        F.col(text_col).contains(query).alias("_exact"),
    )
    return (
        results.join(hit, id_col, "left")
        .withColumn(
            score_col,
            F.when(F.col("_exact"), F.col(score_col) * boost).otherwise(
                F.col(score_col)
            ),
        )
        .drop("_exact")
    )


def entity_boost(
    results: DataFrame,
    priority_entities: list[str],
    entities_col: str = "entities",
    score_col: str = "score",
    boost: float = 0.2,
) -> DataFrame:
    """ranking.py:45-77 rerank_by_entities: score ×= (1 + boost × matches)
    where matches = |priority ∩ result.entities| (set intersection)."""
    if not priority_entities:
        return results
    prio = F.array(*[F.lit(e) for e in sorted(set(priority_entities))])
    matches = F.size(F.array_intersect(F.array_distinct(F.col(entities_col)), prio))
    return results.withColumn(
        score_col,
        F.when(matches > 0, F.col(score_col) * (1.0 + boost * matches)).otherwise(
            F.col(score_col)
        ),
    )


def autocomplete(
    docs: DataFrame, prefix: str, col: str = "text", limit: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Prefix completion (keyword.py:346-378 LIKE 'prefix%'). `tiebreak_col`
    makes the LIMIT deterministic when completions collide (duplicate texts
    are planted by the corpus generator)."""
    order = [F.col(col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    return docs.where(F.col(col).startswith(prefix)).orderBy(*order).limit(limit)


def recency_boost(
    results: DataFrame,
    ts_col: str = "created_at",
    score_col: str = "score",
    decay_factor: float = 0.5,
) -> DataFrame:
    """ranking.py:85-123 recency reranker: recency = 1/(1 + age_days·0.1)
    against the newest result; score = score·(1−d) + recency·d. Rows with a
    null timestamp keep their score (the reference's `continue`)."""
    newest = results.agg(F.max(ts_col).alias("_newest"))
    age_days = F.datediff(F.col("_newest"), F.col(ts_col))
    rec = 1.0 / (1.0 + age_days * 0.1)
    return (
        results.crossJoin(F.broadcast(newest))
        .withColumn(
            score_col,
            F.when(
                F.col(ts_col).isNotNull(),
                F.col(score_col) * (1.0 - decay_factor) + rec * decay_factor,
            ).otherwise(F.col(score_col)),
        )
        .drop("_newest")
    )


def dedupe_results(
    results: DataFrame, by: str = "doc_id", score_col: str = "score",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ranking.py:125-160: keep the highest-scoring row per key."""
    from pyspark.sql.window import Window

    order = [F.desc(score_col)] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(by).orderBy(*order)
    return (
        results.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def diversify_by_source(
    results: DataFrame,
    source_col: str = "doc_id",
    score_col: str = "score",
    max_per_source: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ranking.py:189-216: cap results per source, keeping the best-scored.
    `tiebreak_col` makes the cut deterministic under score ties."""
    from pyspark.sql.window import Window

    order = [F.desc(score_col)] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        results.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_per_source)
        .drop("_rk")
    )
