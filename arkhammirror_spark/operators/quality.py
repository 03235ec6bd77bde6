"""Gopher-style document quality rules — fully native column math.

The standard web-corpus quality gate from Rae et al. 2021 ("Scaling
Language Models: ... Gopher", §A1.1 quality filtering), the filter family
every large-scale training-data pipeline applies after main-content
extraction. All seven rules compile to Catalyst expressions over one
split — no Python anywhere:

- word count within [min_words, max_words];
- mean word length within [3, 10];
- symbol-to-word ratio (# and ellipsis) ≤ 0.1;
- ≤ 90% of lines start with a bullet;
- ≤ 30% of lines end with an ellipsis;
- ≥ 80% of words contain at least one alphabetic character;
- at least 2 distinct required stop words present
  (the/be/to/of/and/that/have/with).

`gopher_quality` returns the per-rule measurements plus the combined
`passes` flag, so downstream consumers can re-threshold without a second
scan. Ratios are exact integer-count divisions (identical on any engine);
the one float mean is rounded at the comparison precision by callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOP_WORDS_REQUIRED = ["the", "be", "to", "of", "and", "that", "have", "with"]
BULLET_CHARS = ("•", "‣", "▪", "-", "*")


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = total_chars / F.greatest(n_words, F.lit(1)).cast("double")

    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(F.regexp_extract_all(text, F.lit(r"(\.\.\.|…)"), F.lit(0)))
    symbol_word_ratio = (n_hash + n_ellipsis) / F.greatest(
        n_words, F.lit(1)
    ).cast("double")

    lines = F.filter(F.split(text, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_rx = "^[\\s]*[" + "".join(BULLET_CHARS).replace("-", "\\-") + "]"
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(bullet_rx)))
    n_ell_end = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
    )
    bullet_line_frac = n_bullet / F.greatest(n_lines, F.lit(1)).cast("double")
    ellipsis_line_frac = n_ell_end / F.greatest(n_lines, F.lit(1)).cast("double")

    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_word_frac = n_alpha / F.greatest(n_words, F.lit(1)).cast("double")

    lowered = F.array_distinct(F.transform(words, F.lower))
    n_stop_hits = F.size(
        F.array_intersect(lowered, F.array(*[F.lit(s) for s in STOP_WORDS_REQUIRED]))
    )

    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        bullet_line_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        alpha_word_frac.alias("alpha_word_frac"),
        n_stop_hits.cast("long").alias("n_stop_hits"),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stop_hits") >= 2)
    )
    return out.withColumn("passes", passes)
