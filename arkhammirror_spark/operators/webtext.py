"""The composed training-data preparation chain for web pages.

One call wires the whole webtext lane in the canonical RefinedWeb-style
order, each stage an operator this repo already gates individually:

1. URL dedup      — canonicalize (operators.urls) and keep one page per
                    canonical url (deterministic min-raw-url keeper);
2. main content   — flattened-DOM density scoring (operators.boilerplate);
3. quality gate   — the seven Gopher rules (operators.quality);
4. exact dedup    — sha256 checksum, min-url keeper (operators.dedup);
5. fuzzy dedup    — MinHash-LSH verified Jaccard ≥ threshold; every pair
                    (a < b) drops b, keeping each duplicate cluster's
                    smallest url (greedy — a chain a~b, b~c keeps only a;
                    the conservative choice for training data, where
                    over-dropping beats duplicate leakage);
6. line dedup     — corpus-wide duplicated-line removal (keep-first).

Exact dedup runs BEFORE line dedup deliberately: removing a shared line
from all-but-one copy would make byte-identical documents differ and
hide them from the checksum stage.

Every stage is individually driver-gated with its own DuckDB oracle; the
composition itself is pinned end-to-end by the `webtext_prep` fixture
query (deterministic pages → pinned output hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def prepare_webtext_corpus(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_words: int = 50,
    jaccard_threshold: float = 0.8,
    min_content_chars: int = 25,
    line_dedup_min_chars: int = 10,
    neardup_bucket_cap: int = 5000,
) -> DataFrame:
    """pages(url, html) → (url, text): the cleaned, deduplicated corpus.

    `neardup_bucket_cap` forwards to the MinHash-LSH hot-bucket guard
    (bounded near-dup recall in pathological boilerplate clusters;
    None disables)."""
    from .boilerplate import extract_main_content
    from .dedup import dedup_lines, verified_neardup_pairs
    from .quality import gopher_quality
    from .urls import dedup_canonical_urls

    # 1. one page per canonical url
    keepers = dedup_canonical_urls(pages, url_col).select(
        F.col("keeper_url").alias(url_col)
    )
    pages1 = pages.join(keepers, url_col)

    # 2. boilerplate-stripped main text — checkpointed ONCE: four
    # downstream branches (quality join, checksum join, near-dup chain,
    # line dedup) would otherwise re-run the DOM flatten + scoring through
    # their join lineage (the measured shingle-recompute lesson). This is a
    # SLIM frame by construction — exactly the two columns every stage
    # consumes, so there is no pruning opportunity a write-then-read would
    # add; at cluster scale swap for a storage checkpoint of the same
    # two-column table.
    mc = extract_main_content(
        pages1, url_col, html_col, min_chars=min_content_chars
    )
    docs = mc.select(F.col("url"), F.col("main_text").alias("text")).localCheckpoint(
        eager=True
    )

    # 3. Gopher quality gate
    q = gopher_quality(docs, id_col="url", text_col="text", min_words=min_words)
    good = docs.join(q.where(F.col("passes")).select("url"), "url")

    # 4. exact checksum dedup (min-url keeper)
    exact_keep = good.groupBy(F.sha2(F.col("text"), 256).alias("_ck")).agg(
        F.min("url").alias("url")
    )
    uniq = good.join(exact_keep.select("url"), "url")

    # 5. MinHash-LSH near-dup: drop the larger url of every verified pair
    pairs = verified_neardup_pairs(
        uniq, id_col="url", text_col="text", threshold=jaccard_threshold,
        bucket_cap=neardup_bucket_cap,
    )
    dropped = pairs.select(F.col("id_b").alias("url")).distinct()
    survivors = uniq.join(dropped, "url", "left_anti")

    # 6. corpus-level line dedup over the survivors
    return dedup_lines(
        survivors, id_col="url", text_col="text", min_chars=line_dedup_min_chars
    )
