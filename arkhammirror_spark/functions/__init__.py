"""Public column-function surface: native expressions usable in any query.

These are the building blocks the operators compose — exported here so a
user of the engine can apply them to their own DataFrames (the equivalent of
the reference's scattered per-shard helper methods).
"""

from ..operators.entities import map_entity_type, valid_entity_col
from ..operators.search import tokenize_col
from ..operators.similarity import hyperplane_bucket
from ..pipeline import host_col

from pyspark.sql import Column, functions as F


def checksum_col(payload: Column) -> Column:
    """SHA-256 content checksum (intake.py:146-152 dedup key)."""
    return F.sha2(payload, 256)


def doc_fingerprint_col(text: Column, mod: int = 1_000_000_000_000_037) -> Column:
    """Polynomial rolling hash over characters (document fingerprinting)."""
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(mod),
    )


def word_count_col(text: Column) -> Column:
    """Python str.split() word count (\\S+ runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))).cast("long")


def letter_ratio_col(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^\p{L}]", "")) / F.length(text)


__all__ = [
    "map_entity_type",
    "valid_entity_col",
    "tokenize_col",
    "hyperplane_bucket",
    "host_col",
    "checksum_col",
    "doc_fingerprint_col",
    "word_count_col",
    "letter_ratio_col",
]
