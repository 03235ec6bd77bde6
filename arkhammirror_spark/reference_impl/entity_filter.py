"""Entity noise filter.

Byte-identical to arkham-shard-entities/arkham_shard_entities/shard.py:323-433
(`_is_valid_entity`): length gates, garbage regexes (numbers/ratios/times/
decimals/percent/currency/1-2 chars/ordinals), a stop/noise word set,
single-word gates (≥3 chars, not all digits, not a generic term for
PERSON/ORG/GPE/ORGANIZATION), and an alphabetic-ratio ≥ 0.5 requirement.
"""

from __future__ import annotations

import functools
import re

MIN_ENTITY_LENGTH = 2
MAX_ENTITY_LENGTH = 200
MIN_SINGLE_WORD_LENGTH = 3

GARBAGE_RES = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"^\d+$",
        r"^\d+/\d+$",
        r"^\d+:\d+$",
        r"^\d+[.,]\d+$",
        r"^\d+%$",
        r"^[$]\d+",
        r"^\d+[$]",
        r"^.{1,2}$",
        r"^\d+(st|nd|rd|th)$",
    )
]

NOISE_WORDS = frozenset(
    {
        "the", "a", "an", "and", "or", "but", "if", "then",
        "is", "are", "was", "were", "be", "been", "being",
        "this", "that", "these", "those", "it", "its",
        "he", "she", "they", "we", "you", "i", "my", "your", "his", "her",
        "what", "which", "who", "whom", "whose", "when", "where", "why", "how",
        "all", "any", "both", "each", "few", "more", "most", "other",
        "some", "such", "no", "nor", "not", "only",
        "today", "tomorrow", "yesterday", "now", "then", "soon", "later",
        "always", "never",
        "monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday",
        "january", "february", "march", "april", "may", "june",
        "july", "august", "september", "october", "november", "december",
        "first", "second", "third", "fourth", "fifth",
        "sixth", "seventh", "eighth", "ninth", "tenth",
        "etc", "vs", "mr", "mrs", "ms", "dr", "jr", "sr", "inc", "llc", "ltd", "corp",
    }
)

GENERIC_TERMS = frozenset(
    {
        "company", "group", "team", "organization", "department",
        "person", "individual", "someone", "anyone", "everyone",
        "city", "town", "country", "state", "place", "location",
        "office", "building", "center", "centre", "area", "region",
    }
)

_GENERIC_TYPES = ("PERSON", "ORG", "GPE", "ORGANIZATION")


@functools.lru_cache(maxsize=1 << 16)
def is_valid_entity(entity_text: str, entity_type: str) -> bool:
    """True when the mention text is worth keeping as an entity.

    Pure function of its arguments; memoized because mention texts repeat
    heavily across a corpus (output unchanged)."""
    if len(entity_text) < MIN_ENTITY_LENGTH or len(entity_text) > MAX_ENTITY_LENGTH:
        return False

    text_lower = entity_text.lower().strip()

    for rx in GARBAGE_RES:
        if rx.match(text_lower):
            return False

    if text_lower in NOISE_WORDS:
        return False

    words = entity_text.split()
    if len(words) == 1:
        if len(entity_text) < MIN_SINGLE_WORD_LENGTH:
            return False
        if entity_text.isdigit():
            return False
        if entity_type in _GENERIC_TYPES and text_lower in GENERIC_TERMS:
            return False

    alpha = sum(1 for c in entity_text if c.isalpha())
    if alpha == 0 or (alpha / len(entity_text)) < 0.5:
        return False

    return True
