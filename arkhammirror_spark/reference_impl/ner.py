"""Deterministic mock NER — the reference's spaCy-free extraction path.

Byte-identical to arkham-shard-parse/arkham_shard_parse/extractors/ner.py:94-143
(`_mock_extract`): scan whitespace-split words left to right; a run starts at a
word whose first char is uppercase AND whose length is >1; the run extends
through every following word whose first char is uppercase (any length); the
entity text joins the raw words (punctuation kept) with single spaces. Each
mention has entity_type PERSON, confidence 0.5, and start/end char 0 (the
reference does not compute offsets on this path).
"""

from __future__ import annotations


def mock_ner(text: str) -> list[dict]:
    """Return mention dicts: text, entity_type, start_char, end_char, confidence."""
    mentions: list[dict] = []
    words = text.split()
    i = 0
    n = len(words)
    while i < n:
        w = words[i]
        if w and w[0].isupper() and len(w) > 1:
            parts = [w]
            j = i + 1
            while j < n and words[j] and words[j][0].isupper():
                parts.append(words[j])
                j += 1
            mentions.append(
                {
                    "text": " ".join(parts),
                    "entity_type": "PERSON",
                    "start_char": 0,
                    "end_char": 0,
                    "confidence": 0.5,
                }
            )
            i = j
        else:
            i += 1
    return mentions
