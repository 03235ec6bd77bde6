"""Rule-based claim extraction.

Byte-identical to arkham-shard-claims/arkham_shard_claims/shard.py:300-374
(`_extract_claims_simple`): split on `(?<=[.!?])\\s+(?=[A-Z])`, strip, keep
sentences with ≥5 whitespace words that don't end with '?' and don't start
with '-', '*' or '#'; truncate to 1000 chars; cap at 100 claims per document;
confidence 0.5.
"""

from __future__ import annotations

import re

_CLAIM_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z])")
MAX_CLAIMS_PER_DOC = 100


def extract_claims(text: str) -> list[dict]:
    """Claim dicts: text, confidence."""
    claims: list[dict] = []
    for sentence in _CLAIM_SPLIT_RE.split(text):
        sentence = sentence.strip()
        if not sentence:
            continue
        if len(sentence.split()) < 5:
            continue
        if sentence.rstrip().endswith("?"):
            continue
        if sentence.startswith("-") or sentence.startswith("*") or sentence.startswith("#"):
            continue
        claims.append({"text": sentence[:1000], "confidence": 0.5})
        if len(claims) >= MAX_CLAIMS_PER_DOC:
            break
    return claims
