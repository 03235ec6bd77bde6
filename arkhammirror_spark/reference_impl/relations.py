"""Entity-pair relation extraction.

Byte-identical to arkham-shard-parse/arkham_shard_parse/extractors/relations.py:
all ordered pairs (i < j) of the mention list are tested; the text strictly
between the two spans is matched (case-folded substring containment) against
six pattern families (confidence 0.75); otherwise a co-occurrence relation is
emitted when the span distance is ≤ 150 chars with confidence
max(0.3, 0.5 − distance/500).

Note the reference's exact arithmetic (relations.py:108-142): when spans are
degenerate/overlapping (start ≥ end — always true on the mock-NER path where
offsets are 0), distance = |start1 − start2| and the evidence string is
"Entities within {d} chars"; otherwise distance = end − start over the
between-text window.
"""

from __future__ import annotations

CO_OCCURRENCE_DISTANCE = 150

RELATION_PATTERNS: dict[str, list[str]] = {
    "employment": [
        "works for", "worked for", "employed by",
        "employee of", "CEO of", "founder of",
        "president of", "director of", "manager of",
    ],
    "ownership": [
        "owns", "owned by", "acquired",
        "purchased", "bought", "sold to",
    ],
    "association": [
        "member of", "part of", "partner of",
        "affiliated with", "associated with",
    ],
    "location": [
        "based in", "located in", "headquartered in",
        "office in", "resides in", "from",
    ],
    "transaction": [
        "paid", "received", "transferred",
        "sent to", "received from",
    ],
    "communication": [
        "contacted", "called", "emailed",
        "met with", "spoke with",
    ],
}


def _pair_relation(text: str, m1: dict, m2: dict) -> dict | None:
    lo = min(m1["end_char"], m2["end_char"])
    hi = max(m1["start_char"], m2["start_char"])

    if lo >= hi or lo < 0 or hi > len(text):
        gap = abs(m1["start_char"] - m2["start_char"])
        if gap <= CO_OCCURRENCE_DISTANCE:
            return {
                "type": "co_occurrence",
                "confidence": max(0.3, 0.5 - gap / 500),
                "evidence": f"Entities within {gap} chars",
            }
        return None

    between = text[lo:hi].lower()
    gap = hi - lo

    for rel_type, needles in RELATION_PATTERNS.items():
        for needle in needles:
            if needle in between:
                return {
                    "type": rel_type,
                    "confidence": 0.75,
                    "evidence": between.strip()[:200],
                }

    if gap <= CO_OCCURRENCE_DISTANCE:
        return {
            "type": "co_occurrence",
            "confidence": max(0.3, 0.5 - gap / 500),
            "evidence": between.strip()[:200] or f"Entities within {gap} chars",
        }
    return None


def extract_relations(text: str, mentions: list[dict]) -> list[dict]:
    """Relation dicts: source_text, target_text, relation_type, confidence, evidence."""
    rels: list[dict] = []
    for i, m1 in enumerate(mentions):
        for m2 in mentions[i + 1 :]:
            hit = _pair_relation(text, m1, m2)
            if hit:
                rels.append(
                    {
                        "source_text": m1["text"],
                        "target_text": m2["text"],
                        "relation_type": hit["type"],
                        "confidence": hit["confidence"],
                        "evidence": hit.get("evidence"),
                    }
                )
    return rels
