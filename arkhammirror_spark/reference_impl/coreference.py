"""Heuristic coreference resolution.

Byte-identical to arkham-shard-parse/arkham_shard_parse/linkers/
coreference.py:35-114: scan whitespace words left→right; personal pronouns
(he/him/his/she/her) resolve to the last seen PERSON entity, it/its to the
last ORG/GPE; "last seen" is updated by the (quirky) reference containment
check — an entity counts as seen at word i when every one of its words is in
the window words[i:i+len(entity_words)]. Resolutions are keyed by the raw
word token (punctuation kept), so a later identical pronoun overwrites the
earlier resolution — exactly as the reference dict does.
"""

from __future__ import annotations

PERSONAL_PRONOUNS = {"he", "him", "his", "she", "her"}
ORG_PRONOUNS = {"it", "its"}


def resolve_coreferences(text: str, mentions: list[dict]) -> dict[str, str]:
    """mentions: dicts with text + entity_type; returns {pronoun_token: entity_text}."""
    resolutions: dict[str, str] = {}
    words = text.split()
    last_person: dict | None = None
    last_org: dict | None = None

    for i, word in enumerate(words):
        wl = word.lower().strip(".,;:!?")
        if wl in PERSONAL_PRONOUNS:
            if last_person:
                resolutions[word] = last_person["text"]
        elif wl in ORG_PRONOUNS:
            if last_org:
                resolutions[word] = last_org["text"]

        for m in mentions:
            ew = m["text"].split()
            if all(w in words[i : i + len(ew)] for w in ew):
                if m["entity_type"] in ("PERSON",):
                    last_person = m
                elif m["entity_type"] in ("ORG", "GPE"):
                    last_org = m
    return resolutions


def coreference_chains(mentions: list[dict]) -> list[list[str]]:
    """Chains = lowercase-grouped mention texts (coreference.py:84-114)."""
    groups: dict[str, list[str]] = {}
    for m in mentions:
        groups.setdefault(m["text"].lower(), []).append(m["text"])
    return list(groups.values())
