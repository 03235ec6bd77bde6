"""Timeline merging (T3) — semantics-identical to arkham-shard-timeline/
arkham_shard_timeline/merging.py (chronological :99, deduplicated :117,
consolidated :156, source-priority :204, duplicate/similar predicates
:258-329, group consolidation :331-389).

Events are plain dicts: {id, document_id, text, date_start (datetime or
date), date_end (optional), confidence (float), entities (list[str])}.
The sequential replace-in-place dedup and first-matching-group consolidation
are order-dependent; tests/test_timeline_merge.py fuzzes this module against
the ACTUAL reference class loaded by file path.
"""

from __future__ import annotations


def _days_diff(a, b) -> int:
    return abs((a - b).days)


def are_duplicates(e1: dict, e2: dict) -> bool:
    """Same date ±1 day, overlapping entities (when both have any), word
    Jaccard > 0.7 (merging.py:258-290)."""
    if _days_diff(e1["date_start"], e2["date_start"]) > 1:
        return False
    if e1.get("entities") and e2.get("entities"):
        if not set(e1["entities"]) & set(e2["entities"]):
            return False
    w1 = set(e1["text"].lower().split())
    w2 = set(e2["text"].lower().split())
    if not w1 or not w2:
        return False
    union = len(w1 | w2)
    return (len(w1 & w2) / union if union else 0) > 0.7


def are_similar(e1: dict, e2: dict) -> bool:
    """Date ±7 days AND (entity overlap OR >30% overlap-over-min words)
    (merging.py:292-329)."""
    if _days_diff(e1["date_start"], e2["date_start"]) > 7:
        return False
    if e1.get("entities") and e2.get("entities"):
        if set(e1["entities"]) & set(e2["entities"]):
            return True
    w1 = set(e1["text"].lower().split())
    w2 = set(e2["text"].lower().split())
    if not w1 or not w2:
        return False
    smaller = min(len(w1), len(w2))
    return (len(w1 & w2) / smaller if smaller else 0) > 0.3


def merge_chronological(events: list[dict]) -> list[dict]:
    return sorted(events, key=lambda e: e["date_start"])


def merge_deduplicated(events: list[dict]) -> tuple[list[dict], int]:
    """Sequential scan over the chronological order; a duplicate replaces the
    kept copy in place when its confidence is strictly higher."""
    kept: list[dict] = []
    removed = 0
    for ev in sorted(events, key=lambda e: e["date_start"]):
        dup_of = None
        for existing in kept:
            if are_duplicates(ev, existing):
                dup_of = existing
                break
        if dup_of is None:
            kept.append(ev)
        else:
            removed += 1
            if ev["confidence"] > dup_of["confidence"]:
                kept[kept.index(dup_of)] = ev
    return kept, removed


def consolidate_group(group: list[dict]) -> dict:
    """Composite event: earliest-date primary, max confidence, union of
    entities, first 3 unique texts joined with ' | ' (merging.py:331-389)."""
    ordered = sorted(group, key=lambda e: e["date_start"])
    primary = ordered[0]
    entities: set[str] = set()
    for ev in group:
        entities.update(ev.get("entities") or [])
    texts: list[str] = []
    for ev in ordered:
        if ev["text"] not in texts:
            texts.append(ev["text"])
        if len(texts) >= 3:
            break
    return {
        "id": primary["id"],
        "document_id": primary["document_id"],
        "text": " | ".join(texts),
        "date_start": primary["date_start"],
        "date_end": primary.get("date_end"),
        "confidence": max(ev["confidence"] for ev in group),
        "entities": list(entities),
        "consolidated": True,
        "source_count": len(group),
    }


def merge_consolidated(events: list[dict]) -> tuple[list[dict], int]:
    """Dedup, then greedy first-matching-group clustering by similarity,
    then per-group consolidation, chronologically sorted."""
    deduped, _dups = merge_deduplicated(events)
    groups: list[list[dict]] = []
    merged = 0
    for ev in deduped:
        placed = False
        for group in groups:
            if any(are_similar(ev, other) for other in group):
                group.append(ev)
                placed = True
                merged += 1
                break
        if not placed:
            groups.append([ev])
    out = [g[0] if len(g) == 1 else consolidate_group(g) for g in groups]
    return sorted(out, key=lambda e: e["date_start"]), merged


def merge_source_priority(
    events: list[dict], priority_docs: list[str]
) -> list[dict]:
    """Sort by (date, priority desc); dedup keeping the higher-priority copy
    (replace in place, merging.py:204-256)."""
    ranked = []
    for ev in events:
        if ev["document_id"] in priority_docs:
            pri = len(priority_docs) - priority_docs.index(ev["document_id"])
        else:
            pri = 0
        ranked.append((pri, ev))
    ranked.sort(key=lambda pe: (pe[1]["date_start"], -pe[0]))

    kept: list[tuple[int, dict]] = []
    for pri, ev in ranked:
        dup_idx = None
        for i, (kpri, kev) in enumerate(kept):
            if are_duplicates(ev, kev):
                dup_idx = i
                break
        if dup_idx is None:
            kept.append((pri, ev))
        elif pri > kept[dup_idx][0]:
            kept[dup_idx] = (pri, ev)
    return [ev for _pri, ev in kept]


def date_range(events: list[dict]) -> tuple | None:
    """(earliest start, latest of starts+ends) — merging.py:391-417."""
    if not events:
        return None
    earliest = min(ev["date_start"] for ev in events)
    latest_candidates = [ev["date_start"] for ev in events]
    for ev in events:
        if ev.get("date_end"):
            latest_candidates.append(ev["date_end"])
    return earliest, max(latest_candidates)
