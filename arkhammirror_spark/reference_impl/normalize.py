"""Text normalization, language detection, and quality scoring.

Byte-identical to the reference LightWorker (the `cpu-light` pool):
- normalize_text   ≡ arkham-frame/arkham_frame/workers/light_worker.py:110-190
- detect_language  ≡ light_worker.py:231-296 (the deterministic fallback path;
  the langdetect path is model-dependent and out of the parity contract)
- assess_quality   ≡ light_worker.py:298-397
- shannon_entropy  ≡ light_worker.py:399-426
"""

from __future__ import annotations

import math
import re
import unicodedata
from collections import Counter

_SMART_PUNCT = (
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),
    ("—", "--"),
    ("…", "..."),
)

_MULTI_SPACE_RE = re.compile(r" {2,}")

# Per-character memo tables: the predicates below are pure functions of the
# character, and real corpora reuse a tiny alphabet, so caching removes the
# dominant per-char C-call/allocation cost without changing a single output
# byte (verified by the differential suite).
_KEEP_CACHE: dict[str, bool] = {}
_SCRIPT_CACHE: dict[str, int] = {}  # 0=not alpha, 1=latin, 2=cyr, 3=ar, 4=cjk, 5=other alpha
_CLS_CACHE: dict[str, int] = {}  # bit0 alpha, bit1 digit


def _keep_char(ch: str) -> bool:
    k = _KEEP_CACHE.get(ch)
    if k is None:
        k = unicodedata.category(ch)[0] != "C" or ch in "\n\t\r"
        _KEEP_CACHE[ch] = k
    return k


def _script_of(ch: str) -> int:
    s = _SCRIPT_CACHE.get(ch)
    if s is None:
        if not ch.isalpha():
            s = 0
        else:
            cp = ord(ch)
            if (0x0041 <= cp <= 0x007A) or (0x00C0 <= cp <= 0x024F):
                s = 1
            elif 0x0400 <= cp <= 0x04FF:
                s = 2
            elif 0x0600 <= cp <= 0x06FF:
                s = 3
            elif (0x4E00 <= cp <= 0x9FFF) or (0x3040 <= cp <= 0x30FF):
                s = 4
            else:
                s = 5
        _SCRIPT_CACHE[ch] = s
    return s


def _cls_of(ch: str) -> int:
    c = _CLS_CACHE.get(ch)
    if c is None:
        c = (1 if ch.isalpha() else 0) | (2 if ch.isdigit() else 0)
        _CLS_CACHE[ch] = c
    return c


def normalize_text(text: str) -> tuple[str, list[str]]:
    """Canonical text cleanup; returns (normalized_text, change_tags).

    Order of operations (must not be reordered — parity anchor):
    control-char drop (keep \\n\\t\\r) → NFKC → smart-punct replacement →
    per-line space collapse + edge strip → ≤2 consecutive blank lines →
    global strip.
    """
    changes: list[str] = []

    # Evaluate the keep predicate once per DISTINCT character and delete via
    # str.translate (C speed): identical output to the per-char filter, since
    # translate deletes exactly the dropped set in order.
    drop = [ch for ch in set(text) if not _keep_char(ch)]
    kept = text.translate({ord(c): None for c in drop}) if drop else text
    if len(kept) != len(text):
        changes.append("removed_control_chars")

    composed = unicodedata.normalize("NFKC", kept)
    if composed != kept:
        changes.append("normalized_unicode")

    depuncted = composed
    for old, new in _SMART_PUNCT:
        depuncted = depuncted.replace(old, new)
    if depuncted != composed:
        changes.append("fixed_smart_punctuation")

    out_lines: list[str] = []
    for line in depuncted.split("\n"):
        out_lines.append(_MULTI_SPACE_RE.sub(" ", line).strip())

    capped: list[str] = []
    blanks = 0
    for line in out_lines:
        if not line:
            blanks += 1
            if blanks <= 2:
                capped.append(line)
        else:
            blanks = 0
            capped.append(line)

    final = "\n".join(capped).strip()

    if len(final.split()) != len(depuncted.split()):
        changes.append("normalized_whitespace")
    if not changes:
        changes.append("no_changes_needed")
    return final, changes


def detect_language(text: str) -> tuple[str, float]:
    """Script-range language heuristic; returns (iso_code_or_unknown, confidence).

    Counts alphabetic chars per script; dominant script wins if its share of
    alphabetic chars is ≥ 0.3, else "unknown". Confidence is round(share, 2).
    """
    latin = cyrillic = arabic = cjk = total = 0
    counts = [0, 0, 0, 0, 0, 0]
    # one _script_of call per DISTINCT char; integer sums are order-free
    for ch, n in Counter(text).items():
        counts[_script_of(ch)] += n
    latin, cyrillic, arabic, cjk = counts[1], counts[2], counts[3], counts[4]
    total = latin + cyrillic + arabic + cjk + counts[5]

    if total == 0:
        return "unknown", 0.0

    ranked = sorted(
        [
            ("en", latin / total),
            ("ru", cyrillic / total),
            ("ar", arabic / total),
            ("zh", cjk / total),
        ],
        key=lambda kv: kv[1],
        reverse=True,
    )
    lang, share = ranked[0]
    if share < 0.3:
        return "unknown", round(share, 2)
    return lang, round(share, 2)


def _entropy_from_counts(counts: "Counter[str]", n: int) -> float:
    # Counter iteration order is first-occurrence order — deterministic for a
    # given string — so this float fold is bit-identical to the original.
    ent = 0.0
    for cnt in counts.values():
        p = cnt / n
        ent -= p * math.log2(p)
    return ent


def shannon_entropy(text: str) -> float:
    """Character-level Shannon entropy in bits."""
    if not text:
        return 0.0
    return _entropy_from_counts(Counter(text), len(text))


def assess_quality(text: str) -> dict:
    """Heuristic quality score in [0,1] with issue tags and stats.

    Deductions (applied in this order, parity-critical): very_short −0.3;
    entropy <2 −0.4 / <3 −0.2; digit_ratio>0.5 −0.2; letter_ratio<0.3 −0.2;
    avg word length <2 −0.2 / >20 −0.1; top-word share >0.3 −0.2.
    """
    issues: list[str] = []
    score = 1.0

    char_count = len(text)
    words = text.split()
    word_count = len(words)

    if char_count == 0:
        return {
            "score": 0.0,
            "issues": ["empty_text"],
            "word_count": 0,
            "char_count": 0,
        }

    if word_count < 3:
        issues.append("very_short")
        score -= 0.3

    char_counts = Counter(text)  # shared by entropy + letter/digit tallies
    entropy = _entropy_from_counts(char_counts, char_count)
    if entropy < 2.0:
        issues.append("very_low_entropy")
        score -= 0.4
    elif entropy < 3.0:
        issues.append("low_entropy")
        score -= 0.2

    letters = 0
    digits = 0
    # one _cls_of call per DISTINCT char; integer sums are order-free
    for c, n in char_counts.items():
        cls = _cls_of(c)
        letters += (cls & 1) * n
        digits += ((cls >> 1) & 1) * n

    if char_count > 0:
        letter_ratio = letters / char_count
        digit_ratio = digits / char_count
        if digit_ratio > 0.5:
            issues.append("mostly_numbers")
            score -= 0.2
        if letter_ratio < 0.3:
            issues.append("low_letter_ratio")
            score -= 0.2
        if word_count > 0:
            avg_word_len = letters / word_count
            if avg_word_len < 2:
                issues.append("very_short_words")
                score -= 0.2
            elif avg_word_len > 20:
                issues.append("very_long_words")
                score -= 0.1

    if word_count > 0:
        top_word, top_n = Counter(words).most_common(1)[0]
        if top_n / word_count > 0.3:
            issues.append("repetitive_words")
            score -= 0.2

    score = max(0.0, min(1.0, score))
    if not issues:
        issues.append("good_quality")

    return {
        "score": round(score, 2),
        "issues": issues,
        "word_count": word_count,
        "char_count": char_count,
        "entropy": round(entropy, 2),
        "letter_ratio": round(letters / char_count if char_count > 0 else 0, 2),
    }
