"""Date mention extraction — the reference's dateparser-free regex path.

Byte-identical to arkham-shard-parse/arkham_shard_parse/extractors/dates.py:
- extract_iso_dates      ≡ dates.py:94-127 (`_extract_with_regex`): ISO
  YYYY-MM-DD with word boundaries; invalid Gregorian dates are skipped;
  confidence 0.8, date_type "absolute".
- extract_relative_dates ≡ dates.py:129-160: yesterday/today/tomorrow,
  last|next week|month|year, "N days/weeks/months/years ago"; confidence 0.7,
  date_type "relative", no normalized date.
"""

from __future__ import annotations

import re
from datetime import datetime

_ISO_RE = re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b")

_RELATIVE_RES = [
    re.compile(r"\b(yesterday|today|tomorrow)\b", re.IGNORECASE),
    re.compile(r"\b(last|next) (week|month|year)\b", re.IGNORECASE),
    re.compile(r"\b(\d+) (days?|weeks?|months?|years?) ago\b", re.IGNORECASE),
]


def extract_iso_dates(text: str) -> list[dict]:
    """ISO-format date mentions with validity check via datetime()."""
    out: list[dict] = []
    for m in _ISO_RE.finditer(text):
        y, mo, d = m.groups()
        try:
            norm = datetime(int(y), int(mo), int(d))
        except ValueError:
            continue
        out.append(
            {
                "text": m.group(),
                "normalized_date": norm,
                "date_type": "absolute",
                "confidence": 0.8,
                "start_char": m.start(),
                "end_char": m.end(),
            }
        )
    return out


def extract_relative_dates(text: str) -> list[dict]:
    """Relative date mentions ('yesterday', 'last week', '3 days ago')."""
    out: list[dict] = []
    for rx in _RELATIVE_RES:
        for m in rx.finditer(text):
            out.append(
                {
                    "text": m.group(),
                    "normalized_date": None,
                    "date_type": "relative",
                    "confidence": 0.7,
                    "start_char": m.start(),
                    "end_char": m.end(),
                }
            )
    return out
