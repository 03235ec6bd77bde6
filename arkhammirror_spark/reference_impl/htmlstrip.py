"""HTML tag stripping — the reference's only HTML-to-text handler.

Byte-identical to the email worker's text/html branch,
arkham-shard-ingest/arkham_shard_ingest/workers/extract_worker.py:713-721:
remove every `<...>` tag with a single regex, collapse all whitespace runs to
one space, strip. (The reference routes *.html files to the cpu-light pool
un-stripped; the email path is the only place tags are removed, and it is the
byte-identity anchor for our HTML extraction stage.)
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def strip_html(html: str) -> str:
    """Tags out, whitespace collapsed to single spaces, edges stripped."""
    no_tags = _TAG_RE.sub("", html)
    return _WS_RE.sub(" ", no_tags).strip()
