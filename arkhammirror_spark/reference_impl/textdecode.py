"""Plain-text byte decoding with encoding fallback.

Byte-identical to arkham-shard-ingest/arkham_shard_ingest/workers/
extract_worker.py:468-508 (`_extract_text`): try utf-8 → utf-16 → latin-1 →
cp1252 (strict), else utf-8 with errors="replace". Returns (text, n_lines)
where n_lines = text.count("\\n") + 1 (the reference's page-count proxy).

Note: the reference opens in text mode, which applies universal newline
translation (\\r\\n → \\n); we decode from bytes, so we replicate that
translation explicitly to stay byte-identical.
"""

from __future__ import annotations

_ENCODINGS = ("utf-8", "utf-16", "latin-1", "cp1252")


def _universal_newlines(s: str) -> str:
    return s.replace("\r\n", "\n").replace("\r", "\n")


def decode_text_bytes(raw: bytes) -> tuple[str, int]:
    text = None
    for enc in _ENCODINGS:
        try:
            text = raw.decode(enc)
            break
        except UnicodeDecodeError:
            continue
    if text is None:
        text = raw.decode("utf-8", errors="replace")
    text = _universal_newlines(text)
    return text, text.count("\n") + 1
