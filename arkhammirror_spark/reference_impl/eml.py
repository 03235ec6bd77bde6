"""EML (email) text extraction.

Byte-identical to arkham-shard-ingest/arkham_shard_ingest/workers/
extract_worker.py:602-742 (`_extract_eml`) for the text-assembly contract:
parse with ``email.message_from_bytes(..., policy=policy.default)``; text =
"--- Headers ---" block (From/To/Cc/Subject/Date present ones as
"Header: value"), blank line, "--- Body ---", then body parts — all
text/plain parts of a multipart message; a text/html part only when no plain
part came first, stripped with the tag regex + whitespace collapse
(extract_worker.py:713-721 ≡ reference_impl.htmlstrip.strip_html);
page count = max(1, part_count).
"""

from __future__ import annotations

import email
from email import policy

from .htmlstrip import strip_html


def extract_eml(raw: bytes) -> tuple[str, int]:
    """Return (text, n_pages)."""
    msg = email.message_from_bytes(raw, policy=policy.default)

    parts: list[str] = []
    part_count = 0

    headers = []
    for header in ["From", "To", "Cc", "Subject", "Date"]:
        value = msg.get(header)
        if value:
            headers.append(f"{header}: {value}")
    if headers:
        parts.append("--- Headers ---")
        parts.extend(headers)
        parts.append("")

    parts.append("--- Body ---")

    if msg.is_multipart():
        for part in msg.walk():
            ctype = part.get_content_type()
            if ctype == "text/plain":
                body = part.get_content()
                if isinstance(body, str):
                    parts.append(body)
                    part_count += 1
            elif ctype == "text/html":
                html = part.get_content()
                if isinstance(html, str):
                    text = strip_html(html)
                    if text and part_count == 0:
                        parts.append(text)
                        part_count += 1
    else:
        body = msg.get_content()
        if isinstance(body, str):
            parts.append(body)
            part_count = 1
        elif isinstance(body, bytes):
            parts.append(body.decode("utf-8", errors="replace"))
            part_count = 1

    return "\n".join(parts), max(1, part_count)
