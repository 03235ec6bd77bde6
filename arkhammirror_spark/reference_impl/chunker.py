"""Fixed-size and sentence-boundary chunking.

Byte-identical to arkham-shard-parse/arkham_shard_parse/chunker.py:
- chunk_fixed     ≡ chunker.py:64-110: window = chunk_size chars, step =
  max(1, chunk_size − overlap); token_count = len(chunk.split()).
- chunk_sentences ≡ chunker.py:112-197: split on the boundary regex, strip
  each sentence, greedy-pack sentences into ≤chunk_size joined with single
  spaces. char_start bookkeeping advances by len(chunk_text) only — the
  reference's (lossy) arithmetic is preserved on purpose; a chunk is cut when
  adding a sentence WOULD overflow, and the overflowing sentence starts the
  next chunk.
"""

from __future__ import annotations

import re

SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z])|(?<=[.!?])\s*(?=\n)")


def chunk_fixed(text: str, chunk_size: int = 500, overlap: int = 50) -> list[dict]:
    """Sliding-window chunks with char offsets."""
    out: list[dict] = []
    n = len(text)
    step = max(1, chunk_size - overlap)
    pos = 0
    idx = 0
    while pos < n:
        end = min(pos + chunk_size, n)
        piece = text[pos:end]
        out.append(
            {
                "text": piece,
                "chunk_index": idx,
                "char_start": pos,
                "char_end": end,
                "token_count": len(piece.split()),
                "method": "fixed",
            }
        )
        idx += 1
        pos += step
    return out


def chunk_sentences(text: str, chunk_size: int = 500, overlap: int = 50) -> list[dict]:
    """Greedy sentence packing; `overlap` is accepted for signature parity but
    unused (the reference's sentence path ignores it too)."""
    sentences = SENTENCE_SPLIT_RE.split(text)

    out: list[dict] = []
    idx = 0
    pending: list[str] = []
    pending_size = 0
    char_start = 0

    def _flush() -> None:
        nonlocal idx, char_start, pending, pending_size
        piece = " ".join(pending)
        out.append(
            {
                "text": piece,
                "chunk_index": idx,
                "char_start": char_start,
                "char_end": char_start + len(piece),
                "token_count": len(piece.split()),
                "method": "sentence",
            }
        )
        idx += 1
        char_start += len(piece)
        pending = []
        pending_size = 0

    for sent in sentences:
        sent = sent.strip()
        if not sent:
            continue
        slen = len(sent)
        if pending_size + slen > chunk_size and pending:
            _flush()
        pending.append(sent)
        pending_size += slen

    if pending:
        _flush()
    return out
