"""Frame ChunkService strategies (C4–C8).

Semantics follow arkham-frame/arkham_frame/services/chunks.py:
- fixed_size   :310-343  (sentence-boundary respect off by default here)
- fixed_tokens :345-393  (no tokenizer in sandbox → chars/token ratio 4.0,
  chunks.py:120-126 — delegates to fixed_size with scaled sizes)
- sentence     :395-447  (split on ``(?<=[.!?])\\s+``, greedy pack)
- paragraph    :449-487  (split on ``\\n\\s*\\n``, greedy pack, offsets via
  first-occurrence ``text.find`` — the reference's quirk, kept)
- recursive    :489-567  (LangChain-style separator cascade)
- markdown     :569-607  (header-section split, recursive for big sections)
- code         :609-632  (recursive with def/class separators)
- semantic     :634-647  (falls back to sentence — the reference placeholder)

Quirks preserved on purpose (deterministic parity): the fixed_size restart
guard compares against the last chunk's *start*; paragraph offsets use
``find`` (first occurrence); recursive offsets drift by one separator length
at the tail exactly as the reference's arithmetic does.
"""

from __future__ import annotations

import re

SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")
PARAGRAPH_RE = re.compile(r"\n\s*\n")
MARKDOWN_HEADER_RE = re.compile(r"^#{1,6}\s+.*$", re.MULTILINE)

DEFAULT_SEPARATORS = ["\n\n", "\n", ". ", " ", ""]
CODE_SEPARATORS = ["\n\nclass ", "\n\ndef ", "\n\nasync def ", "\n\n", "\n", " ", ""]
CHARS_PER_TOKEN = 4.0


def chunk_fixed_size(
    text: str, chunk_size: int = 500, chunk_overlap: int = 50
) -> list[tuple[str, int, int]]:
    chunks: list[tuple[str, int, int]] = []
    start = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        piece = text[start:end]
        if piece.strip():
            chunks.append((piece, start, end))
        start = end - chunk_overlap
        if start <= (chunks[-1][1] if chunks else 0):
            start = end
    return chunks


def chunk_fixed_tokens(
    text: str, chunk_size: int = 128, chunk_overlap: int = 16
) -> list[tuple[str, int, int]]:
    return chunk_fixed_size(
        text,
        chunk_size=int(chunk_size * CHARS_PER_TOKEN),
        chunk_overlap=int(chunk_overlap * CHARS_PER_TOKEN),
    )


def chunk_sentence(
    text: str, chunk_size: int = 500
) -> list[tuple[str, int, int]]:
    sentences = [s.strip() for s in SENTENCE_RE.split(text) if s.strip()]
    chunks: list[tuple[str, int, int]] = []
    cur: list[str] = []
    cur_len = 0
    start = 0
    for s in sentences:
        if cur_len + len(s) > chunk_size and cur:
            piece = " ".join(cur)
            chunks.append((piece, start, start + len(piece)))
            start += len(piece)
            cur, cur_len = [], 0
        cur.append(s)
        cur_len += len(s)
    if cur:
        piece = " ".join(cur)
        chunks.append((piece, start, start + len(piece)))
    return chunks


def chunk_paragraph(
    text: str, chunk_size: int = 500
) -> list[tuple[str, int, int]]:
    paras = [(p.strip(), text.find(p)) for p in PARAGRAPH_RE.split(text) if p.strip()]
    chunks: list[tuple[str, int, int]] = []
    cur: list[str] = []
    cur_len = 0
    cur_start = 0
    for para, off in paras:
        if cur_len + len(para) > chunk_size and cur:
            piece = "\n\n".join(cur)
            chunks.append((piece, cur_start, cur_start + len(piece)))
            cur, cur_len = [], 0
            cur_start = off
        cur.append(para)
        cur_len += len(para)
        if not cur[:-1]:
            cur_start = off
    if cur:
        piece = "\n\n".join(cur)
        chunks.append((piece, cur_start, cur_start + len(piece)))
    return chunks


def chunk_recursive(
    text: str,
    separators: list[str] | None = None,
    chunk_size: int = 500,
    chunk_overlap: int = 50,
    offset: int = 0,
) -> list[tuple[str, int, int]]:
    separators = separators if separators is not None else DEFAULT_SEPARATORS
    out: list[tuple[str, int, int]] = []

    sep = separators[-1]
    for s in separators:
        if s == "":
            sep = s
            break
        if s in text:
            sep = s
            break

    splits = text.split(sep) if sep else list(text)

    good: list[str] = []
    cur = ""
    for piece in splits:
        if len(piece) < chunk_size:
            if len(cur) + len(piece) + len(sep) <= chunk_size:
                cur += (sep if cur else "") + piece
            else:
                if cur:
                    good.append(cur)
                cur = piece
        else:
            if cur:
                good.append(cur)
                cur = ""
            if len(separators) > 1:
                out.extend(
                    chunk_recursive(piece, separators[1:], chunk_size, chunk_overlap, offset)
                )
            else:
                out.append((piece, offset, offset + len(piece)))
            offset += len(piece) + len(sep)
    if cur:
        good.append(cur)

    for piece in good:
        out.append((piece, offset, offset + len(piece)))
        offset = offset + len(piece) + len(sep)
    return out


def chunk_markdown(
    text: str, chunk_size: int = 500, chunk_overlap: int = 50
) -> list[tuple[str, int, int]]:
    headers = list(MARKDOWN_HEADER_RE.finditer(text))
    if not headers:
        return chunk_recursive(text, None, chunk_size, chunk_overlap)
    chunks: list[tuple[str, int, int]] = []
    for i, h in enumerate(headers):
        sec_start = h.start()
        sec_end = headers[i + 1].start() if i + 1 < len(headers) else len(text)
        sec = text[sec_start:sec_end].strip()
        if len(sec) > chunk_size:
            chunks.extend(
                chunk_recursive(sec, None, chunk_size, chunk_overlap, sec_start)
            )
        elif sec:
            chunks.append((sec, sec_start, sec_end))
    return chunks


def chunk_code(
    text: str, chunk_size: int = 500, chunk_overlap: int = 50
) -> list[tuple[str, int, int]]:
    return chunk_recursive(text, list(CODE_SEPARATORS), chunk_size, chunk_overlap)


STRATEGIES = {
    "fixed_size": chunk_fixed_size,
    "fixed_tokens": chunk_fixed_tokens,
    "sentence": chunk_sentence,
    "paragraph": chunk_paragraph,
    "recursive": chunk_recursive,
    "markdown": chunk_markdown,
    "code": chunk_code,
    "semantic": chunk_sentence,  # reference placeholder falls back (chunks.py:634-647)
}


def chunk_with_strategy(text: str, strategy: str, **kw) -> list[dict]:
    fn = STRATEGIES[strategy]
    if strategy == "recursive":
        kw.pop("separators", None)
        tuples = fn(text, None, **kw)
    else:
        tuples = fn(text, **kw)
    return [
        {
            "text": t,
            "chunk_index": i,
            "char_start": s,
            "char_end": e,
            "token_count": max(1, int(len(t) / CHARS_PER_TOKEN)),
            "method": strategy,
        }
        for i, (t, s, e) in enumerate(tuples)
    ]
