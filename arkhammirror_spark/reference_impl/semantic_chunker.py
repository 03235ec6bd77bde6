"""Semantic chunking (C3) — the reference's model-present path with the
embedding lookup injected.

Semantics-identical to arkham-shard-parse/arkham_shard_parse/chunker.py
_chunk_semantic (:199-334): sentence split on the boundary regex; <3
sentences or no embeddings → sentence-chunk fallback (:229-239); window-2
mean-embedding cosine between adjacent windows (+1e-8 denominator, :242-259);
adaptive threshold mean−std floored at 0.5 (0.7 when no similarities,
:260-268); break on low similarity or size ≥ chunk_size, suppressed below
chunk_size//3 (:277-296); the lossy char_start += len(chunk)+1 bookkeeping
(:312) is preserved.

`embed_fn(sentences) -> list[vector] | None` injects the model; pass
operators.embed_model.fake_embedding-based vectors for deterministic tests,
or None to exercise the reference's no-model fallback gate.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from .chunker import SENTENCE_SPLIT_RE, chunk_sentences


def chunk_semantic(
    text: str,
    embed_fn: Callable[[list[str]], Sequence | None],
    chunk_size: int = 500,
    overlap: int = 50,
) -> list[dict]:
    sentences = [s.strip() for s in SENTENCE_SPLIT_RE.split(text) if s.strip()]

    if len(sentences) < 3:
        return chunk_sentences(text, chunk_size, overlap)

    embeddings = embed_fn(sentences)
    if embeddings is None:
        return chunk_sentences(text, chunk_size, overlap)
    embeddings = np.asarray(embeddings, dtype=float)

    window = 2
    similarities: list[float] = []
    for i in range(len(sentences) - window):
        cur = np.mean(embeddings[i : i + window], axis=0)
        nxt = np.mean(embeddings[i + 1 : i + 1 + window], axis=0)
        sim = float(
            np.dot(cur, nxt) / (np.linalg.norm(cur) * np.linalg.norm(nxt) + 1e-8)
        )
        similarities.append(sim)

    if similarities:
        threshold = max(float(np.mean(similarities) - np.std(similarities)), 0.5)
    else:
        threshold = 0.7

    out: list[dict] = []
    idx = 0
    pending: list[str] = []
    size = 0
    char_start = 0
    for i, sent in enumerate(sentences):
        pending.append(sent)
        size += len(sent)

        cut = (i < len(similarities) and similarities[i] < threshold) or (
            size >= chunk_size
        )
        if cut and size < chunk_size // 3:
            cut = False

        if cut and pending:
            piece = " ".join(pending)
            out.append(
                {
                    "text": piece,
                    "chunk_index": idx,
                    "char_start": char_start,
                    "char_end": char_start + len(piece),
                    "token_count": len(piece.split()),
                    "method": "semantic",
                }
            )
            idx += 1
            char_start += len(piece) + 1
            pending = []
            size = 0

    if pending:
        piece = " ".join(pending)
        out.append(
            {
                "text": piece,
                "chunk_index": idx,
                "char_start": char_start,
                "char_end": char_start + len(piece),
                "token_count": len(piece.split()),
                "method": "semantic",
            }
        )
    return out
