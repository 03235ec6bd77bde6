"""C3 semantic chunker: differential vs the ACTUAL reference _chunk_semantic
(loaded by file path, embeddings injected via monkeypatched
_get_sentence_embeddings), plus the Spark operator's fallback wiring."""

from __future__ import annotations

import importlib.util
import os
import random
import sys
import types

import pytest

from arkhammirror_spark.operators.embed_model import fake_embedding
from arkhammirror_spark.reference_impl.semantic_chunker import chunk_semantic

REF_DIR = "/root/reference/packages/arkham-shard-parse/arkham_shard_parse"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not available"
)


def _load_reference():
    pkg = "arkham_shard_parse"
    if pkg not in sys.modules:
        mod = types.ModuleType(pkg)
        mod.__path__ = [REF_DIR]
        sys.modules[pkg] = mod
    for leaf in ("models", "chunker"):
        name = f"{pkg}.{leaf}"
        if name in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_DIR, f"{leaf}.py")
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
    return sys.modules[f"{pkg}.chunker"]


@pytest.fixture(scope="module")
def ref_chunker():
    return _load_reference()


def _embed(sents: list[str]):
    return [fake_embedding(s, dim=16) for s in sents]


def _fuzz_text(seed: int) -> str:
    rng = random.Random(seed)
    words = ["alpha", "beta", "report", "value", "case", "metric", "slow",
             "fast", "table", "merge"]
    sents = []
    for _ in range(rng.randint(3, 14)):
        n = rng.randint(2, 9)
        s = " ".join(rng.choice(words) for _ in range(n))
        sents.append(s.capitalize() + rng.choice([".", "!", "?"]))
    return " ".join(sents)


@pytest.mark.parametrize("seed", range(20))
@pytest.mark.parametrize("chunk_size", [60, 150, 500])
def test_semantic_parity_with_injected_embeddings(ref_chunker, seed, chunk_size):
    text = _fuzz_text(seed)
    tc = ref_chunker.TextChunker(chunk_size=chunk_size, method="semantic")
    tc._get_sentence_embeddings = lambda sents: _embed(sents)
    exp = tc._chunk_semantic(text, document_id="d")
    got = chunk_semantic(text, _embed, chunk_size=chunk_size)
    assert [
        (c["text"], c["chunk_index"], c["char_start"], c["char_end"],
         c["token_count"], c["method"])
        for c in got
    ] == [
        (c.text, c.chunk_index, c.char_start, c.char_end, c.token_count,
         c.chunk_method)
        for c in exp
    ]


@pytest.mark.parametrize("seed", range(5))
def test_no_model_gate_falls_back_to_sentence(ref_chunker, seed):
    text = _fuzz_text(seed)
    tc = ref_chunker.TextChunker(chunk_size=120, method="semantic")
    tc._get_sentence_embeddings = lambda sents: None
    exp = tc._chunk_semantic(text, document_id="d")
    got = chunk_semantic(text, lambda s: None, chunk_size=120)
    assert [(c["text"], c["char_start"]) for c in got] == [
        (c.text, c.char_start) for c in exp
    ]


def test_spark_semantic_chunk_operator(spark):
    from arkhammirror_spark.operators.spans import extract_chunks_semantic

    text = _fuzz_text(3)
    docs = spark.createDataFrame(
        [("u1", text)], "url: string, extracted_text: string"
    )
    rows = sorted(
        extract_chunks_semantic(docs, chunk_size=60).collect(),
        key=lambda r: r["chunk_index"],
    )
    local = chunk_semantic(text, _embed_64, chunk_size=60)
    assert [(r["text"], r["char_start"], r["method"]) for r in rows] == [
        (c["text"], c["char_start"], c["method"]) for c in local
    ]


def _embed_64(sents: list[str]):
    return [fake_embedding(s, dim=64) for s in sents]
