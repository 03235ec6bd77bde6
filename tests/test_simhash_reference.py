"""Byte-parity differential for the documents shard's own SimHash
(arkham-shard-documents/services/deduplication.py:48-184): the ACTUAL
reference class, loaded by file path, vs the native
dedup.simhash64_reference operator — exact 64-bit equality per text,
including the tokenizer's unicode \\w semantics, duplicate-shingle
weighting, md5 big-endian bit order, and the empty-text -> 0 branch."""

from __future__ import annotations

import importlib.util
import os
import random
import string

import pytest

REF = ("/root/reference/packages/arkham-shard-documents/"
       "arkham_shard_documents/services/deduplication.py")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def simhash_ref():
    spec = importlib.util.spec_from_file_location("_ref_dedup", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimHash()


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


_CASES = [
    "The quick brown fox jumps over the lazy dog.",
    "hello, hello, HELLO!!! hello world; world... world",
    "single",
    "two words",
    "",
    "   \t\n  ",
    "!!! ... ;;; ###",  # normalizes away -> no tokens -> 0
    "café naïve résumé 中文处理 "
    "straße",
    "a b a b a b a b c",  # heavy duplicate shingles
    "Line one.\nLine two!\tTabbed three?",
]


def test_simhash_byte_parity_on_cases(spark, simhash_ref):
    from arkhammirror_spark.operators.dedup import simhash64_reference

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CASES)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r for r in simhash64_reference(df).collect()
    }
    for i, text in enumerate(_CASES):
        ref_u = simhash_ref.compute(text)
        g = got[i]
        assert g["simhash"] == _to_signed(ref_u), (i, text)
        assert g["simhash_bits"] == format(ref_u, "064b"), (i, text)


def test_simhash_byte_parity_fuzz(spark, simhash_ref):
    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + ".,;:!?'\"()- _"
    texts = []
    for _ in range(40):
        n = rng.randint(0, 60)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
            for _ in range(n)
        ]
        texts.append(" ".join(words))
    from arkhammirror_spark.operators.dedup import simhash64_reference

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in simhash64_reference(df).collect()}
    for i, text in enumerate(texts):
        ref_u = simhash_ref.compute(text)
        assert got[i]["simhash"] == _to_signed(ref_u), (i, text)


def test_reference_hamming_equals_bitcount_xor(simhash_ref):
    """SimHash.hamming_distance (:151-168) == the operator-side
    bit_count(xor) the banded joins use, and similarity_score mirrors
    1 - d/64."""
    rng = random.Random(5)
    SimHash = type(simhash_ref)
    for _ in range(50):
        a = rng.getrandbits(64)
        b = rng.getrandbits(64)
        d = SimHash.hamming_distance(a, b)
        assert d == bin(a ^ b).count("1")
        assert SimHash.similarity_score(a, b) == 1.0 - d / 64


def test_null_text_is_zero(spark):
    from arkhammirror_spark.operators.dedup import simhash64_reference

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = simhash64_reference(df).collect()[0]
    assert r["simhash"] == 0 and r["simhash_bits"] == "0" * 64
