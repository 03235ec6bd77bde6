"""Differential tests: run the ACTUAL reference extractor code (pure-Python
modules loaded by file path from /root/reference) side-by-side with our
reference_impl oracle on fuzzed inputs, asserting byte-identical outputs.

The reference packages aren't importable as installed distributions, so we
register lightweight namespace parents and import the leaf modules directly —
no reference __init__/shard machinery runs, only the pure extractor code.

If the reference tree is absent (e.g. CI without the mirror), the whole module
skips — the fixed-fixture suite in test_reference_impl.py still guards parity.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import pytest
from hypothesis import given, settings, strategies as st

import arkhammirror_spark.reference_impl as ours

REF = "/root/reference/packages"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def _load(modname: str, path: str):
    if modname in sys.modules:
        return sys.modules[modname]
    parent = modname.rsplit(".", 1)[0]
    if "." in modname and parent not in sys.modules:
        pkg = types.ModuleType(parent)
        pkg.__path__ = []
        sys.modules[parent] = pkg
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    base = f"{REF}/arkham-shard-parse/arkham_shard_parse"
    _load("arkham_shard_parse", f"{base}/__init__.py".replace("__init__.py", "models.py"))
    # register namespace parents without executing package __init__ files
    for name in ("arkham_shard_parse", "arkham_shard_parse.extractors"):
        if name not in sys.modules or not hasattr(sys.modules[name], "__path__"):
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
    models = _load("arkham_shard_parse.models", f"{base}/models.py")
    sys.modules["arkham_shard_parse"].models = models
    ner = _load("arkham_shard_parse.extractors.ner", f"{base}/extractors/ner.py")
    dates = _load("arkham_shard_parse.extractors.dates", f"{base}/extractors/dates.py")
    relations = _load(
        "arkham_shard_parse.extractors.relations", f"{base}/extractors/relations.py"
    )
    chunker = _load("arkham_shard_parse.chunker", f"{base}/chunker.py")
    return types.SimpleNamespace(
        models=models, ner=ner, dates=dates, relations=relations, chunker=chunker
    )


# Text generator: words that exercise capitalization runs, punctuation,
# dates, relation patterns, unicode, and whitespace shapes.
_WORDS = st.sampled_from(
    [
        "John", "Smith", "Acme", "Corp", "A", "Xy", "works", "for", "met", "with",
        "acquired", "based", "in", "New", "York.", "the", "and", "2024-01-15",
        "2024-13-45", "yesterday", "last", "week", "3", "days", "ago", "Q3",
        "café", "Ünïted", "UPPER", "x", "--", "...", "it's", "5.", "No!", "Why?",
    ]
)
_SEP = st.sampled_from([" ", "  ", "\n", "\t", " \n ", ". "])
_TEXTS = st.lists(st.tuples(_WORDS, _SEP), min_size=0, max_size=60).map(
    lambda ps: "".join(w + s for w, s in ps)
)
_ANYTEXT = st.text(max_size=200)


@settings(max_examples=300, deadline=None)
@given(_TEXTS)
def test_mock_ner_differential(ref, text):
    theirs = ref.ner.NERExtractor()._mock_extract(text)
    mine = ours.mock_ner(text)
    assert [m["text"] for m in mine] == [m.text for m in theirs]
    assert [m["confidence"] for m in mine] == [m.confidence for m in theirs]


@settings(max_examples=300, deadline=None)
@given(_TEXTS, st.integers(1, 40), st.integers(0, 45))
def test_chunk_fixed_differential(ref, text, size, overlap):
    theirs = ref.chunker.TextChunker(chunk_size=size, overlap=overlap, method="fixed")
    t = theirs.chunk_text(text, "d")
    m = ours.chunk_fixed(text, chunk_size=size, overlap=overlap)
    assert [(c["text"], c["char_start"], c["char_end"], c["token_count"]) for c in m] == [
        (c.text, c.char_start, c.char_end, c.token_count) for c in t
    ]


@settings(max_examples=300, deadline=None)
@given(_TEXTS, st.integers(5, 80))
def test_chunk_sentences_differential(ref, text, size):
    theirs = ref.chunker.TextChunker(chunk_size=size, method="sentence")
    t = theirs.chunk_text(text, "d")
    m = ours.chunk_sentences(text, chunk_size=size)
    assert [(c["text"], c["char_start"], c["char_end"]) for c in m] == [
        (c.text, c.char_start, c.char_end) for c in t
    ]


@settings(max_examples=300, deadline=None)
@given(_TEXTS)
def test_iso_dates_differential(ref, text):
    t = ref.dates.DateExtractor()._extract_with_regex(text, None, None)
    m = ours.extract_iso_dates(text)
    assert [(x["text"], x["normalized_date"], x["start_char"], x["end_char"]) for x in m] == [
        (x.text, x.normalized_date, x.start_char, x.end_char) for x in t
    ]


@settings(max_examples=200, deadline=None)
@given(_TEXTS)
def test_relative_dates_differential(ref, text):
    t = ref.dates.DateExtractor().extract_relative_dates(text)
    m = ours.extract_relative_dates(text)
    assert [(x["text"], x["start_char"], x["end_char"]) for x in m] == [
        (x.text, x.start_char, x.end_char) for x in t
    ]


@settings(max_examples=200, deadline=None)
@given(_TEXTS)
def test_relations_differential(ref, text):
    their_mentions = ref.ner.NERExtractor()._mock_extract(text)
    my_mentions = ours.mock_ner(text)
    t = ref.relations.RelationExtractor().extract(text, their_mentions)
    m = ours.extract_relations(text, my_mentions)
    assert [
        (x["source_text"], x["target_text"], x["relation_type"], x["confidence"], x["evidence"])
        for x in m
    ] == [
        (x.source_entity_id, x.target_entity_id, x.relation_type, x.confidence, x.evidence_text)
        for x in t
    ]


@settings(max_examples=300, deadline=None)
@given(_ANYTEXT)
def test_normalize_differential_against_inline_port(text):
    """normalize/quality/lang live in light_worker.py inside a Worker class that
    needs the frame; assert our functions against a minimal inline transcription
    of the same steps instead (structure-checked in test_reference_impl)."""
    import re
    import unicodedata

    cleaned = "".join(
        ch for ch in text if unicodedata.category(ch)[0] != "C" or ch in "\n\t\r"
    )
    normalized = unicodedata.normalize("NFKC", cleaned)
    fixed = normalized
    for old, new in {
        "‘": "'", "’": "'", "“": '"', "”": '"',
        "–": "-", "—": "--", "…": "...",
    }.items():
        fixed = fixed.replace(old, new)
    lines = [re.sub(r" {2,}", " ", ln).strip() for ln in fixed.split("\n")]
    out, blanks = [], 0
    for ln in lines:
        if not ln:
            blanks += 1
            if blanks <= 2:
                out.append(ln)
        else:
            blanks = 0
            out.append(ln)
    expected = "\n".join(out).strip()

    got, _ = ours.normalize_text(text)
    assert got == expected


@pytest.fixture(scope="module")
def ref_coref(ref):
    base = f"{REF}/arkham-shard-parse/arkham_shard_parse"
    for name in ("arkham_shard_parse.linkers",):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
    return _load(
        "arkham_shard_parse.linkers.coreference", f"{base}/linkers/coreference.py"
    )


@settings(max_examples=200, deadline=None)
@given(_TEXTS)
def test_coreference_differential(ref, ref_coref, text):
    their_mentions = ref.ner.NERExtractor()._mock_extract(text)
    my_mentions = ours.mock_ner(text)
    import arkhammirror_spark.reference_impl.coreference as mc

    theirs = ref_coref.CoreferenceResolver().resolve(text, their_mentions)
    mine = mc.resolve_coreferences(text, my_mentions)
    assert mine == theirs

    their_chains = ref_coref.CoreferenceResolver().resolve_chains(text, their_mentions)
    my_chains = mc.coreference_chains(my_mentions)
    assert sorted(map(tuple, my_chains)) == sorted(map(tuple, their_chains))
