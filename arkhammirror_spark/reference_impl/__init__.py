"""Pure-Python oracle implementations of the reference's deterministic extractors.

Every function here reproduces, byte-for-byte, the output of a function in
mantisfury/ArkhamMirror (cited per-function as ``path:line`` relative to the
reference repo). They are dependency-free, side-effect-free, and are the
single source of truth used BOTH by the pytest parity suite AND inside the
Spark pandas UDFs — so the Spark pipeline's text/span outputs equal the
oracle's by construction.
"""

from .normalize import normalize_text, detect_language, assess_quality, shannon_entropy
from .ner import mock_ner
from .dates import extract_iso_dates, extract_relative_dates
from .relations import extract_relations
from .chunker import chunk_fixed, chunk_sentences, SENTENCE_SPLIT_RE
from .entity_filter import is_valid_entity
from .claims import extract_claims
from .htmlstrip import strip_html
from .textdecode import decode_text_bytes

__all__ = [
    "normalize_text",
    "detect_language",
    "assess_quality",
    "shannon_entropy",
    "mock_ner",
    "extract_iso_dates",
    "extract_relative_dates",
    "extract_relations",
    "chunk_fixed",
    "chunk_sentences",
    "SENTENCE_SPLIT_RE",
    "is_valid_entity",
    "extract_claims",
    "strip_html",
    "decode_text_bytes",
]
