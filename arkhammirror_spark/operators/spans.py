"""Span-extraction stage: docs → mentions / dates / relations / chunks / claims.

Each derived table is one ``mapInPandas`` pass over (url, extracted_text)
applying the corresponding reference_impl oracle function per document inside
the Arrow batch, exploding to rows in-batch (pandas), so the Spark plan stays
a single Python node per table with native exchanges around it.

Reference lineage: parse shard orchestration (arkham_shard_parse/shard.py:
286-344) runs NER → dates → relations → chunks per page; here each family is
an independent column-pruned branch off the cached docs DataFrame, letting
Spark schedule them in parallel instead of sequentially per document.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from ..reference_impl.chunker import chunk_fixed, chunk_sentences
from ..reference_impl.claims import extract_claims
from ..reference_impl.dates import extract_iso_dates, extract_relative_dates
from ..reference_impl.ner import mock_ner
from ..reference_impl.relations import extract_relations
from ..schemas import CHUNK_STRUCT, CLAIM_STRUCT, DATE_STRUCT, MENTION_STRUCT, REL_STRUCT


def _keyed_schema(struct: StructType) -> StructType:
    return StructType([StructField("url", StringType(), False)] + list(struct.fields))


def _explode_per_doc(
    docs: DataFrame, fn: Callable[[str], list[dict]], struct: StructType
) -> DataFrame:
    from ..shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    schema = _keyed_schema(struct)
    names = [f.name for f in schema.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: list[dict] = []
            for url, text in zip(pdf["url"].tolist(), pdf["extracted_text"].tolist()):
                if not text:
                    continue
                for rec in fn(text):
                    rec = dict(rec)
                    rec["url"] = url
                    out_rows.append(rec)
            if out_rows:
                out = pd.DataFrame(out_rows)
                if "normalized_date" in out.columns:
                    out["normalized_date"] = pd.to_datetime(
                        out["normalized_date"], utc=True
                    )
                yield out[names]
            else:
                yield pd.DataFrame({n: pd.Series(dtype="object") for n in names})

    return docs.select("url", "extracted_text").mapInPandas(_run, schema)


def extract_mentions(docs: DataFrame) -> DataFrame:
    """Mock-NER mentions (ner.py:94-143 semantics)."""
    return _explode_per_doc(docs, mock_ner, MENTION_STRUCT)


def extract_dates(docs: DataFrame, include_relative: bool = True) -> DataFrame:
    """ISO + relative date mentions (dates.py:94-160)."""

    def _fn(text: str) -> list[dict]:
        out = extract_iso_dates(text)
        if include_relative:
            out = out + extract_relative_dates(text)
        return out

    return _explode_per_doc(docs, _fn, DATE_STRUCT)


def extract_rels(docs: DataFrame) -> DataFrame:
    """Pairwise relations over mock-NER mentions (relations.py:62-142)."""

    def _fn(text: str) -> list[dict]:
        return extract_relations(text, mock_ner(text))

    return _explode_per_doc(docs, _fn, REL_STRUCT)


def extract_chunks(
    docs: DataFrame,
    method: str = "sentence",
    chunk_size: int = 500,
    overlap: int = 50,
) -> DataFrame:
    """Chunking (chunker.py:64-197); parse-shard defaults method=sentence/500/50."""
    chunker = chunk_sentences if method == "sentence" else chunk_fixed

    def _fn(text: str) -> list[dict]:
        return chunker(text, chunk_size=chunk_size, overlap=overlap)

    return _explode_per_doc(docs, _fn, CHUNK_STRUCT)


def extract_claims_df(docs: DataFrame) -> DataFrame:
    """Rule-based claims (claims/shard.py:300-374)."""
    return _explode_per_doc(docs, extract_claims, CLAIM_STRUCT)


def extract_chunks_strategy(
    docs: DataFrame, strategy: str, **kw
) -> DataFrame:
    """Frame ChunkService strategies C4–C8 (services/chunks.py:310-647):
    fixed_size / fixed_tokens / sentence / paragraph / recursive / markdown /
    code / semantic(→sentence), dispatched per document in one Arrow pass."""
    from ..reference_impl.frame_chunks import chunk_with_strategy

    def _fn(text: str) -> list[dict]:
        return chunk_with_strategy(text, strategy, **kw)

    return _explode_per_doc(docs, _fn, CHUNK_STRUCT)


def extract_chunks_semantic(
    docs: DataFrame,
    chunk_size: int = 500,
    overlap: int = 50,
    dim: int = 64,
) -> DataFrame:
    """C3 semantic chunking (chunker.py:199-334): per-doc sentence
    embeddings from the embed_model singleton (sentence-transformers when
    importable, deterministic fake otherwise) feed the reference-faithful
    window-2-cosine breakpoint skeleton. One Arrow pass, embeddings never
    leave the worker."""
    from ..reference_impl.semantic_chunker import chunk_semantic
    from .embed_model import _load_model, fake_embedding

    model_holder: list = []

    def _fn(text: str) -> list[dict]:
        if not model_holder:  # lazy per-python-worker singleton
            model_holder.append(_load_model("BAAI/bge-m3"))
        model = model_holder[0]

        def _embed(sents: list[str]):
            if model is not None:
                return [list(map(float, v)) for v in model.encode(sents, batch_size=32)]
            return [fake_embedding(s, dim=dim) for s in sents]

        return chunk_semantic(text, _embed, chunk_size=chunk_size, overlap=overlap)

    return _explode_per_doc(docs, _fn, CHUNK_STRUCT)


def extract_rels_from_mentions(docs_raw: DataFrame) -> DataFrame:
    """Native fast path for relations on the mock-NER pipeline: with the
    degenerate 0/0 offsets the reference emits (_pair_relation via
    relations.py:108-121), EVERY ordered mention pair is a co_occurrence
    with confidence exactly 0.5 and evidence "Entities within 0 chars" —
    so the rels table is a pure pair combination over the already-extracted
    `_mentions` arrays. No second mock-NER pass, no per-pair Python: the
    Arrow-batched variant measured 37 s of the 76 s pipeline wall at 20k
    docs; this is one whole-stage-codegen explode. `extract_rels` remains
    the general-text operator for real-offset NER (between-text patterns).

    Parity with extract_rels on the mock path is asserted in
    tests/test_pipeline_spark.py.
    """
    from pyspark.sql import functions as F

    names = F.col("_mentions").getField("text")
    sz = F.size(names)
    pairs = F.when(
        sz >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), sz - 2),
                lambda i: F.transform(
                    F.slice(names, i + 2, F.size(names) - i - 1),
                    lambda t: F.struct(
                        F.element_at(names, i + 1).alias("source_text"),
                        t.alias("target_text"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<source_text:string,target_text:string>>"))
    return (
        docs_raw.where(F.col("error").isNull())
        .select("url", F.explode(pairs).alias("p"))
        .select(
            "url",
            F.col("p.source_text"),
            F.col("p.target_text"),
            F.lit("co_occurrence").alias("relation_type"),
            F.lit(0.5).alias("confidence"),
            F.lit("Entities within 0 chars").alias("evidence"),
        )
    )
