"""Page-granular span extraction.

The reference parse shard loops a document's stored pages and extracts
entities/dates/relations/chunks per page with per-page char offsets
(arkham_shard_parse/shard.py:326-344). For web pages a pages-table row IS one
page; multi-page payloads (PDF joins pages with "\\n\\n",
extract_worker.py:278) need re-splitting to recover that granularity.

``paged_spans`` splits the document back into pages — PDFs on the "\\n\\n"
page seam, everything else a single page — normalizes each page with the N1
anchor, and runs the requested reference extractor per page, emitting
``page_number`` (1-based, like arkham_frame.pages) with per-page offsets.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..reference_impl.chunker import chunk_sentences
from ..reference_impl.dates import extract_iso_dates
from ..reference_impl.ner import mock_ner
from ..reference_impl.normalize import normalize_text
from ..schemas import CHUNK_STRUCT, DATE_STRUCT, MENTION_STRUCT


def split_pages(extracted_text: str, kind: str | None) -> list[str]:
    """Recover per-page texts from the joined extraction output."""
    if kind == "pdf" and extracted_text:
        return extracted_text.split("\n\n")
    return [extracted_text]


def _paged_schema(struct: StructType) -> StructType:
    return StructType(
        [
            StructField("url", StringType(), False),
            StructField("page_number", IntegerType(), False),
        ]
        + list(struct.fields)
    )


def paged_spans(
    docs: DataFrame,
    fn: Callable[[str], list[dict]],
    struct: StructType,
    text_col: str = "extracted_text",
    kind_col: str | None = "kind",
) -> DataFrame:
    """Generic per-page span extraction: fn(normalized page) → rows with
    (url, page_number) keys."""
    from ..shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    schema = _paged_schema(struct)
    names = [f.name for f in schema.fields]
    cols = ["url", text_col] + ([kind_col] if kind_col and kind_col in docs.columns else [])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            kinds = (
                pdf[kind_col].tolist()
                if kind_col and kind_col in pdf.columns
                else [None] * len(pdf)
            )
            for url, text, kind in zip(pdf["url"].tolist(), pdf[text_col].tolist(), kinds):
                if not text:
                    continue
                for pno, page in enumerate(split_pages(text, kind), start=1):
                    page_norm, _ = normalize_text(page)
                    if not page_norm:
                        continue
                    for rec in fn(page_norm):
                        rec = dict(rec)
                        rec["url"] = url
                        rec["page_number"] = pno
                        rows.append(rec)
            if rows:
                out = pd.DataFrame(rows)
                if "normalized_date" in out.columns:
                    out["normalized_date"] = pd.to_datetime(out["normalized_date"], utc=True)
                yield out[names]
            else:
                yield pd.DataFrame({n: pd.Series(dtype="object") for n in names})

    return docs.select(*cols).mapInPandas(_run, schema)


def paged_mentions(docs: DataFrame, **kw) -> DataFrame:
    return paged_spans(docs, mock_ner, MENTION_STRUCT, **kw)


def paged_chunks(docs: DataFrame, chunk_size: int = 500, **kw) -> DataFrame:
    return paged_spans(
        docs, lambda t: chunk_sentences(t, chunk_size=chunk_size), CHUNK_STRUCT, **kw
    )


def paged_dates(docs: DataFrame, **kw) -> DataFrame:
    return paged_spans(docs, extract_iso_dates, DATE_STRUCT, **kw)
