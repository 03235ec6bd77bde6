"""Explicit StructType schemas for every table in the pipeline.

The reference declares fixed DDL at service startup (documents.py:149-247,
entities.py:257-357); we mirror that regime: explicit schemas everywhere,
never inferSchema. Input table shape is fixed by BASELINE.json input_hint:
pages(url string, warc_ts timestamp, html binary, text string, lang string).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        # payload kind hint used by the format dispatcher (mirrors the
        # reference's file-type classifier, file_type.py:71-105); derived
        # from content sniffing when absent.
        StructField("kind", StringType(), True),
    ]
)

# docs: one row per page/url after extraction + normalization (FIXTURES.md §4)
DOCS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("extracted_text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("lang_conf", DoubleType(), True),
        StructField("quality_score", DoubleType(), True),
        StructField("quality_issues", ArrayType(StringType()), True),
        StructField("word_count", LongType(), True),
        StructField("n_pages", IntegerType(), True),
        StructField("checksum", StringType(), True),
        StructField("error", StringType(), True),
        # audit side-channel (dropped from the public docs table)
        StructField("_part_id", IntegerType(), True),
        StructField("_batch_ms", DoubleType(), True),
    ]
)

MENTION_STRUCT_FIELDS = [
    StructField("text", StringType(), False),
    StructField("entity_type", StringType(), False),
    StructField("start_char", IntegerType(), False),
    StructField("end_char", IntegerType(), False),
    StructField("confidence", DoubleType(), False),
]

# docs + fused mock-NER mentions (extract_docs(include_mentions=True)):
# _mentions = full mention structs; _names = sorted distinct lowercase names
# that pass the noise filter (the edge-build input — persisting just this
# array instead of the full mention structs keeps the cached working set
# small at corpus scale); _n_mentions = len(_mentions).
DOCS_MENTIONS_SCHEMA = StructType(
    list(DOCS_SCHEMA.fields)
    + [
        StructField("_mentions", ArrayType(StructType(MENTION_STRUCT_FIELDS)), True),
        StructField("_names", ArrayType(StringType()), True),
        StructField("_n_mentions", IntegerType(), True),
    ]
)

CHUNK_STRUCT = StructType(
    [
        StructField("text", StringType(), False),
        StructField("chunk_index", IntegerType(), False),
        StructField("char_start", IntegerType(), False),
        StructField("char_end", IntegerType(), False),
        StructField("token_count", IntegerType(), False),
        StructField("method", StringType(), False),
    ]
)

MENTION_STRUCT = StructType(
    [
        StructField("text", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("start_char", IntegerType(), False),
        StructField("end_char", IntegerType(), False),
        StructField("confidence", DoubleType(), False),
    ]
)

DATE_STRUCT = StructType(
    [
        StructField("text", StringType(), False),
        StructField("normalized_date", TimestampType(), True),
        StructField("date_type", StringType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("start_char", IntegerType(), False),
        StructField("end_char", IntegerType(), False),
    ]
)

REL_STRUCT = StructType(
    [
        StructField("source_text", StringType(), False),
        StructField("target_text", StringType(), False),
        StructField("relation_type", StringType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("evidence", StringType(), True),
    ]
)

CLAIM_STRUCT = StructType(
    [
        StructField("text", StringType(), False),
        StructField("confidence", DoubleType(), False),
    ]
)

AUDIT_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_rows", LongType(), False),
        StructField("output_rows", LongType(), False),
        StructField("error_rows", LongType(), False),
        StructField("wall_ms", DoubleType(), False),
        StructField("snapshot_id", StringType(), False),
    ]
)
