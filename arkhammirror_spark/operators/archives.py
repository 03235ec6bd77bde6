"""Archive explosion operator (S11): archive rows → member rows.

The reference recursively extracts archives to a filesystem silo and
re-ingests each member (archive_worker.py:93-516). Spark restatement: one
``mapInPandas`` pass turns each archive payload into (url, member_name,
member_payload) rows — which feed straight back into ``extract_docs`` (the
member urls are ``{url}!{member}``, so lineage stays visible). Bombs and
traversal names quarantine per the error-column contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from ..reference_impl.archive import extract_archive_members, sniff_archive

MEMBER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("member_name", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)


def explode_archives(pages: DataFrame, payload_col: str = "html") -> DataFrame:
    """Archive rows → one row per member (+ one error row per bad archive)."""
    from ..shipping import ensure_shipped

    ensure_shipped(pages.sparkSession)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for url, payload in zip(pdf["url"].tolist(), pdf[payload_col].tolist()):
                if payload is None:
                    continue
                raw = bytes(payload)
                if sniff_archive(raw) is None:
                    continue
                try:
                    for name, data in extract_archive_members(raw):
                        rows.append(
                            {"url": f"{url}!{name}", "member_name": name,
                             "payload": data, "error": None}
                        )
                except Exception as exc:
                    rows.append(
                        {"url": url, "member_name": None, "payload": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEMBER_SCHEMA.fields])

    return pages.select("url", payload_col).mapInPandas(_run, MEMBER_SCHEMA)
