"""Adaptive scan fan-out for CPU-heavy narrow stages.

A small parquet input (one file, one row group) plans a ONE-task scan, and
every narrow transformation chained onto it — explodes, regex extraction,
hash computation — inherits that single task, so a 32-core executor runs
one core hot (measured: the near-dup shingle explode at sf0.1 spent 4.8 s
in a single task). `spread` repartitions such inputs up to the session's
default parallelism BEFORE the heavy work, keyed by the caller's row key so
the shuffle is deterministic and skew-free (guide §2.5 "input skew: one
huge unsplittable file → repartition immediately after the read").

Adaptive in both directions: when the input already has at least
`defaultParallelism` partitions (any real-scale table), it is returned
unchanged — no extra exchange at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition `df` to defaultParallelism iff it has fewer partitions.

    Pass the row key (e.g. the doc id) so the exchange hash-partitions
    deterministically; with no key a round-robin repartition is used.
    """
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= p:
        return df
    return df.repartition(p, *key_cols) if key_cols else df.repartition(p)
