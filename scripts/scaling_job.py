"""One measured extraction run for the scaling bench.

Usage (via spark-submit, the north rule's run mode):
    spark-submit --master local[N] --py-files <pkg.zip> scripts/scaling_job.py \
        <pages_parquet> <num_partitions>

Prints one JSON line: {"cores": N, "docs": n, "wall_s": t, "docs_per_sec": r}.
Measures the extraction DAG (extract + spans + entities + edges forced by
counts), excluding JVM/session startup — the quantity that scales with
executors on a real cluster.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    pages_path, num_partitions = sys.argv[1], int(sys.argv[2])

    spark = SparkSession.builder.appName("scaling-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    # the bench corpus is a handful of small parquet files; keep enough input
    # splits that the scan itself parallelizes (a 100 TB corpus has no such
    # problem — petabytes of files split naturally)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    # small Arrow batches keep the python-worker resident set flat on
    # kilobyte-sized documents (10k-row default batches measurably thrash)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")

    from arkhammirror_spark.pipeline import run_extraction_stats

    cores = spark.sparkContext.defaultParallelism
    pages = spark.read.parquet(pages_path)

    # warm the input file cache so both runs read from page cache equally
    n_pages = pages.count()

    t0 = time.perf_counter()
    stats = run_extraction_stats(spark, pages, num_partitions=num_partitions)
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "pages": n_pages,
                "docs": stats["docs"],
                "mentions": stats["mentions"],
                "edges": stats["edges"],
                "wall_s": round(wall, 2),
                "docs_per_sec": round(stats["docs"] / wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
