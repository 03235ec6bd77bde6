"""Round-8 measurement harness (bench.py is FROZEN — extra benchmarks live
here per the optimization-round rules).

Usage:
  python bench_extra.py time  <part> [part ...]   # noop-sink wall per part
  python bench_extra.py plan  <part> [part ...]   # explain("formatted") dump
  python bench_extra.py both  <part> [part ...]
  python bench_extra.py entry <entry> [...]       # contract-entry level

Parts come from arkhammirror_spark.queries.QUERIES (the fine-grained
registry bench.py itself sums into contract entries); entries come from
the 50-entry driver contract. Timing uses the noop sink (guide §1.4) so
the computation — not the count() shortcut or a real sink — is what is
measured, and each job is labelled (guide §1.5).

Env knobs match bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plan_dir = os.environ.get("PLAN_DIR", "plans/r08")
    plan_tag = os.environ.get("PLAN_TAG", "before")
    repeat = int(os.environ.get("REPEAT", "1"))

    from arkhammirror_spark.session import get_spark

    spark = get_spark(
        "arkhammirror-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    if mode == "entry":
        from arkhammirror_spark.contract import build_contract

        registry, _ = build_contract()
    else:
        from arkhammirror_spark.queries import QUERIES as registry

    if names == ["all"]:
        names = list(registry.keys())

    import gc

    for name in names:
        fn = registry[name]
        for r in range(repeat):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build_s = time.perf_counter() - t0
            if mode in ("plan", "both") and r == 0:
                os.makedirs(plan_dir, exist_ok=True)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(plan_dir, f"{name}_{plan_tag}.txt"), "w"
                ) as f:
                    f.write(txt)
                print(f"# plan written: {name}_{plan_tag}.txt", flush=True)
            if mode in ("time", "both", "entry"):
                spark.sparkContext.setJobDescription(f"{name} [noop]")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                spark.sparkContext.setJobDescription(None)
                print(
                    f"{name}\trun{r}\tbuild={build_s:.3f}s\tnoop={wall:.3f}s",
                    flush=True,
                )
            del df
            gc.collect()
    spark.stop()


if __name__ == "__main__":
    main()
