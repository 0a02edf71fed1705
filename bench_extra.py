#!/usr/bin/env python
"""Round-8 optimization harness: per-query timing + plan capture.

bench.py is FROZEN for measurement, so the optimization loop lives here:
same methodology (noop sink, min-of-N timed runs, same session settings),
but selectable query subsets, job labels for the UI, and optional
``.explain("formatted")`` capture into plans/r08/.

Usage:
    python bench_extra.py [query ...]            # time queries (all if none)
    python bench_extra.py --plans [query ...]    # also dump explain files
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_RUNS as in bench.py
    BENCH_EXTRA_SUFFIX names the plan files (_before / _after).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from cpdd_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    args = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "")

    spark = get_spark(
        master=f"local[{cores}]",
        app_name="cpdd_bench_extra",
        shuffle_partitions=max(cores, 16),
    )

    queries = dict(entry_mod.queries())
    queries["minhash_pairs_lsh"] = entry_mod.q_minhash_pairs_lsh
    queries["signatures"] = entry_mod.q_signatures_full

    names = args or list(queries)
    timings: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        if dump_plans:
            os.makedirs("plans/r08", exist_ok=True)
            with open(f"plans/r08/{name}{suffix}.txt", "w") as f:
                f.write(fn(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            force(fn(spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        timings[name] = samples
        print(json.dumps({"q": name, "min": min(samples), "samples": samples}),
              flush=True)

    print(json.dumps({
        "sf_dir": sf_dir, "cores": cores, "runs": runs,
        "min_total": round(sum(min(s) for s in timings.values()), 3),
        "queries": {k: min(v) for k, v in timings.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
