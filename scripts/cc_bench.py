"""Measure the driver-union-find vs distributed-CC crossover (verdict r4 #7).

The auto strategy switches on an estimated-bytes bound
(cpdd_spark.cc.DRIVER_CC_MAX_BYTES = 64 MB). This script MEASURES both
strategies just above that bound on the same synthetic edge list, so the
crossover is grounded in numbers instead of asserted: generate a
chains-of-length-L graph entirely executor-side (spark.range — no driver
materialization), run each strategy, report wall seconds and the cluster
count (both must agree).

Usage: python scripts/cc_bench.py [n_edges] [chain_len]
Prints one JSON line; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cpdd_spark.cc import _driver_cc_bound, connected_components
from cpdd_spark.session import get_spark


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    # chains of `chain` vertices: edge (v, v+1) unless v closes a chain.
    # 40-char ids ≈ the conv_id width class; est_bytes/edge ≈ 80 + 100.
    ids = spark.range(n_edges + 1).filter(
        (F.col("id") % chain) != (chain - 1)
    )
    edges = ids.select(
        F.format_string("conv_%033d", F.col("id")).alias("a"),
        F.format_string("conv_%033d", F.col("id") + 1).alias("b"),
    ).localCheckpoint(eager=True)
    n = edges.count()
    est = n * (80 + 100)

    out: dict[str, object] = {
        "metric": "cc_strategy_crossover",
        "n_edges": n,
        "chain_len": chain,
        "est_bytes": est,
        # the effective auto-switch bound (scaled to spark.driver.memory;
        # 64 MB floor / 1 GB cap — heap-safety, not a latency crossover)
        "driver_bound_bytes": _driver_cc_bound(spark),
        "above_bound": est > _driver_cc_bound(spark),
    }
    for strategy in ("driver", "distributed"):
        best = None
        n_clusters = None
        for _ in range(2):
            t0 = time.monotonic()
            clusters = connected_components(edges, strategy=strategy)
            n_clusters = (
                clusters.select("cluster_id").distinct().count()
            )
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[f"{strategy}_sec"] = round(best, 2)
        out[f"{strategy}_clusters"] = n_clusters
    assert out["driver_clusters"] == out["distributed_clusters"], out
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
