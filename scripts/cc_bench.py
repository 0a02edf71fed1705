"""Measure driver-union-find vs distributed-CC — crossover AND scale proof.

Two modes:

1. Default (legacy, r4 verdict #7): chains-only graph just above the
   auto-switch byte bound, both strategies timed, cluster counts must
   agree.  ``python scripts/cc_bench.py [n_edges] [chain_len]``

2. ``--scale`` (r6 verdict #5): sweep to >= 20 M edges on a MIXED graph
   — 60% chains of 32 (diameter driver), 30% stars of fan 64 (min-label
   fan-in), 10% one deterministic hot component (a spanning chain over
   the hot block plus hash-random extra edges: exactly ONE component,
   heavily skewed degrees).  Everything is generated executor-side
   (spark.range + hash arithmetic — nothing materializes on the
   driver), the analytic component count is known exactly at every
   size, the distributed path reports its ROUND count (pointer
   jumping's O(log diameter) bound), and the driver path runs wherever
   its estimated collect fits the heap so the crossover (or its
   absence) is measured, not asserted.
   ``python scripts/cc_bench.py --scale [sizes-in-edges ...]``

Prints one JSON line per configuration; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cpdd_spark.cc import _driver_cc_bound, connected_components
from cpdd_spark.session import get_spark

CHAIN_LEN = 32
STAR_FAN = 64
_ID = "conv_%033d"
# disjoint vertex-id blocks per topology
_STAR_BASE = 10**9
_HOT_BASE = 2 * 10**9


def _fmt(col):
    return F.format_string(_ID, col)


def _chains(spark, n_edges: int):
    """Chains of CHAIN_LEN vertices: edge (v, v+1) unless v closes one.
    The range length is sized so the filter yields EXACTLY n_edges rows
    (31 edges per 32-id block) — no driver-side limit() shuffle."""
    per = CHAIN_LEN - 1
    m = (n_edges // per) * CHAIN_LEN + (n_edges % per)
    ids = spark.range(m).filter((F.col("id") % CHAIN_LEN) != per)
    return ids.select(_fmt(F.col("id")).alias("a"), _fmt(F.col("id") + 1).alias("b"))


def _stars(spark, n_edges: int):
    """Stars: hub + STAR_FAN leaves, one edge per leaf."""
    i = spark.range(n_edges)
    hub = _STAR_BASE + (F.col("id") / STAR_FAN).cast("long") * (STAR_FAN + 1)
    leaf = hub + 1 + F.col("id") % STAR_FAN
    return i.select(_fmt(hub).alias("a"), _fmt(leaf).alias("b"))


def _hot(spark, n_edges: int):
    """One deterministic hot component: spanning chain over the block
    (guarantees exactly one component) + hash-random extra edges
    (skewed collisions)."""
    n_vertices = max(2, n_edges // 2)
    chain = spark.range(n_vertices - 1).select(
        _fmt(_HOT_BASE + F.col("id")).alias("a"),
        _fmt(_HOT_BASE + F.col("id") + 1).alias("b"),
    )
    extra = spark.range(max(0, n_edges - (n_vertices - 1))).select(
        _fmt(
            _HOT_BASE + F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_vertices))
        ).alias("a"),
        _fmt(
            _HOT_BASE + F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_vertices))
        ).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return chain.unionByName(extra)


def _mixed(spark, n_edges: int):
    n_chain = int(n_edges * 0.6)
    n_star = int(n_edges * 0.3)
    n_hot = n_edges - n_chain - n_star
    edges = (
        _chains(spark, n_chain)
        .unionByName(_stars(spark, n_star))
        .unionByName(_hot(spark, n_hot))
        .localCheckpoint(eager=True)
    )
    # exact analytic component count: full chains + a possible partial
    # tail chain, full stars + a possible partial star, + 1 hot component
    n_chains = -(-n_chain // (CHAIN_LEN - 1))
    n_stars = -(-n_star // STAR_FAN)
    expected = n_chains + n_stars + 1
    return edges, expected


def run_scale(sizes: list[int]) -> None:
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    for n in sizes:
        edges, expected = _mixed(spark, n)
        n_actual = edges.count()
        est = n_actual * (80 + 100)
        row: dict[str, object] = {
            "metric": "cc_scale",
            "requested_edges": n,
            "edges": n_actual,
            "expected_clusters": expected,
            "est_bytes": est,
            "driver_bound_bytes": _driver_cc_bound(spark),
        }
        for strategy in ("distributed", "driver"):
            if strategy == "driver" and est > (2 << 30):
                row["driver_sec"] = None  # collect would be multi-GB; skipped
                continue
            stats: dict = {}
            best, n_clusters, rounds = None, None, None
            for _ in range(2):
                t0 = time.monotonic()
                clusters = connected_components(
                    edges, strategy=strategy, stats=stats
                )
                n_clusters = clusters.select("cluster_id").distinct().count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                rounds = stats.get("rounds")
            row[f"{strategy}_sec"] = round(best, 2)
            row[f"{strategy}_clusters"] = n_clusters
            if strategy == "distributed":
                row["rounds"] = rounds
            assert n_clusters == expected, (strategy, n_clusters, expected)
        if row.get("driver_clusters") is not None:
            assert row["driver_clusters"] == row["distributed_clusters"], row
        print(json.dumps(row), flush=True)
        edges.unpersist()
    spark.stop()


def main() -> None:
    if "--scale" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--scale"]
        sizes = [int(a) for a in args] or [2_000_000, 8_000_000, 20_000_000]
        run_scale(sizes)
        return

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    # chains of `chain` vertices: edge (v, v+1) unless v closes a chain.
    # 40-char ids ≈ the conv_id width class; est_bytes/edge ≈ 80 + 100.
    ids = spark.range(n_edges + 1).filter(
        (F.col("id") % chain) != (chain - 1)
    )
    edges = ids.select(
        F.format_string(_ID, F.col("id")).alias("a"),
        F.format_string(_ID, F.col("id") + 1).alias("b"),
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
