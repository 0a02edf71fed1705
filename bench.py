#!/usr/bin/env python
"""Headline benchmark: dedup + analytics queries at a given scale factor.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...,
     "cores": N, "sf_dir": ...}

Env:
    SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Two-scale protocol (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 on the
same input; scaling efficiency = (T8/T32)/4 on wall time (equivalently
throughput ratio / 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cpdd_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "assemble",          # P2 document assembly
    "exact_clusters",    # P3 exact tier
    "signatures",        # P5/P6 MinHash+SimHash kernel
    "minhash_pairs",     # P7-P9 LSH + verified Jaccard
    "substring_pairs",   # P11 winnowed substring pass
    "clusters",          # flagship: full dedup clustering
    "ngram_pairs",       # exact inverted-index Jaccard
    "quality",           # text analysis scan
    "ann_topk",          # brute-force cosine top-k
    "events_hourly",     # windowed aggregation
]

# round-2 additions, timed and reported but kept OUT of the headline total so
# `value` stays comparable across rounds
EXTRA = [
    "pricing_summary",   # Q1-shape scan aggregation
    "ship_priority",     # Q3-shape join + top-k
    "region_revenue",    # Q5-shape star join (broadcast dims)
    "embed_dup_pairs",   # LSH-bucketed embedding dedup
    "simhash_pairs",     # SimHash near-dup screen
    "user_sessions",     # gap sessionization (lag + cumsum windows)
    "bpe_token_count",   # BPE-regex token counting
]


def force(df) -> int:
    """Fully materialize (noop sink computes every column, unlike count)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"cpdd_bench_{cores}",
        shuffle_partitions=max(cores, 16),
    )

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    t_total0 = time.time()
    for name in HEADLINE:
        t0 = time.time()
        force(queries[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_total0, 3)

    extra: dict[str, float] = {}
    for name in EXTRA:
        t0 = time.time()
        force(queries[name](spark, sf_dir))
        extra[name] = round(time.time() - t0, 3)

    # throughput: turns processed by the flagship clustering per second of
    # its wall time (the north-rule metric's unit)
    n_turns = entry_mod.derived_transcripts(spark, sf_dir).count()
    turns_per_sec = round(n_turns / max(timings["clusters"], 1e-9), 1)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extra,
                "sf": sf,
                "turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "cores": cores,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
