#!/usr/bin/env python
"""Headline benchmark: dedup + analytics queries at a given scale factor.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...,
     "cores": N, "sf_dir": ...}

Production vs oracle mode (round-3 split): the HEADLINE times the
production LSH-only MinHash route (``minhash_pairs_lsh`` — the path the
scale pipeline runs); the deterministic oracle-mode twin ``minhash_pairs``
(LSH + exhaustive inverted-index recall backstop, double the candidate
work by design) stays under EXTRA so its cost is still visible but no
longer distorts the round-over-round headline.

Each query is timed SPARK_GRAFT_RUNS times (default 3) and the MINIMUM is
reported: this VM's wall clock varies 20-30% (occasionally 2x) under
background load, and run 1 additionally pays JIT/codegen warmup —
measured same-code spread across bench invocations was 18.6s vs 30.8s
min-of-2; min-of-3 restores the floor. `value` is the sum of per-query
minima.

Env:
    SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] parallelism (default 32)
    SPARK_GRAFT_RUNS    timed runs per query, min taken (default 3)

Two-scale protocol (BASELINE.md / BENCH/BASELINE.md): scripts/two_scale.py
runs the full pipeline at two executor scales; this file is the per-round
single-scale feedback loop.
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
    "assemble",           # P2 document assembly
    "exact_clusters",     # P3 exact tier
    "signatures",         # P5/P6 MinHash+SimHash kernel
    "minhash_pairs_lsh",  # P7-P9 LSH + verified Jaccard (production route)
    "substring_pairs",    # P11 winnowed substring pass
    "clusters",           # flagship: full dedup clustering (oracle ngram edges)
    "ngram_pairs",        # exact inverted-index Jaccard
    "quality",            # text analysis scan
    "ann_topk",           # brute-force cosine top-k
    "events_hourly",      # windowed aggregation
]

# timed and reported but kept OUT of the headline total (clusters_lsh sits
# here, not in HEADLINE, so round-over-round headline totals stay
# comparable — adding a query to HEADLINE would read as a regression)
EXTRA = [
    "clusters_lsh",      # at-scale flagship: clustering via LSH+sets-verify
                         # edges (the DedupPipeline route; same clusters as
                         # `clusters`, equality pinned in tests/test_entry.py)
    "minhash_pairs",     # ORACLE-mode MinHash (LSH + recall backstop union)
    "pricing_summary",   # Q1-shape scan aggregation
    "ship_priority",     # Q3-shape join + top-k
    "region_revenue",    # Q5-shape star join (broadcast dims)
    "embed_dup_pairs",   # LSH-bucketed embedding dedup
    "simhash_pairs",     # SimHash near-dup screen
    "user_sessions",     # gap sessionization (lag + cumsum windows)
    "bpe_token_count",   # BPE-regex token counting
    "ann_lsh_topk",      # hyperplane-LSH ANN (matmul sketch path)
    "ann_ivf_topk",      # IVF-Flat ANN (k-means coarse quantizer)
    "events_asof",       # as-of join (union + ordered forward-fill)
    "session_errors",    # interval join (bucketized containment)
    "event_quantiles_approx",  # GK-sketch percentiles (the at-scale form)
    "user_conversion",   # funnel (conditional-min aggregation)
    "user_running_spend",  # per-user running prefix sum (decimal-exact)
    "top_orders_per_segment",  # threshold-pruned top-N per group
    "doc_split",         # deterministic hash split (map-side only)
    "pack_sequences",    # token-budget sequence packing
    "line_dedup",        # intra-doc line dedup (JVM array ops)
    "multimodal_features",  # REAL PNG/BMP encode+decode over every doc
    "audio_features",    # REAL WAV encode+decode+spectral features per doc
    "decontaminate",     # benchmark-overlap screen (broadcast probe grams)
    "stream_exact_dedup",  # T17: 3-micro-batch incremental exact dedup
    "token_freq",        # corpus vocabulary counting (partial-agg + top-k)
    "repetition",        # Gopher-style duplicate-n-gram fractions (JVM)
]


def force(df) -> int:
    """Fully materialize (noop sink computes every column, unlike count)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def timed_min(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"cpdd_bench_{cores}",
        shuffle_partitions=max(cores, 16),
    )

    queries = dict(entry_mod.queries())
    # production MinHash route: benched here, oracle-gated via minhash_pairs
    queries["minhash_pairs_lsh"] = entry_mod.q_minhash_pairs_lsh
    # bench times the FULL signature table (the kernel over every doc);
    # the queries() 'signatures' entry is its pinned 20-row oracle probe
    queries["signatures"] = entry_mod.q_signatures_full

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = timed_min(lambda: force(queries[name](spark, sf_dir)), runs)
    total = round(sum(timings.values()), 3)

    extra: dict[str, float] = {}
    for name in EXTRA:
        extra[name] = timed_min(lambda: force(queries[name](spark, sf_dir)), runs)

    # throughput, both framings (the flagship-only number alone invited
    # misreading in round 2): turns/sec against the flagship clustering
    # wall AND against the whole headline wall
    n_turns = entry_mod.derived_transcripts(spark, sf_dir).count()
    turns_per_sec = round(n_turns / max(timings["clusters"], 1e-9), 1)
    turns_per_sec_total = round(n_turns / max(total, 1e-9), 1)

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
                "turns_per_sec_total": turns_per_sec_total,
                "runs_per_query": runs,
                "agg": "min",
                "cores": cores,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
