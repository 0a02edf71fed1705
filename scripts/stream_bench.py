#!/usr/bin/env python
"""Streaming near-tier throughput (round-4 verdict item 8).

The incremental dedup stream (exact probe + NEAR-duplicate index probe)
was pytest-only; this measures it: a seeded fixture is split into K
single-file micro-batches, drained through ``IncrementalDedup.start``
(availableNow, maxFilesPerTrigger=1 so every file is its own batch), and
the drain is timed end to end. Reported beside the batch pipeline's
numbers in BENCH/BASELINE.md:

- turns/sec over the whole drain (micro-batch overhead INCLUDED — that
  is the streaming tax the number exists to expose);
- near-index growth (docs/bands rows after the drain);
- compaction effect (rows before/after, wall seconds);
- a post-compaction single-batch probe time (the steady-state cost of
  one more micro-batch against a compacted index).

Usage: python scripts/stream_bench.py [--convs 20000] [--batches 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument(
        "--max-files-per-trigger",
        type=int,
        default=1,
        help="files per micro-batch; 1 = every file its own batch (the "
        "documented worst-case shape — note r3-r5 records ran the "
        "default 8, i.e. a 2-micro-batch drain for 10 files)",
    )
    args = ap.parse_args()

    from cpdd_spark.fixtures import FixtureParams, generate
    from cpdd_spark.session import get_spark
    from cpdd_spark.streaming import IncrementalDedup

    fx = generate(FixtureParams(num_convs=args.convs, seed=42))
    conv_ids = sorted(fx.truth["conv_id"])
    n_turns = len(fx.transcripts)

    base = tempfile.mkdtemp(prefix="stream_bench_")
    watch = os.path.join(base, "in")
    os.makedirs(watch)
    per = -(-len(conv_ids) // args.batches)
    for i in range(args.batches):
        ids = set(conv_ids[i * per : (i + 1) * per])
        part = fx.transcripts[fx.transcripts["conv_id"].isin(ids)]
        # single FILES: the file stream source does not see directories
        part.to_parquet(os.path.join(watch, f"batch_{i:03d}.parquet"), index=False)

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    dedup = IncrementalDedup(
        spark,
        os.path.join(base, "clusters"),
        near_index_dir=os.path.join(base, "nearidx"),
    )

    t0 = time.time()
    q = dedup.start(
        watch,
        os.path.join(base, "ckpt"),
        max_files_per_trigger=args.max_files_per_trigger,
    )
    q.awaitTermination()
    drain_s = time.time() - t0

    docs_rows = spark.read.parquet(os.path.join(base, "nearidx", "docs")).count()
    bands_rows = spark.read.parquet(os.path.join(base, "nearidx", "bands")).count()
    out_rows = spark.read.parquet(os.path.join(base, "clusters")).count()

    t1 = time.time()
    comp = dedup.compact_index()
    compact_s = time.time() - t1

    # steady-state: one more micro-batch against the compacted index
    probe_ids = set(conv_ids[:per])
    part = fx.transcripts[fx.transcripts["conv_id"].isin(probe_ids)].copy()
    part["conv_id"] = part["conv_id"] + "_replay"
    pb = spark.createDataFrame(part)
    t2 = time.time()
    dedup.process_batch(pb, batch_id=10_000)
    probe_s = time.time() - t2

    print(
        json.dumps(
            {
                "metric": "streaming_near_tier",
                "convs": args.convs,
                "turns": n_turns,
                "batches": args.batches,
                "max_files_per_trigger": args.max_files_per_trigger,
                "drain_sec": round(drain_s, 2),
                "turns_per_sec": round(n_turns / drain_s, 1),
                "clusters_rows": out_rows,
                "index_docs_rows": docs_rows,
                "index_bands_rows": bands_rows,
                "compact": comp,
                "compact_sec": round(compact_s, 2),
                "post_compact_batch_sec": round(probe_s, 2),
            }
        )
    )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
