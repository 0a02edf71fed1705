"""Structured Streaming: incremental exact dedup of arriving transcripts.

The reference is single-pass batch over a frozen snapshot
(/root/reference/README:250); its incrementality story is "rerun with
no-clobber" (copy.c:73-96). This module upgrades that to a streaming
micro-batch pipeline: new turn files land in a directory (stand-in for a
Kafka/Iceberg CDC source), each micro-batch assembles ONLY complete new
conversations, exact-matches them against the already-clustered corpus
(the reference index probe, matching.c:320-375), and appends cluster
assignments — arriving duplicates link to existing canonicals.

Uses ``foreachBatch`` because the dedup probe needs a join against the
mutable clusters table — the documented pattern for stateful sinks that
Structured Streaming's append-only model can't express natively. Watermarks
are not needed for exact dedup of whole conversations (a conversation is
complete by construction when its file lands); a late-turn variant would
hang ``withWatermark('ts', ...)`` on this same scaffold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cpdd_spark.assemble import assemble_documents

TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


class IncrementalDedup:
    """Streaming exact-dedup into a clusters directory.

    ``clusters_dir`` holds the accumulated ``(conv_id, n_turns, doc_len,
    md5, xxh64, cluster_id)`` assignments; each micro-batch probes it and appends
    rows for new conversations (first-seen conv of new content becomes its
    own canonical — min-key-wins within the batch for determinism).
    """

    def __init__(self, spark: SparkSession, clusters_dir: str):
        self.spark = spark
        self.clusters_dir = clusters_dir

    def _existing(self) -> DataFrame | None:
        try:
            if any(f.endswith(".parquet") for f in os.listdir(self.clusters_dir)):
                # mergeSchema: a directory migrated from the md5-only layout
                # mixes files with and without xxh64 — a plain read could
                # pick the narrow schema and silently drop the column
                df = self.spark.read.option("mergeSchema", "true").parquet(
                    self.clusters_dir
                )
                if "xxh64" not in df.columns:  # pure-legacy directory
                    df = df.withColumn("xxh64", F.lit(None).cast("long"))
                return df
        except FileNotFoundError:
            pass
        return None

    def process_batch(self, turns: DataFrame, batch_id: int = 0) -> None:
        # dual fingerprints: the cross-batch probe joins on BOTH hash
        # families (+ exact length/turn counts) — the same relaxed-verify
        # guarantee as exact_clusters(verify='fingerprint'): a wrong
        # assignment needs simultaneous md5+xxhash64 collisions at equal
        # length (~2^-192), vs the raw-md5 probe this replaces, which
        # silently trusted a single 128-bit family
        docs = (
            assemble_documents(turns)
            .withColumn("md5", F.md5("doc"))
            .withColumn("xxh64", F.xxhash64("doc"))
        )
        existing = self._existing()
        if existing is not None:
            # no-clobber: conversations already assigned are skipped
            docs = docs.join(
                existing.select("conv_id"), "conv_id", "left_anti"
            )
        # within-batch canonical: min conv_id per content (exact tier key)
        from pyspark.sql import Window

        grp = Window.partitionBy("n_turns", "doc_len", "md5", "doc")
        batch_assigned = docs.withColumn(
            "batch_canon", F.min("conv_id").over(grp)
        )
        if existing is not None:
            # probe the existing index on the exact key; prefer the existing
            # canonical (first-match-wins across time, matching.c:320-375)
            # min() (not dropDuplicates) so a replayed/duplicated index row
            # can never flip the assignment — deterministic across retries
            probe = (
                existing.groupBy(
                    F.col("n_turns").alias("e_nt"),
                    F.col("doc_len").alias("e_dl"),
                    F.col("md5").alias("e_md5"),
                    F.col("xxh64").alias("e_xxh"),
                )
                .agg(F.min("cluster_id").alias("e_cluster"))
            )
            batch_assigned = batch_assigned.join(
                probe,
                (F.col("n_turns") == F.col("e_nt"))
                & (F.col("doc_len") == F.col("e_dl"))
                & (F.col("md5") == F.col("e_md5"))
                # legacy (pre-xxh64) index rows carry a null e_xxh: accept
                # the md5-only match for those — the original guarantee —
                # instead of null-comparing to false and re-canonicalizing
                # known content under a new cluster_id
                & (F.col("e_xxh").isNull() | (F.col("xxh64") == F.col("e_xxh"))),
                "left",
            )
            # a content key present both as a legacy row and a dual-hash row
            # would match twice — collapse to the minimum existing canonical
            batch_assigned = batch_assigned.groupBy(
                "conv_id", "n_turns", "doc_len", "md5", "xxh64", "batch_canon"
            ).agg(F.min("e_cluster").alias("e_cluster"))
        else:
            batch_assigned = batch_assigned.withColumn("e_cluster", F.lit(None))
        out = batch_assigned.select(
            "conv_id",
            "n_turns",
            "doc_len",
            "md5",
            "xxh64",
            F.coalesce(F.col("e_cluster"), F.col("batch_canon")).alias("cluster_id"),
        )
        out.write.mode("append").parquet(self.clusters_dir)

    def start(self, input_dir: str, checkpoint_dir: str) -> StreamingQuery:
        """File-source stream -> foreachBatch incremental dedup. The
        checkpoint dir gives exactly-once batch tracking (crash-resume:
        Spark replays uncommitted batches; process_batch's anti-join makes
        replays idempotent)."""
        stream = (
            self.spark.readStream.schema(TURNS_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .parquet(input_dir)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
