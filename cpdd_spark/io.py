"""Table I/O shim: Iceberg on a real cluster, Parquet in the sandbox.

The north rule mandates Iceberg tables for input, clusters, metrics and
lineage. No Iceberg runtime jar ships with pyspark 4.1.2 offline, so this
module keeps ONE code path whose format resolves at runtime: if the session
has an Iceberg catalog configured we address tables by name through it;
otherwise we read/write Parquet directories with identical schemas and
partition specs. All pipeline code goes through :class:`TableIO` — swapping
the sandbox for a cluster changes zero pipeline lines.

Reference analogue: the recursive reference-directory scan
(/root/reference/src/cpdd/matching.c:150-204) and the copy-or-link sink
(/root/reference/src/cpdd/copy.c:242-338) — both become declarative
table scans/writes so Catalyst can prune partitions and push filters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.cpdd", None))
    except Exception:
        return False


class TableIO:
    """Named-table read/write over Iceberg (cluster) or Parquet dirs (sandbox).

    ``root`` is the warehouse directory in Parquet mode; ignored for Iceberg.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.iceberg = _has_iceberg(spark)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"cpdd.{name}")
        # Parquet dir counts only when the write committed (_SUCCESS marker):
        # mirrors cpdd's crash-safe partial-output cleanup
        # (/root/reference/src/cpdd/copy.c:28-67) — a killed write leaves no
        # readable table, so resume re-runs that stage.
        return os.path.isfile(os.path.join(self.path(name), "_SUCCESS"))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.format("iceberg").load(f"cpdd.{name}")
        return self.spark.read.parquet(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.iceberg:
            w = df.writeTo(f"cpdd.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        self._write_parquet(df, name, "overwrite", partition_by)

    def append(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        if self.iceberg:
            # Iceberg fixes the partition spec at table creation — apply it
            # on the first append (create), inherit it afterwards
            if partition_by and not self.spark.catalog.tableExists(f"cpdd.{name}"):
                from pyspark.sql import functions as F

                df.writeTo(f"cpdd.{name}").partitionedBy(
                    *[F.col(c) for c in partition_by]
                ).create()
                return
            df.writeTo(f"cpdd.{name}").append()
        else:
            self._write_parquet(df, name, "append", partition_by)

    def _write_parquet(
        self, df: DataFrame, name: str, mode: str, partition_by: list[str] | None
    ) -> None:
        """Parquet write with empty-output guards — a degenerate write must
        still commit a READABLE (schema-bearing) table:

        - a ZERO-partition DataFrame (empty input relation) writes no
          parquet part files at all, only _SUCCESS, and read-back then
          fails schema inference → force one empty file (getNumPartitions
          is plan metadata, no job);
        - a dynamic-partitioned write of ZERO rows creates no partition
          directories (same unreadable result). Detected AFTER the write by
          a filesystem walk (no part file anywhere under the table dir) —
          an upfront ``isEmpty()`` would re-execute the full upstream plan
          once per non-degenerate partitioned write just to prove it
          non-empty; the walk costs ~zero and only the degenerate shape
          pays the rewrite. The rewrite commits the empty table
          unpartitioned: the partition column stays as a data column, so
          the read-back schema is unchanged."""
        if df.rdd.getNumPartitions() == 0:
            df = df.repartition(1)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))
        if partition_by and not self._has_part_files(self.path(name)):
            df.repartition(1).write.mode("overwrite").parquet(self.path(name))

    @staticmethod
    def _has_part_files(path: str) -> bool:
        """True if a committed part file exists under ``path``.

        The walk only works on a LOCAL path; for a remote warehouse
        (hdfs://, s3a://, ...) ``os.walk`` yields nothing, which would
        read as "empty" and trigger a destructive unpartitioned rewrite
        of a perfectly good table. A remote path therefore answers
        through the JVM Hadoop FileSystem instead — same question, same
        cost class (one directory listing), no local-FS assumption."""
        if "://" in path and not path.startswith("file://"):
            return TableIO._has_part_files_hadoop(path)
        local = path[len("file://") :] if path.startswith("file://") else path
        for root, _dirs, files in os.walk(local):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    @staticmethod
    def _has_part_files_hadoop(path: str) -> bool:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        jvm = spark._jvm
        jsc = spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return False
        it = fs.listFiles(hpath, True)  # recursive
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                return True
        return False

    def drop(self, name: str) -> None:
        if self.iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS cpdd.{name}")
            return
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)
