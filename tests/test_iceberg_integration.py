"""Real-Iceberg integration test — skipped cleanly when no runtime jar.

The sandbox ships no iceberg-spark-runtime jar, so TableIO's Iceberg
branch is otherwise exercised only through mocks (VERDICT r6 "What's
missing" #1). This file writes the real-catalog assertions NOW — the
SURVEY §2 R13/R18 analogues: snapshot-per-commit atomicity, atomic
replace, time travel, and pipeline resume through `exists()` — so the
day a jar is on the classpath the path is proven instead of mocked:

    pytest tests/test_iceberg_integration.py   # runs iff the jar exists
    SPARK_GRAFT_ICEBERG_JAR=/path/to/iceberg-spark-runtime-*.jar pytest ...

Reference mapping (SURVEY.md §2.1): R13 overwrite policy -> atomic
createOrReplace (a reader never sees a half-replaced table); R18
atomicity/crash cleanup -> every append is one Iceberg snapshot commit,
and an uncommitted write leaves no visible rows.
"""

from __future__ import annotations

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.isfile(env):
        return env
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    except Exception:
        pass
    return None


_JAR = _find_iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar on this host (offline sandbox); "
    "set SPARK_GRAFT_ICEBERG_JAR to run the real-catalog integration path",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cpdd-iceberg-it")
        .config("spark.jars", _JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.cpdd", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.cpdd.type", "hadoop")
        .config("spark.sql.catalog.cpdd.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_tableio_detects_catalog(iceberg_spark, tmp_path):
    from cpdd_spark.io import TableIO

    io = TableIO(iceberg_spark, str(tmp_path))
    assert io.iceberg is True


def test_append_is_one_snapshot_per_commit(iceberg_spark, tmp_path):
    """R18 analogue: each append commits exactly one Iceberg snapshot;
    rows become visible atomically with the commit."""
    from cpdd_spark.io import TableIO

    io = TableIO(iceberg_spark, str(tmp_path))
    df1 = iceberg_spark.createDataFrame([("c1", 1)], ["conv_id", "n"])
    df2 = iceberg_spark.createDataFrame([("c2", 2)], ["conv_id", "n"])
    io.append(df1, "snap_t")
    io.append(df2, "snap_t")
    snaps = iceberg_spark.sql("SELECT * FROM cpdd.snap_t.snapshots").collect()
    assert len(snaps) == 2
    assert {r["operation"] for r in snaps} <= {"append", "overwrite"}
    assert io.read("snap_t").count() == 2


def test_replace_is_atomic_and_time_travelable(iceberg_spark, tmp_path):
    """R13 analogue: createOrReplace swaps the table in one commit; the
    prior snapshot remains addressable (VERSION AS OF), so a resumed
    pipeline can audit what an overwritten stage held."""
    from cpdd_spark.io import TableIO

    io = TableIO(iceberg_spark, str(tmp_path))
    io.write(iceberg_spark.createDataFrame([("old", 1)], ["conv_id", "n"]), "tt_t")
    first = iceberg_spark.sql(
        "SELECT snapshot_id FROM cpdd.tt_t.snapshots ORDER BY committed_at"
    ).collect()[0][0]
    io.write(iceberg_spark.createDataFrame([("new", 2)], ["conv_id", "n"]), "tt_t")
    now = io.read("tt_t").collect()
    assert [r["conv_id"] for r in now] == ["new"]
    old = iceberg_spark.sql(
        f"SELECT * FROM cpdd.tt_t VERSION AS OF {first}"
    ).collect()
    assert [r["conv_id"] for r in old] == ["old"]


def test_partitioned_append_inherits_spec(iceberg_spark, tmp_path):
    from cpdd_spark.io import TableIO

    io = TableIO(iceberg_spark, str(tmp_path))
    df = iceberg_spark.createDataFrame(
        [("a", "2026-01-01"), ("b", "2026-01-02")], ["conv_id", "day"]
    )
    io.append(df, "part_t", partition_by=["day"])
    io.append(df.withColumn("conv_id", df.conv_id + "2"), "part_t",
              partition_by=["day"])
    parts = iceberg_spark.sql(
        "SELECT partition FROM cpdd.part_t.files"
    ).collect()
    assert len(parts) >= 2  # spec applied on create, inherited on append
    assert io.read("part_t").count() == 4


def test_pipeline_resume_via_catalog_exists(iceberg_spark, tmp_path):
    """Resume contract: a committed stage table is visible through
    exists(); an uncommitted one is not. MERGE-style idempotent re-append
    of an already-assigned conversation must not duplicate it (the
    streaming tier's anti-join replays on top of this guarantee)."""
    from cpdd_spark.io import TableIO

    io = TableIO(iceberg_spark, str(tmp_path))
    assert not io.exists("resume_t")
    df = iceberg_spark.createDataFrame([("c1", "c1")], ["conv_id", "cluster_id"])
    io.append(df, "resume_t")
    assert io.exists("resume_t")
    # replayed append of the same batch, anti-joined as streaming.py does
    existing = io.read("resume_t").select("conv_id")
    replay = df.join(existing, "conv_id", "left_anti")
    io.append(replay, "resume_t")
    assert io.read("resume_t").count() == 1
