"""Physical-plan regression guards: the properties docs/SCALE.md claims
(pushdown, pruning, no global sort in assembly) must stay visible in
``.explain`` output — a plan regression is a perf bug even when results
stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpdd_spark.assemble import assemble_documents

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    # earlier test modules may have cached the same tables; a cached
    # relation rewrites the plan (InMemoryTableScan / ReusedExchange) and
    # hides the scan-level properties these tests assert
    df.sparkSession.catalog.clearCache()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("n_chars > 100")
        .select("doc_id", "text")
    )
    plan = _plan(df)
    assert "n_chars" in plan.split("DataFilters")[1][:200]  # filter reached scan
    # pruned read schema: only the 3 referenced columns, not lang/source
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "lang" not in scan and "source" not in scan


def test_assemble_plan_shape(spark, turns_df):
    plan = _plan(assemble_documents(turns_df))
    # partial + final hash aggregation around exactly one exchange...
    assert plan.count("Exchange hashpartitioning") == 1
    # ...and no sort operator: ordering is array_sort inside the agg row
    assert "Sort [" not in plan


def test_pricing_summary_pushdown(spark):
    """The Q1-shape scan must push the shipdate filter into the parquet
    reader (raw TIMESTAMP_NTZ comparison — a to_date() wrapper would block
    pushdown) and prune to the 7 referenced columns."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.queries()["pricing_summary"](spark, SF))
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "LessThanOrEqual(l_shipdate" in scan  # pushed filter
    assert "l_orderkey" not in scan and "l_partkey" not in scan  # pruned


def test_region_revenue_broadcasts_dims(spark):
    """The Q5-shape star join must broadcast the dimension tables, not
    shuffle the fact table against them."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.queries()["region_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "CartesianProduct" not in plan


def test_exact_eager_path_skips_window(spark, turns_df):
    from cpdd_spark.exact import exact_clusters

    docs = assemble_documents(turns_df)
    lazy_plan = _plan(exact_clusters(docs, lazy_hash=True))
    eager_plan = _plan(exact_clusters(docs, lazy_hash=False))
    assert lazy_plan.count("Window") == 2
    assert eager_plan.count("Window") == 1
