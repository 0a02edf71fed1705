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


def test_token_freq_take_ordered(spark):
    """The vocabulary top-100 must be per-partition heaps
    (TakeOrderedAndProject), never a global sort of the whole count
    table, and the count must partial-aggregate before the shuffle."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.queries()["token_freq"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the exchange


def test_decontaminate_broadcasts_probe_grams(spark):
    """The decontamination screen must broadcast the probe-gram union
    (map-side semi-join against the corpus-side explode), never shuffle
    the corpus grams against the probe set, and never go cartesian."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.queries()["decontaminate"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def _window_is_partitionless(line: str) -> bool:
    """Parse a physical-plan 'Window ...' line. Spark prints only the
    NON-EMPTY specs: ([funcs], [part], [order]) when fully specified,
    ([funcs], [part]) for partitioned-unordered, ([funcs], [order]) for the
    partition-less 'Moving all data to a single partition' shape. With two
    groups, the second is an ORDER spec (and the window partition-less) iff
    it carries sort directions."""
    s = line[line.index("Window ") + len("Window ") :]
    depth = 0
    groups: list[str] = []
    start = 0
    for i, ch in enumerate(s):
        if ch == "[":
            depth += 1
            if depth == 1:
                start = i
        elif ch == "]":
            depth = max(depth - 1, 0)
            if depth == 0:
                groups.append(s[start : i + 1])
    if len(groups) >= 3:
        return False
    if len(groups) <= 1:
        return True  # funcs only: no partition, no order
    second = groups[1]
    return " ASC" in second or " DESC" in second


def test_no_unbounded_single_partition_window(spark):
    """Scale guard (round-2 verdict item 2): no queries() plan may funnel
    an UNBOUNDED input through a partition-less Window (WindowExec moves
    all rows to one task — a scale-killer invisible at sf0.001). A
    partition-less Window is tolerated only when the plan bounds its input
    first (TakeOrderedAndProject / GlobalLimit — e.g. ship_priority ranks
    the already-limited top-10)."""
    import __spark_entry__ as entry_mod

    offenders = []
    for name, q in entry_mod.queries().items():
        if name == "pipeline_metrics":
            continue  # runs a full pipeline at build time; covered by test_pipeline
        plan = _plan(q(spark, SF))
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window [" not in line:
                continue
            if not _window_is_partitionless(line):
                continue  # partitioned: parallel
            below = "\n".join(lines[i:])  # children print after the node
            if "TakeOrderedAndProject" not in below and "GlobalLimit" not in below:
                offenders.append((name, line.strip()))
    assert offenders == [], f"partition-less Window over unbounded input: {offenders}"


def test_ship_priority_take_ordered(spark):
    """The Q3 top-10 must compile to TakeOrderedAndProject (parallel
    per-partition heaps), not a global-window rank over the aggregate."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.queries()["ship_priority"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_exact_eager_path_skips_window(spark, turns_df):
    from cpdd_spark.exact import exact_clusters

    docs = assemble_documents(turns_df)
    lazy_plan = _plan(exact_clusters(docs, lazy_hash=True))
    eager_plan = _plan(exact_clusters(docs, lazy_hash=False))
    assert lazy_plan.count("Window") == 2
    assert eager_plan.count("Window") == 1


def test_no_unsanctioned_cartesian_products(spark):
    """Global scale guard: the ONLY plans allowed to contain a cartesian
    product are the two explicitly-documented exact ANN baselines
    (ann_topk / embed_dup_pairs twin paths run brute force BY DESIGN as
    the oracle twins of the LSH/IVF routes). Any other query acquiring a
    crossJoin — e.g. a lost join key after a refactor — fails here before
    it fails at 100x the data."""
    import __spark_entry__ as entry_mod

    ALLOWED = {"ann_topk", "ann_recall", "ivf_recall"}  # exact-baseline halves
    offenders = []
    for name, q in entry_mod.queries().items():
        if name in ALLOWED or name == "pipeline_metrics":
            continue
        plan = _plan(q(spark, SF))
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert offenders == [], offenders


def test_embed_dup_pairs_no_string_casts(spark):
    """The typed-id candidate path (similarity.cosine_dup_pairs_lsh ->
    pairs_from_buckets(id_col='id')) must keep native LONG vector ids end
    to end: a reintroduced string cast would triple the shuffle key bytes
    and silently regress the r5 typed-id work. No cast-to-string may
    appear anywhere in the executed plan."""
    import re

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["embed_dup_pairs"](spark, SF)
    plan = _plan(df).lower()
    casts = re.findall(r"cast\([^)]*as string\)", plan)
    assert not casts, casts[:5]
