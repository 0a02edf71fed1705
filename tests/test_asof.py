"""As-of join: property-checked against pandas merge_asof (the reference
implementation of backward-inclusive as-of semantics), plus tolerance and
no-key variants. The driver-facing query is additionally oracle-checked
against DuckDB's native ASOF JOIN (test_entry)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cpdd_spark.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {
            "id": np.arange(400),
            "k": rng.integers(0, 8, 400),
            "t": rng.integers(0, 10_000, 400).astype("int64"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 8, 300),
                "t": rng.integers(0, 10_000, 300).astype("int64"),
                "payload": rng.normal(size=300),
            }
        )
        # kill (k, t) ties so every engine picks the same row
        .groupby(["k", "t"], as_index=False)
        .agg(payload=("payload", "max"))
    )
    return left, right


def _expected(left, right, tolerance=None):
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    return (
        pd.merge_asof(
            left.sort_values("t", kind="stable"),
            right.sort_values("t", kind="stable"),
            on="t",
            by="k",
            direction="backward",
            allow_exact_matches=True,
            **kw,
        )
        .set_index("id")["payload"]
    )


def test_asof_matches_merge_asof(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
        )
        .toPandas()
        .set_index("id")["right_payload"]
    )
    exp = _expected(left, right)
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_names=False
    )


def test_asof_tolerance(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            tolerance=500,
        )
        .toPandas()
        .set_index("id")["right_payload"]
    )
    exp = _expected(left, right, tolerance=500)
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_names=False
    )


def test_asof_no_by_key(spark):
    left = pd.DataFrame({"id": [0, 1, 2], "t": [5, 15, 2]})
    right = pd.DataFrame({"t": [3, 10], "v": [30.0, 100.0]})
    got = {
        r["id"]: r["right_v"]
        for r in asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), on="t"
        ).collect()
    }
    assert got == {0: 30.0, 1: 100.0, 2: None}


# ---------------------------------------------------------------------------
# interval (range-containment) join
# ---------------------------------------------------------------------------

def test_interval_join_containment_and_boundaries(spark):
    from cpdd_spark.rangejoin import interval_join

    points = spark.createDataFrame(
        [(0, "u", 5), (1, "u", 10), (2, "u", 20), (3, "u", 31), (4, "v", 10)],
        "pid int, k string, t long",
    )
    intervals = spark.createDataFrame(
        # [5,10] inclusive both ends; [8,30] overlaps it; v has its own
        [("u", "a", 5, 10), ("u", "b", 8, 30), ("v", "c", 0, 15)],
        "k string, iv string, s long, e long",
    )
    got = sorted(
        (r["pid"], r["iv"])
        for r in interval_join(
            points, intervals, on="t", start="s", end="e", by="k", bucket_width=7
        ).collect()
    )
    # pid0: in a only (5 is a's start boundary, before b). pid1: in BOTH
    # (10 = a's end boundary, inside b). pid2: b. pid3: nothing (31 > 30).
    # pid4: c (different key; u's intervals must not leak).
    assert got == [(0, "a"), (1, "a"), (1, "b"), (2, "b"), (4, "c")], got


def test_interval_join_bucket_width_invariance(spark):
    """The bucket width is a PERFORMANCE knob: results are identical at
    any width (intervals spanning many buckets dedupe nothing wrongly)."""
    import numpy as np

    from cpdd_spark.rangejoin import interval_join

    rng = np.random.default_rng(23)
    pts = [(int(i), int(k), int(t)) for i, (k, t) in enumerate(
        zip(rng.integers(0, 5, 200), rng.integers(0, 1000, 200)))]
    ivs = []
    for j in range(40):
        s = int(rng.integers(0, 900))
        ivs.append((int(rng.integers(0, 5)), j, s, s + int(rng.integers(0, 300))))
    points = spark.createDataFrame(pts, "pid int, k int, t long")
    intervals = spark.createDataFrame(ivs, "k int, iv int, s long, e long")

    def run(bw):
        return sorted(
            (r["pid"], r["iv"])
            for r in interval_join(
                points, intervals, on="t", start="s", end="e", by="k",
                bucket_width=bw,
            ).collect()
        )

    assert run(1) == run(64) == run(100000)


def test_interval_join_no_nested_loop_plan(spark):
    """The whole point: the plan must be an equi-join on (by, bucket),
    never a BroadcastNestedLoopJoin."""
    from cpdd_spark.rangejoin import interval_join

    points = spark.createDataFrame([(0, "u", 5)], "pid int, k string, t long")
    intervals = spark.createDataFrame([("u", "a", 0, 9)], "k string, iv string, s long, e long")
    plan = interval_join(
        points, intervals, on="t", start="s", end="e", by="k", bucket_width=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# empty-input robustness (the verify-skill probe list)
# ---------------------------------------------------------------------------

def test_asof_empty_right(spark):
    left = spark.createDataFrame([(0, "u", 5)], "id int, k string, t long")
    right = spark.createDataFrame([], "k string, t long, v double")
    rows = asof_join(left, right, on="t", by="k").collect()
    assert len(rows) == 1 and rows[0]["right_v"] is None


def test_interval_join_empty_sides(spark):
    from cpdd_spark.rangejoin import interval_join

    points = spark.createDataFrame([(0, "u", 5)], "pid int, k string, t long")
    no_iv = spark.createDataFrame([], "k string, iv string, s long, e long")
    assert interval_join(points, no_iv, on="t", start="s", end="e", by="k").count() == 0
    no_pts = spark.createDataFrame([], "pid int, k string, t long")
    iv = spark.createDataFrame([("u", "a", 0, 9)], "k string, iv string, s long, e long")
    assert interval_join(no_pts, iv, on="t", start="s", end="e", by="k").count() == 0


def test_ivf_tiny_and_empty_corpus(spark):
    from cpdd_spark.similarity import ivf_centroids, ivf_topk

    # tiny corpus the 1/16 hash-sample may miss: falls back to full scan
    tiny = spark.createDataFrame(
        [(i, [float(i + 1)] * 64) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    c = ivf_centroids(tiny, dim=64, n_centroids=4)
    assert c.shape == (4, 64)
    got = ivf_topk(tiny, tiny, dim=64, k=1, n_centroids=4, n_probe=4).collect()
    assert len(got) > 0
    # truly empty corpus: seeded planes, no crash
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    c2 = ivf_centroids(empty, dim=64, n_centroids=4)
    assert c2.shape == (4, 64)


def test_asof_null_payload_not_spliced(spark):
    """A legitimately-NULL payload column in the matched right row must
    come through as NULL — not forward-filled from an OLDER right row
    (the matched row attaches whole, as DuckDB ASOF / merge_asof do)."""
    left = spark.createDataFrame([("k", 10), ("k", 20)], "key string, t long")
    right = spark.createDataFrame(
        [("k", 5, 1.0, "v5"), ("k", 15, None, "v15")],
        "key string, t long, price double, tag string",
    )
    out = asof_join(left, right, on="t", by="key")
    rows = {
        r["t"]: (r["right_price"], r["right_tag"], r["right_t"])
        for r in out.collect()
    }
    assert rows[10] == (1.0, "v5", 5)
    # t=20 matches the t=15 row whose price IS NULL: must stay NULL
    assert rows[20] == (None, "v15", 15)


def test_asof_global_window_warns(spark):
    """by=None is a documented single-partition global window — a silent
    scale-killer on large frames, so it must WARN loudly, and with a
    category Python's DEFAULT filters actually display (UserWarning;
    ResourceWarning is suppressed by default, which would make the
    notice invisible outside test harnesses)."""
    import warnings

    left = spark.createDataFrame([(1, 10)], "id long, t long")
    right = spark.createDataFrame([(5, 1.0)], "t long, v double")
    with warnings.catch_warnings(record=True) as caught:
        # default filters, NOT simplefilter("always"): proves the warning
        # is visible to a plain interpreter
        warnings.resetwarnings()
        out = asof_join(left, right, on="t")
        assert any(
            issubclass(w.category, UserWarning)
            and "GLOBAL ordered window" in str(w.message)
            for w in caught
        )
    assert out.collect()[0]["right_v"] == 1.0

    # keyed path stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        asof_join(
            left.withColumn("k", F.lit(1)),
            right.withColumn("k", F.lit(1)),
            on="t",
            by="k",
        )
        assert not any("GLOBAL ordered window" in str(w.message) for w in caught)
