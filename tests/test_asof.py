"""As-of join: property-checked against pandas merge_asof (the reference
implementation of backward-inclusive as-of semantics), plus tolerance and
no-key variants. The driver-facing query is additionally oracle-checked
against DuckDB's native ASOF JOIN (test_entry)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

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
