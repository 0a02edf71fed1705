"""Driver union-find vs distributed label propagation: identical clusters."""

from __future__ import annotations

from cpdd_spark.cc import connected_components


def _clusters(spark, edges, strategy, vertices=None):
    e = spark.createDataFrame(edges, "a string, b string")
    v = (
        spark.createDataFrame([(x,) for x in vertices], "conv_id string")
        if vertices
        else None
    )
    return {
        r["conv_id"]: r["cluster_id"]
        for r in connected_components(e, v, strategy=strategy).collect()
    }


def test_strategies_agree(spark):
    edges = [
        ("b", "c"), ("a", "b"), ("x", "y"), ("y", "z"),
        ("m", "n"), ("n", "a"),
    ]
    verts = ["a", "b", "c", "x", "y", "z", "m", "n", "solo"]
    d = _clusters(spark, edges, "driver", verts)
    p = _clusters(spark, edges, "distributed", verts)
    assert d == p
    assert d["solo"] == "solo"
    assert d["c"] == "a" and d["n"] == "a" and d["z"] == "x"


def test_auto_small_uses_driver_result(spark):
    edges = [(f"v{i:04d}", f"v{i+1:04d}") for i in range(100)]
    auto = _clusters(spark, edges, "auto")
    assert set(auto.values()) == {"v0000"}


def test_driver_empty_edges(spark):
    got = _clusters(spark, [], "driver", vertices=["p", "q"])
    assert got == {"p": "p", "q": "q"}
