"""Connected components on hand-built graphs (SURVEY §5 plan item 1)."""

from __future__ import annotations

from cpdd_spark.cc import connected_components


def _run(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, "a string, b string")
    v = spark.createDataFrame([(x,) for x in vertices], "conv_id string") if vertices else None
    return {
        r["conv_id"]: r["cluster_id"] for r in connected_components(e, v).collect()
    }


def test_path_graph(spark):
    got = _run(spark, [("b", "c"), ("a", "b"), ("c", "d"), ("d", "e")])
    assert got == {x: "a" for x in "abcde"}


def test_star_graph(spark):
    got = _run(spark, [("m", "z"), ("m", "y"), ("m", "x")])
    assert got == {x: "m" for x in "mzyx"}


def test_two_components_and_singleton(spark):
    got = _run(spark, [("a", "b"), ("x", "y")], vertices=["a", "b", "x", "y", "solo"])
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "solo": "solo"}


def test_empty_edges(spark):
    got = _run(spark, [], vertices=["p", "q"])
    assert got == {"p": "p", "q": "q"}


def test_long_path_converges(spark):
    n = 30
    edges = [(f"v{i:03d}", f"v{i+1:03d}") for i in range(n)]
    got = _run(spark, edges)
    assert set(got.values()) == {"v000"}
