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


def test_distributed_long_chain_converges(spark):
    """A long path graph forces MULTIPLE pointer-jump rounds: the fused
    Observation-based convergence detection must stop the loop with the
    exact min-label clusters (no early stop, no extra rounds needed)."""
    edges = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(64)]
    got = _clusters(spark, edges, "distributed")
    assert set(got.values()) == {"c000"}
    assert len(got) == 65


def test_auto_boundary_forces_distributed(spark, monkeypatch):
    """With the driver byte-bound forced to zero, 'auto' must take the
    distributed path and still produce the driver-identical clusters."""
    import cpdd_spark.cc as cc

    monkeypatch.setattr(cc, "_driver_cc_bound", lambda spark: 0)
    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    auto = _clusters(spark, edges, "auto", vertices=["a", "b", "c", "x", "y", "s"])
    assert auto == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "s": "s"}


def test_driver_cc_bound_scales_with_driver_memory():
    """The auto-switch byte bound follows spark.driver.memory: mem/16
    with a 64 MB floor (unknown/small drivers) and a 1 GB cap (past
    which collect TIME, not heap, is the concern). Parsing covers the
    JVM memory-string grammar (512m, 32g, 1t, plain bytes, g/gb case)."""
    import cpdd_spark.cc as cc

    class FakeConf:
        def __init__(self, mem):
            self._mem = mem

        def get(self, key, default=None):
            return self._mem if self._mem is not None else default

    class FakeSpark:
        def __init__(self, mem):
            self.conf = FakeConf(mem)

    mb64, gb1 = 64 << 20, 1 << 30
    assert cc._driver_cc_bound(FakeSpark(None)) == mb64  # default 1g -> floor
    assert cc._driver_cc_bound(FakeSpark("512m")) == mb64  # 32MB -> floor
    assert cc._driver_cc_bound(FakeSpark("2g")) == (2 << 30) // 16
    assert cc._driver_cc_bound(FakeSpark("32g")) == gb1  # 2GB -> cap
    assert cc._driver_cc_bound(FakeSpark("1t")) == gb1
    assert cc._driver_cc_bound(FakeSpark("4G")) == (4 << 30) // 16
    assert cc._driver_cc_bound(FakeSpark("8gb")) == (8 << 30) // 16
    assert cc._driver_cc_bound(FakeSpark(str(32 << 30))) == gb1
    assert cc._driver_cc_bound(FakeSpark("garbage")) == mb64  # parse fail -> floor
