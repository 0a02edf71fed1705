"""Winnowed substring pass: guarantee + verification (SURVEY §5)."""

from __future__ import annotations

import numpy as np

from cpdd_spark.assemble import assemble_documents
from cpdd_spark.config import DedupConfig
from cpdd_spark.substring import _winnow, substring_pairs

CFG = DedupConfig()


def test_winnow_guarantee_property():
    """Any k consecutive positions contain at least one selected position
    (the winnowing coverage invariant)."""
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    k = CFG.winnow_window
    sel = set(_winnow(h, k).tolist())
    for start in range(0, len(h) - k + 1):
        assert any(p in sel for p in range(start, start + k)), start


def test_winnow_short_input():
    h = np.array([5, 3, 9], dtype=np.uint64)
    sel = _winnow(h, 8)
    assert sel.tolist() == [1]  # global min position
    assert _winnow(np.empty(0, dtype=np.uint64), 8).size == 0


def test_winnow_deterministic_alignment():
    """The same hash subsequence embedded in two different contexts selects
    at least one common fingerprint (what makes cross-doc matching work)."""
    rng = np.random.default_rng(1)
    shared = rng.integers(0, 2**63, size=40, dtype=np.uint64)
    a = np.concatenate([rng.integers(0, 2**63, 100, dtype=np.uint64), shared,
                        rng.integers(0, 2**63, 50, dtype=np.uint64)])
    b = np.concatenate([rng.integers(0, 2**63, 7, dtype=np.uint64), shared,
                        rng.integers(0, 2**63, 200, dtype=np.uint64)])
    k = CFG.winnow_window
    fa = set(a[_winnow(a, k)].tolist())
    fb = set(b[_winnow(b, k)].tolist())
    shared_sel = fa & fb & set(shared.tolist())
    assert shared_sel, "no common fingerprint selected from the shared run"


def test_substring_dups_found(spark, turns_df, truth_pdf):
    """Every planted substring_dup (60 spliced tokens >= W + k - 1 = 37)
    must pair with its source; pairs are verified (n_common_windows >= 1)."""
    docs = assemble_documents(turns_df).cache()
    got = {
        tuple(sorted([r["a"], r["b"]]))
        for r in substring_pairs(docs, CFG).collect()
    }
    planted = truth_pdf[truth_pdf["kind"] == "substring_dup"]
    assert len(planted) > 0
    for _, row in planted.iterrows():
        pair = tuple(sorted([row["conv_id"], row["source_conv"]]))
        assert pair in got, pair


def test_substring_no_false_verification(spark, turns_df):
    """Reported pairs really share a W-token run: re-check one pair by
    brute force over token windows."""
    docs = assemble_documents(turns_df).cache()
    pairs = substring_pairs(docs, CFG).limit(3).collect()
    texts = {r["conv_id"]: r["doc"] for r in docs.collect()}
    w = CFG.substring_w
    for r in pairs:
        ta, tb = texts[r["a"]].split(), texts[r["b"]].split()
        wins_a = {tuple(ta[i : i + w]) for i in range(len(ta) - w + 1)}
        wins_b = {tuple(tb[i : i + w]) for i in range(len(tb) - w + 1)}
        assert len(wins_a & wins_b) == r["n_common_windows"]
