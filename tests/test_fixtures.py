"""Fixture generator: determinism + planted-duplicate structure."""

from __future__ import annotations

import numpy as np

from cpdd_spark.fixtures import FixtureParams, generate


def test_deterministic():
    a = generate(FixtureParams(num_convs=50, seed=7))
    b = generate(FixtureParams(num_convs=50, seed=7))
    assert a.transcripts.equals(b.transcripts)
    assert a.truth.equals(b.truth)


def test_seed_changes_output():
    a = generate(FixtureParams(num_convs=50, seed=7))
    b = generate(FixtureParams(num_convs=50, seed=8))
    assert not a.transcripts["text"].equals(b.transcripts["text"])


def test_truth_composition(smoke_fixture):
    counts = smoke_fixture.truth["kind"].value_counts()
    p = smoke_fixture.params
    assert counts["exact_dup"] == int(p.num_convs * p.exact_dup_pct / 100)
    assert counts["near_dup"] == int(p.num_convs * p.near_dup_pct / 100)
    assert counts["substring_dup"] == int(p.num_convs * p.substring_dup_pct / 100)


def test_exact_dups_verbatim(smoke_fixture):
    t = smoke_fixture.transcripts.sort_values(["conv_id", "turn_idx"])
    texts = {cid: list(g["text"]) for cid, g in t.groupby("conv_id")}
    for _, row in smoke_fixture.truth.iterrows():
        if row["kind"] == "exact_dup":
            assert texts[row["conv_id"]] == texts[row["source_conv"]]
        if row["kind"] == "near_dup":
            assert texts[row["conv_id"]] != texts[row["source_conv"]]


def test_turn_order_scrambled_on_disk(smoke_fixture):
    t = smoke_fixture.transcripts
    # at least one conversation's rows are out of order on disk
    out_of_order = 0
    for _, g in t.groupby("conv_id"):
        if not np.all(np.diff(g["turn_idx"].to_numpy()) > 0):
            out_of_order += 1
    assert out_of_order > 10


def test_skew_block():
    f = generate(FixtureParams(num_convs=40, skew_block=20, seed=3))
    skew = f.truth[f.truth["kind"] == "skew_dup"]
    assert len(skew) == 20
    assert skew["cluster_id"].nunique() == 1
