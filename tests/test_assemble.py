"""Document assembly: stable turn ordering + per-turn text equality invariant
(BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpdd_spark.assemble import SEP, assemble_documents


def test_assembly_restores_turn_order(spark, turns_df, smoke_fixture):
    docs = assemble_documents(turns_df).toPandas().set_index("conv_id")

    # oracle: sort the (scrambled-on-disk) pandas frame by turn_idx per conv
    pdf = smoke_fixture.transcripts.sort_values(["conv_id", "turn_idx"])
    expected = pdf.groupby("conv_id")["text"].agg(SEP.join)

    assert len(docs) == expected.size
    for conv_id, exp_doc in expected.items():
        assert docs.loc[conv_id, "doc"] == exp_doc, conv_id


def test_per_turn_text_equality_roundtrip(spark, turns_df):
    """Splitting the assembled doc on SEP must reproduce every turn's text in
    turn_idx order — the per-row invariant vs the reference (file bytes are
    streamed in deterministic order, matching.c:45-53)."""
    docs = assemble_documents(turns_df)
    exploded = docs.select(
        "conv_id", F.posexplode(F.split("doc", SEP)).alias("turn_idx", "rt_text")
    )
    orig = turns_df.select("conv_id", "turn_idx", "text")
    diff = (
        exploded.join(orig, ["conv_id", "turn_idx"], "full")
        .filter(
            (F.col("rt_text") != F.col("text"))
            | F.col("rt_text").isNull()
            | F.col("text").isNull()
        )
        .count()
    )
    assert diff == 0


def test_counts_and_lengths(spark, turns_df):
    docs = assemble_documents(turns_df)
    row = docs.agg(
        F.sum("n_turns").alias("t"), F.count("*").alias("c"), F.min("doc_len").alias("m")
    ).collect()[0]
    assert row["t"] == turns_df.count()
    assert row["c"] == turns_df.select("conv_id").distinct().count()
    assert row["m"] > 0
