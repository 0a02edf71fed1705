"""Exact n-gram Jaccard dedup via an inverted shingle index (pure DataFrame).

The fully-deterministic, oracle-checkable near-dup path: no hashing, no
sampling — documents pair iff they SHARE at least one n-gram (inverted-index
self-join), and survive iff exact Jaccard over distinct n-gram sets clears
tau. Complements the MinHash path (cpdd_spark.signatures/lsh): same
verification semantics (tier-3 of the reference,
/root/reference/src/cpdd/matching.c:77-83), different candidate generator —
complete but O(postings^2 per shingle), so it's the small/medium-corpus and
ground-truth tool, while MinHash+LSH is the 10^12-turn path.

Everything is `pyspark.sql.functions` (codegen'd, shuffles on shingle then
on pair); the identical computation is expressible in ANSI SQL, which is
exactly how the driver's DuckDB oracle cross-checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """``(id, shingle)`` distinct word n-grams per document, plus per-doc
    distinct counts. Docs shorter than n tokens contribute nothing.

    Tokenization is ALL-whitespace split (regex), matching the signature
    tier's ``str.split()`` so n-gram Jaccard and MinHash-verified Jaccard
    are the same quantity on multi-line documents."""
    toks = F.split(F.col(text_col), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), grams.alias("grams"))
        .filter(F.size(F.col("grams")) > 0)
        .select("id", F.size("grams").alias("n_grams"), F.explode("grams").alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, tau: float = 0.7
) -> DataFrame:
    """``(a, b, jaccard)`` for all pairs with exact n-gram Jaccard >= tau.

    Plan: explode distinct n-grams -> self-join on shingle (the inverted
    index; Catalyst shuffles once on the shingle key) -> per-pair
    intersection counts -> Jaccard from inclusion-exclusion. Ultra-common
    shingles are the skew hazard; at scale prepend a shingle-frequency cap
    (drop postings longer than L) — omitted here to keep exact semantics.
    """
    sets = ngram_sets(df, id_col, text_col, n).persist()  # self-join input
    left = sets.select(
        F.col("id").alias("a"), F.col("n_grams").alias("na"), "shingle"
    )
    right = sets.select(
        F.col("id").alias("b"), F.col("n_grams").alias("nb"), "shingle"
    )
    inter = (
        left.join(right, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("c")).cast("double"),
        )
        .filter(F.col("jaccard") >= tau)
        .select("a", "b", "jaccard")
    )
