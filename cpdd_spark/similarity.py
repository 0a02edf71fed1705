"""Embedding similarity: brute-force cosine top-k, threshold dedup, and a
random-hyperplane-LSH scale path.

New capability class for training-data pipelines (the reference has no
vector notion). Design rules:

- dot products / norms are built with ``F.zip_with`` + ``F.aggregate`` in
  DOUBLE with strict left-to-right accumulation — deterministic, engine
  portable (DuckDB's list functions reduce in the same order), and entirely
  JVM-side;
- brute-force top-k is the correctness baseline: queries x corpus via a
  (broadcastable) cross join — right for small query sets and as oracle;
- the scale path buckets the corpus by sign-bit sketches of seeded random
  hyperplanes (Charikar'02): cosine-close vectors collide with high
  probability, so each query scans one bucket group instead of the corpus.
  Same screen-then-verify shape as the dedup tiers: bucket -> exact cosine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(pairs: DataFrame, va: str = "emb_a", vb: str = "emb_b") -> DataFrame:
    return pairs.withColumn(
        "cosine", _dot(F.col(va), F.col(vb)) / (_norm(F.col(va)) * _norm(F.col(vb)))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, neighbor_id, cosine,
    rank)``. Self-matches excluded; ties broken by neighbor_id for full
    determinism. The corpus side of the cross join broadcasts when small;
    at scale use :func:`lsh_topk`."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("emb_a")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_b")
    )
    scored = (
        with_cosine(q.crossJoin(c))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding near-duplicate pairs: ``(a, b, cosine)`` with cosine >=
    threshold, a < b. Brute-force form (exact); swap the crossJoin for
    :func:`hyperplane_buckets` collisions at scale."""
    left = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("emb_a"))
    right = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("emb_b"))
    return (
        with_cosine(left.crossJoin(right))
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Charikar sign-sketch: ``(id, bucket)`` where bucket packs the sign
    bits of n_planes seeded random hyperplane projections. JVM-side: the
    plane matrix enters the plan as array literals."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        proj = _dot(F.col(vec_col), plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("emb"), bucket.alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-LSH (standard amplification:
    a true neighbor is a candidate iff it collides in >= 1 of n_tables
    independent sketches — P = 1-(1-p^n_planes)^n_tables, p = 1 - theta/pi).
    Candidates are deduped across tables, then exact cosine + rank. Tune:
    more planes => smaller buckets (cheaper, lower recall); more tables =>
    higher recall (more candidate volume)."""
    cands = None
    for t in range(n_tables):
        cb = hyperplane_buckets(corpus, dim, n_planes, seed + 1000 * t, id_col, vec_col)
        qb = hyperplane_buckets(queries, dim, n_planes, seed + 1000 * t, id_col, vec_col)
        c = qb.select(
            F.col("id").alias("query_id"), "bucket"
        ).join(
            cb.select(F.col("id").alias("neighbor_id"), "bucket"), "bucket"
        ).select("query_id", "neighbor_id")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.filter(F.col("query_id") != F.col("neighbor_id")).distinct()
    scored = (
        cands.join(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("emb_a")),
            "query_id",
        )
        .join(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_b")),
            "neighbor_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        with_cosine(scored)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
