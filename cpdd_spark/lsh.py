"""LSH band bucketing + skew-aware candidate-pair generation (P7, P8).

The reference's tier-1 "size buckets" (binary search on size,
/root/reference/src/cpdd/matching.c:337-354) generalize to hash buckets:
slice the k-slot MinHash signature into b bands of r rows; documents
colliding on any band's hash become candidate pairs, verified later by exact
Jaccard (the same never-trust-the-hash discipline as matching.c:77-83).

Skew is THE scale hazard here (BASELINE.json: "salted repartitioning to
defuse hot LSH bands at 10^12-turn scale"). Defenses, layered:

1. **Dedupe before LSH**: signatures are computed over exact-cluster
   representatives only, so a million byte-identical boilerplate transcripts
   collapse to ONE row before any band hashing (the reference's layering:
   cheap exact tier screens before expensive tiers).
2. **Bounded buckets**: bucket sizes are counted first (one cheap agg);
   buckets <= ``max_band_bucket`` emit all C(n,2) pairs via a self-join that
   AQE's skew-join splitting parallelizes; larger ("hot") buckets switch to
   a salted star topology — members are salted into shards of bounded size,
   full pairs are emitted only within a shard, and shard representatives are
   chained so the bucket stays connected. Connectivity through the verify
   tier is preserved for true duplicate blobs (every edge still gets exact
   Jaccard verification) while the pair count per bucket drops from O(n^2)
   to O(n * cap).
3. **AQE**: adaptive skew-join splitting + partition coalescing handle the
   residual imbalance at runtime (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cpdd_spark.config import DedupConfig


def band_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """``signatures`` -> ``(conv_id, band_id, band_hash)``.

    Docs with no shingles (< w tokens) are screened out — they cannot meet a
    Jaccard threshold and the exact tier already handles identical shorts.
    ``F.hash`` (Murmur3) over the band slice runs JVM-side inside codegen.
    """
    r = cfg.lsh_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda j: F.hash(F.slice("minhash", j * r + 1, r)),
    )
    return (
        signatures.filter(F.col("n_shingles") > 0)
        .select("conv_id", F.posexplode(bands).alias("band_id", "band_hash"))
    )


def pairs_from_buckets(
    buckets: DataFrame, key_cols: list[str], cfg: DedupConfig
) -> DataFrame:
    """Skew-aware pair generation from ``(key_cols..., conv_id)`` bucket rows.

    Shared by LSH band buckets and substring fingerprint buckets. Normal
    buckets (<= max_band_bucket members) emit all C(n,2) pairs via an
    equi-self-join (AQE skew-join splits the shuffle); hot buckets emit
    salted within-shard pairs plus a representative chain — O(n*cap) pairs
    while preserving connectivity through CC for true duplicate blobs.
    """
    sizes = buckets.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("bucket_n"))
    keyed = buckets.join(sizes, key_cols)

    # --- normal buckets: full pairwise self-join (C(n,2) pairs) ---
    small = keyed.filter(F.col("bucket_n") <= cfg.max_band_bucket)
    left = small.select(*key_cols, F.col("conv_id").alias("a"))
    right = small.select(*key_cols, F.col("conv_id").alias("b"))
    small_pairs = left.join(right, key_cols).filter(F.col("a") < F.col("b"))

    # --- hot buckets: salted shards + shard-chain (O(n * cap) pairs) ---
    hot = keyed.filter(F.col("bucket_n") > cfg.max_band_bucket).withColumn(
        "salt", F.pmod(F.crc32(F.col("conv_id")), F.lit(cfg.salt_buckets))
    )
    skey = [*key_cols, "salt"]
    hl = hot.select(*skey, F.col("conv_id").alias("a"))
    hr = hot.select(*skey, F.col("conv_id").alias("b"))
    shard_pairs = hl.join(hr, skey).filter(F.col("a") < F.col("b"))
    # chain shard representatives (min conv_id per shard) so the bucket's
    # shards stay mutually connected through CC
    reps = hot.groupBy(*skey).agg(F.min("conv_id").alias("rep"))
    bucket_rep = reps.groupBy(*key_cols).agg(F.min("rep").alias("bucket_rep"))
    chain_pairs = (
        reps.join(bucket_rep, key_cols)
        .filter(F.col("rep") != F.col("bucket_rep"))
        .select(
            F.least("rep", "bucket_rep").alias("a"),
            F.greatest("rep", "bucket_rep").alias("b"),
        )
    )

    return (
        small_pairs.select("a", "b")
        .unionByName(shard_pairs.select("a", "b"))
        .unionByName(chain_pairs)
        .distinct()
    )


def candidate_pairs(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct candidate ``(a, b)`` pairs with a < b from band collisions."""
    return pairs_from_buckets(
        band_buckets(signatures, cfg), ["band_id", "band_hash"], cfg
    )


def simhash_candidates(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Near-dup screen over SimHash: pairs with Hamming(a, b) <= t.

    Block on bit-bands of the 64-bit fingerprint (pigeonhole: with
    ``n_blocks = t + 1`` blocks, any pair within Hamming distance t collides
    on at least one whole block), then filter exactly on popcount — again
    the screen-then-verify discipline of matching.c:77-83.
    """
    n_blocks = cfg.simhash_hamming_max + 1
    width = 64 // n_blocks
    sigs = signatures.filter(F.col("n_shingles") > 0)
    blocks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(n_blocks)
        ]
    )
    keyed = sigs.select(
        "conv_id", "simhash", F.posexplode(blocks).alias("block_id", "block_val")
    )
    left = keyed.select(
        "block_id", "block_val",
        F.col("conv_id").alias("a"), F.col("simhash").alias("sim_a"),
    )
    right = keyed.select(
        "block_id", "block_val",
        F.col("conv_id").alias("b"), F.col("simhash").alias("sim_b"),
    )
    return (
        left.join(right, ["block_id", "block_val"])
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .filter(F.col("hamming") <= cfg.simhash_hamming_max)
        .select("a", "b", "hamming")
        .distinct()
    )
