"""Exact-duplicate clustering: cpdd's three-tier cascade as one Spark plan (P3).

Reference semantics being reproduced bit-for-bit
(/root/reference/src/cpdd/matching.c):

- tier 1, size filter: files of different size never compare
  (binary search on size, matching.c:337-354; README:55);
- tier 2, lazy MD5: digest only files in size-collision groups
  (duplicate-size marking, matching.c:300-315; lazy compute 100-139);
- tier 3, byte verification: an MD5 match is never trusted without a full
  byte compare (collision guard, matching.c:77-83, files_identical 30-59);
- first-match-wins canonicalization: candidates are scanned in sorted-array
  order and the first verified match wins (matching.c:320-375) — with a
  deterministic order this is exactly "min key of the group is canonical".

Spark translation:

- tier 1 is the ``doc_len`` grouping key — Catalyst prunes cross-size
  comparisons for free;
- tier 2 is ``F.when(needs_hash, F.md5(...))``: the window count over
  ``doc_len`` reproduces the duplicate-size marking, so MD5 is computed for
  exactly the same set of documents cpdd would digest (the README's
  "typical case: MD5 for ~50% of files", README:156-159);
- tier 3: grouping by ``(doc_len, md5, doc)`` includes the full document in
  the key, so two docs land in one cluster iff they are string-identical —
  the byte-verify guarantee. At 100 TB one would group by
  ``(doc_len, md5)`` and accept the 2^-128 collision odds, or re-verify
  within groups; we keep the verifying key to match cpdd exactly while the
  shuffled payload stays one row per doc either way.
- ``min(conv_id) over group`` is the canonical representative (the "link
  target"); singleton clusters are the "plain copy" disposition
  (copy.c:289-318).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mark_needs_hash(docs: DataFrame) -> DataFrame:
    """Tier-1/2 boundary: ``needs_hash`` is true iff the doc's length
    collides with another doc — the adjacent-pair scan of matching.c:300-315
    expressed as a window count over the size key."""
    w = Window.partitionBy("doc_len")
    return docs.withColumn("needs_hash", F.count(F.lit(1)).over(w) > F.lit(1))


def exact_clusters(
    docs: DataFrame,
    lazy_hash: bool = True,
    verify: str = "bytes",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """``documents(conv_id, n_turns, doc_len, doc)`` ->
    ``exact_clusters(conv_id, doc_len, md5, cluster_id, cluster_size)``.

    ``keep`` names extra input columns to carry through to the output
    (e.g. ``("doc",)`` so a caller can derive the representative-document
    table by FILTERING this frame — ``conv_id == cluster_id`` — instead of
    joining the cluster ids back onto the corpus, which re-shuffles both
    sides just to re-attach a column this window already saw).

    ``lazy_hash=True`` mirrors cpdd's lazy-MD5 economics (hash only within
    size-collision groups). At transcript scale hashing is cheap relative to
    the shuffle, so callers may pass ``lazy_hash=False`` to hash
    unconditionally — the produced CLUSTERS are identical either way (only
    the ``md5`` column's null-set differs), matching SURVEY §4's note.

    ``verify`` picks the tier-3 guarantee/shuffle trade:

    - ``'bytes'`` (default): the full document joins the grouping key, so
      membership is literal string identity — cpdd's byte-verify, bit-for-bit
      (matching.c:30-59). Cost: the window shuffles full document text.
    - ``'fingerprint'``: group on ``(n_turns, doc_len, md5, xxhash64)`` — two
      INDEPENDENT hash families plus exact length/turn counts. A false merge
      needs a simultaneous md5+xxhash64 collision at equal length (~2^-192);
      in exchange the shuffle payload drops from the corpus text to ~50
      bytes/doc, because Catalyst prunes ``doc`` the moment both digests are
      computed map-side (the window never references it). This is the 10^12-
      turn mode; docs/SCALE.md:107-110 designs it, and tests prove the two
      modes produce identical clusters on dup-heavy fixtures. Implies eager
      hashing (a lazy tier-2 would itself shuffle the text to find size
      collisions, defeating the point).
    """
    if verify == "fingerprint":
        hashed = docs.select(
            "conv_id",
            "n_turns",
            "doc_len",
            F.md5(F.col("doc")).alias("md5"),
            F.xxhash64(F.col("doc")).alias("xxh64"),
            *keep,
        )
        grp = Window.partitionBy("n_turns", "doc_len", "md5", "xxh64")
        return (
            hashed.withColumn("cluster_id", F.min("conv_id").over(grp))
            .withColumn("cluster_size", F.count(F.lit(1)).over(grp))
            .select(
                "conv_id", "doc_len", "md5", "cluster_id", "cluster_size", *keep
            )
        )
    if verify != "bytes":
        raise ValueError(f"verify must be 'bytes' or 'fingerprint', got {verify!r}")
    if lazy_hash:
        hashed = mark_needs_hash(docs).withColumn(
            "md5", F.when(F.col("needs_hash"), F.md5(F.col("doc")))
        )
    else:
        # eager path skips the needs_hash window entirely — one full
        # shuffle+sort of the corpus saved; clusters are identical
        hashed = docs.withColumn("md5", F.md5(F.col("doc")))
    # Tier 3: doc participates in the grouping key => string-identity verify.
    # n_turns is ALSO in the key: the dup contract is per-turn text equality
    # (BASELINE.json input_hint), and a turn containing the '\n' separator
    # would otherwise make assembly non-injective (["a\nb"] vs ["a","b"]).
    grp = Window.partitionBy("n_turns", "doc_len", "md5", "doc")
    return (
        hashed.withColumn("cluster_id", F.min("conv_id").over(grp))
        .withColumn("cluster_size", F.count(F.lit(1)).over(grp))
        .select(
            "conv_id", "doc_len", "md5", "cluster_id", "cluster_size", *keep
        )
    )


def exact_pairs(clusters: DataFrame) -> DataFrame:
    """Edge list ``(a, b)`` with a < b linking each member to its canonical —
    input to connected components so the exact tier and the near-dup tier
    merge into one final clustering."""
    return (
        clusters.filter(F.col("conv_id") != F.col("cluster_id"))
        .select(
            F.least("conv_id", "cluster_id").alias("a"),
            F.greatest("conv_id", "cluster_id").alias("b"),
        )
    )
