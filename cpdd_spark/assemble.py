"""Document assembly: turns -> one document per conversation (P2).

The reference reads each file's bytes in deterministic stream order
(/root/reference/src/cpdd/matching.c:45-53); the transcript analogue is
concatenating turn texts under STABLE ``turn_idx`` ordering — the per-row
invariant mandated by BASELINE.json ``input_hint`` ("per-turn text equality
under stable turn ordering").

Implementation notes (scale):

- ``collect_list(struct(turn_idx, text))`` + ``array_sort`` is ONE shuffle on
  ``conv_id`` with map-side partial aggregation, and ``array_sort`` on the
  leading struct field sorts per-group without a global sort. This beats
  ``Window.partitionBy(conv_id).orderBy(turn_idx)`` (which adds a sort within
  every partition) and stays entirely JVM-side / codegen'd — no Python.
- the turn separator is '\\n', which cannot appear inside fixture turn text;
  assembly is therefore injective (doc equality <=> per-turn text equality),
  which is what lets the MD5 tier reproduce cpdd's grouping bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\n"


def assemble_documents(turns: DataFrame, keep_metadata: bool = False) -> DataFrame:
    """``transcripts(conv_id, turn_idx, role, text, tool, ts)`` ->
    ``documents(conv_id, n_turns, doc_len, doc)``.

    Rows may arrive in any order (fixtures scramble them on purpose); the
    struct sort restores ``turn_idx`` order deterministically. ``turn_idx``
    leads the struct so ``array_sort`` orders by it; texts are recovered by
    projection afterwards.

    ``keep_metadata=True`` additionally carries the full per-turn attribute
    structs through as a ``turns`` column (turn_idx-ordered
    array<struct<turn_idx, role, text, tool, ts>>) — the transcript analogue
    of cpdd preserving mtime/mode/ownership on copy
    (/root/reference/src/cpdd/copy.c:99-128): the original conversation is
    reconstructible from the deduped output. Same single shuffle either way;
    the default drops attributes so dedup tiers shuffle minimal rows.
    """
    meta_cols = (
        [F.col("role"), F.col("text"), F.col("tool"), F.col("ts")]
        if keep_metadata
        else [F.col("text")]
    )
    base = (
        turns.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), *meta_cols))
            ).alias("turns")
        )
        .select(
            "conv_id",
            F.size("turns").cast("long").alias("n_turns"),
            F.concat_ws(SEP, F.transform("turns", lambda t: t["text"])).alias("doc"),
            "turns",
        )
        .withColumn("doc_len", F.length("doc").cast("long"))
    )
    if keep_metadata:
        return base.select("conv_id", "n_turns", "doc_len", "doc", "turns")
    return base.select("conv_id", "n_turns", "doc_len", "doc")
