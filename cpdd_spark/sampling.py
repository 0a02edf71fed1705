"""Deterministic hash-based splitting & stratified sampling — the
reservoir-free way a training-data pipeline carves train/val/test sets and
down-samples strata at 100 TB.

Not present in the reference (cpdd partitions nothing); included because
every large-corpus pipeline needs BOTH, and the naive forms break at scale:
``df.randomSplit`` is nondeterministic across runs/partitionings, and
``sampleBy`` draws per-row randoms (a rerun samples a different set, and a
late-arriving shard samples inconsistently with the rest of the corpus).

The primitive here is a pure MAP-SIDE expression: 3 hex chars of
``md5(id)`` parsed to a uniform bucket in [0, 4096) — 16^3 equally likely
values, no modulo bias, no shuffle, no state, no RNG. The same document
lands in the same split on every engine, every run, every cluster size, and
md5 exists verbatim in Spark AND DuckDB, so the assignment is
oracle-checkable (the hex digits are parsed with an explicit CASE ladder in
both dialects — no engine-specific hex-to-int builtin is trusted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 16 ** 3  # 3 hex chars: uniform, no modulo bias

_HEX = "0123456789abcdef"


def _hex_digit(col):
    """One lowercase hex char column -> its value 0..15 (explicit CASE
    ladder: portable across engines, whole-stage codegen in Spark)."""
    expr = F.lit(0)
    for i, ch in enumerate(_HEX[1:], start=1):
        expr = F.when(col == ch, F.lit(i)).otherwise(expr)
    return expr


def hash_bucket(col) -> "F.Column":
    """Deterministic uniform bucket in [0, 4096) from ``md5(col)``'s first
    3 hex chars."""
    h = F.md5(col.cast("string"))
    return (
        _hex_digit(F.substring(h, 1, 1)) * 256
        + _hex_digit(F.substring(h, 2, 1)) * 16
        + _hex_digit(F.substring(h, 3, 1))
    )


def hash_bucket_sql(col_sql: str) -> str:
    """The identical bucket expression in portable SQL (DuckDB oracle
    twin) — kept next to :func:`hash_bucket` so the two ladders cannot
    drift independently."""

    def digit(pos: int) -> str:
        cases = " ".join(
            f"WHEN '{ch}' THEN {i}" for i, ch in enumerate(_HEX[1:], start=1)
        )
        return (
            f"(CASE substr(md5(CAST({col_sql} AS VARCHAR)), {pos}, 1) "
            f"{cases} ELSE 0 END)"
        )

    return f"({digit(1)} * 256 + {digit(2)} * 16 + {digit(3)})"


def hash_split(
    df: DataFrame, id_col: str, fracs: dict[str, float]
) -> DataFrame:
    """Assign every row a deterministic named split by cumulative bucket
    thresholds: ``fracs`` like ``{'train': .9, 'val': .05, 'test': .05}``
    (must sum to ~1; the LAST split absorbs rounding). Adds ``split_bucket``
    (the raw bucket, for audits) and ``split``. Pure projection — zero
    shuffle at any scale, stable under reruns, repartitioning, and
    incremental arrival."""
    total = sum(fracs.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col))
    names = list(fracs)
    expr = F.lit(names[-1])  # last split takes the rounding remainder
    acc = 0.0
    bounds = []
    for name in names[:-1]:
        acc += fracs[name]
        bounds.append((name, round(acc * N_BUCKETS)))
    for name, bound in reversed(bounds):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    return df.withColumn("split_bucket", b).withColumn("split", expr)


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum down-sampling: keep a row iff its hash
    bucket falls below ``rate * 4096`` for its stratum (unlisted strata use
    ``default_rate``). The scale properties that matter: one map-side
    filter (no shuffle, no RNG state), the SAME ids survive on every rerun
    and on every engine, and late-arriving data samples consistently with
    everything already processed — none of which holds for ``sampleBy``."""
    b = hash_bucket(F.col(id_col))
    thr = F.lit(round(default_rate * N_BUCKETS))
    for k, r in rates.items():
        thr = F.when(F.col(strata_col) == k, F.lit(round(r * N_BUCKETS))).otherwise(thr)
    return df.filter(b < thr)
