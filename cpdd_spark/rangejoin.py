"""Interval (range-containment) join — bucketized, never a nested loop.

The companion temporal operator to :mod:`cpdd_spark.asof`: assign POINT
rows to the INTERVAL rows containing them (event -> session window,
timestamp -> config-validity range, offset -> document span). Spark has no
native range join strategy: the naive ``points.join(intervals, (ts >=
start) & (ts <= end))`` plans as BroadcastNestedLoopJoin — O(n*m) and
banned by this repo's plan guards.

Shape here: quantize time into fixed-width buckets; each interval explodes
into the buckets it overlaps, points map to exactly one bucket; one
EQUI-join on (by, bucket) then the exact containment filter. Join
cardinality is bounded by true matches + same-bucket near-misses, and an
interval's fan-out is ceil(span / bucket_width) + 1 rows — pick the width
near the TYPICAL interval span so most intervals explode into O(1) rows
(the standard trade; degenerate over-long intervals are the skew valve AQE
handles, or pre-split upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    start: str,
    end: str,
    by: str | None = None,
    bucket_width: int = 1,
) -> DataFrame:
    """Rows of ``points`` joined to every ``intervals`` row with
    ``start <= point.on <= end`` (inclusive both ends) and equal ``by``
    key when given. ``on``/``start``/``end`` must share a numeric unit;
    ``bucket_width`` is in that unit."""
    bw = F.lit(bucket_width)
    p = points.withColumn("_bucket", F.floor(F.col(on) / bw))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor(F.col(start) / bw), F.floor(F.col(end) / bw))
        ),
    )
    keys = ([by] if by else []) + ["_bucket"]
    cond = (F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end))
    return p.join(iv, keys).filter(cond).drop("_bucket")
