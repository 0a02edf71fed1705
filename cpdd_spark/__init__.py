"""cpdd_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine for multi-turn conversation/agent transcripts.

Re-expresses the semantics of the reference dedup tool ``ldebyl/cpdd``
(/root/reference, a single-threaded C99 content-hash file deduplicator) as an
idiomatic Spark pipeline:

- the reference's three-tier cascade (size filter -> lazy MD5 -> byte verify;
  /root/reference/src/cpdd/matching.c:69-145) becomes
  length-prefilter -> hash tier (MD5 exact, MinHash+SimHash approximate) ->
  exact verification (string equality / exact Jaccard);
- "emit a link to the matched reference file" (copy.c:242-338) becomes
  "emit a (member -> canonical cluster_id) row";
- the ``syndir`` seeded synthetic generator (src/syndir/core.c:380-414)
  becomes :mod:`cpdd_spark.fixtures`.

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` where
possible, Arrow-batched pandas UDFs for the numeric kernels (MinHash,
SimHash, Jaccard, winnowing), never per-row Python.
"""

from cpdd_spark.config import DedupConfig
from cpdd_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
