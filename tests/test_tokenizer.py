"""Cross-engine parity of the canonical whitespace tokenizer.

One tokenizer definition, three implementations — pandas ``str.split()``
(signature/substring Arrow kernels), ``textfuncs.ws_tokens`` (JVM n-gram
index), and ``__spark_entry__.WS_SQL`` (DuckDB oracles) — must yield the
SAME token stream on adversarial whitespace, or the minhash/ngram/oracle
Jaccard triple-equality silently narrows to single-space corpora (the
round-2 advice finding).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cpdd_spark.textfuncs import _WS_CODEPOINTS, WS_RE2, ws_tokens

# every whitespace codepoint exercised, plus leading/trailing separators,
# runs of mixed whitespace, and lookalike NON-whitespace that must survive
ADVERSARIAL = [
    "plain single space tokens",
    "  leading and trailing  ",
    "tab\tsplit\tand\nnewline",
    "vertical\x0btab and\x0cformfeed",
    "file\x1cgroup\x1drecord\x1eunit\x1fseparators",
    "nel\x85nbsp\xa0ogham wide",
    "en em thin hair ",
    "line para narrow math ideo　end",
    "zero​width stays one-token-pair",  # U+200B is NOT whitespace
    "",
    "\t\n 　",  # whitespace-only -> zero tokens
    "mixed \t   runs collapse",
]

# systematic: every canonical whitespace codepoint as the sole separator,
# also doubled and flanking — the literals above are belt, this is braces
ADVERSARIAL += [f"left{ws}right" for ws in _WS_CODEPOINTS]
ADVERSARIAL += [f"{ws}x{ws}{ws}y{ws}" for ws in _WS_CODEPOINTS]


def test_ws_class_is_python_str_split_set():
    expected = {chr(c) for c in range(0x110000) if chr(c).isspace()}
    assert set(_WS_CODEPOINTS) == expected


def test_jvm_tokens_match_pandas(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)], "i int, doc string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", ws_tokens("doc").alias("toks")).collect()
    }
    for i, s in enumerate(ADVERSARIAL):
        assert got[i] == s.split(), f"JVM mismatch on {s!r}"


def test_duckdb_tokens_match_pandas():
    con = duckdb.connect()
    expr = f"list_filter(regexp_split_to_array(doc, '{WS_RE2}+'), t -> t <> '')"
    for s in ADVERSARIAL:
        (toks,) = con.execute(f"SELECT {expr} FROM (SELECT ? AS doc)", [s]).fetchone()
        assert toks == s.split(), f"DuckDB mismatch on {s!r}"


def test_ngram_sets_use_canonical_tokens(spark):
    """A doc with exotic separators produces the same 2-gram set through
    the JVM inverted index as through a pandas-side reference."""
    from cpdd_spark.ngram import ngram_sets

    doc = "alpha beta\tgamma delta  epsilon "
    df = spark.createDataFrame([("d1", doc)], "id string, text string")
    got = sorted(
        r["shingle"] for r in ngram_sets(df, "id", "text", 2).collect()
    )
    toks = doc.split()
    want = sorted({" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)})
    assert got == want
