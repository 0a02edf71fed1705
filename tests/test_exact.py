"""Exact-tier clustering: bit-for-bit parity with a literal replay of cpdd's
three-tier cascade (size -> lazy MD5 -> byte compare;
/root/reference/src/cpdd/matching.c:69-145, 300-315)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from cpdd_spark.assemble import assemble_documents
from cpdd_spark.exact import exact_clusters, mark_needs_hash


def cpdd_oracle(docs: dict[str, tuple[int, str]]) -> dict[str, str]:
    """~20-line pure-Python replay of the reference tiers over assembled
    documents (FIXTURES.md §6). ``docs`` maps conv_id -> (n_turns, doc);
    n_turns rides with the size key (per-turn equality contract).
    Returns conv_id -> cluster_id."""
    by_size = defaultdict(list)
    for cid, (n_turns, doc) in docs.items():
        by_size[(n_turns, len(doc))].append(cid)         # tier 1: size groups
    cluster = {}
    for _size, cids in by_size.items():
        if len(cids) == 1:                               # unique size: no MD5
            cluster[cids[0]] = cids[0]
            continue
        by_digest = defaultdict(list)
        for cid in cids:                                 # tier 2: lazy MD5
            by_digest[hashlib.md5(docs[cid][1].encode()).hexdigest()].append(cid)
        for _d, dcids in by_digest.items():
            by_content = defaultdict(list)
            for cid in dcids:                            # tier 3: byte verify
                by_content[docs[cid][1]].append(cid)
            for members in by_content.values():
                canon = min(members)                     # first-match-wins == min key
                for cid in members:
                    cluster[cid] = canon
    return cluster


def test_exact_cluster_parity_with_cpdd_oracle(spark, turns_df):
    docs_df = assemble_documents(turns_df).cache()
    got = {
        r["conv_id"]: r["cluster_id"]
        for r in exact_clusters(docs_df).collect()
    }
    docs = {
        r["conv_id"]: (r["n_turns"], r["doc"])
        for r in docs_df.select("conv_id", "n_turns", "doc").collect()
    }
    expected = cpdd_oracle(docs)
    assert got == expected


def test_separator_collision_does_not_merge(spark):
    """A turn containing the '\\n' separator must not cluster with a
    conversation whose separate turns render to the same doc string."""
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    rows = [
        ("c1", 0, "user", "a\nb", "", None),
        ("c2", 0, "user", "a", "", None),
        ("c2", 1, "user", "b", "", None),
    ]
    out = exact_clusters(assemble_documents(spark.createDataFrame(rows, schema)))
    got = {r["conv_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"c1": "c1", "c2": "c2"}


def test_exact_matches_truth_labels(spark, turns_df, truth_pdf):
    """Planted exact dups must cluster with their source (syndir ground
    truth made explicit, core.c:317-344)."""
    got = {
        r["conv_id"]: r["cluster_id"] for r in exact_clusters(assemble_documents(turns_df)).collect()
    }
    for _, row in truth_pdf.iterrows():
        if row["kind"] == "exact_dup":
            assert got[row["conv_id"]] == got[row["source_conv"]]
        elif row["kind"] in ("unique", "near_dup", "substring_dup"):
            # near/substring dups are NOT exact dups — must stay singletons here
            others = [c for c, cl in got.items() if cl == got[row["conv_id"]] and c != row["conv_id"]]
            if row["kind"] == "unique":
                # a unique conv may still be cluster head for its dups; but it
                # must not join a DIFFERENT head
                assert got[row["conv_id"]] <= row["conv_id"]


def test_lazy_hash_matches_eager(spark, turns_df):
    docs = assemble_documents(turns_df)
    lazy = {r["conv_id"]: r["cluster_id"] for r in exact_clusters(docs, lazy_hash=True).collect()}
    eager = {r["conv_id"]: r["cluster_id"] for r in exact_clusters(docs, lazy_hash=False).collect()}
    assert lazy == eager


def test_fingerprint_mode_matches_bytes(spark, turns_df):
    """The scale mode (group on dual digests, no doc in the shuffle) must
    produce the identical clustering as byte-verify mode."""
    docs = assemble_documents(turns_df)
    by_bytes = {
        r["conv_id"]: (r["cluster_id"], r["cluster_size"])
        for r in exact_clusters(docs, lazy_hash=False).collect()
    }
    by_fp = {
        r["conv_id"]: (r["cluster_id"], r["cluster_size"])
        for r in exact_clusters(docs, verify="fingerprint").collect()
    }
    assert by_bytes == by_fp


def test_fingerprint_mode_prunes_doc_from_shuffle(spark, turns_df):
    """In fingerprint mode the window partitions on digests only — the doc
    column must not appear in the Window spec (it is pruned before the
    exchange; in bytes mode it IS the verify and must appear)."""
    docs = assemble_documents(turns_df)

    def window_lines(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return [l for l in plan.splitlines() if "Window [" in l or "Window(" in l]

    fp_lines = window_lines(exact_clusters(docs, verify="fingerprint"))
    assert fp_lines and all("doc#" not in l for l in fp_lines)
    byte_lines = window_lines(exact_clusters(docs, lazy_hash=False))
    assert byte_lines and any("doc#" in l for l in byte_lines)


def test_needs_hash_is_size_collision(spark, turns_df):
    docs = assemble_documents(turns_df)
    marked = mark_needs_hash(docs).select("conv_id", "doc_len", "needs_hash").toPandas()
    sizes = marked.groupby("doc_len")["conv_id"].count()
    for _, row in marked.iterrows():
        assert row["needs_hash"] == (sizes[row["doc_len"]] > 1)
