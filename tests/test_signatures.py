"""MinHash/SimHash kernel unit tests (SURVEY §5 plan item 1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cpdd_spark.config import DedupConfig
from cpdd_spark.signatures import (
    _minhash,
    _perm_params,
    _simhash,
    compute_signatures,
    exact_jaccard_sets,
    shingle_hashes,
)

CFG = DedupConfig()


def _sig_for(docs: list[str], cfg: DedupConfig = CFG) -> np.ndarray:
    consts = _perm_params(cfg)
    h, offs = shingle_hashes(pd.Series(docs), cfg.shingle_w)
    return _minhash(h, offs, consts), _simhash(h, offs), np.diff(offs)


def test_shingle_counts():
    docs = pd.Series(["a b c d e f g", "a b c", ""])  # 7, 3, 0 tokens; w=5
    _, offs = shingle_hashes(docs, 5)
    assert list(np.diff(offs)) == [3, 0, 0]


def test_shingle_hash_order_sensitivity():
    h1, _ = shingle_hashes(pd.Series(["a b c d e"]), 5)
    h2, _ = shingle_hashes(pd.Series(["e d c b a"]), 5)
    assert h1[0] != h2[0]


def test_identical_docs_identical_signatures():
    doc = "the quick brown fox jumps over the lazy dog again and again"
    (sig, sim, _) = _sig_for([doc, doc])
    assert np.array_equal(sig[0], sig[1])
    assert sim[0] == sim[1]


def test_minhash_estimates_jaccard():
    """MinHash agreement fraction ~ exact Jaccard (binomial, k=128):
    |est - J| < 4*sqrt(J(1-J)/k) with overwhelming probability."""
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    base = list(rng.choice(vocab, size=300))
    mutated = base.copy()
    for pos in rng.choice(len(base), size=15, replace=False):
        mutated[pos] = str(rng.choice(vocab))
    d1, d2 = " ".join(base), " ".join(mutated)
    jac = exact_jaccard_sets(d1, d2, CFG.shingle_w)
    (sig, _, _) = _sig_for([d1, d2])
    est = float(np.mean(sig[0] == sig[1]))
    tol = 4 * np.sqrt(jac * (1 - jac) / CFG.num_perm) + 1e-9
    assert abs(est - jac) < tol, (est, jac, tol)


def test_minhash_range_and_empty():
    (sig, sim, n_sh) = _sig_for(["a b", "x y z q r s t"])  # 0 and 3 shingles
    assert n_sh[0] == 0 and np.all(sig[0] == -1) and sim[0] == 0
    # full-int64 range is legal (uint64 minima viewed as int64); what matters
    # is the slots are real values, not the empty sentinel row
    assert not np.all(sig[1] == -1)


def test_simhash_hamming_monotone():
    """More mutation => (weakly) larger Hamming distance, and near-dups stay
    well under half the bits."""
    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(500)]
    base = list(rng.choice(vocab, size=400))

    def ham_at(n_mut: int) -> int:
        m = base.copy()
        for pos in rng.choice(len(base), size=n_mut, replace=False):
            m[pos] = str(rng.choice(vocab))
        (_, sim, _) = _sig_for([" ".join(base), " ".join(m)])
        return bin((int(sim[0]) ^ int(sim[1])) & 0xFFFFFFFFFFFFFFFF).count("1")

    h_small, h_big = ham_at(4), ham_at(120)
    assert h_small < 16
    assert h_small < h_big


def test_compute_signatures_spark(spark, turns_df):
    from cpdd_spark.assemble import assemble_documents

    docs = assemble_documents(turns_df)
    sigs = compute_signatures(docs, CFG)
    pdf = sigs.toPandas()
    assert len(pdf) == docs.count()
    assert all(len(m) == CFG.num_perm for m in pdf["minhash"])
    # spark batch path == local kernel path
    one = docs.limit(3).toPandas()
    local_sig, local_sim, _ = _sig_for(list(one["doc"]))
    by_id = pdf.set_index("conv_id")
    for i, cid in enumerate(one["conv_id"]):
        assert np.array_equal(np.array(by_id.loc[cid, "minhash"]), local_sig[i])
        assert by_id.loc[cid, "simhash"] == local_sim[i]


def test_simhash_only_mode_bit_identical(spark, turns_df):
    """with_minhash=False skips the k-permutation sweep; the emitted
    simhash column (and n_shingles) must be bit-identical to the full
    fused pass — the guarantee that lets the SimHash screen take the
    cheap path without touching its pinned oracle."""
    from cpdd_spark.assemble import assemble_documents

    docs = assemble_documents(turns_df)
    full = compute_signatures(docs, CFG).toPandas().set_index("conv_id")
    lean = compute_signatures(docs, CFG, with_minhash=False).toPandas()
    assert list(lean.columns) == ["conv_id", "n_shingles", "simhash"]
    assert len(lean) == len(full)
    for _, r in lean.iterrows():
        assert r["simhash"] == full.loc[r["conv_id"], "simhash"]
        assert r["n_shingles"] == full.loc[r["conv_id"], "n_shingles"]


def test_bad_band_config_rejected():
    with pytest.raises(ValueError):
        DedupConfig(num_perm=128, lsh_bands=10, lsh_rows=4)
