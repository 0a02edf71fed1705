"""Seeded synthetic transcript fixtures with explicit ground truth.

Transcript-domain rewrite of the reference's ``syndir`` generator
(/root/reference/src/syndir/core.c:380-414): seeded generation of a corpus
with a controlled duplicate percentage. Differences, per FIXTURES.md:

- the "file" is a multi-turn conversation in the mandated input shape
  ``(conv_id, turn_idx, role, text, tool, ts)``;
- ground truth is EXPLICIT (syndir keeps it implicit: a source file is a dup
  iff its content was copied, core.c:317-344) — we emit a ``truth`` table;
- the size sampler keeps syndir's folded-normal scheme (mu=p50,
  sigma=(p95-p50)/1.645, clamped to [0.1*p50, max]; core.c:30-68) but uses a
  seeded ``np.random.Generator`` instead of Box-Muller over ``rand()``;
- besides exact duplicates (verbatim turn copy, same text per turn_idx —
  core.c:330-331) we plant near-dups (token mutations), substring-dups
  (spliced token runs) and an optional hot-band skew block.

Determinism: everything derives from ``seed``; timestamps are a pinned
epoch + arithmetic (no ``time(NULL)`` — unlike syndir's default seed,
src/syndir/args.c:83). Rows are written shuffled so tests prove document
assembly restores stable turn order.

Near-dup mutation rates are chosen so planted pairs sit ABOVE the pinned
Jaccard threshold: with w-word shingles and token mutation rate m, shared
shingle fraction s ~= (1-m)^w and J ~= s/(2-s); at w=5, m<=0.025 keeps
J >= ~0.78 > tau=0.7.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

CHARSET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789.,!?-_"
)
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "calculator", "browser", "python"]
EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z


@dataclass(frozen=True)
class FixtureParams:
    """syndir-equivalent knobs (/root/reference/src/syndir/args.c:73-83)."""

    num_convs: int = 100
    exact_dup_pct: float = 30.0       # --percent analogue (args.c:77)
    near_dup_pct: float = 20.0
    substring_dup_pct: float = 5.0
    turns_p50: int = 8
    turns_p95: int = 40
    turns_max: int = 200
    words_p50: int = 9                # per-turn length, in words
    words_p95: int = 70
    words_max: int = 500
    vocab_size: int = 4000
    mutation_lo: float = 0.01
    mutation_hi: float = 0.025
    shingle_w: int = 5                # must match DedupConfig.shingle_w
    min_jaccard: float = 0.75         # planted near-dups stay above tau=0.7
    min_src_tokens: int = 60          # dup sources need real shingle mass
    substring_run: int = 60           # tokens spliced (>= config.substring_w)
    skew_block: int = 0               # N identical short convs (hot LSH band)
    seed: int = 42                    # test_cpdd.sh:28


def _folded_normal_sizes(
    rng: np.random.Generator, n: int, p50: float, p95: float, pmax: float
) -> np.ndarray:
    """syndir's size sampler (core.c:30-68): |N(mu=p50, sigma=(p95-p50)/1.645)|
    clamped to [0.1*p50, pmax]."""
    sigma = (p95 - p50) / 1.645
    x = np.abs(rng.normal(p50, sigma, size=n))
    return np.clip(x, max(1.0, 0.1 * p50), pmax).astype(np.int64)


def _make_vocab(rng: np.random.Generator, size: int) -> np.ndarray:
    """Random words of 2-12 chars over syndir's charset (core.c:72),
    restricted to word-safe chars so whitespace tokenization is stable."""
    chars = np.array(list(CHARSET))
    lens = rng.integers(2, 13, size=size)
    words = ["".join(rng.choice(chars, size=l)) for l in lens]
    return np.array(words, dtype=object)


class TranscriptFixture:
    """Generated corpus: ``transcripts`` + ``truth`` pandas frames."""

    def __init__(self, transcripts: pd.DataFrame, truth: pd.DataFrame, params: FixtureParams):
        self.transcripts = transcripts
        self.truth = truth
        self.params = params

    def write(self, out_dir: str, n_files: int = 16) -> None:
        """``transcripts.parquet`` is a DIRECTORY of n_files part files:
        a single monolithic file caps Spark's scan parallelism at
        size/maxPartitionBytes tasks (measured: 2 tasks for 1.7M turns),
        which strangles every map-side stage. Real tables are multi-file."""
        os.makedirs(out_dir, exist_ok=True)
        tdir = os.path.join(out_dir, "transcripts.parquet")
        os.makedirs(tdir, exist_ok=True)
        n = len(self.transcripts)
        step = (n + n_files - 1) // n_files
        for i in range(n_files):
            part = self.transcripts.iloc[i * step : (i + 1) * step]
            if len(part):
                part.to_parquet(os.path.join(tdir, f"part-{i:04d}.parquet"), index=False)
        self.truth.to_parquet(os.path.join(out_dir, "truth.parquet"), index=False)


def generate(params: FixtureParams = FixtureParams()) -> TranscriptFixture:
    rng = np.random.default_rng(params.seed)
    vocab = _make_vocab(rng, params.vocab_size)

    n = params.num_convs
    n_exact = int(n * params.exact_dup_pct / 100.0)
    n_near = int(n * params.near_dup_pct / 100.0)
    n_sub = int(n * params.substring_dup_pct / 100.0)
    n_unique = n - n_exact - n_near - n_sub
    if n_unique <= 0:
        raise ValueError("dup percentages sum to >= 100")

    # token streams per conversation, as lists of per-turn token-id arrays
    conv_turn_tokens: list[list[np.ndarray]] = []
    kinds: list[str] = []
    sources: list[int] = []          # index of source conv, -1 for unique
    mut_rates: list[float] = []

    def fresh_turns() -> list[np.ndarray]:
        n_turns = int(
            _folded_normal_sizes(rng, 1, params.turns_p50, params.turns_p95, params.turns_max)[0]
        )
        n_turns = max(1, n_turns)
        lens = _folded_normal_sizes(rng, n_turns, params.words_p50, params.words_p95, params.words_max)
        return [rng.integers(0, params.vocab_size, size=int(l)) for l in lens]

    # 1) uniques first — they are the "reference corpus" dups copy from
    #    (select_random_reference walks earlier entries, core.c:256-270)
    for _ in range(n_unique):
        conv_turn_tokens.append(fresh_turns())
        kinds.append("unique")
        sources.append(-1)
        mut_rates.append(0.0)

    def _tok_jaccard(turns_a: list[np.ndarray], turns_b: list[np.ndarray], w: int) -> float:
        fa, fb = np.concatenate(turns_a), np.concatenate(turns_b)
        sa = {tuple(fa[i : i + w]) for i in range(len(fa) - w + 1)}
        sb = {tuple(fb[i : i + w]) for i in range(len(fb) - w + 1)}
        if not sa or not sb:
            return 0.0
        inter = len(sa & sb)
        return inter / (len(sa) + len(sb) - inter)

    # dup sources need enough shingle mass that a near-dup can stay above
    # tau (a 1-token source has zero w-shingles and can never near-match)
    tok_counts = [sum(len(t) for t in turns) for turns in conv_turn_tokens]
    eligible = [i for i in range(n_unique) if tok_counts[i] >= params.min_src_tokens]
    if not eligible:
        eligible = [int(np.argmax(tok_counts[:n_unique]))]

    # 2) exact dups: verbatim per-turn copy (same text per turn_idx;
    #    core.c:330-331, README:189 "same content, different name")
    for _ in range(n_exact):
        src = int(rng.integers(0, n_unique))
        conv_turn_tokens.append([t.copy() for t in conv_turn_tokens[src]])
        kinds.append("exact_dup")
        sources.append(src)
        mut_rates.append(0.0)

    # 3) near dups: token-level substitute/insert/delete at a small rate,
    #    verified to land above min_jaccard (retry with halved rate so truth
    #    labels are guaranteed honest w.r.t. the pinned tau)
    for _ in range(n_near):
        src = int(eligible[rng.integers(0, len(eligible))])
        rate = float(rng.uniform(params.mutation_lo, params.mutation_hi))
        while True:
            turns = []
            total_mut = 0
            for t in conv_turn_tokens[src]:
                t = t.copy()
                n_mut = rng.binomial(len(t), rate)
                for _ in range(int(n_mut)):
                    op = rng.integers(0, 3)
                    pos = int(rng.integers(0, len(t)))
                    if op == 0:      # substitute
                        t[pos] = rng.integers(0, params.vocab_size)
                    elif op == 1 and len(t) > 2:  # delete
                        t = np.delete(t, pos)
                    else:            # insert
                        t = np.insert(t, pos, rng.integers(0, params.vocab_size))
                total_mut += int(n_mut)
                turns.append(t)
            if total_mut == 0:
                # guarantee the near-dup differs from its source (a
                # 0-mutation copy would silently be an exact dup)
                ti = int(rng.integers(0, len(turns)))
                pos = int(rng.integers(0, len(turns[ti])))
                old = turns[ti][pos]
                turns[ti] = turns[ti].copy()
                turns[ti][pos] = (old + 1 + rng.integers(0, params.vocab_size - 1)) % params.vocab_size
                total_mut = 1
            if _tok_jaccard(conv_turn_tokens[src], turns, params.shingle_w) >= params.min_jaccard:
                break
            rate /= 2.0
        conv_turn_tokens.append(turns)
        kinds.append("near_dup")
        sources.append(src)
        mut_rates.append(rate)

    # 4) substring dups: otherwise-fresh conv with a contiguous run of
    #    >= substring_run tokens spliced from a source conv (caught only by
    #    the substring pass, not by MinHash at tau)
    for _ in range(n_sub):
        src = int(eligible[rng.integers(0, len(eligible))])
        src_flat = np.concatenate(conv_turn_tokens[src])
        run = min(params.substring_run, len(src_flat))
        start = int(rng.integers(0, max(1, len(src_flat) - run + 1)))
        block = src_flat[start : start + run]
        turns = fresh_turns()
        ti = int(rng.integers(0, len(turns)))
        pos = int(rng.integers(0, len(turns[ti]) + 1))
        turns[ti] = np.concatenate([turns[ti][:pos], block, turns[ti][pos:]])
        conv_turn_tokens.append(turns)
        kinds.append("substring_dup")
        sources.append(src)
        mut_rates.append(0.0)

    # 5) optional hot-band skew block: identical short boilerplate convs
    if params.skew_block > 0:
        boiler = [rng.integers(0, params.vocab_size, size=12)]
        skew_head = len(conv_turn_tokens)
        for k in range(params.skew_block):
            conv_turn_tokens.append([t.copy() for t in boiler])
            kinds.append("skew_dup")
            sources.append(skew_head if k > 0 else -1)
            mut_rates.append(0.0)

    total = len(conv_turn_tokens)
    conv_ids = [f"conv_{i:08d}" for i in range(total)]

    # truth cluster = min conv_id of the clique (canonical representative,
    # the analogue of "link to the matched reference file", copy.c:242-338)
    first_skew = kinds.index("skew_dup") if "skew_dup" in kinds else -1
    cluster_of = list(range(total))
    for i in range(total):
        if kinds[i] == "skew_dup":
            cluster_of[i] = first_skew
        elif sources[i] >= 0:
            cluster_of[i] = sources[i]

    truth = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "cluster_id": [conv_ids[c] for c in cluster_of],
            "kind": kinds,
            "source_conv": [conv_ids[s] if s >= 0 else "" for s in sources],
            "mutation_rate": mut_rates,
        }
    )

    # flatten to turn rows
    rows_conv, rows_idx, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    for i, turns in enumerate(conv_turn_tokens):
        for j, tok in enumerate(turns):
            rows_conv.append(conv_ids[i])
            rows_idx.append(j)
            role = ROLES[j % len(ROLES)]
            rows_role.append(role)
            rows_text.append(" ".join(vocab[tok]))
            rows_tool.append(TOOLS[j % len(TOOLS)] if role == "tool" else "")
            rows_ts.append(EPOCH_2026 + i * 60 + j)

    transcripts = pd.DataFrame(
        {
            "conv_id": pd.array(rows_conv, dtype="string"),
            "turn_idx": pd.array(rows_idx, dtype="int32"),
            "role": pd.array(rows_role, dtype="string"),
            "text": pd.array(rows_text, dtype="string"),
            "tool": pd.array(rows_tool, dtype="string"),
            # microsecond precision: Spark's parquet reader rejects
            # TIMESTAMP(NANOS) (PARQUET_TYPE_ILLEGAL), which pandas' default
            # datetime64[ns] would produce
            "ts": pd.to_datetime(np.array(rows_ts, dtype="int64"), unit="s").astype(
                "datetime64[us]"
            ),
        }
    )
    # scramble row order on disk so assembly must restore turn_idx order
    perm = rng.permutation(len(transcripts))
    transcripts = transcripts.iloc[perm].reset_index(drop=True)
    return TranscriptFixture(transcripts, truth, params)


def generate_to_dir(out_dir: str, params: FixtureParams = FixtureParams()) -> str:
    """Generate (if absent) and return ``out_dir``; idempotent per params."""
    marker = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(marker):
        generate(params).write(out_dir)
    return out_dir
