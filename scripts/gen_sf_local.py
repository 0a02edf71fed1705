#!/usr/bin/env python
"""Local approximate sf-N testbed generator (round-8 measurement aid).

The driver's round-end bench runs at a larger, driver-generated scale
factor (BENCH_r07.json: sf1.0, ~6M lineitem / 50k documents) which is
deleted between rounds, so the optimization loop cannot re-measure at
that scale against the real files. This script synthesizes a testbed with
the same schemas, key ranges and value distributions as the shipped
sf0.1 (measured with DuckDB; see OPTIMIZATION_r08.md), scaled by
--mult. It is for TIMING ONLY — correctness stays gated on the real
sf0.01 oracle — and nothing in the query paths reads it unless
SPARK_GRAFT_SF_DIR points at it explicitly.

Usage: python scripts/gen_sf_local.py --mult 10 --out /root/sf_local/sf1.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "vector", "query", "agg", "table",
    "hash", "slow", "filter", "customer", "stream", "key", "group",
    "join", "shuffle", "cache", "disk", "read", "write", "merge", "plan",
]

SEGMENTS = ["AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["signup", "click", "error", "view", "purchase"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]
PADJ = ["large", "hot", "blue", "red", "green", "small", "dark", "light"]
PNOUN = ["ring", "bolt", "screw", "gear", "cap", "rod", "pin", "disk"]


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(name, table.num_rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--out", default="/root/sf_local/sf1.0")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    m = args.mult
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    # documents: uniform 10..100 tokens from the 31-word vocab, ~0.16%
    # planted exact-dup texts (sf0.1 had 8/5000)
    n_docs = int(5000 * m)
    lens = rng.integers(10, 101, n_docs)
    toks = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts = []
    pos = 0
    for L in lens:
        texts.append(" ".join(VOCAB[t] for t in toks[pos:pos + L]))
        pos += L
    for i in rng.choice(n_docs, max(1, int(n_docs * 0.0016)), replace=False):
        if i > 0:
            texts[i] = texts[i - 1]
    write(args.out, "documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": ["en"] * n_docs,
        "source": [f"src{i % 20}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-d L2-normalized, 10 loose label clusters
    n_emb = int(2000 * m)
    centers = rng.normal(size=(10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] * 0.5 + rng.normal(size=(n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))

    # events: 30-day increasing timestamps, 5 types, value ~ |N|*scale
    n_ev = int(100000 * m)
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    ts = base + np.sort(rng.integers(0, span_us, n_ev)).astype("timedelta64[us]")
    write(args.out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(1500 * m), n_ev), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(np.abs(rng.normal(0, 62, n_ev)), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # orders / lineitem / customer / part / supplier / nation / region
    n_ord = int(150000 * m)
    n_cust = int(15000 * m)
    odates = (np.datetime64("1995-01-01") +
              rng.integers(0, 2400, n_ord).astype("timedelta64[D]"))
    write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [["O", "P", "F"][i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 105000, n_ord), 2),
        "o_orderdate": pa.array(odates.astype("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }))

    n_li = int(600000 * m)
    n_part = int(20000 * m)
    n_supp = int(1000 * m)
    lkeys = np.sort(rng.integers(0, n_ord, n_li))
    sdates = (np.datetime64("1995-01-02") +
              rng.integers(0, 2500, n_li).astype("timedelta64[D]"))
    write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [["N", "A", "R"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdates.astype("datetime64[us]"), pa.timestamp("us")),
    }))

    write(args.out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))

    write(args.out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{PADJ[a]} {PNOUN[b]}"
                   for a, b in zip(rng.integers(0, 8, n_part),
                                   rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 5, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part) % 1100, 2),
    }))

    write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    write(args.out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write(args.out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))


if __name__ == "__main__":
    main()
