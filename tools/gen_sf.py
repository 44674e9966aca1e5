#!/usr/bin/env python
"""Deterministic scale-factor fixture generator for the one-off sf1.0
scale probe (SCALING.json's 4th point).

The driver-generated fixtures stop at sf0.1 and their generator is not in
this repo, so this tool synthesizes a SCHEMA-IDENTICAL, distribution-
faithful superset scale: every column type, key range convention, value
domain, and structural plant (near-dup pairs marked with the 'dup' token,
exact-dup pairs, unit-norm embeddings, 30-day event window, 31-word
document vocabulary) is matched to the measured sf0.1 distributions —
see the inline notes. It is NOT byte-compatible with the driver's seed;
it exists so wall-time-vs-SF exponents get a 4th decade and so parity
(Spark vs DuckDB on the SAME generated data) can be asserted at 10x the
bench scale. Never writes into /root/testdata.

One DELIBERATE departure from naive extrapolation: the document
vocabulary grows with the corpus (n_vocab ~ 30 * (scale/0.1)^(1/3), i.e.
the 3-token shingle space grows linearly with doc count — a Heaps-law
surrogate). The driver fixture's vocabulary is FIXED at 30 words, which
at 10x the docs would hold the shingle space constant while pairs grow
quadratically: every banding/dedup key's candidate volume would explode
with the fixture's collision density, not the operator's design (measured:
the naive 10x fixture ground q_cc_doubling for 20+ minutes). Holding
per-shingle document frequency constant instead makes the 4th scaling
point measure operator growth under a realistic corpus null model.

Usage:
    python tools/gen_sf.py --scale 1.0 --out /tmp/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 777
DAY_US = 86_400_000_000

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]  # 30 uniform words; 'dup' is the planted near-dup marker (31st token)
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "old", "small", "red", "new", "large", "hot", "cold"]
P_NOUN = ["ring", "gear", "bolt", "plate", "rod", "widget", "gizmo", "anvil"]
P_TYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _ts(base: str, day_offsets, us_within=None):
    base_us = np.datetime64(base).astype("datetime64[us]").astype(np.int64)
    us = base_us + day_offsets.astype(np.int64) * DAY_US
    if us_within is not None:
        us = us + us_within.astype(np.int64)
    return us.astype("datetime64[us]")


def gen(scale: float, out: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows", flush=True)

    # region / nation: fixed dims, identical shape at every SF
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    n_cust = int(150_000 * scale)
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )

    n_supp = int(10_000 * scale)
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
    )

    n_part = int(200_000 * scale)
    adj = np.array(P_ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, 8, n_part)]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
                "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
                "p_type": pa.array(np.array(P_TYPE)[rng.integers(0, 6, n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
    )

    n_ord = int(1_500_000 * scale)
    # o_orderkey stays dense < MERGE_DV_INSERT_OFFSET (10M): the merge_dv
    # fixture guard raises on keys at/above the synthetic-insert offset
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _ts("1995-01-01", rng.integers(0, 2405, n_ord)),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    # lineitem: 1..7 lines per order (measured mean 4.075); linenumbers
    # drawn WITH replacement — the driver fixture has duplicate
    # (l_orderkey, l_linenumber) pairs, which downstream oracles tie-break on
    per_order = rng.integers(1, 8, n_ord)
    lk = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    n_li = len(lk)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lk, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts("1995-01-01", rng.integers(1, 2500, n_li)),
            }
        ),
    )

    n_ev = int(1_000_000 * scale)
    n_users = int(15_000 * scale)
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": _ts(
                    "2024-01-01",
                    rng.integers(0, 30, n_ev),
                    rng.integers(0, DAY_US, n_ev),
                ),
                "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": np.round(rng.exponential(50.0, n_ev), 2),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, n_ev)
                ],
            }
        ),
    )

    # documents: uniform vocab (Heaps-scaled, see module docstring),
    # 10..100 tokens/doc; 5% near-dup pairs (copy of an earlier doc with
    # 2 tokens replaced by 'dup' — measured jaccard ~0.98) plus ~0.3%
    # exact-dup pairs
    n_doc = int(50_000 * scale)
    n_vocab = max(len(VOCAB), round(len(VOCAB) * (scale / 0.1) ** (1 / 3)))
    vocab = np.array(
        VOCAB + [f"tok{i:03d}" for i in range(n_vocab - len(VOCAB))]
    )
    texts: list[str] = []
    n_near = int(n_doc * 0.05)
    n_exact = max(2, int(n_doc * 0.003))
    for i in range(n_doc):
        n_tok = int(rng.integers(10, 101))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_tok)]))
    near_ids = rng.choice(np.arange(n_doc // 10, n_doc), n_near, replace=False)
    for i in near_ids:
        # source must be LONG (>= 40 tokens): 2 replaced tokens then keep
        # pair jaccard >= ~0.77, far from the 0.5 component threshold —
        # borderline-j pairs are exactly where 16-band LSH has a ~1%
        # false-negative rate, and the CC oracle's pair graph is the
        # EXACT one, so a planted pair the bands may miss would make the
        # probe flaky by construction rather than test anything
        while True:
            src = int(rng.integers(0, i))
            if len(texts[src].split()) >= 40 and " dup " not in f" {texts[src]} ":
                break
        toks = texts[src].split()
        for _ in range(2):
            toks[int(rng.integers(0, len(toks)))] = "dup"
        texts[int(i)] = " ".join(toks)
    exact_ids = rng.choice(
        np.setdiff1d(np.arange(n_doc // 10, n_doc), near_ids), n_exact, replace=False
    )
    for i in exact_ids:
        texts[int(i)] = texts[int(rng.integers(0, i))]
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[
                        rng.choice(len(LANGS), n_doc, p=np.array(LANG_W))
                    ]
                ),
                "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    # embeddings: 64-d unit-norm gaussians (measured: no cluster structure,
    # labels uniform 0..9, norms exactly 1)
    n_vec = int(20_000 * scale)
    V = rng.standard_normal((n_vec, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), pa.int64()),
                "embedding": pa.array(
                    [v for v in V], pa.list_(pa.float32())
                ),
                "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
            }
        ),
    )


def main() -> None:
    args = sys.argv[1:]
    scale, out = 1.0, "/tmp/sf1.0"
    if "--scale" in args:
        scale = float(args[args.index("--scale") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]
    if os.path.realpath(out).startswith("/root/testdata"):
        sys.exit("refusing to write into /root/testdata")
    gen(scale, out)
    print(f"wrote scale={scale} fixture to {out}")


if __name__ == "__main__":
    main()
