#!/usr/bin/env python
"""Skew-stress evidence for the mitigation operators (SKEW.json).

The committed fixtures have benign key distributions, so the salted-join
and hub-cap keys pass correctness without ever demonstrating that the
mitigation buys anything. This tool generates a DELIBERATELY skewed
fixture (deterministic, seeded) and measures each mitigation against its
naive twin on the SAME data:

  1. join_unsalted  — customer⋈nation shuffle join where 85% of customers
                      share ONE nationkey (broadcast + AQE skew-join OFF,
                      so the hot key lands on a single reducer)
  2. join_salted    — the shipped q_join_salted (SALT=8 composite key)
                      under identical confs; result equality asserted
  3. join_aqe_skew  — the unsalted plan with AQE skew-join ON (runtime
                      mitigation alternative, thresholds scaled to the
                      fixture so the optimizer can act)
  4. link_uncapped  — the shipped q_link_predict on a graph with a
                      4000-degree hub supplier (wedge stream ~8M rows
                      from one mid node)
  5. link_capped    — the shipped q_link_predict_capped (LINK_HUB_CAP=32,
                      wedge stream bounded by Σ min(deg, 32)²)

Per variant: wall seconds (min of 2 warm runs) plus per-task shuffle-read
metrics of the heaviest new stage from the Spark UI REST API — max task
read, median task read, and their ratio (the skew number: a perfectly
balanced stage sits near 1, one hot reducer sends it to ~#partitions).

Usage:  python tools/skew_bench.py            # writes SKEW.json at repo root
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SEED = 20260815
FIX_DIR = "/tmp/dpas_skew"
N_CUST = 4_000_000
HOT_NATION_PCT = 0.85
HUB_DEG = 4_000  # hub supplier's distinct-order degree
BG_SUPPLIERS = 600
BG_DEG = 40


def build_fixture() -> dict:
    """Deterministic skewed fixture, schema-identical to the driver tables
    the operators read (customer/nation for the join pair, orders/lineitem
    for the graph pair). Never touches /root/testdata."""
    os.makedirs(FIX_DIR, exist_ok=True)
    rng = np.random.RandomState(SEED)

    # --- customer: one hot nationkey --------------------------------------
    keys = np.arange(N_CUST, dtype=np.int64)
    hot = rng.random(N_CUST) < HOT_NATION_PCT
    nk = np.where(hot, 0, rng.randint(1, 25, N_CUST)).astype(np.int32)
    bal = np.round(rng.random(N_CUST) * 9000.0 + 1000.0, 2)
    pq.write_table(
        pa.table(
            {
                "c_custkey": keys,
                "c_name": np.array(["c"] * N_CUST, dtype=object),
                "c_nationkey": nk,
                "c_acctbal": bal,
                "c_mktsegment": np.array(["BUILDING"] * N_CUST, dtype=object),
            }
        ),
        os.path.join(FIX_DIR, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": np.arange(25, dtype=np.int32),
                "n_name": np.array([f"NATION_{i:02d}" for i in range(25)], dtype=object),
                "n_regionkey": (np.arange(25) % 5).astype(np.int32),
            }
        ),
        os.path.join(FIX_DIR, "nation.parquet"),
    )

    # --- orders + lineitem: one hub supplier ------------------------------
    # hub edges: supplier 1 × customers 0..HUB_DEG-1
    hub_cust = np.arange(HUB_DEG, dtype=np.int64)
    hub_supp = np.full(HUB_DEG, 1, dtype=np.int64)
    # background: BG_SUPPLIERS suppliers × BG_DEG customers each, customer
    # ids offset so customer-side mids stay low-degree
    bg_supp = np.repeat(np.arange(100, 100 + BG_SUPPLIERS, dtype=np.int64), BG_DEG)
    bg_cust = 10_000 + np.arange(BG_SUPPLIERS * BG_DEG, dtype=np.int64) % (
        BG_SUPPLIERS * BG_DEG // 2
    )
    cust = np.concatenate([hub_cust, bg_cust])
    supp = np.concatenate([hub_supp, bg_supp])
    n_edges = len(cust)
    okey = np.arange(n_edges, dtype=np.int64)
    ts = np.full(n_edges, np.datetime64("1997-06-01", "us"))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": okey,
                "o_custkey": cust,
                "o_orderstatus": np.array(["F"] * n_edges, dtype=object),
                "o_totalprice": np.full(n_edges, 1000.0),
                "o_orderdate": pa.array(ts),
                "o_orderpriority": np.array(["3-MEDIUM"] * n_edges, dtype=object),
            }
        ),
        os.path.join(FIX_DIR, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": okey,
                "l_partkey": okey % 1000,
                "l_suppkey": supp,
                "l_linenumber": np.ones(n_edges, dtype=np.int32),
                "l_quantity": np.full(n_edges, 50.0),
                "l_extendedprice": np.full(n_edges, 100.0),
                "l_discount": np.zeros(n_edges),
                "l_tax": np.zeros(n_edges),
                "l_returnflag": np.array(["N"] * n_edges, dtype=object),
                "l_linestatus": np.array(["F"] * n_edges, dtype=object),
                "l_shipdate": pa.array(ts),
            }
        ),
        os.path.join(FIX_DIR, "lineitem.parquet"),
    )
    return {
        "n_customers": N_CUST,
        "hot_nation_share": HOT_NATION_PCT,
        "hub_degree": HUB_DEG,
        "bg_suppliers": BG_SUPPLIERS,
        "bg_degree": BG_DEG,
        "n_edges": int(n_edges),
    }


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _max_stage_id(spark) -> int:
    try:
        stages = _api(spark, "/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def _task_skew(spark, after_stage: int) -> dict:
    """Per-task shuffle-read metrics of the heaviest stage newer than
    `after_stage`: the stage with max total shuffle read, its max and
    median task reads, and their ratio."""
    try:
        stages = [
            s
            for s in _api(spark, "/stages?status=COMPLETE")
            if s["stageId"] > after_stage and s.get("shuffleReadBytes", 0) > 0
        ]
        if not stages:
            return {}
        heavy = max(stages, key=lambda s: s["shuffleReadBytes"])
        summary = _api(
            spark,
            f"/stages/{heavy['stageId']}/{heavy['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,1.0",
        )
        reads = summary["shuffleReadMetrics"]["readBytes"]
        lo, med, hi = reads
        return {
            "stage_id": heavy["stageId"],
            "stage_shuffle_read_mb": round(heavy["shuffleReadBytes"] / 1e6, 2),
            "n_tasks": heavy["numCompleteTasks"],
            "max_task_read_mb": round(hi / 1e6, 3),
            "median_task_read_mb": round(med / 1e6, 3),
            "task_skew_ratio": round(hi / med, 1) if med > 0 else None,
        }
    except Exception as exc:  # UI disabled → wall times still recorded
        return {"error": str(exc)[:120]}


def _run(spark, fn, n_runs: int = 2):
    """min-of-n wall time + task metrics from the fastest run's stages."""
    best, metrics = None, {}
    for _ in range(n_runs):
        before = _max_stage_id(spark)
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        if best is None or dt < best:
            best, metrics = dt, _task_skew(spark, before)
            best_rows = rows
    return best, metrics, best_rows


def main() -> None:
    fixture = build_fixture()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.operators.graph import LINK_HUB_CAP
    from data_pipeline_aws_spark.tables import table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def conf_hot_join(aqe_skew: bool) -> None:
        # force the shuffle join: the whole point is reducer-side skew
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        if aqe_skew:
            # scale AQE's skew thresholds to the fixture (defaults target
            # 256 MB partitions; the hot partition here is ~10^1.5 MB)
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    def reset_confs() -> None:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            spark.conf.unset(k)

    def unsalted():
        c = table(spark, FIX_DIR, "customer")
        n = spark.read.parquet(os.path.join(FIX_DIR, "nation.parquet"))
        return (
            c.join(n, c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            )
            .collect()
        )

    # warm the page cache once so run 1 isn't billed the cold read
    for t in ("customer", "nation", "orders", "lineitem"):
        spark.read.parquet(os.path.join(FIX_DIR, f"{t}.parquet")).count()

    out: dict = {"fixture": fixture, "salt": 8, "link_hub_cap": LINK_HUB_CAP}
    variants: dict = {}

    conf_hot_join(aqe_skew=False)
    w, m, rows_u = _run(spark, unsalted)
    variants["join_unsalted"] = {"wall_sec": round(w, 2), **m}
    w, m, rows_s = _run(spark, lambda: qs["q_join_salted"](spark, FIX_DIR).collect())
    variants["join_salted"] = {"wall_sec": round(w, 2), **m}
    canon = lambda rows: sorted((r.n_name, r.n_customers, r.total_bal) for r in rows)  # noqa: E731
    assert canon(rows_u) == canon(rows_s), "salted join diverged from unsalted"

    conf_hot_join(aqe_skew=True)
    w, m, rows_a = _run(spark, unsalted)
    variants["join_unsalted_aqe_skew"] = {"wall_sec": round(w, 2), **m}
    assert canon(rows_u) == canon(rows_a), "AQE skew join diverged"
    reset_confs()

    w, m, _ = _run(spark, lambda: qs["q_link_predict"](spark, FIX_DIR).collect())
    variants["link_uncapped"] = {"wall_sec": round(w, 2), **m}
    w, m, _ = _run(
        spark, lambda: qs["q_link_predict_capped"](spark, FIX_DIR).collect()
    )
    variants["link_capped"] = {"wall_sec": round(w, 2), **m}

    out["variants"] = variants
    out["speedup"] = {
        "salted_vs_unsalted": round(
            variants["join_unsalted"]["wall_sec"]
            / max(variants["join_salted"]["wall_sec"], 1e-9),
            2,
        ),
        "aqe_skew_vs_unsalted": round(
            variants["join_unsalted"]["wall_sec"]
            / max(variants["join_unsalted_aqe_skew"]["wall_sec"], 1e-9),
            2,
        ),
        "capped_vs_uncapped": round(
            variants["link_uncapped"]["wall_sec"]
            / max(variants["link_capped"]["wall_sec"], 1e-9),
            2,
        ),
    }
    path = os.path.join(_REPO, "SKEW.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
