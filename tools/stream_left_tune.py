#!/usr/bin/env python
"""Bounded tuning experiment for q_stream_stream_left (round-11 verdict
order #4): the key's cost floor is per-trigger state-store commits
(4 join state stores x partitions x 2 sides x 3 watermark-committing
triggers + no-data flush batches), not data volume. Two levers, measured
head-to-head at sf0.1, min-of-N per config:

  (a) state-store provider: HDFSBacked (default) vs RocksDB
  (b) spark.sql.shuffle.partitions for the streaming query (state-store
      instance count is fixed at query start = shuffle partitions)

Writes STREAM_TUNE.json at the repo root. Adoption rule (from the
verdict): keep the current config unless a variant wins >= 1.5x; a
documented negative result also closes the order.

Usage: python tools/stream_left_tune.py [--runs 2] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_aws_spark.session import get_spark  # noqa: E402
from data_pipeline_aws_spark.streaming import jobs  # noqa: E402

HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

CONFIGS = [
    {"name": "baseline_hdfs_p8", "provider": HDFS, "partitions": 8},
    {"name": "hdfs_p4", "provider": HDFS, "partitions": 4},
    {"name": "hdfs_p2", "provider": HDFS, "partitions": 2},
    {"name": "rocksdb_p8", "provider": ROCKS, "partitions": 8},
    {"name": "rocksdb_p2", "provider": ROCKS, "partitions": 2},
]


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = get_spark("stream-left-tune")
    spark.sparkContext.setLogLevel("ERROR")
    key = "spark.sql.streaming.stateStore.providerClass"
    default_parts = jobs.STREAM_SHUFFLE_PARTITIONS
    results = []
    expected_rows = None
    for cfg in CONFIGS:
        spark.conf.set(key, cfg["provider"])
        jobs.STREAM_SHUFFLE_PARTITIONS = cfg["partitions"]
        times = []
        rows = None
        try:
            for _ in range(runs):
                t0 = time.monotonic()
                rows = jobs.q_stream_stream_left(spark, sf_dir).count()
                times.append(round(time.monotonic() - t0, 3))
        finally:
            jobs.STREAM_SHUFFLE_PARTITIONS = default_parts
            spark.conf.set(key, HDFS)
        if expected_rows is None:
            expected_rows = rows
        assert rows == expected_rows, (
            f"{cfg['name']} changed the RESULT ({rows} vs {expected_rows}) — "
            "a tuning knob must never change semantics"
        )
        results.append({**cfg, "runs": times, "best_sec": min(times), "rows": rows})
        print(f"{cfg['name']}: best {min(times)} s over {times} ({rows} rows)", flush=True)

    base = results[0]["best_sec"]
    for r in results:
        r["speedup_vs_baseline"] = round(base / r["best_sec"], 3)
    winner = max(results, key=lambda r: r["speedup_vs_baseline"])
    out = {
        "key": "q_stream_stream_left",
        "sf_dir": sf_dir,
        "runs_per_config": runs,
        "configs": results,
        "winner": winner["name"],
        "winner_speedup": winner["speedup_vs_baseline"],
        "adopted": bool(winner["speedup_vs_baseline"] >= 1.5 and winner["name"] != results[0]["name"]),
        "adoption_rule": ">=1.5x over baseline or keep current config (round-11 verdict order #4)",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STREAM_TUNE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {path}: winner {out['winner']} ({out['winner_speedup']}x), adopted={out['adopted']}")


if __name__ == "__main__":
    main()
