#!/usr/bin/env python
"""Targeted quiet-host re-measure: min-of-N wall time for the given query
keys at $SPARK_GRAFT_SF_DIR (default sf0.1), bench.py's measurement
protocol (tuned session, noop sink, flagship+Arrow warmup, loadavg stamps)
without the full-suite cost. Used for drift attribution: BASELINE.md's
cross-round comparisons must come from quiet-host min-of-N runs, not the
(possibly contended) closing artifact.

Usage:
    python tools/remeasure.py [-n 3] key [key ...]

Prints one JSON line: {"queries": {key: min_sec}, "passes": N,
"loadavg_1min": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from data_pipeline_aws_spark import all_queries  # noqa: E402
from data_pipeline_aws_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n_passes = 3
    if args and args[0] == "-n":
        n_passes = int(args[1])
        args = args[2:]
    if not args:
        sys.exit("usage: remeasure.py [-n passes] key [key ...]")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    # Same quiet-host gate as bench.py's closing artifact: this tool's
    # whole purpose is quiet-host drift attribution, so a contended start
    # waits (up to 10 min, 30 s re-samples) and the JSON line carries a
    # host_contended stamp either way. SPARK_GRAFT_BENCH_QUIET_WAIT=0 skips.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0"))
    wait_left = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "600"))
    load_start = os.getloadavg()[0]
    while load_start > max_load and wait_left > 0:
        print(
            f"host busy (1-min loadavg {load_start} > {max_load}); waiting",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(30)
        wait_left -= 30
        load_start = os.getloadavg()[0]

    spark = get_spark("remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [k for k in args if k not in queries]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    # Same warmup as bench.py: JVM + file metadata via the flagship, Python
    # worker fork via one Arrow-path query (both uncounted).
    queries["q_agg_basic"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    queries["q_pandas_udaf"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for p in range(n_passes):
        for name in args:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            print(f"pass{p} {name} {elapsed}", file=sys.stderr, flush=True)
    from bench import _cpu_calibration

    print(
        json.dumps(
            {
                "queries": timings,
                "passes": n_passes,
                "loadavg_1min": {"start": load_start, "end": os.getloadavg()[0]},
                "host_contended": load_start > max_load,
                "calib_sec": _cpu_calibration(),
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
