#!/usr/bin/env python
"""Empirical scaling curves: min-of-N wall time for the given query keys at
each SF dir, plus fitted growth exponents vs scale factor — turning the plan
pins' structural 100×-scale claims into committed data (SCALING.json).

Usage:
    python tools/scaling.py [-n 2] [--top K] [--sf-dirs d1,d2,...] [--cold] [key ...]

--cold clears each SF's sink caches first and keeps cache-backed keys'
pass-0 (write-inclusive BUILD) numbers — bench.py --cold's convention —
writing to SCALING_COLD.json so build exponents never overwrite the
warm-readback artifact.

With --top K (default 10 when no keys given) the key list is the K most
expensive queries of the committed BENCH_FULL.json map. Per key the tool
records wall seconds at sf0.001 / sf0.01 / sf0.1 (min-of-N, bench.py's
measurement protocol: tuned session, noop sink, warmup uncounted) and two
exponents of t ~ sf^e:

  - exponent     — least-squares slope of log t vs log sf over all 3 points.
    Fixed per-query overhead (~0.2-0.5 s of scheduling/planning) flattens
    this at small SFs, so it UNDERSTATES growth; it is the conservative
    floor.
  - exponent_hi  — the sf0.01 → sf0.1 slope alone, where data cost dominates
    overhead; this is the number to read against the ~1.2 flag threshold
    (log-linear ops land ≲1.1; a quadratic term shows as ≫1.2 long before
    it is a wall-clock problem at test scale).

Keys whose fixture is a cached on-disk sink (bench.py SINK_CACHE_KEYS)
measure warm READ-BACK of the landed layout, same as the warm bench — the
artifact stamps the mode so nobody mistakes a cache read's exponent for the
build's.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from data_pipeline_aws_spark import all_queries  # noqa: E402
from data_pipeline_aws_spark.session import get_spark  # noqa: E402

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
FLAG_EXPONENT = 1.2


def _fit_exponent(sfs: list[float], ts: list[float]) -> float:
    """Least-squares slope of log t vs log sf."""
    xs = [math.log(s) for s in sfs]
    ys = [math.log(max(t, 1e-3)) for t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def _take_flag(args: list[str], flag: str) -> tuple[list[str], str | None]:
    """Pop ``flag <value>`` from args, exiting with usage on a dangling
    flag (the bench.py lesson: argv mistakes must die at startup)."""
    if flag not in args:
        return args, None
    i = args.index(flag)
    if i + 1 >= len(args):
        sys.exit(f"usage: {flag} <value> (flag given without a value)")
    return args[:i] + args[i + 2 :], args[i + 1]


def main() -> None:
    args = sys.argv[1:]
    args, n_val = _take_flag(args, "-n")
    args, top_val = _take_flag(args, "--top")
    args, dirs_val = _take_flag(args, "--sf-dirs")
    cold = "--cold" in args
    if cold:
        # --cold: sink caches are cleared per SF so pass 0 measures the
        # write-inclusive BUILD; later passes keep a cache key's pass-0
        # number (bench.py --cold's convention), giving the cache family's
        # build cost its own exponent curve in a SEPARATE artifact.
        args = [a for a in args if a != "--cold"]
    merge = "--merge" in args
    if merge:
        # --merge: min-combine this run's per-SF points into the existing
        # artifact's entries (the min-of-N convention across runs) and
        # recompute each touched key's exponents over ALL decades present.
        # Untouched keys keep their committed rows — this is how the sf10
        # fifth decade extends SCALING.json without re-sweeping all keys.
        args = [a for a in args if a != "--merge"]
    n_passes = int(n_val) if n_val else 2
    top_k = int(top_val) if top_val else None
    sf_dirs = tuple(dirs_val.split(",")) if dirs_val else SF_DIRS
    for d in sf_dirs:
        if not os.path.isdir(d):
            sys.exit(f"sf dir missing: {d}")
    if not args and top_k is None:
        top_k = 10

    queries = all_queries()
    keys = list(args)
    if top_k:
        with open(os.path.join(_REPO, "BENCH_FULL.json")) as f:
            full = json.load(f)["queries"]
        ranked = sorted(full, key=full.get, reverse=True)
        keys += [k for k in ranked if k in queries and k not in keys][: top_k]
    unknown = [k for k in keys if k not in queries]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    # Quiet-host gate + calib anchor (bench.py's shared quiet_gate):
    # scaling exponents compare times taken minutes apart, so a mid-run
    # co-tenant burst would masquerade as superlinear growth. The per-SF
    # loadavg stamps let a reader reject a contaminated column.
    from bench import (
        SINK_CACHE_KEYS,
        _clear_sink_caches,
        _cpu_calibration,
        _loadavg_1min,
        quiet_gate,
    )

    load_start, max_load = quiet_gate()

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, dict[str, float]] = {k: {} for k in keys}
    load_by_sf: dict[str, float] = {}
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        if cold:
            _clear_sink_caches(sf_dir)
        # warmup (uncounted): JVM + file metadata + Python worker fork
        queries["q_agg_basic"](spark, sf_dir).write.mode("overwrite").format("noop").save()
        queries["q_pandas_udaf"](spark, sf_dir).write.mode("overwrite").format("noop").save()
        for p in range(n_passes):
            for name in keys:
                if cold and p > 0 and name in SINK_CACHE_KEYS:
                    continue  # keep the write-inclusive pass-0 number
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                elapsed = round(time.perf_counter() - t0, 3)
                cur = times[name].get(tag)
                if cur is None or elapsed < cur:
                    times[name][tag] = elapsed
                print(f"{tag} pass{p} {name} {elapsed}", file=sys.stderr, flush=True)
        load_by_sf[tag] = round(_loadavg_1min(), 2)

    path = os.path.join(_REPO, "SCALING_COLD.json" if cold else "SCALING.json")
    prior = {}
    if merge and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)

    report = dict(prior.get("keys", {}))
    flagged = []
    for name in keys:
        points = {
            t: v
            for t, v in report.get(name, {}).items()
            if t.startswith("sf") and isinstance(v, (int, float))
        }
        for t, v in times[name].items():  # min-of-N convention across runs
            points[t] = min(v, points[t]) if t in points else v
        p_tags = sorted(points, key=lambda t: float(t.removeprefix("sf")))
        p_sfs = [float(t.removeprefix("sf")) for t in p_tags]
        ts = [points[t] for t in p_tags]
        if len(p_tags) < 2:  # first point of a new key: no slope yet
            report[name] = {
                **points,
                "exponent": None,
                "exponent_hi": None,
                "flagged": False,
                "sink_cache": name in SINK_CACHE_KEYS,
            }
            continue
        exp3 = _fit_exponent(p_sfs, ts)
        # exponent_hi = slope over the LAST two (largest) SFs, where data
        # cost dominates fixed overhead
        exp_hi = round(
            math.log(max(ts[-1], 1e-3) / max(ts[-2], 1e-3))
            / math.log(p_sfs[-1] / p_sfs[-2]),
            3,
        )
        report[name] = {
            **points,
            "exponent": exp3,
            "exponent_hi": exp_hi,
            "flagged": exp_hi > FLAG_EXPONENT,
            "sink_cache": name in SINK_CACHE_KEYS,
        }

    for name, entry in report.items():
        if entry.get("flagged"):
            flagged.append(name)

    all_dirs = sorted(
        set(prior.get("sf_dirs", []) if merge else []) | set(sf_dirs),
        key=lambda d: float(os.path.basename(d.rstrip("/")).removeprefix("sf")),
    )
    out = {
        "keys": report,
        "sf_dirs": all_dirs,
        "passes": n_passes,
        "flag_threshold": FLAG_EXPONENT,
        "flagged": sorted(flagged),
        "loadavg_1min_after_sf": load_by_sf,
        "host_contended": load_start > max_load,
        "calib_sec": _cpu_calibration(),
        "sink_mode": "cold_write_inclusive" if cold else "warm_readback",
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"flagged": sorted(flagged), "n_keys": len(report), "out": path}))
    sys.exit(0)


if __name__ == "__main__":
    main()
