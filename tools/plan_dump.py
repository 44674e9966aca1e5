#!/usr/bin/env python
"""Dump query plans for the optimization-round evidence files.

For each given key, writes ``plans/<round>/<key>_<tag>.txt`` containing
(1) ``explain("formatted")`` — the numbered-operator physical plan with
PushedFilters / ReadSchema / join strategies, and (2) the FINALIZED
post-AQE executed plan (isFinalPlan=true, AQE-chosen joins, codegen spans),
which requires running the query once.

Usage:
    python tools/plan_dump.py --round r13 --tag before key [key ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from data_pipeline_aws_spark import all_queries  # noqa: E402
from data_pipeline_aws_spark.plans.inspect import executed_plan  # noqa: E402
from data_pipeline_aws_spark.session import get_spark  # noqa: E402


def _flag(args: list[str], flag: str, default: str) -> str:
    if flag in args:
        i = args.index(flag)
        v = args[i + 1]
        del args[i : i + 2]
        return v
    return default


def main() -> None:
    args = sys.argv[1:]
    rnd = _flag(args, "--round", "r13")
    tag = _flag(args, "--tag", "before")
    if not args:
        sys.exit("usage: plan_dump.py [--round rN] [--tag before|after] key [key ...]")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in args:
        spark.sparkContext.setJobDescription(f"plan_dump: {name}")
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        final = executed_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({tag})\n\n")
            f.write("== explain('formatted') ==\n\n")
            f.write(buf.getvalue())
            f.write("\n== finalized executed plan (post-AQE) ==\n\n")
            f.write(final)
            f.write("\n")
        print(f"wrote {path}", flush=True)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
