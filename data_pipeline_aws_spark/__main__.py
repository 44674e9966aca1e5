"""CLI entry point — the Spark-native replacement for the reference's
declared job invocation chain (trigger Lambda → Step Functions →
``glue:startJobRun.sync`` → ``orders_job.py``, declared at
``/root/reference/Hoth/FHIR/cloudformations/lambda-stack.yml:23-55`` with an
empty job body). Where Glue wires ``--ENV``-parameterized S3 paths into a
job script, this CLI wires a data directory into a registered query:

    python -m data_pipeline_aws_spark list
    python -m data_pipeline_aws_spark run q_agg_basic --sf-dir /root/testdata/sf0.01
    python -m data_pipeline_aws_spark run q_star_join --sf-dir ... --show 20
    python -m data_pipeline_aws_spark run q_pipeline_e2e --sf-dir ... --out /tmp/result

``run`` executes the query end-to-end: ``--out`` writes parquet (the
production shape — results land columnar next to the data), otherwise the
first ``--show`` rows print. ``--explain`` prints the formatted physical
plan instead of executing — the plan-review verb this repo's SCALE.md
workflow is built around.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_pipeline_aws_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    run = sub.add_parser("run", help="run one registered query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--show", type=int, default=20, help="rows to print")
    run.add_argument("--out", default=None, help="write result parquet here")
    run.add_argument(
        "--explain", action="store_true", help="print the physical plan, don't execute"
    )
    args = ap.parse_args(argv)

    from data_pipeline_aws_spark import all_queries

    queries = all_queries()
    if args.cmd == "list":
        try:
            for name in sorted(queries):
                print(name)
        except BrokenPipeError:  # `| head` closed the pipe — not an error
            sys.stderr.close()
        return 0

    if args.name not in queries:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    from data_pipeline_aws_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
