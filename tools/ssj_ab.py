#!/usr/bin/env python
"""Interleaved A/B for q_stream_stream_join: two independent file-source
streams (current, arm A) vs ONE shared source stream feeding both sides of
the self-join (candidate, arm B — the q_stream_stream_left drain already
uses this shape). Asserts drained results are row-identical before timing.

Usage: python tools/ssj_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_aws_spark.session import get_spark  # noqa: E402
from data_pipeline_aws_spark.streaming.jobs import (  # noqa: E402
    _run_to_completion,
    _stream_events,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sides(purchase_src, click_src):
    purchases = (
        purchase_src.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        click_src.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    return purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND "
            "c_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts"
        ),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))


def arm_a(spark):
    return _sides(_stream_events(spark, SF_DIR), _stream_events(spark, SF_DIR))


def arm_b(spark):
    ev = _stream_events(spark, SF_DIR)
    return _sides(ev, ev)


def drain(spark, arm) -> tuple[float, int]:
    t0 = time.perf_counter()
    res = _run_to_completion(arm(spark), "append")
    res.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    return dt, res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ssj_ab")
    spark.sparkContext.setLogLevel("ERROR")
    # row-identity check once, before timing
    _, ra = drain(spark, arm_a)
    _, rb = drain(spark, arm_b)
    ca, cb = ra.count(), rb.count()
    diff = ra.exceptAll(rb).count() + rb.exceptAll(ra).count()
    print(f"rows A={ca} B={cb} symdiff={diff}", flush=True)
    assert ca == cb and diff == 0, "ARMS DIFFER — candidate rejected"
    ta, tb = [], []
    for i in range(n):
        dt, _ = drain(spark, arm_a)
        ta.append(dt)
        print(f"round {i} A {dt:.3f}", flush=True)
        dt, _ = drain(spark, arm_b)
        tb.append(dt)
        print(f"round {i} B {dt:.3f}", flush=True)
    print(f"A(two sources) min={min(ta):.3f} all={[round(t,3) for t in ta]}")
    print(f"B(one source)  min={min(tb):.3f} all={[round(t,3) for t in tb]}")


if __name__ == "__main__":
    main()
