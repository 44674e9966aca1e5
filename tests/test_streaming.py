"""Streaming semantics beyond the oracle-checkable drained queries:
watermark late-data dropping and custom stateful processing
(applyInPandasWithState). These behaviors only exist on the streaming path,
so they are asserted directly rather than via the DuckDB oracle."""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterator

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@pytest.fixture()
def arrival_dir():
    d = tempfile.mkdtemp(prefix="dpas_stream_arrivals_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, path: str, name: str, rows):
    from datetime import datetime

    rows = [
        (e, u, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), v) for e, u, ts, v in rows
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, name))


def _drain(stream_df, mode: str, name: str):
    q = stream_df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    return stream_df.sparkSession.table(name)


def test_watermark_finalizes_windows_in_append_mode(spark, arrival_dir):
    """Append-mode windowed aggregation emits a window only after the
    watermark passes its end: with micro-batch 2 advancing event time past
    window 1, the drained sink holds window 1 but NOT the still-open window 2
    (bounded state — the 100 TB streaming guarantee)."""
    _write_batch(
        spark,
        arrival_dir,
        "b1",
        [(1, 1, "2024-01-01 00:01:00", 1.0), (2, 1, "2024-01-01 00:05:00", 2.0)],
    )
    _write_batch(
        spark,
        arrival_dir,
        "b2",
        [(3, 1, "2024-01-01 02:30:00", 4.0)],
    )
    schema = spark.read.parquet(os.path.join(arrival_dir, "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrival_dir + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    out = _drain(agg, "append", "dpas_wm_append").collect()
    starts = {str(r.win_start) for r in out}
    assert "2024-01-01 00:00:00" in starts, f"finalized window missing: {starts}"
    assert "2024-01-01 02:00:00" not in starts, "open window must not emit in append mode"


def test_apply_in_pandas_with_state_running_count(spark, arrival_dir):
    """Custom stateful operator: per-user running event count kept in
    GroupState across micro-batches. The last update per user must equal the
    batch group count — state survives between triggers."""
    _write_batch(
        spark,
        arrival_dir,
        "b1",
        [(1, 1, "2024-01-01 00:01:00", 1.0), (2, 2, "2024-01-01 00:02:00", 1.0)],
    )
    _write_batch(
        spark,
        arrival_dir,
        "b2",
        [(3, 1, "2024-01-01 00:03:00", 1.0), (4, 1, "2024-01-01 00:04:00", 1.0)],
    )
    schema = spark.read.parquet(os.path.join(arrival_dir, "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrival_dir + "/*")
    )

    def running_count(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})

    result = stream.groupBy("user_id").applyInPandasWithState(
        running_count,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _drain(result, "update", "dpas_state_counts").toPandas()
    # memory sink in update mode appends every emission; the max per user is
    # the final state.
    final = out.groupby("user_id")["n_events"].max().to_dict()
    assert final == {1: 3, 2: 1}, f"unexpected final counts: {final}"


def test_checkpoint_resume_is_exactly_once(spark, arrival_dir):
    """Checkpoint recovery: a restarted query with the SAME checkpoint
    location must process only files that arrived since the previous run —
    never reprocessing landed epochs — so the landed sink equals the batch
    aggregate exactly (no loss, no duplication). This is the property that
    makes streaming jobs safely restartable in production."""
    src = os.path.join(arrival_dir, "src")
    out = os.path.join(arrival_dir, "out")
    ckpt = os.path.join(arrival_dir, "ckpt")
    os.makedirs(src)

    _write_batch(spark, src, "f1", [
        (1, 1, "2024-01-01 00:00:00", 10.0),
        (2, 1, "2024-01-01 00:01:00", 20.0),
    ])

    schema = "event_id long, user_id long, ts timestamp, value double"
    epochs_run = []

    def run_once():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)

        def land(batch_df, epoch_id):
            epochs_run.append(epoch_id)
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"epoch={epoch_id}")
            )

        q = (
            stream.writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first_epochs = list(epochs_run)
    assert len(first_epochs) >= 1

    # new data arrives while the job is down; restart from the checkpoint
    _write_batch(spark, src, "f2", [
        (3, 2, "2024-01-01 00:02:00", 5.0),
        (4, 2, "2024-01-01 00:03:00", 7.0),
    ])
    run_once()
    second_epochs = epochs_run[len(first_epochs):]
    # the restart must begin AFTER the last committed epoch, not at 0
    assert second_epochs and min(second_epochs) > max(first_epochs)

    back = spark.read.parquet(out)
    assert back.count() == 4  # every event exactly once
    assert sorted(r.event_id for r in back.select("event_id").collect()) == [1, 2, 3, 4]


def test_alert_suppression_survives_micro_batches(spark, arrival_dir):
    """q_stream_alert's edge-trigger must suppress ACROSS micro-batches: a
    user hot at the end of batch 1 and still hot at the start of batch 2
    must NOT re-emit 'enter' — the carried GroupState boolean is what makes
    the stream edge- rather than level-triggered."""
    from data_pipeline_aws_spark.streaming.jobs import ALERT_THRESHOLD

    hot = ALERT_THRESHOLD + 50.0
    cool = ALERT_THRESHOLD - 50.0
    # user 1: cool -> hot | (batch break) hot -> cool  => enter@2, exit@4
    # user 2: hot         | hot, hot                   => enter@5 only
    _write_batch(
        spark,
        arrival_dir,
        "b1",
        [
            (1, 1, "2024-01-01 00:01:00", cool),
            (2, 1, "2024-01-01 00:02:00", hot),
            (5, 2, "2024-01-01 00:01:30", hot),
        ],
    )
    _write_batch(
        spark,
        arrival_dir,
        "b2",
        [
            (3, 1, "2024-01-01 00:03:00", hot),
            (4, 1, "2024-01-01 00:04:00", cool),
            (6, 2, "2024-01-01 00:03:30", hot),
            (7, 2, "2024-01-01 00:04:30", hot),
        ],
    )
    import pandas as pd  # noqa: F811

    schema = spark.read.parquet(os.path.join(arrival_dir, "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrival_dir + "/*")
    )

    def alert(key, pdfs, state):
        (was_hot,) = state.get if state.exists else (False,)
        frames = [pdf for pdf in pdfs if len(pdf)]
        out_ts, out_val, out_tr = [], [], []
        if frames:
            pdf = pd.concat(frames).sort_values(["ts", "event_id"])
            for v, t in zip(pdf["value"], pdf["ts"]):
                is_hot = bool(v > ALERT_THRESHOLD)
                if is_hot != was_hot:
                    out_ts.append(t)
                    out_val.append(float(v))
                    out_tr.append("enter" if is_hot else "exit")
                    was_hot = is_hot
        state.update((was_hot,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_ts),
                "ts": out_ts,
                "value": out_val,
                "transition": out_tr,
            }
        )

    result = stream.groupBy("user_id").applyInPandasWithState(
        alert,
        outputStructType="user_id long, ts timestamp, value double, transition string",
        stateStructType="hot boolean",
        outputMode="Append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _drain(result, "append", "dpas_alert_edges").toPandas()
    got = sorted(
        (int(r.user_id), str(r.ts), r.transition) for r in out.itertuples()
    )
    assert got == [
        (1, "2024-01-01 00:02:00", "enter"),
        (1, "2024-01-01 00:04:00", "exit"),
        (2, "2024-01-01 00:01:30", "enter"),
    ], got


def test_late_rows_dropped_one_batch_after_watermark(spark, arrival_dir):
    """The late-row filter uses the watermark committed with the PREVIOUS
    batch (q_stream_late_data's one-batch-lag contract): a replay arriving
    two batches after the watermark passed its window must be counted in
    numRowsDroppedByWatermark and must NOT reopen the already-emitted
    window (no duplicate window row, no count inflation)."""
    _write_batch(
        spark,
        arrival_dir,
        "b0",
        [(1, 1, "2024-01-01 10:00:00", 1.0), (2, 1, "2024-01-01 10:20:00", 1.0)],
    )
    _write_batch(spark, arrival_dir, "b1", [(3, 1, "2024-01-01 12:00:00", 1.0)])
    _write_batch(spark, arrival_dir, "b2", [(4, 1, "2024-01-01 14:00:00", 1.0)])
    _write_batch(spark, arrival_dir, "b3", [(5, 1, "2024-01-01 10:30:00", 1.0)])
    schema = spark.read.parquet(os.path.join(arrival_dir, "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrival_dir + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    name = "dpas_late_drop"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        dropped = sum(
            (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
            for p in q.recentProgress
        )
    finally:
        q.stop()
        q.awaitTermination(30)
    assert dropped == 1, f"late replay not dropped: {dropped}"
    rows = {(str(r.win_start), r.n) for r in spark.table(name).collect()}
    assert ("2024-01-01 10:00:00", 2) in rows, rows
    assert all(n == 2 for s, n in rows if s == "2024-01-01 10:00:00"), rows
    assert len([s for s, _ in rows if s == "2024-01-01 10:00:00"]) == 1, rows


def test_sink_replay_after_midepoch_kill_is_idempotent(spark, arrival_dir):
    """The exactly-once contract q_stream_sink claims, driven through an
    actual failure: the foreachBatch sink WRITES its epoch directory and
    then the job dies before the epoch commits to the checkpoint (the
    at-least-once window). On restart the SAME epoch id must be replayed —
    not skipped — and its mode=overwrite epoch=<id> write must land on top
    of the orphaned directory, so the final table has no duplicate and no
    missing rows even though that epoch's sink ran twice."""
    src = os.path.join(arrival_dir, "src")
    out = os.path.join(arrival_dir, "out")
    ckpt = os.path.join(arrival_dir, "ckpt")
    os.makedirs(src)
    rows_by_file = {
        "f0": [(1, 1, "2024-01-01 00:00:00", 10.0), (2, 1, "2024-01-01 00:01:00", 20.0)],
        "f1": [(3, 2, "2024-01-01 00:02:00", 5.0)],
        "f2": [(4, 2, "2024-01-01 00:03:00", 7.0), (5, 3, "2024-01-01 00:04:00", 9.0)],
    }
    for name, rows in rows_by_file.items():
        _write_batch(spark, src, name, rows)

    schema = "event_id long, user_id long, ts timestamp, value double"
    attempts: list[int] = []
    poisoned: list[int] = []

    def run(poison: bool):
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

        def land(batch_df, epoch_id):
            attempts.append(epoch_id)
            # the sink itself SUCCEEDS...
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"epoch={epoch_id}")
            )
            # ...then the driver dies before the checkpoint commit
            if poison and epoch_id == 1 and 1 not in poisoned:
                poisoned.append(epoch_id)
                raise RuntimeError("injected crash after sink write, before commit")

        q = (
            stream.writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the injected crash surfaces as StreamingQueryException
        finally:
            q.stop()

    run(poison=True)
    assert poisoned == [1], f"epoch 1 never reached: {attempts}"
    first = list(attempts)
    assert first == [0, 1], first  # died mid-epoch-1; epoch 2 never started

    run(poison=False)
    replayed = attempts[len(first):]
    # the uncommitted epoch REPLAYS under the same id (not skipped, not
    # renumbered) and the stream then advances
    assert replayed[0] == 1, replayed
    assert attempts.count(1) == 2, attempts
    assert attempts.count(0) == 1, attempts  # committed epochs never rerun

    back = spark.read.parquet(out)
    got = sorted(r.event_id for r in back.select("event_id").collect())
    assert got == [1, 2, 3, 4, 5], got  # no loss, no duplication


def test_stream_merge_replay_after_midepoch_kill_is_idempotent(spark, arrival_dir):
    """The streaming MERGE's exactly-once contract through a real failure,
    driving the OPERATOR'S OWN foreachBatch body (merge_land_fn): the DV +
    delta epoch dirs for one micro-batch land, then the driver dies before
    the checkpoint commit. On restart the same epoch replays and its
    mode=overwrite epoch dirs land on top of the orphans — the merged
    read-path state must equal the batch MERGE with no duplicate DV marks
    and no double-applied delta rows."""
    from data_pipeline_aws_spark.streaming.jobs import merge_land_fn

    stage = os.path.join(arrival_dir, "stage")
    ckpt = os.path.join(arrival_dir, "ckpt")
    os.makedirs(stage)

    # tiny base: 10 keys in 2 "files"; feed: delete k%5==0, update k%3==0,
    # one insert — sliced into 3 arrival files like the operator's layout
    base = spark.createDataFrame(
        [(k, 100 * k, k % 2, k // 2 + 1) for k in range(1, 11)],
        "o_orderkey long, cents long, file_id int, pos int",
    )
    base.write.mode("overwrite").parquet(os.path.join(stage, "base"))
    feed = [
        (k, "delete", None) if k % 5 == 0 else (k, "update", 100 * k + 7)
        for k in range(1, 11)
        if k % 5 == 0 or k % 3 == 0
    ] + [(999, "insert", 42)]
    for s in range(3):
        rows = [r for i, r in enumerate(feed) if i % 3 == s]
        spark.createDataFrame(
            rows, "o_orderkey long, op string, new_cents long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stage, "feed_in", f"slice={s}")
        )

    land = merge_land_fn(stage)
    attempts: list[int] = []
    poisoned: list[int] = []

    def run(poison: bool):
        stream = (
            spark.readStream.schema("o_orderkey long, op string, new_cents long")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(stage, "feed_in"))
        )

        def wrapped(batch_df, epoch_id):
            attempts.append(epoch_id)
            land(batch_df, epoch_id)  # the real sink body SUCCEEDS...
            if poison and epoch_id == 1 and 1 not in poisoned:
                poisoned.append(epoch_id)
                raise RuntimeError("injected crash after sink write, before commit")

        q = (
            stream.writeStream.foreachBatch(wrapped)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the injected crash surfaces as StreamingQueryException
        finally:
            q.stop()

    run(poison=True)
    assert poisoned == [1], f"epoch 1 never reached: {attempts}"
    run(poison=False)
    assert attempts.count(1) == 2, attempts  # replayed, same id
    assert attempts.count(0) == 1, attempts  # committed epoch never reruns

    dv = spark.read.parquet(os.path.join(stage, "dv"))
    delta = spark.read.parquet(os.path.join(stage, "delta"))
    live = base.join(dv.select("file_id", "pos"), ["file_id", "pos"], "left_anti")
    merged = live.select("o_orderkey", "cents").unionByName(
        delta.select("o_orderkey", "cents")
    )
    got = {(r.o_orderkey, r.cents) for r in merged.collect()}
    want = {(k, 100 * k) for k in range(1, 11) if k % 5 != 0 and k % 3 != 0}
    want |= {(k, 100 * k + 7) for k in range(1, 11) if k % 5 != 0 and k % 3 == 0}
    want |= {(999, 42)}
    assert got == want
    assert merged.count() == len(want), "replay duplicated a delta/DV row"
    # every DV mark unique: the replayed epoch overwrote, not appended
    assert dv.count() == dv.select("file_id", "pos").distinct().count()


def test_stream_sink_cache_self_heals_after_partial_drain(spark, sf_dir):
    """A drain that crashed before the _SUCCESS sentinel leaves orphan
    epoch=N dirs in the versioned cache; the rebuilt layout must clear
    them (a re-drain's epoch numbering is not guaranteed to reproduce the
    orphan ids) so the warm read-back never aggregates duplicates."""
    from data_pipeline_aws_spark.streaming.jobs import (
        _stream_sink_cache_dir,
        q_stream_sink,
    )
    from data_pipeline_aws_spark.tables import table

    out = _stream_sink_cache_dir(sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(os.path.join(out, "epoch=999"))
    # orphan rows that would double-count event_type='click' if kept
    table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).limit(50).write.mode("overwrite").parquet(os.path.join(out, "epoch=999"))
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))

    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in q_stream_sink(spark, sf_dir).collect()
    }
    want = {
        r.event_type: (r.n_events, r.total_value)
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    }
    assert got == want
    assert not os.path.exists(os.path.join(out, "epoch=999"))


def test_vacuum_deletes_only_orphans_and_is_replayable(spark, sf_dir):
    """After vacuum: every planted orphan is gone from disk, every live
    data file and checksum sidecar survives byte-for-byte (inode set
    unchanged minus orphans), and a second call replants + re-vacuums to
    the identical report — the fixture is reusable, not consumed."""
    import os

    from data_pipeline_aws_spark import all_queries
    from data_pipeline_aws_spark.streaming.jobs import (
        VACUUM_ORPHANS,
        _vacuum_cache_dir,
    )

    q = all_queries()["q_vacuum_orphans"]
    rows1 = {r.kind: r for r in q(spark, sf_dir).collect()}
    layout = _vacuum_cache_dir(sf_dir)
    for _kind, rel, _size in VACUUM_ORPHANS:
        assert not os.path.exists(os.path.join(layout, rel)), rel
    live = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(layout)
        for f in fn
    ]
    assert any(f.endswith(".crc") for f in live), (
        "checksum sidecars must survive vacuum"
    )
    rows2 = {r.kind: r for r in q(spark, sf_dir).collect()}
    assert {k: (v.n_files, v.total_bytes) for k, v in rows1.items()} == {
        k: (v.n_files, v.total_bytes) for k, v in rows2.items()
    }
    assert all(r.read_path_intact for r in rows2.values())


def test_left_outer_interval_join_expiry_emits_exactly_once(spark, arrival_dir):
    """Failure-injection for q_stream_stream_left's core guarantee: a
    null-padded left row emits EXACTLY ONCE, and only after the watermark
    proves no match can arrive. Arrival order is adversarial:

    - b0: purchase P1 (will match late), purchase P2 (never matches)
    - b1: P1's click — arriving a BATCH LATER but inside the interval and
      before the watermark passes, so P1 must emit as a MATCH, never as a
      premature null row
    - b2, b3: far-future watermark pushers on both sides — P2's null row
      must appear once (not zero times, not once per subsequent batch)
    """
    import time as _time
    from datetime import datetime

    def _write_typed(name, rows, ts_shift):
        data = [
            (e, u, t, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"))
            for e, u, t, ts in rows
        ]
        df = spark.createDataFrame(
            data, "event_id long, user_id long, event_type string, ts timestamp"
        )
        df.coalesce(1).write.parquet(os.path.join(arrival_dir, name))
        d = os.path.join(arrival_dir, name)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (ts_shift, ts_shift))

    base = _time.time()
    _write_typed(
        "b0",
        [
            (1, 10, "purchase", "2024-01-01 10:00:00"),
            (2, 20, "purchase", "2024-01-01 10:05:00"),
        ],
        base,
    )
    _write_typed("b1", [(3, 10, "click", "2024-01-01 09:45:00")], base + 10)
    _write_typed(
        "b2",
        [(-1, -1, "purchase", "2024-03-01 00:00:00"),
         (-2, -2, "click", "2024-03-01 00:00:00")],
        base + 20,
    )
    _write_typed(
        "b3",
        [(-3, -3, "purchase", "2024-04-01 00:00:00"),
         (-4, -4, "click", "2024-04-01 00:00:00")],
        base + 30,
    )

    schema = spark.read.parquet(os.path.join(arrival_dir, "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(arrival_dir + "/*")
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id")
    out = _drain(joined, "append", "left_outer_expiry").where(
        F.col("purchase_id") >= 0
    )
    rows = sorted((r.purchase_id, r.click_id) for r in out.collect())
    # P1 matched its late-arriving click exactly once — no premature null
    # twin alongside the match; P2 expired into exactly one null row.
    assert rows == [(1, 3), (2, None)], rows


def test_trigger_incremental_replay_is_a_noop(spark, sf_dir, tmp_path):
    """Exactly-once ledger: processing the same arrival twice must not
    mint a new epoch, not touch the committed state, and the final
    rollup must equal the full recompute (round-11 verdict order #3)."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_aws_spark.streaming.jobs import (
        _trigger_epochs,
        _trigger_partial,
        _trigger_reagg,
        trigger_landing,
        trigger_process,
    )
    from data_pipeline_aws_spark.tables import table

    landing = trigger_landing(spark, sf_dir)
    arrivals = sorted(
        os.path.join(landing, d)
        for d in os.listdir(landing)
        if d.startswith("arrival_")
    )
    state = str(tmp_path / "state")

    assert trigger_process(spark, state, arrivals[0]) is True
    assert _trigger_epochs(state) == [1]
    snapshot = {
        f: os.stat(os.path.join(state, "rollup_e1", f)).st_mtime_ns
        for f in os.listdir(os.path.join(state, "rollup_e1"))
    }
    # replay: no new epoch, committed files untouched
    assert trigger_process(spark, state, arrivals[0]) is False
    assert _trigger_epochs(state) == [1]
    assert snapshot == {
        f: os.stat(os.path.join(state, "rollup_e1", f)).st_mtime_ns
        for f in os.listdir(os.path.join(state, "rollup_e1"))
    }

    for a in arrivals[1:]:
        assert trigger_process(spark, state, a) is True
    assert _trigger_epochs(state) == [1, 2, 3]
    got = (
        spark.read.parquet(os.path.join(state, "rollup_e3"))
        .orderBy("o_orderpriority")
        .collect()
    )
    want = (
        _trigger_reagg(_trigger_partial(table(spark, sf_dir, "orders")))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert got == want


def test_trigger_incremental_reads_only_rollup_and_delta(spark, sf_dir, tmp_path):
    """Delta-only processing: the merge plan for arrival N reads exactly
    the bounded committed rollup and arrival N's files — never any
    previously landed arrival (the O(delta) contract)."""
    import os

    from data_pipeline_aws_spark.streaming.jobs import (
        trigger_landing,
        trigger_merged,
        trigger_process,
    )

    landing = trigger_landing(spark, sf_dir)
    arrivals = sorted(
        os.path.join(landing, d)
        for d in os.listdir(landing)
        if d.startswith("arrival_")
    )
    state = str(tmp_path / "state")
    trigger_process(spark, state, arrivals[0])
    merged, cur, processed = trigger_merged(spark, state, arrivals[1])
    assert cur == 1 and processed == [os.path.basename(arrivals[0])]
    roots = set()
    for f in merged.inputFiles():
        p = os.path.dirname(f.removeprefix("file:"))
        roots.add(os.path.realpath(p))
    allowed = {
        os.path.realpath(os.path.join(state, "rollup_e1")),
        os.path.realpath(arrivals[1]),
    }
    assert roots == allowed, roots


@pytest.mark.slow
def test_processing_time_soak_state_stays_bounded(spark):
    """Streaming soak (round-12 verdict order #8): every other streaming
    test drains a BOUNDED file source with availableNow/one-batch
    triggers — a state leak that only accumulates across many
    processingTime triggers is invisible to all of them. Run a windowed
    watermark aggregation on the unbounded rate source for ~75 s of real
    triggers and assert from the engine's own stateOperators metrics
    that state size PLATEAUS (watermark eviction keeps pace) instead of
    growing with runtime.

    Bound arithmetic: 100 distinct keys, 10 s tumbling windows, 10 s
    watermark → live state is the in-flight window + up to two
    not-yet-evicted closed windows per key ≈ ≤400 rows; 1000 gives
    generous trigger-jitter slack while still catching any real leak
    (an unevicted soak would retain ~7 windows x 100 keys by t=75 s and
    keep climbing)."""
    import time

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            (F.col("value") % 100).alias("key"),
            F.col("timestamp").alias("ts"),
        )
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds"), "key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        events.writeStream.outputMode("update")
        .format("noop")
        .trigger(processingTime="2 seconds")
        .start()
    )
    samples = []  # (wallclock_sec, numRowsTotal, memoryUsedBytes)
    t0 = time.monotonic()
    try:
        while time.monotonic() - t0 < 75:
            time.sleep(2)
            p = q.lastProgress
            if not p or not p.get("stateOperators"):
                continue
            op = p["stateOperators"][0]
            samples.append(
                (
                    round(time.monotonic() - t0, 1),
                    op["numRowsTotal"],
                    op["customMetrics"].get("stateOnCurrentVersionSizeBytes")
                    or op.get("memoryUsedBytes", 0),
                )
            )
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    assert len(samples) >= 15, f"soak produced too few progress samples: {samples}"
    rows = [s[1] for s in samples]
    third = len(samples) // 3
    peak_early, peak_late = max(rows[:third]), max(rows[-third:])
    assert peak_late <= 1000, (
        f"state rows still growing at soak end (leak): {samples}"
    )
    assert peak_late <= max(peak_early, 400) * 1.5, (
        f"state grew across the soak instead of plateauing: "
        f"early peak {peak_early}, late peak {peak_late}; {samples}"
    )
    peak_bytes = max(s[2] for s in samples)
    assert 0 < peak_bytes < 64 * 1024 * 1024, (
        f"state bytes unbounded or unreported: peak {peak_bytes}"
    )
