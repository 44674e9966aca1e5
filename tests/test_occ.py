"""Concurrent-writer conflict detection (round-11 verdict order #5).

Pins the OCC commit protocol on the MERGE-on-read layout: conflicting
MERGEs serialize (the loser detects its stale read snapshot at publish
time, recomputes, retries — additive sums are conserved, so a lost
update cannot hide), while bucket-disjoint writers both land without a
recompute. The deterministic interleaves use occ_merge's before_commit
seam; a threaded stress run closes with the conserved-sum invariant."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from data_pipeline_aws_spark.occ import (
    OCC_BUCKETS,
    occ_commit_info,
    occ_init,
    occ_live,
    occ_merge,
    occ_snapshot,
)
from data_pipeline_aws_spark.tables import table


def _base(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
    )


def _updates(spark, keys, add):
    return spark.createDataFrame(
        [(int(k), int(add)) for k in keys], "o_orderkey long, add_cents long"
    )


def _cents(spark, path, key):
    rows = occ_live(spark, path).where(F.col("o_orderkey") == key).collect()
    return rows[0].cents if rows else None


def test_occ_single_merge_records_snapshot_and_written_files(
    spark, sf_dir, tmp_path
):
    path = str(tmp_path / "tbl")
    occ_init(spark, path, _base(spark, sf_dir))
    base_val = _cents(spark, path, 1)
    v, attempts = occ_merge(spark, path, _updates(spark, [1, 2], 100))
    assert (v, attempts) == (1, 1)
    info = occ_commit_info(path, 1)
    assert info["read_snapshot"] == 0 and info["op"] == "merge"
    assert info["buckets"] == [1 % OCC_BUCKETS, 2 % OCC_BUCKETS]
    data_dir = os.path.join(path, info["data"])
    assert info["written"] and all(
        os.path.exists(os.path.join(data_dir, f)) for f in info["written"]
    )
    assert _cents(spark, path, 1) == (base_val or 0) + 100


def test_occ_conflicting_merges_serialize_never_interleave(
    spark, sf_dir, tmp_path
):
    """Writer A stages its delta from snapshot 0; before A commits,
    writer B lands a full merge on the SAME key. A must detect the
    conflict at publish time (B's buckets intersect), recompute from
    snapshot 1, and commit on top — both adds survive."""
    path = str(tmp_path / "tbl")
    occ_init(spark, path, _base(spark, sf_dir))
    key = 7
    base_val = _cents(spark, path, key) or 0

    def interleave_b():
        vb, ab = occ_merge(spark, path, _updates(spark, [key], 1000))
        assert (vb, ab) == (1, 1)

    va, aa = occ_merge(
        spark, path, _updates(spark, [key], 7), before_commit=interleave_b
    )
    assert va == 2, "loser must commit AFTER the interloper"
    assert aa == 2, "conflict must force a full recompute round"
    assert occ_commit_info(path, 2)["read_snapshot"] == 1
    assert _cents(spark, path, key) == base_val + 1000 + 7


def test_occ_disjoint_writers_both_land_without_recompute(
    spark, sf_dir, tmp_path
):
    """Bucket-disjoint concurrent writers: the loser of the version race
    re-targets the next version WITHOUT recomputing (attempts stays 1,
    read_snapshot stays 0) — the cheap path partition-disjoint writers
    take."""
    path = str(tmp_path / "tbl")
    occ_init(spark, path, _base(spark, sf_dir))
    a_keys, b_keys = [1, 65], [2, 66]  # buckets {1} vs {2}
    base_a = {k: _cents(spark, path, k) or 0 for k in a_keys}

    def interleave_b():
        vb, ab = occ_merge(spark, path, _updates(spark, b_keys, 500))
        assert (vb, ab) == (1, 1)

    va, aa = occ_merge(
        spark, path, _updates(spark, a_keys, 5), before_commit=interleave_b
    )
    assert (va, aa) == (2, 1), "disjoint loser must not recompute"
    info = occ_commit_info(path, 2)
    assert info["read_snapshot"] == 0  # stale-but-valid snapshot kept
    live = {
        r.o_orderkey: r.cents
        for r in occ_live(spark, path)
        .where(F.col("o_orderkey").isin(a_keys + b_keys))
        .collect()
    }
    for k in a_keys:
        assert live[k] == base_a[k] + 5
    assert all(live[k] is not None for k in b_keys)


def test_occ_graded_key_drives_both_race_shapes(spark, sf_dir):
    """q_occ_merge (round-12 verdict order #1): the published race layout
    must show exactly the two designed shapes in its commit log — writer
    B wins v1, A recomputes from snapshot 1 into v2 (conflict), D wins v3
    from snapshot 2, C re-targets its staged delta into v4 with its STALE
    read_snapshot 2 kept (disjoint) — and the key's metadata columns must
    come from that log, not constants."""
    import json

    from data_pipeline_aws_spark.occ import occ_race_fixture, q_occ_merge

    layout = occ_race_fixture(spark, sf_dir)
    assert occ_snapshot(layout) == 4
    snaps = {v: occ_commit_info(layout, v)["read_snapshot"] for v in (1, 2, 3, 4)}
    assert snaps == {1: 0, 2: 1, 3: 2, 4: 2}, snaps
    with open(os.path.join(layout, "_META.json")) as f:
        meta = json.load(f)
    assert meta["summary"] == {
        "n_commits": 4,
        "n_recomputed": 1,
        "n_retargeted": 1,
    }
    assert meta["a"]["attempts"] == 2 and meta["c"]["attempts"] == 1
    # disjointness by construction: C's buckets all even, D's all odd
    c_buckets = occ_commit_info(layout, 4)["buckets"]
    d_buckets = occ_commit_info(layout, 3)["buckets"]
    assert all(b % 2 == 0 for b in c_buckets)
    assert all(b % 2 == 1 for b in d_buckets)
    # warm call reads the published layout back — same fixture, same rows
    df = q_occ_merge(spark, sf_dir)
    row = df.where(F.col("key_mod") == 1).collect()[0]
    assert (row.n_commits, row.n_recomputed, row.n_retargeted) == (4, 1, 1)


def test_occ_threaded_stress_conserves_the_sum(spark, sf_dir, tmp_path):
    """Four writers race additive merges on overlapping keys; every add
    must survive serialization (a lost update breaks the conserved sum)."""
    path = str(tmp_path / "tbl")
    occ_init(spark, path, _base(spark, sf_dir))
    keys = [1, 2, 7]
    base_sum = sum(_cents(spark, path, k) or 0 for k in keys)
    adds = [11, 13, 17, 19]
    errors = []

    def writer(add):
        try:
            occ_merge(spark, path, _updates(spark, keys, add))
        except Exception as exc:  # noqa: BLE001 - surface in main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(a,)) for a in adds]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert occ_snapshot(path) == len(adds)
    got = sum(_cents(spark, path, k) for k in keys)
    assert got == base_sum + len(keys) * sum(adds)
