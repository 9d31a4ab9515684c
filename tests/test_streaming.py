"""Structured Streaming seed ingestion: canonicalize → dedup →
idempotent frontier append via foreachBatch; resumable checkpoint."""

import os

from lopez_spark.streaming.frontier_stream import SeedStream


def _write_seeds(seed_dir, name, urls):
    with open(os.path.join(seed_dir, name), "w") as f:
        f.write("\n".join(urls) + "\n")


def test_seed_stream_ingests_and_dedups(spark, tmp_path):
    seed_dir = str(tmp_path / "seeds")
    frontier_dir = str(tmp_path / "frontier")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(seed_dir)

    _write_seeds(
        seed_dir,
        "batch1.txt",
        [
            "https://H3.Example.Test/img-00000003#frag",  # canonicalizes
            "https://h3.example.test/img-00000003",  # dup of the above
            "https://h4.example.test/img-00000004",
            "not a url",  # dropped
        ],
    )
    stream = SeedStream(spark, seed_dir, frontier_dir, ckpt)
    q = stream.start(trigger_once=True)
    q.awaitTermination(120)

    rows = {r["url"]: r for r in spark.read.parquet(frontier_dir).collect()}
    assert set(rows) == {
        "https://h3.example.test/img-00000003",
        "https://h4.example.test/img-00000004",
    }
    assert all(r["status"] == "open" and r["depth"] == 0 for r in rows.values())

    # second micro-batch: one dup of an already-ingested URL + one new
    _write_seeds(
        seed_dir,
        "batch2.txt",
        ["https://h3.example.test/img-00000003", "https://h9.example.test/img-00000009"],
    )
    q2 = stream.start(trigger_once=True)
    q2.awaitTermination(120)

    urls = [r["url"] for r in spark.read.parquet(frontier_dir).collect()]
    assert len(urls) == len(set(urls)) == 3  # idempotent append (no dup row)
    assert "https://h9.example.test/img-00000009" in urls


def test_stateful_sessionization_stream(spark, tmp_path):
    """applyInPandasWithState session windows: sessions close either by
    a gap-jumping event or by the event-time watermark timeout; results
    match the pure-Python oracle for every watermark-closed session."""
    import json

    from lopez_spark.streaming.sessionize_stream import (
        sessionize_py,
        sessionize_stream,
    )

    gap = 1800
    base = 1_700_000_000
    # user 1: two sessions separated by > gap; user 2: one session;
    # user 3: a late session near the max timestamp (stays open unless
    # the watermark passes its end + gap)
    rows = [
        (1, base + 0), (1, base + 60), (1, base + 120),
        (1, base + 10_000), (1, base + 10_030),
        (2, base + 500), (2, base + 2_000), (2, base + 2_100),
        (3, base + 99_000),
        # watermark driver: far-future event pushes the watermark past
        # everyone's end + gap
        (4, base + 200_000),
    ]
    src = str(tmp_path / "events")
    os.makedirs(src)
    with open(os.path.join(src, "ev.json"), "w") as f:
        for i, (u, t) in enumerate(rows):
            f.write(json.dumps({"user_id": u, "ts": t, "event_id": i}) + "\n")

    events = (
        spark.readStream.schema("user_id long, ts long, event_id long")
        .json(src)
        .selectExpr("user_id", "CAST(ts AS timestamp) AS ts", "event_id")
    )
    out_dir = str(tmp_path / "sessions")
    q = (
        sessionize_stream(events, gap_seconds=gap, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }

    oracle = sessionize_py([(u, t) for u, t in rows], gap_seconds=gap)
    # the final watermark after availableNow = max ts - 10 min; any
    # session with end + gap < watermark must have been emitted
    watermark = base + 200_000 - 600
    want = {
        (u, s, e, n)
        for u, sess in oracle.items()
        for s, e, n in sess
        if e + gap < watermark
    }
    assert want  # the fixture really closes sessions
    assert got >= want, f"missing sessions: {want - got}"
    # nothing emitted that the oracle doesn't contain
    all_sessions = {(u, s, e, n) for u, sess in oracle.items() for s, e, n in sess}
    assert got <= all_sessions
