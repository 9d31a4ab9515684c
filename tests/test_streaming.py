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


def test_watermarked_sliding_window_rates(spark, tmp_path):
    """Sliding-window fetch-rate monitor: finalized (append-mode)
    windows match the batch computation over the non-late rows; a row
    arriving behind the watermark is dropped."""
    import json

    from lopez_spark.streaming.rate_window import (
        host_rate_windows,
        host_rate_windows_batch,
    )

    base = 1_700_000_000 - (1_700_000_000 % 600)  # align to a window slide
    on_time = [
        ("h0", base + 10), ("h0", base + 70), ("h1", base + 130),
        ("h0", base + 610), ("h1", base + 640),
        ("h0", base + 1900),
    ]
    src = str(tmp_path / "fetches")
    os.makedirs(src)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for h, t in rows:
                f.write(json.dumps({"host": h, "ts": t}) + "\n")

    out_dir = str(tmp_path / "rates")
    ckpt = str(tmp_path / "ckpt3")

    def run_once():
        stream = (
            spark.readStream.schema("host string, ts long")
            .json(src)
            .selectExpr("host", "CAST(ts AS timestamp) AS ts")
        )
        q = (
            host_rate_windows(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: the on-time rows + the watermark driver — the watermark
    # (persisted in the checkpoint) ends at max ts - 15 min
    write("b1.json", on_time)
    write("b2.json", [("h9", base + 20_000)])
    run_once()
    # run 2: a row 2 hours behind the checkpointed watermark — beyond
    # the 15-min bound, so its (already-finalized) windows must not
    # change and no new rows may appear for it
    write("b3.json", [("h0", base + 12_800)])
    run_once()
    got = {
        (r["w_start"], r["w_end"], r["host"], r["n_fetches"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # oracle: batch windows over the NON-late rows, restricted to
    # windows the final watermark (max on-time ts - 15 min) finalized
    batch_src = spark.createDataFrame(
        [(h, t) for h, t in on_time + [("h9", base + 20_000)]], "host string, ts long"
    ).selectExpr("host", "CAST(ts AS timestamp) AS ts")
    final_wm = base + 20_000 - 900
    want = {
        (r["w_start"], r["w_end"], r["host"], r["n_fetches"])
        for r in host_rate_windows_batch(batch_src).collect()
        if r["w_end"].timestamp() < final_wm
    }
    assert want  # fixture finalizes windows
    assert got == want
    # the late h0 row really was dropped: no finalized window counts it
    late_windows = {
        (r["w_start"], r["w_end"]) for r in got if r[2] == "h0" and r[0].timestamp() > base + 12_000
    }
    assert not late_windows


def test_wds_corpus_stream_equals_batch(spark, tmp_path):
    """Shards landing in a directory stream through the SAME Arrow
    stage as batch: the append-mode result over two arrival rounds
    equals one batch run over all files; a garbage shard is contained
    as its ok=False row, and round two only adds the new file's rows
    (incremental listing, not a re-read)."""
    from lopez_spark import fixtures as fx
    from lopez_spark.sources.webdataset import build_shard, wds_samples
    from lopez_spark.streaming.corpus_stream import stream_wds_samples

    def shard(a, n=3):
        return build_shard(
            [
                {
                    "key": f"{a}-{j:04d}",
                    "files": {
                        "raw": fx.encode_image(fx.oracle_pixels(3 * a + j), "raw"),
                        "txt": f"cap {a}/{j}".encode(),
                    },
                }
                for j in range(n)
            ]
        )

    d = tmp_path / "shards"
    d.mkdir()
    (d / "s0.tar").write_bytes(shard(0))
    (d / "bad.tar").write_bytes(b"not a tar" * 50)

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            stream_wds_samples(spark, str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    got1 = drain()
    assert sum(1 for r in got1 if r["ok"]) == 3
    assert sum(1 for r in got1 if not r["ok"]) == 1

    (d / "s1.tar").write_bytes(shard(1, n=4))  # second arrival round
    got2 = drain()
    assert len(got2) == len(got1) + 4  # only the new file's rows

    batch = wds_samples(
        spark.createDataFrame(
            [
                (str(p), bytearray(p.read_bytes()))
                for p in sorted(d.glob("*.tar"))
            ],
            "shard_id string, bytes binary",
        )
    ).collect()
    keyf = lambda r: (r["shard_id"].split("/")[-1], r["sample_no"])  # noqa: E731
    strip = lambda rows: sorted(  # noqa: E731
        (
            {**r.asDict(), "shard_id": r["shard_id"].split("/")[-1]}
            for r in rows
        ),
        key=lambda x: (x["shard_id"], x["sample_no"]),
    )
    assert strip(got2) == strip(batch)


def test_wds_stream_dedup_across_arrival_rounds(spark, tmp_path):
    """Cross-micro-batch exact dedup: a sample re-arriving in a later
    shard (same content_hash) is dropped by the state store; new
    samples pass.  State survives between the two availableNow drains
    via the checkpoint."""
    from lopez_spark import fixtures as fx
    from lopez_spark.sources.webdataset import build_shard
    from lopez_spark.streaming.corpus_stream import stream_wds_dedup

    def sample(key, i):
        return {
            "key": key,
            "files": {
                "raw": fx.encode_image(fx.oracle_pixels(i), "raw"),
                "txt": f"cap {i}".encode(),
            },
        }

    d = tmp_path / "shards"
    d.mkdir()
    (d / "s0.tar").write_bytes(build_shard([sample(f"a{i}", i) for i in range(3)]))

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        q = (
            stream_wds_dedup(spark, str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    got1 = drain()
    assert len(got1) == 3
    # round 2: 2 duplicates of round-1 content (new keys, same bytes)
    # + 2 genuinely new samples
    (d / "s1.tar").write_bytes(
        build_shard(
            [sample("b0", 0), sample("b1", 1),
             sample("b7", 7), sample("b8", 8)]
        )
    )
    got2 = drain()
    assert len(got2) == 5  # only the 2 new survive
    hashes = [r["content_hash"] for r in got2]
    assert len(set(hashes)) == 5  # one row per distinct content


def test_wds_stream_dedup_bounded_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics vs the unbounded state
    store, pinned on a replayed 3-round shard sequence with pinned
    file mtimes (round-4 VERDICT stretch #9):

    * round 2 (+30 min): a duplicate of a round-1 sample arrives while
      its state is live -> dropped (same as unbounded), one new sample
      admitted; processing round 2 advances the watermark past the
      round-1 samples' (ts + 10 min) expiry -> state evicted;
    * round 3 (+40 min): the SAME round-1 duplicate arrives again ->
      RE-ADMITTED (bounded state), while a duplicate of the round-2
      sample (state still live) stays dropped.  The unbounded variant
      replayed over the identical directory admits neither.
    """
    import os

    from lopez_spark import fixtures as fx
    from lopez_spark.sources.webdataset import build_shard
    from lopez_spark.streaming.corpus_stream import (
        stream_wds_dedup,
        stream_wds_dedup_bounded,
    )

    def sample(key, i):
        return {
            "key": key,
            "files": {
                "raw": fx.encode_image(fx.oracle_pixels(i), "raw"),
                "txt": f"cap {i}".encode(),
            },
        }

    t0 = 1_767_225_600  # 2026-01-01T00:00:00Z, pinned
    d = tmp_path / "shards"
    d.mkdir()

    def write(name, samples, ts):
        p = d / name
        p.write_bytes(build_shard(samples))
        os.utime(p, (ts, ts))

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain(fn, ckpt, out):
        q = (
            fn(spark, str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    bounded = lambda s, p: stream_wds_dedup_bounded(s, p, "10 minutes")  # noqa: E731

    # round 1: three samples at t0
    write("s0.tar", [sample(f"a{i}", i) for i in range(3)], t0)
    got1 = drain(bounded, ckpt, out)
    assert len(got1) == 3

    # round 2 at t0+30min: dup of sample 0 (state live: watermark at
    # batch start is t0-10min) + one new sample
    write("s1.tar", [sample("b0", 0), sample("b7", 7)], t0 + 1800)
    got2 = drain(bounded, ckpt, out)
    assert len(got2) == 4  # dup dropped, b7 admitted

    # round 3 at t0+40min: dup of sample 0 again (round-1 state now
    # evicted: watermark t0+20min > t0+10min expiry) + dup of b7
    # (still live: expires t0+40min > watermark t0+20min)
    write("s2.tar", [sample("c0", 0), sample("c7", 7)], t0 + 2400)
    got3 = drain(bounded, ckpt, out)
    assert len(got3) == 5, [r["key"] for r in got3]
    readmitted = [r for r in got3 if r["key"] == "c0"]
    assert len(readmitted) == 1  # the expired-state duplicate came back
    assert not [r for r in got3 if r["key"] in ("b0", "c7")]

    # the unbounded variant over the IDENTICAL directory admits neither
    got_unb = drain(
        stream_wds_dedup, str(tmp_path / "ckpt_u"), str(tmp_path / "out_u")
    )
    assert len(got_unb) == 4  # 3 originals + b7, no re-admission
    assert sorted(r["key"] for r in got_unb) == ["a0", "a1", "a2", "b7"]
