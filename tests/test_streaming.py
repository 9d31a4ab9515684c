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
