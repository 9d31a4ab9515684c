"""Structured Streaming corpus ingestion: WebDataset shards arriving
continuously (the crawl keeps exporting shards; the curation side
keeps consuming them).

The reference has no streaming surface (SURVEY §2.9); as with seed
ingestion (``frontier_stream.py``) the streaming-shaped piece of a
production pipeline is ARRIVAL — new shard files landing in a
directory as crawl tasks publish them (the WebDataset sink's
tmp-then-rename means a visible file is always complete).  This module
is that path:

    ``*.tar`` files appearing under ``shard_dir``
    → readStream (binaryFile source — Spark lists new files per
      micro-batch; the content column carries the shard bytes)
    → the SAME Arrow explode stage the batch path uses
      (``wds_samples``: one row per sample, malformed shards contained
      per-row)
    → append sink (per-sample rows are immutable facts — no watermark
      or state needed; exactly-once via the streaming checkpoint)

Batch ≡ streaming by construction: both run ``wds_samples``, so the
append-mode stream over a directory equals the batch run over the
same files (pinned by test).  At scale, prefer
``maxFilesPerTrigger`` to bound a micro-batch and keep shard files at
the 1 GB convention — one task per shard either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.webdataset import wds_samples


def stream_wds_samples(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Streaming DataFrame of per-sample rows (WDS_SAMPLE_SCHEMA) from
    the tar shards under ``shard_dir``; attach any writeStream sink.
    shard_id = file path (matching ``wds_samples_from_paths``)."""
    shards = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed by the format, but streaming
        # sources refuse inference — state it explicitly
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.tar")
        .load(shard_dir)
        .select(F.col("path").alias("shard_id"), F.col("content").alias("bytes"))
    )
    return wds_samples(shards)


def stream_wds_dedup(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Streaming exact dedup of arriving samples: the per-sample rows
    of :func:`stream_wds_samples`, minus any sample whose
    ``content_hash`` was already seen in ANY earlier micro-batch —
    Structured Streaming's ``dropDuplicates`` keys the state store by
    the hash, so dedup is exactly-once across arrivals and survives
    restarts via the checkpoint (the streaming twin of the engine's
    batch seen-set anti-join, F4).

    Only ok=True sample rows enter the dedup (malformed-shard
    ok=False containment markers are dropped here — their NULL hashes
    would all collapse into one state-store key; monitor malformed
    shards on :func:`stream_wds_samples` itself, where the containment
    contract lives).

    State is ~tens of bytes per distinct hash and unbounded by design
    here (content hashes never expire — a duplicate a month later is
    still a duplicate).  At 10^10+ samples, either bound it with
    ``dropDuplicatesWithinWatermark`` over an arrival-time column
    (dedup-within-horizon semantics) or run the at-rest banded
    seen-set (operators/seen.py) over the accumulated corpus instead."""
    samples = stream_wds_samples(spark, shard_dir)
    return samples.filter(F.col("ok")).dropDuplicates(["content_hash"])


def stream_wds_dedup_bounded(
    spark: SparkSession, shard_dir: str, horizon: str = "10 minutes"
) -> DataFrame:
    """The BOUNDED-STATE variant documented above, implemented:
    ``dropDuplicatesWithinWatermark`` over the shard file's
    modification time (binaryFile's ``modificationTime`` — arrival
    time, copied onto every sample row by the Arrow stage).

    Semantics vs the unbounded :func:`stream_wds_dedup` (pinned by
    tests/test_streaming.py on a replayed shard sequence):

    * a duplicate arriving while the original's state is live
      (watermark < original_ts + horizon) is dropped, same as
      unbounded;
    * once the watermark passes that bound the state is EVICTED, so a
      duplicate arriving later is re-admitted — dedup-within-horizon,
      the trade that keeps state ~O(samples per horizon) instead of
      O(all samples ever) at 10^10+ scale.  A month-later duplicate is
      caught by the at-rest banded seen-set (operators/seen.py), not
      by streaming state."""
    shards = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.tar")
        .load(shard_dir)
        .select(
            F.col("path").alias("shard_id"),
            F.col("content").alias("bytes"),
            F.col("modificationTime").alias("arrival_ts"),
        )
    )
    samples = wds_samples(shards, with_arrival_ts=True)
    return (
        samples.filter(F.col("ok"))
        .withWatermark("arrival_ts", horizon)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
