"""Structured Streaming frontier ingestion (continuous-crawl mode).

The reference has no streaming surface (SURVEY §2.9) — its crawl loop
is batch-iterative by design, and this engine keeps waves as
checkpointed batch jobs.  What *does* stream in a production crawl is
seed/URL ingestion: discovered or submitted URLs arriving continuously.
This module is that path, built on Structured Streaming:

    text files of URLs appearing under ``seed_dir``
    → readStream (file source)
    → canonicalize (Arrow-batched UDF) + hash + origin (JVM)
    → drop in-stream duplicates
    → foreachBatch: anti-join against the frontier store's seen set,
      append survivors as open frontier rows (depth 0)

``foreachBatch`` gives exactly-once appends against the wave store
(idempotent by url_hash — the reference's on-conflict-do-nothing,
``ensure_status.sql``), and the streaming checkpoint makes ingestion
resumable, mirroring the engine's wave checkpoints.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import FRONTIER_COLS
from ..urlnorm import ParamPolicy, canonicalize_udf


def open_rows_from_urls(df: DataFrame, policy: ParamPolicy) -> DataFrame:
    """raw URL strings → canonical open frontier rows (shared by the
    streaming sink and any batch bulk-seed path)."""
    canon = df.select(canonicalize_udf(policy)(F.col("value")).alias("url")).filter(
        F.col("url").isNotNull()
    )
    return (
        canon.withColumn("url_hash", F.xxhash64("url"))
        .withColumn("origin", F.regexp_extract("url", r"^(https?://[^/?#]*)", 1))
        .withColumn("status", F.lit("open"))
        .withColumn("http_status", F.lit(None).cast("int"))
        .withColumn("depth", F.lit(0))
        .select(*FRONTIER_COLS)
    )


class SeedStream:
    """Continuous seed ingestion into a frontier parquet directory."""

    def __init__(
        self,
        spark: SparkSession,
        seed_dir: str,
        frontier_dir: str,
        checkpoint_dir: str,
        policy: ParamPolicy | None = None,
    ):
        self.spark = spark
        self.seed_dir = seed_dir
        self.frontier_dir = frontier_dir
        self.checkpoint_dir = checkpoint_dir
        self.policy = policy or ParamPolicy()
        os.makedirs(seed_dir, exist_ok=True)

    def _sink(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = open_rows_from_urls(batch_df, self.policy).dropDuplicates(["url_hash"])
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(self.frontier_dir).select("url_hash")
            fresh = rows.join(seen, "url_hash", "left_anti")
        except Exception:
            fresh = rows  # first batch: no frontier yet
        fresh.write.mode("append").parquet(self.frontier_dir)

    def start(self, trigger_once: bool = False):
        stream = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", "16")
            .load(self.seed_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self._sink)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
