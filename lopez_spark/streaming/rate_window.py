"""Watermarked sliding-window aggregation: the per-host fetch-rate
monitor (the streaming form of F7 politeness accounting).

The reference has no streaming surface (SURVEY §2.9); this is the
beyond-reference Structured-Streaming counterpart of the engine's
per-origin rate bookkeeping: a stream of fetch events → sliding
event-time windows per host → fetch counts, with a watermark bounding
state and dropping too-late rows.  In ``append`` output mode a window
row is emitted exactly once, when the watermark passes its end — the
idempotent shape a downstream Iceberg append needs.

At scale: the groupBy keys are (window, host) — state is
O(hosts × windows-in-flight), independent of event volume; partial
counts are merged map-side per micro-batch, so the shuffle carries one
row per key per batch, not per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_rate_windows(
    fetches: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """fetches: streaming DataFrame with (ts timestamp, host string).
    Returns finalized sliding-window rows
    (w_start, w_end, host, n_fetches) — append-mode safe."""
    return (
        fetches.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("host"))
        .agg(F.count(F.lit(1)).alias("n_fetches"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "host",
            "n_fetches",
        )
    )


def host_rate_windows_batch(
    fetches: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """The identical computation on a batch DataFrame — the oracle the
    streaming result must converge to for every finalized window."""
    return (
        fetches.groupBy(F.window("ts", window, slide).alias("w"), F.col("host"))
        .agg(F.count(F.lit(1)).alias("n_fetches"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "host",
            "n_fetches",
        )
    )
