"""Frontier operators: priority batch selection (F2), origin routing
with hot-host salting (F3/O3), link cleaning (F10/F11), seen-set dedup
(F4).

F2 is a faithful re-expression of the reference's hand-written SQL
(``postgres-lopez/src/sql/fetch.sql:1-41``): a running
``count(*) over (partition by host order by depth)`` — default RANGE
frame, so ties at equal depth share the count — then a global
``order by (count, depth) limit batch``.  The global limit compiles to
``TakeOrderedAndProject`` (no full sort materialization), which is the
plan you want at 10^10 frontier rows.  Intra-batch tie order in
Postgres is nondeterministic; we pin a total order with ``url`` as the
final key so wave contents are reproducible (SURVEY §7 "genuinely
hard" #1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from .config import Boundaries, CrawlConfig

CLEANED_LINK_TYPE = ArrayType(
    StructType([StructField("reason", StringType()), StructField("to_url", StringType())])
)


def priority_batch(open_df: DataFrame, batch_size: int, max_depth: int) -> DataFrame:
    """Select the next wave batch with host plurality (fetch.sql).

    numbered: count(*) over (partition by origin order by depth) —
    RANGE-to-current-row default frame in both Postgres and Spark.
    to_take: order by (count, depth, url) limit batch_size.
    """
    w = Window.partitionBy("origin").orderBy("depth")
    return (
        open_df.filter(F.col("depth") <= F.lit(max_depth))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .orderBy("cnt", "depth", "url")
        .limit(batch_size)
        .drop("cnt")
    )


def with_salt(batch: DataFrame, cfg: CrawlConfig) -> tuple[DataFrame, dict[str, int]]:
    """Assign politeness-preserving salts to hot origins.

    Origins with more than ``hot_origin_threshold`` rows in the batch are
    split into ``n_salts ≤ max_salts`` subpartitions; the fetch stage
    compensates by multiplying the per-origin delay by ``n_salts``
    (time-sliced token sharing — global rate preserved exactly).
    The batch is small (≤ batch_size), so the count is a cheap agg.
    """
    counts = {r["origin"]: r["n"] for r in batch.groupBy("origin").agg(F.count("*").alias("n")).collect()}
    salt_counts = {
        o: min(cfg.max_salts, -(-n // cfg.hot_origin_threshold))
        for o, n in counts.items()
        if n > cfg.hot_origin_threshold
    }
    if not salt_counts:
        return batch.withColumn("salt", F.lit(0)), {}
    mapping = F.create_map(
        *[x for o, s in salt_counts.items() for x in (F.lit(o), F.lit(s))]
    )
    salted = batch.withColumn(
        "salt",
        F.coalesce(
            F.pmod(F.xxhash64("url"), mapping[F.col("origin")]).cast("int"), F.lit(0)
        ),
    )
    return salted, salt_counts


def route_by_origin(batch: DataFrame, partitions: int) -> DataFrame:
    """Origin-affinity routing (F3): one (origin, salt) never spans two
    politeness contexts.  Mirrors ``hash(origin) % workers``
    (``lib-lopez/src/crawler/master.rs:147-157``)."""
    return batch.repartition(partitions, F.col("origin"), F.col("salt"))


def clean_links_udf(boundaries: Boundaries):
    """Arrow-batched link cleaner: applies ``Boundaries::clean_links``
    for ahref/canonical links and the redirect rule
    (``worker/mod.rs:264-285``) for 3xx rows.  The same Python functions
    back the BFS oracle — parity by construction."""

    @F.pandas_udf(CLEANED_LINK_TYPE)
    def _clean(url: pd.Series, links: pd.Series, http_status: pd.Series) -> pd.Series:
        out = []
        for u, ls, st in zip(url, links, http_status):
            if ls is None or len(ls) == 0:
                out.append([])
                continue
            if st is not None and st == 301:
                loc = ls[0]["raw"]
                target = boundaries.clean_redirect(u, loc)
                out.append([] if target is None else [{"reason": "redirect", "to_url": target}])
            else:
                cleaned = boundaries.clean_links(u, [(l["reason"], l["raw"]) for l in ls])
                out.append([{"reason": r, "to_url": t} for r, t in cleaned])
        return pd.Series(out)

    return _clean


def expand_links(results: DataFrame, boundaries: Boundaries) -> DataFrame:
    """Fetch results → cleaned edge rows (from_url, from_hash, reason,
    to_url, to_hash, depth)."""
    cleaned = results.withColumn(
        "cleaned", clean_links_udf(boundaries)("url", "links", "http_status")
    )
    return (
        cleaned.select(
            F.col("url").alias("from_url"),
            F.col("url_hash").alias("from_hash"),
            (F.col("depth") + 1).alias("depth"),
            F.explode("cleaned").alias("link"),
        )
        .select(
            "from_url",
            "from_hash",
            "depth",
            F.col("link.reason").alias("reason"),
            F.col("link.to_url").alias("to_url"),
        )
        .withColumn("to_hash", F.xxhash64("to_url"))
    )


def new_open_rows(edges: DataFrame, seen: DataFrame, bloom=None) -> DataFrame:
    """Seen-set dedup (F4): first discovery wins, min depth sticks
    (``ensure_status.sql`` on-conflict-do-nothing).  groupBy does the
    map-side partial min; the anti-join is the wave-level dedup.  With a
    ``bloom`` over the seen set (operators/seen.py), definite-new links
    bypass the shuffle and only bloom-positives are exactly verified —
    identical results, 10^10-scale shuffle volume."""
    from ..operators.seen import seen_anti_join

    candidates = (
        edges.groupBy("to_url")
        .agg(F.min("depth").alias("depth"), F.first("to_hash").alias("url_hash"))
        .withColumnRenamed("to_url", "url")
    )
    return seen_anti_join(candidates, seen, "url_hash", bloom)


def origin_col(url: Column) -> Column:
    """scheme://netloc extracted JVM-side (codegen, no Python)."""
    return F.regexp_extract(url, r"^(https?://[^/]*)", 1)
