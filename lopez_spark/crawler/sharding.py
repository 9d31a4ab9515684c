"""Rendezvous (highest-random-weight) frontier sharding — the
coordinator-free host→owner assignment a multi-machine crawl fleet
partitions its URL space by (Thaler & Ravishankar 1998; UbiCrawler,
Boldi 2004 §3 assigns hosts to agents exactly this way).

Every worker can compute any host's owner locally: the owner of
``host`` among ``n_shards`` shards is the arg-max of
``md5(host '#' shard)`` over the shard ids, compared as hex strings
(identical in Spark and DuckDB — the repo's cross-engine hash idiom).
Growing the fleet S → S+1 moves only ~1/(S+1) of the hosts (vs
~S/(S+1) for mod-N), so reshards do not stampede the politeness state.

Scale shape: the arg-max compiles to ONE per-row codegen expression —
``array_max`` over a ``transform(sequence(...))`` struct array — so
assignment costs zero shuffles and no row explosion; splitting a
frontier for export is the assignment column plus a partition-by
write.  Engine surface of the oracle-gated ``crawl_shard_assign``
query (plans/driver_queries.py), which calls these builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OWNER_EXPR = (
    "array_max(transform(sequence(0, {top}), "
    "s -> struct(md5(concat({host}, '#', cast(s as string))) as score, "
    "cast(s as int) as shard))).shard"
)


def hrw_owner_col(host_col: str, n_shards: int) -> Column:
    """Owner shard id (0..n_shards-1) of each host — one whole-stage-
    codegen expression, no explosion, no shuffle."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return F.expr(_OWNER_EXPR.format(top=n_shards - 1, host=host_col))


def assign_shards(
    frontier: DataFrame, n_shards: int, host_col: str = "origin"
) -> DataFrame:
    """Tag frontier rows with their owner shard (column ``shard``).
    Keyed on the origin by default — politeness state is per-origin,
    so all of an origin's URLs must land on one worker.  Feed the
    result to ``.write.partitionBy("shard")`` to export per-worker
    seed lists, or filter ``shard == my_id`` inside each worker of an
    independently-launched fleet."""
    return frontier.withColumn("shard", hrw_owner_col(host_col, n_shards))
