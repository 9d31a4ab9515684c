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
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from .config import Boundaries, CrawlConfig

CLEANED_LINK_TYPE = ArrayType(
    StructType([StructField("reason", StringType()), StructField("to_url", StringType())])
)


def priority_batch(open_df: DataFrame, batch_size: int, max_depth: int) -> DataFrame:
    """Select the next wave batch with host plurality (fetch.sql).

    Semantics (identical result set to the reference SQL):
      numbered: cnt = count(*) over (partition by origin order by depth)
      — the default RANGE frame makes cnt a *per-(origin, depth)
      cumulative count*, shared by all peers at that depth;
      to_take: order by (cnt, depth, url) limit batch_size.

    Physical plan (the 10^10-row version): instead of a window over the
    whole frontier (skewed by hot origins) + global sort-limit (a
    driver-side TakeOrdered merge that *anti*-scales with parallelism),
    compute the (origin, depth) histogram — tiny: |origins|×|depths| —
    derive cnt via window functions over the histogram itself, pick the
    (cnt, depth) cutoff peer-class from the class histogram (collecting
    exactly one row), then select frontier rows by broadcast-joining the
    taken (origin, depth) keys.  Only the boundary peer-class (one
    (cnt, depth) group) is ever sorted by url; the histogram never
    reaches the driver.
    """
    batch, _counts, _n = priority_batch_and_origin_counts(open_df, batch_size, max_depth)
    return batch


def priority_batch_and_origin_counts(
    open_df: DataFrame,
    batch_size: int,
    max_depth: int,
    hot_threshold: int | None = None,
) -> tuple[DataFrame, dict[str, int], int]:
    """priority_batch plus the per-origin taken counts AND the exact
    selected-row count, both read off the histogram for free: a cutoff
    selects exactly ``batch_size`` rows by construction, and on the
    everything-fits path the count is the histogram total — so callers
    can size the fetch partitioning to the batch *before* any action
    on it (the engine's sub-quota BFS warm-up waves stop paying
    full-parallelism task overhead).  (Origin counts: boundary
    peer-class counted in full — a slight
    overestimate for the origins sharing the cutoff class, harmless for
    its only use, politeness salting).

    Fully distributed: the (origin, depth) histogram — tiny relative to
    the frontier, but at web scale still 10^7–10^8 origins — never
    reaches the driver.  Cumulative counts are window functions *over
    the histogram DataFrame* (a shuffle of histogram rows, not frontier
    rows); the class histogram over distinct (cnt, depth) pairs — a few
    hundred rows even at 10^10 URLs — gets a global running total; the
    driver collects exactly ONE row (the cutoff class) plus, when
    ``hot_threshold`` is set, the handful of hot-origin counts.  The
    window partition key is the *host* (scheme stripped), matching
    fetch.sql's ``substring(page_url from '^https?://([^/]*)/')``.

    ``hot_threshold``: when set, the returned dict contains only origins
    whose taken count exceeds it (all with_salt needs); when None, all
    origins' counts are collected (small-scale/back-compat path).

    Adaptive: the histogram aggregation itself is always distributed
    (one pass over the frontier, lineage-cut materialization); the
    cutoff logic then runs driver-side when the histogram is small
    (≤ ``_DRIVER_HIST_MAX`` rows — a few MB even at 10^4 origins, and
    one job round-trip instead of four) and switches to the window-
    function path above that, so 10^7–10^8-origin frontiers never ship
    their histogram to the driver.
    """
    elig = open_df.filter(F.col("depth") <= F.lit(max_depth))
    cols = open_df.columns

    # ONE pass over the frontier materializes the histogram (tiny:
    # |origins|×|depths| rows, distributed, lineage-cut) — every
    # downstream step (cumulative counts, cutoff, key sets, hot
    # counts) reads the materialized histogram, never the frontier
    hist = (
        elig.groupBy("origin", "depth")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("host", F.regexp_replace("origin", r"^https?://", ""))
        .localCheckpoint(eager=True)
    )

    # size probe and row fetch in ONE job over the checkpointed blocks:
    # CollectLimit short-circuits at MAX+1 rows, so the driver holds at
    # most MAX+1 histogram rows even at 10^8 origins (the previous
    # count()-then-collect() was two job round-trips per wave)
    probe = hist.limit(_DRIVER_HIST_MAX + 1).collect()
    if len(probe) <= _DRIVER_HIST_MAX:
        sel = _cutoff_driver(probe, batch_size, hot_threshold)
        if sel is None:  # everything eligible fits in the batch — the
            # origin counts and total come from the rows already in
            # hand (no extra aggregation job)
            counts: dict[str, int] = {}
            for r in probe:
                counts[r["origin"]] = counts.get(r["origin"], 0) + r["n"]
            total = sum(counts.values())
            if hot_threshold is not None:
                counts = {o: n for o, n in counts.items() if n > hot_threshold}
            return elig, counts, total
    else:
        sel = _cutoff_distributed(hist, batch_size, hot_threshold)
        if sel is None:  # everything fits (sub-quota wave): one 1-row
            # aggregate + the hot-origin collect over the materialized
            # histogram
            total_elig = hist.agg(F.sum("n")).first()[0]
            tc = hist.groupBy("origin").agg(F.sum("n").alias("n"))
            if hot_threshold is not None:
                tc = tc.filter(F.col("n") > hot_threshold)
            return (
                elig,
                {r["origin"]: r["n"] for r in tc.collect()},
                int(total_elig or 0),
            )

    full_keys, boundary_keys, k_boundary, origin_counts = sel
    batch_full = elig.join(F.broadcast(full_keys), ["origin", "depth"])
    batch_boundary = (
        elig.join(F.broadcast(boundary_keys), ["origin", "depth"])
        .orderBy("url")
        .limit(int(k_boundary))
    )
    # cutoff semantics guarantee exactly batch_size selected rows:
    # full classes contribute `before` rows, the boundary class tops up
    # with k_boundary = batch_size - before
    return (
        batch_full.select(*cols).unionByName(batch_boundary.select(*cols)),
        origin_counts,
        batch_size,
    )


_DRIVER_HIST_MAX = 65_536  # histogram rows the driver will hold


def _cutoff_driver(hist_rows, batch_size: int, hot_threshold: int | None):
    """Small-histogram path: the exact class-cutoff computation in plain
    Python over the collected (origin, depth, n, host) rows.  Returns
    None when everything fits, else (full_keys_df, boundary_keys_df,
    k_boundary, origin_counts)."""
    spark = SparkSession.getActiveSession()
    by_host: dict[str, list[tuple[int, str, int]]] = {}
    for r in hist_rows:
        by_host.setdefault(r["host"], []).append((r["depth"], r["origin"], r["n"]))

    # cnt = per-host cumulative count over depth (RANGE-peer semantics)
    groups: list[tuple[int, int, str, int]] = []  # (cnt, depth, origin, n)
    for dns in by_host.values():
        dns.sort()
        acc = 0
        i = 0
        while i < len(dns):
            # all origins of this host at the same depth share one cnt
            j = i
            total_d = 0
            while j < len(dns) and dns[j][0] == dns[i][0]:
                total_d += dns[j][2]
                j += 1
            acc += total_d
            for depth, origin, n in dns[i:j]:
                groups.append((acc, depth, origin, n))
            i = j

    class_n: dict[tuple[int, int], int] = {}
    for cnt, depth, _origin, n in groups:
        class_n[(cnt, depth)] = class_n.get((cnt, depth), 0) + n

    total = 0
    cutoff: tuple[int, int] | None = None
    for cd in sorted(class_n):
        if total + class_n[cd] >= batch_size:
            cutoff = cd
            break
        total += class_n[cd]
    if cutoff is None:
        return None

    origin_counts: dict[str, int] = {}
    for c, d, o, n in groups:
        if (c, d) <= cutoff:
            origin_counts[o] = origin_counts.get(o, 0) + n
    if hot_threshold is not None:
        origin_counts = {o: n for o, n in origin_counts.items() if n > hot_threshold}

    key_schema = "origin string, depth int"
    full = [(o, d) for (c, d, o, _n) in groups if (c, d) < cutoff] or [("", -1)]
    boundary = [(o, d) for (c, d, o, _n) in groups if (c, d) == cutoff]
    return (
        spark.createDataFrame(full, key_schema),
        spark.createDataFrame(boundary, key_schema),
        batch_size - total,
        origin_counts,
    )


def _cutoff_distributed(hist: DataFrame, batch_size: int, hot_threshold: int | None):
    """Large-histogram path: identical cutoff logic as window functions
    over the materialized histogram DataFrame — the driver collects
    exactly one cutoff row plus the hot-origin counts."""
    # cnt = per-host cumulative count over depth; depth is unique per
    # host after the rollup, so ROWS ≡ fetch.sql's RANGE-peer semantics
    hostd = hist.groupBy("host", "depth").agg(F.sum("n").alias("hn"))
    wc = Window.partitionBy("host").orderBy("depth")
    hostd = hostd.withColumn("cnt", F.sum("hn").over(wc))

    # peer classes over (cnt, depth): the cutoff accumulates whole
    # classes; only the boundary class is split (by url).  The global
    # ordered window runs over the class histogram — hundreds of rows.
    classes = hostd.groupBy("cnt", "depth").agg(F.sum("hn").alias("class_n"))
    wg = Window.orderBy("cnt", "depth").rowsBetween(Window.unboundedPreceding, -1)
    classes = classes.withColumn(
        "before", F.coalesce(F.sum("class_n").over(wg), F.lit(0))
    )
    cut = (
        classes.filter(F.col("before") + F.col("class_n") >= batch_size)
        .orderBy("cnt", "depth")
        .limit(1)
        .collect()
    )
    if not cut:
        return None

    c_star, d_star = cut[0]["cnt"], cut[0]["depth"]
    keyed = hist.join(hostd.select("host", "depth", "cnt"), ["host", "depth"])
    lt_cut = (F.col("cnt") < c_star) | (
        (F.col("cnt") == c_star) & (F.col("depth") < d_star)
    )
    eq_cut = (F.col("cnt") == c_star) & (F.col("depth") == d_star)

    tc = keyed.filter(lt_cut | eq_cut).groupBy("origin").agg(F.sum("n").alias("n"))
    if hot_threshold is not None:
        tc = tc.filter(F.col("n") > hot_threshold)
    return (
        keyed.filter(lt_cut).select("origin", "depth"),
        keyed.filter(eq_cut).select("origin", "depth"),
        batch_size - cut[0]["before"],
        {r["origin"]: r["n"] for r in tc.collect()},
    )


def with_salt(
    batch: DataFrame, cfg: CrawlConfig, origin_counts: dict[str, int]
) -> tuple[DataFrame, dict[str, int]]:
    """Assign politeness-preserving salts to hot origins.

    Origins with more than ``hot_origin_threshold`` rows in the batch are
    split into ``n_salts ≤ max_salts`` subpartitions; the fetch stage
    compensates by multiplying the per-origin delay by ``n_salts``
    (time-sliced token sharing — global rate preserved exactly).
    ``origin_counts`` come for free from the priority histogram
    (priority_batch_and_origin_counts) — no extra pass over the batch.
    """
    salt_counts = {
        o: min(cfg.max_salts, -(-n // cfg.hot_origin_threshold))
        for o, n in origin_counts.items()
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


def clean_link_udf(boundaries: Boundaries):
    """Arrow-batched scalar link cleaner: (page_url, raw, reason) →
    canonical target or null.  Applies ``Boundaries::clean_links``
    semantics for ahref/canonical links and the redirect rule
    (``worker/mod.rs:264-285``) for reason='redirect'.  The same Python
    functions back the BFS oracle — parity by construction.  Scalar
    string columns cross Arrow far cheaper than nested structs."""
    from ..urlnorm import join_and_canonicalize

    @F.pandas_udf(StringType())
    def _clean(page: pd.Series, raw: pd.Series, reason: pd.Series) -> pd.Series:
        out = []
        is_frontier = boundaries.is_frontier
        is_allowed = boundaries.is_allowed
        params = boundaries.params
        for p, r, rs in zip(page, raw, reason):
            if rs == "redirect":
                out.append(boundaries.clean_redirect(p, r))
            elif is_frontier(p):
                out.append(None)  # frontier cut (boundaries.rs:51-53)
            else:
                c = join_and_canonicalize(p, r, params)
                out.append(c if c is not None and is_allowed(c) else None)
        return pd.Series(out, dtype=object)

    return _clean


# a raw href this shape is its own canonical form: lowercase https,
# *dotted* non-IP host (the lookahead requires a letter before the first
# slash; the mandatory `(\.[a-z0-9-]+)+` group requires at least one dot,
# so dotless intranet-style hosts — which canonicalize() rejects — always
# take the slow path), safe-charset path, no port/query/fragment — for
# such links checked_join+canonicalize is the identity, so the JVM can
# skip Python
_CANONICAL_FORM = (
    r"^https://(?=[^/?#]*[a-z])[a-z0-9-]+(\.[a-z0-9-]+)+/[A-Za-z0-9/\-._~]*$"
)


def _rlike_any(col: Column, patterns: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def expand_links(
    results: DataFrame, boundaries: Boundaries, partitions: int | None = None
) -> DataFrame:
    """Fetch results → cleaned edge rows (from_url, from_hash, reason,
    to_url, to_hash, depth).

    The fetch output is partitioned by (origin, salt) — correct for
    politeness, skewed for CPU work (a hot host is 30% of one batch).
    Link cleaning has no per-origin state, so rebalance round-robin
    before the UDF: the cleaning cost spreads across all cores.  The
    zip/explode of the parallel link arrays is JVM-side; only flat
    strings cross the Python boundary.  The per-page (reason, url)
    dedup of ``clean_links`` (boundaries.rs:69-74) is the JVM
    dropDuplicates at the end."""
    if partitions:
        results = results.repartition(partitions)
    exploded = results.select(
        F.col("url").alias("from_url"),
        F.col("url_hash").alias("from_hash"),
        (F.col("depth") + 1).alias("depth"),
        F.explode(F.arrays_zip("link_reasons", "link_raws")).alias("lz"),
    ).select(
        "from_url",
        "from_hash",
        "depth",
        F.col("lz.link_reasons").alias("reason"),
        F.col("lz.link_raws").alias("raw"),
    )
    # JVM fast path: already-canonical raws on non-frontier pages with a
    # positive boundary verdict bypass the Python cleaner entirely; every
    # other row takes the exact shared-code slow path.  (Assumes boundary
    # regexes behave identically under Java and Python regex — the same
    # contract the oracle queries rely on.)
    raw, page = F.col("raw"), F.col("from_url")
    fast = (
        raw.rlike(_CANONICAL_FORM)
        & _rlike_any(raw, boundaries.allowed)
        & ~_rlike_any(raw, boundaries.disallowed)
        & ~_rlike_any(page, boundaries.frontier)
    )
    # (branch split, not CASE WHEN: Spark extracts pandas UDFs into a
    # plan node that evaluates them for every row regardless of the
    # condition — filtering first keeps Python off the fast rows)
    fast_rows = exploded.filter(fast).withColumn("to_url", raw)
    slow_rows = exploded.filter(~fast).withColumn(
        "to_url", clean_link_udf(boundaries)("from_url", "raw", "reason")
    )
    # dedup keys are the 64-bit hashes, not the URL strings: the engine
    # already treats url_hash as URL identity (the seen set keys on it),
    # and hashing 8-byte longs in the exchange is ~3× cheaper than
    # re-hashing ~80-byte URL strings per row in the hottest shuffle.
    # Collision budget of that convention: E[colliding pairs] ≈ n²/2^65
    # ≈ 3 pairs at the north-rule 10^10 URLs — each silently merges two
    # distinct URLs/edges (one crawled under the other's identity).
    # Acceptable for crawl dedup/linkage; switch url_hash to a 128-bit
    # hash everywhere if exact linkage at ≥10^10 is ever required.
    return (
        fast_rows.unionByName(slow_rows)
        .filter(F.col("to_url").isNotNull())
        .withColumn("to_hash", F.xxhash64("to_url"))
        .dropDuplicates(["from_hash", "reason", "to_hash"])
        .select("from_url", "from_hash", "depth", "reason", "to_url", "to_hash")
    )


def new_open_rows(
    edges: DataFrame, seen: DataFrame, bloom=None, banded=None, cuckoo=None
) -> DataFrame:
    """Seen-set dedup (F4): first discovery wins, min depth sticks
    (``ensure_status.sql`` on-conflict-do-nothing).  groupBy does the
    map-side partial min; the anti-join is the wave-level dedup.  With a
    ``bloom`` over the seen set (operators/seen.py), definite-new links
    bypass the shuffle and only bloom-positives are exactly verified —
    identical results, 10^10-scale shuffle volume.  ``banded`` is the
    engine-scale variant: a ``(bloom_df, BandedBloomSpec)`` pair — the
    filter lives as (band, bits) DataFrame rows co-partitioned with the
    candidates, so nothing full-size exists on the driver or in any
    broadcast.  ``cuckoo`` (a partition count) is the per-partition
    cogrouped cuckoo-filter tier: both sides hash-co-partition on the
    key and each partition probes a locally-built cuckoo filter —
    ~2.2 bytes/seen-key, no standing state between waves.  All variants
    are results-identical to the exact anti-join (tested)."""
    from ..operators.seen import (
        seen_anti_join,
        seen_anti_join_banded,
        seen_anti_join_cogrouped,
    )

    # group on the 64-bit hash (URL identity throughout the engine):
    # map-side partial min/first still collapses each partition's
    # duplicates before the shuffle, but the exchange hashes longs, not
    # URL strings
    candidates = (
        edges.groupBy(F.col("to_hash").alias("url_hash"))
        .agg(F.min("depth").alias("depth"), F.first("to_url").alias("url"))
    )
    if banded is not None:
        bloom_df, spec = banded
        return seen_anti_join_banded(candidates, seen, "url_hash", bloom_df, spec)
    if cuckoo is not None:
        return seen_anti_join_cogrouped(candidates, seen, "url_hash", cuckoo)
    return seen_anti_join(candidates, seen, "url_hash", bloom)


def origin_col(url: Column) -> Column:
    """scheme://netloc extracted JVM-side (codegen, no Python)."""
    return F.regexp_extract(url, r"^(https?://[^/]*)", 1)
