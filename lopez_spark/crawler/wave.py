"""The crawl driver loop (operators F1, F5, F6, F15, F16).

Spark lifecycle equivalent of ``CrawlMaster::start``
(``lib-lopez/src/crawler/master.rs:37-207``): each *wave* is one
checkpointed DataFrame job —

    open frontier → F2 priority batch → route by (origin, salt)
    → mapInPandas fetch (robots + politeness + content lookup)
    → clean + explode links → anti-join seen → union new frontier
    → atomic snapshot commit (catalog.WaveStore)

Crawl-end (F15): empty eligible batch, or quota exhausted (F6).  Spark
job completion replaces the reference's ``exists_taken`` poll — a wave
*is* one job, so there are no stranded 'taken' rows to reset; a crash
mid-wave resumes from the previous committed snapshot.
"""

from __future__ import annotations

import logging
import time as _time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import FRONTIER_COLS, WaveStore
from ..urlnorm import canonicalize, origin_of
from .config import CrawlConfig
from .fetch import FETCH_SCHEMA, make_fetch_fn
from .frontier import (
    expand_links,
    new_open_rows,
    priority_batch_and_origin_counts,
    route_by_origin,
    with_salt,
)
from .traps import count_templates, filter_trapped, merge_template_counts
from .web import WebProvider

log = logging.getLogger(__name__)

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("origin", StringType(), False),
        StructField("status", StringType(), False),
        StructField("http_status", IntegerType(), True),
        StructField("depth", IntegerType(), False),
    ]
)


@dataclass
class CrawlSummary:
    waves: int = 0
    processed: int = 0
    per_wave: list[dict] = field(default_factory=list)
    seen_tier: str = "exact"  # exact | broadcast | banded (selected by size)


def seed_frontier(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    """F1: canonicalize seeds, hash, status=open, depth=0
    (``MasterBackend::ensure_seeded``, ``postgres-lopez/src/master.rs:72-91``)."""
    rows = []
    seen = set()
    for s in cfg.seeds:
        canon = canonicalize(s, cfg.boundaries.params)
        if canon is None or canon in seen:
            continue
        seen.add(canon)
        rows.append((canon, origin_of(canon), "open", None, 0))
    df = spark.createDataFrame(
        rows, "url string, origin string, status string, http_status int, depth int"
    )
    return df.withColumn("url_hash", F.xxhash64("url")).select(*FRONTIER_COLS)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        web: WebProvider,
        store: WaveStore,
        analyzer=None,
        images: DataFrame | None = None,
    ):
        """``analyzer``/``images``: when set, each wave's successfully
        fetched pages run the compiled DSL rules over the image corpus
        (analyses.py) and land in ``analyses.parquet`` per wave —
        the reference's ``ensure_analyzed`` sink
        (``postgres-lopez/src/worker.rs:52-120``)."""
        self.spark = spark
        self.cfg = cfg
        self.web = web
        self.store = store
        self.analyzer = analyzer
        self.images = images

    def crawl(self, max_waves: int | None = None) -> CrawlSummary:
        """Run (or resume) the wave loop until crawl-end.

        Pipelined commit (opt-in via ``cfg.pipeline_commit``; made for
        object-store deployments where the O(frontier) snapshot write is
        high-latency IO — see BENCH §6 for the latency-injected A/B):
        wave ``k``'s new frontier is materialized once (eager
        ``localCheckpoint``), its data write starts on a background
        thread, and the foreground proceeds to compute the WHOLE of
        wave ``k+1`` (priority selection, fetch, expand, dedup) from the
        checkpointed blocks — the write's latency hides under real
        work, not just bookkeeping.  Wave ``k``'s manifest — the commit
        point resume relies on — is committed only when its writer
        drains, which happens before wave ``k+1``'s writer starts:
        manifest-last atomicity per wave and wave ordering are both
        preserved, and a crash anywhere loses at most the in-flight
        wave, exactly as in serial mode.
        """
        from pyspark import InheritableThread

        spark, cfg = self.spark, self.cfg
        summary = CrawlSummary()

        latest = self.store.latest_wave()
        if latest is None:
            frontier = seed_frontier(spark, cfg)
            next_wave = 0
            processed = 0
        else:
            frontier = self.store.load_frontier(spark, latest)
            next_wave = latest + 1
            processed = self.store.load_manifest(latest)["processed_total"]

        bloom = None  # broadcast tier (single BloomFilter64)
        bloom_df = None  # banded tier (DataFrame of (band, bits))
        bloom_spec = None
        # Seen-filter tier, selected by physical filter size (or forced
        # via cfg.seen_tier).  Every tier keeps the same invariant: the
        # driver never materializes a URL hash — the round-1/2 design
        # pulled every wave's discoveries through ``toPandas`` to mutate
        # a driver-held filter, a funnel at any scale.
        tier = cfg.seen_tier
        if tier == "auto":
            if cfg.seen_bloom_capacity:
                from ..operators.seen import BloomFilter64

                proto = BloomFilter64(cfg.seen_bloom_capacity, cfg.seen_bloom_fpp)
                tier = (
                    "broadcast"
                    if (proto.m + 7) // 8 <= cfg.seen_broadcast_max_bytes
                    else "banded"
                )
            else:
                tier = "exact"
        if tier in ("broadcast", "banded") and not cfg.seen_bloom_capacity:
            raise ValueError(f"seen_tier={tier!r} requires seen_bloom_capacity")
        if tier == "broadcast":
            # one filter, built distributed (treeReduce — the driver
            # receives a single m/8-byte buffer) and re-broadcast per
            # wave.  Probe is a shuffle-free map over the candidates.
            from ..operators.seen import build_bloom

            bloom = build_bloom(
                frontier, "url_hash", cfg.seen_bloom_capacity, cfg.seen_bloom_fpp
            )
        elif tier == "banded":
            # banded DataFrame tier (operators/seen.py): the filter
            # lives as (band, bits) rows co-partitioned with candidates
            # — nothing full-size ever exists on the driver or in any
            # broadcast, which is what lets the 10^10-key north-rule
            # capacity (~12 GB of bits) exist at all.
            from ..operators.seen import BandedBloomSpec, build_banded_bloom

            bloom_spec = BandedBloomSpec(
                cfg.seen_bloom_capacity, cfg.seen_bloom_fpp, cfg.seen_band_bytes
            )
            bloom_df = build_banded_bloom(
                frontier, "url_hash", bloom_spec
            ).localCheckpoint(eager=True)
        # "cuckoo": per-partition cogrouped cuckoo filters, rebuilt from
        # the co-partitioned seen side each wave — no standing state to
        # seed or maintain.  "exact": plain anti-join.

        # spider-trap accounting (traps.py): one startup aggregation of
        # the whole frontier (also correct on resume), then incremental
        # per-wave merges of the discoveries only
        trap_state = (
            count_templates(frontier).localCheckpoint(eager=True)
            if cfg.trap_budget
            else None
        )

        import os as _os

        profile = bool(_os.environ.get("LOPEZ_WAVE_PROFILE"))
        # LOPEZ_WAVE_HLL=1: carry a HyperLogLog register set of every
        # URL the frontier has ever held (operators/sketches.py) and
        # write it into each committed manifest — the mergeable
        # distinct-URLs counter that replaces counter.rs-style exact
        # counters at 10^10 URLs.  Same startup-then-incremental
        # pattern as trap accounting: one whole-frontier aggregation
        # here (also correct on resume — the frontier IS the seen set),
        # then per-wave merges of the discoveries only (a 64-row
        # aggregate over the already-persisted new_open frame).
        hll_regs = None
        if _os.environ.get("LOPEZ_WAVE_HLL"):
            from ..operators.sketches import hll_registers

            # on resume, the last committed manifest already carries the
            # exact register list for the frontier (the merge algebra
            # makes seeding equivalent to recomputing) — skip the
            # whole-frontier aggregation then (ADVICE r5)
            prev_regs = (
                self.store.load_manifest(next_wave - 1)
                .get("metrics", {})
                .get("hll_regs")
                if next_wave > 0
                else None
            )
            hll_regs = (
                [int(x) for x in prev_regs]
                if prev_regs
                else hll_registers(frontier.select("url"), "url")
            )
        # AIMD adaptive-politeness multipliers (cfg.adaptive_politeness):
        # carried in every committed manifest, so resume restores the
        # backoff state of the wave it restarts after
        origin_mult: dict[str, float] = {}
        if cfg.adaptive_politeness and next_wave > 0:
            origin_mult = {
                o: float(v)
                for o, v in self.store.load_manifest(next_wave - 1)
                .get("politeness_mult", {})
                .items()
            }
        k = next_wave
        # the frontier is scanned 3× per wave (priority histogram,
        # seen anti-join, status update) — keep it stored; from wave 1
        # on it is the previous wave's localCheckpoint
        frontier = frontier.persist()
        # pipelined commit: wave k-1's background writer + its deferred
        # manifest + the persisted frames its write still reads
        in_flight: tuple | None = None

        def _drain(flight) -> None:
            """Join a wave's background writer, surface its error, then
            — and only then — commit its manifest (manifest-last
            atomicity per wave is preserved: the manifest lands strictly
            after the wave's data is durably written, and wave order is
            preserved because wave k's writer starts only after wave
            k-1's manifest committed)."""
            writer, wk, wmanifest, frames, werr = flight
            writer.join()
            if werr:
                raise werr[0]
            self.store.commit_manifest(wk, wmanifest)
            for fr in frames:
                try:
                    fr.unpersist()
                except Exception:
                    pass
        try:
            while max_waves is None or k < next_wave + max_waves:
                wave_t0 = _time.monotonic()
                phases: dict[str, float] = {}

                def _mark(name: str, _last=[wave_t0]):  # noqa: B006 - per-wave reset below
                    if profile:
                        now = _time.monotonic()
                        phases[name] = round(now - _last[0], 3)
                        _last[0] = now

                remaining = cfg.quota - processed
                if remaining <= 0:
                    break

                open_df = frontier.filter(F.col("status") == "open")
                batch, origin_counts, n_sel = priority_batch_and_origin_counts(
                    open_df,
                    min(cfg.batch_size, remaining),
                    cfg.max_depth,
                    # only hot origins' counts ever reach the driver
                    # (salting needs nothing else) — at 10^8 origins the
                    # full counts dict would be a driver OOM
                    hot_threshold=cfg.hot_origin_threshold,
                )
                if n_sel == 0:  # crawl-end (F15): nothing eligible — known
                    break  # from the histogram, before any fetch job runs
                _mark("select")
                salted, salt_counts = with_salt(batch, cfg, origin_counts)
                # size the fetch stage to the batch (known exactly from the
                # cutoff arithmetic, no extra action): sub-quota BFS warm-up
                # waves run a handful of tasks; quota waves run all of them
                fetch_parts = max(
                    1, min(cfg.partitions, -(-n_sel // cfg.fetch_rows_per_task))
                )
                routed = route_by_origin(salted, fetch_parts)

                fetch_fn = make_fetch_fn(
                    self.web,
                    cfg,
                    salt_counts,
                    wave_no=k,
                    origin_mult=origin_mult if cfg.adaptive_politeness else None,
                )
                obs = Observation(f"wave-{k}")
                results = routed.mapInPandas(fetch_fn, FETCH_SCHEMA).observe(
                    obs,
                    F.count(F.lit(1)).alias("n_batch"),
                    F.count_if(F.col("status") == "closed").alias("n_closed"),
                    F.count_if(F.col("status") == "error").alias("n_error"),
                    F.count_if(F.col("status") == "skipped").alias("n_skipped"),
                    F.max("politeness_wait_s").alias("max_wait_s"),
                )
                # no count job: the cutoff arithmetic already knows the batch
                # size exactly (a cutoff selects exactly batch_size rows; the
                # everything-fits path is the histogram total), and the fetch
                # stage emits exactly one row per input URL (F14 — errors are
                # rows, never drops).  The wave's write materializes the
                # persisted fetch output and fills `obs`; obs.get is read
                # only after that action.
                n_batch = n_sel
                results = results.persist()

                # link-clean parallelism scales with the batch like the fetch
                # stage (links ≈ a few × batch rows): sub-quota BFS warm-up
                # waves stop paying cfg.partitions-wide stages for a few
                # thousand links; quota waves keep full parallelism
                edges = expand_links(results, cfg.boundaries, fetch_parts).persist()
                new_open = (
                    new_open_rows(
                        edges,
                        frontier,
                        bloom=bloom,
                        banded=(bloom_df, bloom_spec) if bloom_df is not None else None,
                        cuckoo=cfg.partitions if tier == "cuckoo" else None,
                    )
                    .withColumn("origin", F.regexp_extract("url", r"^(https?://[^/?#]*)", 1))
                    .withColumn("status", F.lit("open"))
                    .withColumn("http_status", F.lit(None).cast("int"))
                    .select(*FRONTIER_COLS)
                )
                if trap_state is not None:
                    # drop discoveries whose (host, template) crossed the
                    # trap budget — the tiny block list broadcasts, so
                    # this adds no shuffle to the discovery path
                    new_open = filter_trapped(
                        new_open, trap_state, cfg.trap_budget
                    )
                # (an Observation here would be lost when AQE's empty-relation
                # propagation prunes a zero-discovery wave's subtree — count
                # the persisted frame instead, AFTER the write/checkpoint has
                # materialized it: one fewer job per wave)
                new_open = new_open.persist()

                processed_rows = results.select(
                    "url", "url_hash", "origin", "status", "http_status", "depth"
                )
                new_frontier = (
                    frontier.join(results.select("url_hash"), "url_hash", "left_anti")
                    .select(*FRONTIER_COLS)
                    .unionByName(processed_rows.select(*FRONTIER_COLS))
                    .unionByName(new_open)
                )

                analyses_df = None
                if self.analyzer is not None and self.images is not None:
                    from ..analyses import analyses_for_wave

                    analyses_df = analyses_for_wave(results, self.images, self.analyzer)

                processed += n_batch
                # delta = this wave's changed rows (status updates + discoveries)
                # — O(batch + new) instead of O(frontier) in delta-mode stores
                delta = processed_rows.select(*FRONTIER_COLS).unionByName(new_open)

                if cfg.pipeline_commit:
                    # materialize the wave's frontier ONCE (eager local
                    # checkpoint = lineage cut + fills `obs`); the background
                    # write and the whole of wave k+1's compute then read
                    # these blocks.  The durable source of truth on resume
                    # stays the committed store: wave k's manifest is
                    # committed only when its writer drains (_drain), which
                    # happens before wave k+1's writer starts — so a crash
                    # anywhere loses at most the in-flight wave, exactly as
                    # in serial mode, while the O(frontier) store write
                    # overlaps the next wave's fetch/expand/dedup instead of
                    # ~1 s of bookkeeping (BENCH §6 latency A/B).
                    nxt = new_frontier.localCheckpoint(eager=True)
                    lineage = nxt.groupBy(F.spark_partition_id().alias("pid")).count().collect()
                    n_new = new_open.count()
                    if bloom_df is not None:
                        bloom_df = self._merge_banded(bloom_df, new_open, bloom_spec)
                    elif bloom is not None:
                        self._merge_broadcast(bloom, new_open, cfg)
                    if trap_state is not None:
                        trap_state = merge_template_counts(trap_state, new_open)
                    _mark("materialize")

                    # wave k-1's write must be durable (and its manifest
                    # committed) before wave k's write begins
                    if in_flight is not None:
                        try:
                            _drain(in_flight)
                        finally:
                            in_flight = None
                    _mark("drain_prev")

                    write_err: list[BaseException] = []

                    def _write(k=k, nxt=nxt, edges=edges, analyses_df=analyses_df, delta=delta, write_err=write_err):
                        try:
                            self.store.write_data(k, nxt, edges, analyses_df, delta=delta)
                        except BaseException as e:  # re-raised at drain
                            write_err.append(e)

                    writer = InheritableThread(target=_write)
                    writer.start()
                else:
                    # serial commit (local default): the parquet write IS
                    # the materialization of the new frontier, and in
                    # snapshot mode the page-cached read-back cuts lineage
                    # for free
                    self.store.write_data(k, new_frontier, edges, analyses_df, delta=delta)
                    _mark("write")
                    n_new = new_open.count()  # cache read: the write materialized it
                    _mark("n_new")
                    if bloom_df is not None:
                        bloom_df = self._merge_banded(bloom_df, new_open, bloom_spec)
                    elif bloom is not None:
                        self._merge_broadcast(bloom, new_open, cfg)
                    if trap_state is not None:
                        trap_state = merge_template_counts(trap_state, new_open)
                    _mark("bloom")
                    if getattr(self.store, "mode", "snapshot") == "delta":
                        nxt = new_frontier.localCheckpoint(eager=True)
                    else:
                        nxt = self.store.load_frontier(spark, k)
                    lineage = nxt.groupBy(F.spark_partition_id().alias("pid")).count().collect()
                    _mark("lineage")

                if cfg.adaptive_politeness:
                    # one bounded keyed aggregate over the persisted
                    # results (error origins + recovering origins only
                    # reach the driver); wave k's manifest carries the
                    # POST-wave-k multipliers — exactly what wave k+1
                    # (or a resume at k+1) applies
                    from .fetch import aimd_update

                    origin_mult = aimd_update(origin_mult, results, cfg)

                if hll_regs is not None:
                    # merge the wave's discoveries into the running
                    # register set (register-wise MAX — associative, so
                    # this equals one pass over frontier ∪ discoveries);
                    # new_open is persisted and already materialized by
                    # the write/checkpoint above, so this is a cache
                    # read feeding a 64-row aggregate
                    from ..operators.sketches import (
                        hll_estimate,
                        hll_merge,
                        hll_registers,
                    )

                    hll_regs = hll_merge(
                        hll_regs, hll_registers(new_open.select("url"), "url")
                    )

                manifest = {
                    "wave": k,
                    "wave_name": self.store.wave_name,
                    "processed_total": processed,
                    "quota": cfg.quota,
                    "salted_origins": salt_counts,
                    # AIMD backoff state AFTER this wave (adaptive
                    # politeness): the multipliers the NEXT wave fetches
                    # under — resume reads these from the last committed
                    # manifest
                    **(
                        {
                            "politeness_mult": {
                                o: round(v, 4) for o, v in origin_mult.items()
                            }
                        }
                        if cfg.adaptive_politeness
                        else {}
                    ),
                    # n_dup = distinct deduped edges whose target yielded no
                    # new frontier URL (already seen, or duplicated within
                    # the wave; edges are pre-deduped on
                    # (from_hash, reason, to_hash) in expand_links).
                    # edges is persisted and was materialized by the linkage
                    # write, so this count is a cache read, not a recompute
                    # (an Observation on the write would hang if AQE's
                    # empty-relation propagation pruned a zero-link wave)
                    "metrics": {
                        **obs.get,
                        "n_new": n_new,
                        "n_links": (n_links := edges.count()),
                        "n_dup": n_links - n_new,
                        # wall time of this wave up to (not including) the
                        # manifest commit — counter.rs's per-crawl counters
                        # have no timing; this is the Spark-side lineage
                        # metric that makes per-wave cost visible in the
                        # committed history
                        "wall_s": round(_time.monotonic() - wave_t0, 3),
                        # per-phase breakdown (LOPEZ_WAVE_PROFILE=1).
                        # serial: select / write / n_new / bloom / lineage.
                        # pipelined: select / materialize (checkpoint +
                        # lineage + counts + filter maintenance) /
                        # drain_prev (waiting on wave k-1's background
                        # write) — wave k's own write cost shows up as
                        # wave k+1's drain_prev
                        **({"phases": phases} if profile else {}),
                        # mergeable distinct-URLs-ever-seen counter
                        # (LOPEZ_WAVE_HLL=1): estimate + the registers
                        # themselves, so manifests from different
                        # crawls/segments can be combined by
                        # register-wise MAX downstream
                        **(
                            {
                                "hll_urls_est": hll_estimate(hll_regs),
                                "hll_regs": hll_regs,
                            }
                            if hll_regs is not None
                            else {}
                        ),
                    },
                    "lineage": {str(r["pid"]): r["count"] for r in lineage},
                }
                if cfg.pipeline_commit:
                    # manifest commits when this wave's writer drains (start
                    # of wave k+1, or the post-loop drain) — manifest-last
                    # per wave, wave order preserved; the frames the write
                    # still reads stay persisted until then
                    # the previous frontier's checkpoint blocks stay
                    # persisted until this wave's writer drains: they are
                    # the recovery root for results/new_open cache loss
                    # while the background write is still reading them
                    in_flight = (
                        writer,
                        k,
                        manifest,
                        [new_open, edges, results, frontier],
                        write_err,
                    )
                else:
                    self.store.commit_manifest(k, manifest)
                    new_open.unpersist()
                    edges.unpersist()
                    results.unpersist()
                    frontier.unpersist()

                summary.per_wave.append(manifest)
                summary.waves += 1
                # next wave scans the frontier 3× (priority histogram, seen
                # anti-join, status update) — keep it stored
                frontier = nxt.persist()
                k += 1

        except BaseException:
            # a mid-wave failure must not leave any background writer
            # running while the caller unwinds (it may stop the
            # SparkSession); join them, and commit the recorded wave's
            # manifest if its own write succeeded — that wave WAS
            # complete
            if in_flight is not None:
                writer_, wk_, manifest_, _frames, werr_ = in_flight
                writer_.join()
                if not werr_:
                    self.store.commit_manifest(wk_, manifest_)
                in_flight = None
            cur = locals().get("writer")
            if cur is not None and cur.is_alive():
                # current wave's writer started but not yet recorded
                # (failure between start() and the in_flight assignment)
                cur.join()
                # surface a concurrent store-write failure instead of
                # silently swallowing it behind the foreground exception
                # (safe for durability — the manifest is uncommitted —
                # but the secondary error matters for diagnosis)
                cur_err = locals().get("write_err")
                if cur_err:
                    log.warning(
                        "background wave write also failed during crawl "
                        "unwind: %r",
                        cur_err[0],
                    )
            raise

        # drain the final in-flight wave (quota exhausted / crawl-end /
        # max_waves): its data write and manifest commit happen here
        if in_flight is not None:
            _drain(in_flight)

        try:
            frontier.unpersist()
        except Exception:
            pass
        summary.processed = processed
        summary.seen_tier = tier
        return summary

    @staticmethod
    def _merge_broadcast(bloom, new_open: DataFrame, cfg: CrawlConfig) -> None:
        """Fold a wave's discoveries into the broadcast-tier filter:
        a distributed treeReduce build over the (persisted, already-
        materialized) discoveries yields ONE m/8-byte bits buffer at the
        driver — same m/k as the standing filter, OR-merged in place.
        The driver handles bits (bounded by ``seen_broadcast_max_bytes``),
        never a discovery hash; the merged filter re-broadcasts on the
        next wave's probe.

        The delta build's per-partition partials are each a full
        m/8-byte buffer regardless of row count, so the (already
        materialized, cache-read) discovery stream is coalesced to ≤8
        partitions first — near the 256 MB broadcast ceiling that is
        8 full-size partial buffers allocated/merged per wave instead
        of 32."""
        from ..operators.seen import build_bloom

        delta = build_bloom(
            new_open.coalesce(8), "url_hash", cfg.seen_bloom_capacity, cfg.seen_bloom_fpp
        )
        bloom.merge(delta)

    @staticmethod
    def _merge_banded(bloom_df: DataFrame, new_open: DataFrame, spec) -> DataFrame:
        """Fold a wave's discoveries into the standing banded seen-filter:
        band-build over the (persisted, already-materialized) discoveries,
        then an OR-merge groupBy over band ids — entirely executor-side,
        each task touching a handful of ≤``seen_band_bytes`` buffers.
        The driver never materializes a discovery hash (the round-1/2
        design pulled every wave's hashes through ``toPandas`` to mutate
        a driver-held filter — a funnel at any scale, and a 12 GB
        broadcast at north-rule capacity).  The merged filter is eagerly
        checkpointed — O(bands) small rows — cutting the wave-over-wave
        lineage chain."""
        from ..operators.seen import build_banded_bloom, merge_banded_blooms

        delta = build_banded_bloom(new_open, "url_hash", spec)
        return merge_banded_blooms(bloom_df, delta).localCheckpoint(eager=True)

    def page_rank(self, iterations: int | None = None) -> DataFrame:
        """Entry point 3 (``lopez page-rank <wave>``, ``lib.rs:269-285``):
        PageRank over closed→closed ahref links (``linkage.sql:1-16``) —
        8 power iterations, damping 0.85, dangling-mass redistribution.
        Unlike the reference (edges materialized in driver RAM,
        ``page_rank.rs:29-37``), this is an iterative DataFrame job."""
        from ..graph.pagerank import ITERATIONS, pagerank

        frontier, edges = self._closed_link_graph()
        ranks = pagerank(edges, iterations=iterations or ITERATIONS)
        named = ranks.withColumnRenamed("node", "url_hash").join(
            frontier.select("url_hash", "url"), "url_hash"
        )
        named.createOrReplaceTempView("named_page_rank")
        return named

    def opic_rank(self, iterations: int | None = None) -> DataFrame:
        """OPIC importance (Abiteboul 2003) over the same closed→closed
        ahref graph as :meth:`page_rank` — the crawl-ORDERING metric:
        cash distributed along out-links per step, history banked,
        importance = (history+cash)/(T+1).  Feed the result back into
        the next crawl's seed priorities to approximate the paper's
        greedy-by-cash policy without a global PageRank pass; beyond
        the reference (it ships batch PageRank only,
        ``lib-lopez/src/page_rank.rs``)."""
        from ..graph.opic import ITERATIONS, opic

        frontier, edges = self._closed_link_graph()
        st = opic(
            edges, src="from_hash", dst="to_hash", iterations=iterations or ITERATIONS
        )
        named = st.withColumnRenamed("node", "url_hash").join(
            frontier.select("url_hash", "url"), "url_hash"
        )
        named.createOrReplaceTempView("named_opic")
        return named

    def _closed_link_graph(self) -> tuple[DataFrame, DataFrame]:
        """(frontier, distinct closed→closed ahref edges) of the latest
        committed wave — the link-analysis input both rankers share
        (``linkage.sql:1-16``)."""
        k = self.store.latest_wave()
        if k is None:
            raise ValueError("no committed waves")
        frontier = self.store.load_frontier(self.spark, k)
        closed = frontier.filter(F.col("status") == "closed").select("url_hash")
        edges = (
            self.store.load_all_linkage(self.spark, k)
            .filter(F.col("reason") == "ahref")
            .select("from_hash", "to_hash")
            .join(closed.withColumnRenamed("url_hash", "from_hash"), "from_hash", "left_semi")
            .join(closed.withColumnRenamed("url_hash", "to_hash"), "to_hash", "left_semi")
            .distinct()
        )
        return frontier, edges

    # ---------------------------------------------------------------- views

    def named_views(self, upto: int | None = None) -> dict[str, DataFrame]:
        """S7: named export views joining hashes back to URLs
        (``migrations/20200825234443_named-tables``)."""
        k = self.store.latest_wave() if upto is None else upto
        if k is None:
            raise ValueError("no committed waves")
        frontier = self.store.load_frontier(self.spark, k)
        linkage = self.store.load_all_linkage(self.spark, k)
        frontier.createOrReplaceTempView("named_status")
        linkage.createOrReplaceTempView("named_linkage")
        views = {"named_status": frontier, "named_linkage": linkage}
        try:
            analyses = self.store.load_all_analyses(self.spark, k)
            analyses.createOrReplaceTempView("named_analyses")
            views["named_analyses"] = analyses
        except Exception:
            pass  # no analyses written (no analyzer configured)
        return views
