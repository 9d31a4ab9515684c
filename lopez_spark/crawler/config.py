"""Crawl configuration: boundaries + set-variables (SURVEY §2.6).

Mirrors ``Boundaries`` (``lib-lopez/src/directives/directives.rs:532-574``)
and the set-variable defaults (``lib-lopez/src/directives/variable.rs:61-141``).
The whole object is parsed once on the driver and shipped to executors
inside task closures (it is tiny) — the Spark analogue of lopez's
``DirectivesConfiguration``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..urlnorm import KEEP_ALL_PARAMS, ParamPolicy, canonicalize, join_and_canonicalize


@dataclass(frozen=True)
class Boundaries:
    """allow / disallow / frontier regex sets + param policy.

    ``is_allowed = any(allowed) and not any(disallowed)``
    (``directives.rs:544-546``); ``is_frontier = any(frontier)``
    (``:548-550``).  Regexes are *searched* (RegexSet::is_match), not
    anchored."""

    allowed: tuple[str, ...] = ()
    disallowed: tuple[str, ...] = ()
    frontier: tuple[str, ...] = ()
    params: ParamPolicy = field(default_factory=ParamPolicy)

    def _compiled(self):
        # compile lazily; dataclass is frozen so cache on type via dict
        key = (self.allowed, self.disallowed, self.frontier)
        cache = _REGEX_CACHE.setdefault(key, {})
        if not cache:
            cache["allow"] = [re.compile(p) for p in self.allowed]
            cache["dis"] = [re.compile(p) for p in self.disallowed]
            cache["front"] = [re.compile(p) for p in self.frontier]
        return cache

    def is_allowed(self, url: str) -> bool:
        c = self._compiled()
        return any(r.search(url) for r in c["allow"]) and not any(
            r.search(url) for r in c["dis"]
        )

    def is_frontier(self, url: str) -> bool:
        c = self._compiled()
        return any(r.search(url) for r in c["front"])

    def clean_links(self, page_url: str, links: list[tuple[str, str]]) -> list[tuple[str, str]]:
        """(reason, raw) → sorted, deduped (reason, canonical_url), with
        the frontier cut — exact port of ``Boundaries::clean_links``
        (``lib-lopez/src/crawler/boundaries.rs:50-75``).  Shared by the
        Spark fetch stage and the BFS oracle: parity by construction."""
        if self.is_frontier(page_url):
            return []
        out = []
        for reason, raw in links:
            canon = join_and_canonicalize(page_url, raw, self.params)
            if canon is not None and self.is_allowed(canon):
                out.append((reason, canon))
        return sorted(set(out))

    def clean_redirect(self, page_url: str, location: str) -> str | None:
        """Redirect link rule (``worker/mod.rs:264-285``): no link if the
        page is a frontier page; target checked against boundaries on the
        *joined* (param-unfiltered) form, then param-cleaned."""
        if self.is_frontier(page_url):
            return None
        joined = join_and_canonicalize(page_url, location, KEEP_ALL_PARAMS)
        if joined is None or not self.is_allowed(joined):
            return None
        return canonicalize(joined, self.params)


_REGEX_CACHE: dict = {}


# set-variable defaults: lib-lopez/src/directives/variable.rs:61-141
@dataclass(frozen=True)
class CrawlConfig:
    seeds: tuple[str, ...]
    boundaries: Boundaries
    user_agent: str = "lopez-spark/0.1"
    quota: int = 1000  # variable.rs:115
    max_depth: int = 7  # variable.rs:116
    max_hits_per_sec: float = 2.5  # variable.rs:87
    request_timeout: float = 60.0  # variable.rs:88
    max_body_size: int = 10_000_000  # variable.rs:117
    enable_page_rank: bool = True  # variable.rs:67
    # profile knobs (lib-lopez/src/cli.rs:98-128) → Spark-side sizing
    batch_size: int = 1024
    partitions: int = 8
    hot_origin_threshold: int = 64  # batch rows per origin before salting
    # fetch-stage task sizing: the wave routes its batch over
    # ceil(n_batch / fetch_rows_per_task) partitions, capped at
    # `partitions` — sub-quota waves (BFS warm-up) run proportionally
    # few tasks instead of paying full-parallelism task overhead, and
    # quota-sized waves keep the configured parallelism.  Default =
    # batch_size / partitions (128): a full 1024-row batch reaches all
    # 8 configured partitions (a 4096 default made fetch_parts == 1 on
    # every wave, silently disabling hot-origin salting).
    fetch_rows_per_task: int = 128
    max_salts: int = 8
    simulate_politeness: bool = True  # virtual clock (no wall-clock sleep)
    # seen-set scale layer (O13): when set, a broadcast Bloom filter of
    # this capacity front-ends the seen anti-join (definite-negative
    # fast path; positives exactly verified — results identical)
    seen_bloom_capacity: int | None = None
    seen_bloom_fpp: float = 0.01
    # tier cutover: capacities whose single filter's bits fit under
    # this ceiling run the broadcast Bloom tier (no candidate shuffle
    # for the probe; maintained per wave by a distributed treeReduce
    # build over the discoveries — the driver holds one bits buffer,
    # never a key).  Larger capacities (north rule: 10^10 keys → ~12 GB
    # of bits, over any broadcast ceiling) run the banded DataFrame
    # tier.  256 MB ≈ 2×10^8 keys at fpp 0.01.
    seen_broadcast_max_bytes: int = 256 << 20
    # seen-set tier override: "auto" picks by size as above ("exact"
    # when no capacity is set); "broadcast" / "banded" force those;
    # "cuckoo" runs the per-partition cogrouped cuckoo-filter anti-join
    # (~2.2 bytes/seen-key partition-local, no standing filter state —
    # rebuilt from the co-partitioned seen side each wave); "exact"
    # forces the plain anti-join.  All tiers results-identical (tested).
    seen_tier: str = "auto"
    # size cap per physical filter shard of the banded seen-filter (the
    # filter lives as a DataFrame of (band, bits) rows — see
    # operators/seen.py BandedBloomSpec); at the 10^10-key north-rule
    # capacity this yields ~360 bands of ≤32 MB instead of one 12 GB
    # broadcast
    seen_band_bytes: int = 32 << 20
    # overlap the wave's snapshot/linkage write (background thread) with
    # the lineage metric + next wave's priority selection.  Pays on
    # object stores where the O(frontier) write is high-latency IO; on
    # local page-cached disk the write is CPU-bound parquet encode on
    # the same cores, so the default stays serial (A/B in BENCH §6,
    # same trade as WaveStore delta mode).  Results are identical.
    pipeline_commit: bool = False
    # optional WARC content sink: when set, every fetch task writes the
    # bodies it fetched (2xx pages whose provider populates
    # FetchResult.body — HttpWeb, WebDriverWeb, SyntheticWeb(with_body=
    # True)) as one .warc.gz in this directory: ISO 28500 response
    # records (full HTTP message payloads), gzip member per record (the
    # splittable Common Crawl layout), attempt-unique tmp + atomic
    # rename so retries and speculative attempts stay safe.  The
    # directory is opened by EXECUTOR tasks: on a multi-node cluster it
    # must be a shared mount (NFS/fuse-mounted object store) or the
    # archives land on executor-local disks.  Off by default: the
    # engine's store keeps analysis results, not bodies (matching the
    # reference); bodies are held per task until its archive flushes,
    # so size fetch_rows_per_task accordingly.
    warc_dir: str | None = None
    # spider-trap budget (crawler/traps.py): when set, URLs collapse to
    # (host, digit-normalized path+query template) keys and a template
    # whose cumulative distinct-URL count crosses this budget stops
    # contributing NEW frontier rows — already-open URLs still drain.
    # Bounds calendar/session-id/faceted-search URL-space explosions at
    # ~budget URLs per template (Mercator §3.3), which max_depth alone
    # cannot (a trap chain explodes breadth-first well within depth 7).
    # State is one aggregated (host, template, n_urls) DataFrame updated
    # per wave from the wave's discoveries; the block list broadcasts
    # into the discovery anti-join — no extra shuffle on the hot path.
    trap_budget: int | None = None
    # adaptive per-origin politeness (AIMD, the TCP congestion-control
    # shape applied to crawl delay): when True, an origin whose wave had
    # any congestion-signal fetch (status == "error": network error /
    # timeout / malformed redirect — NOT 404s, which are content, not
    # congestion) gets its politeness delay MULTIPLIED by
    # politeness_backoff (capped at politeness_max_backoff); each
    # subsequent clean wave SUBTRACTS politeness_recover until the
    # multiplier returns to 1.0 and is dropped.  The adaptive extension
    # of the reference's fixed `set max_hits_per_sec` budget
    # (lib-lopez/src/directives/variable.rs:87): the configured rate
    # stays the CEILING; an origin showing distress is probed gently
    # back toward it instead of being hammered at a rate it already
    # failed to serve.  Driver state is one small dict (error origins +
    # still-recovering origins only), updated from the wave's persisted
    # results by one tiny keyed aggregate, carried in every committed
    # manifest (resume-correct), and broadcast into the fetch stage
    # with the salt counts.
    adaptive_politeness: bool = False
    politeness_backoff: float = 2.0
    politeness_recover: float = 0.25
    politeness_max_backoff: float = 8.0
    # floor delay (seconds) a backed-off origin pays when its base rate
    # is unlimited (max_hits_per_sec <= 0 and no robots crawl-delay) —
    # without it the AIMD multiplier would multiply 0 and never
    # actually slow an erroring origin (ADVICE r5)
    politeness_floor_s: float = 0.1

    def min_interval(self, crawl_delay: float | None) -> float:
        """Per-origin delay: max(1/max_hits_per_sec, robots crawl-delay)
        (``lib-lopez/src/crawler/worker/origins.rs:20-52``)."""
        base = 1.0 / self.max_hits_per_sec if self.max_hits_per_sec > 0 else 0.0
        return max(base, crawl_delay or 0.0)
