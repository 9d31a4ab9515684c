"""Pure-Python reference crawler (the parity oracle).

Implements exactly the semantics of the reference's scheduler —
``fetch.sql`` priority selection (running count per host over depth with
RANGE peers, order by (count, depth) with explicit ``url`` tie-break,
limit batch) and the worker state machine — over the same
``SyntheticWeb`` / ``Boundaries`` objects the Spark engine uses, with
**no Spark**.  Wave-by-wave frontier snapshots from the engine are
asserted equal to this oracle's (the north rule's crawl-ordering parity
criterion).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .crawler.config import CrawlConfig
from .crawler.robots import RobotExclusion
from .crawler.web import WebProvider
from .urlnorm import canonicalize, origin_of


@dataclass
class PageState:
    status: str  # open | closed | error | skipped
    http_status: int | None
    depth: int


@dataclass
class OracleResult:
    # frontier snapshot after each wave: {url: (status, http_status, depth)}
    snapshots: list[dict[str, tuple[str, int | None, int]]] = field(default_factory=list)
    # edges discovered per wave: set of (from_url, reason, to_url, depth)
    wave_edges: list[set[tuple[str, str, str, int]]] = field(default_factory=list)
    # batch processed per wave: set of (url, depth)
    wave_batches: list[set[tuple[str, int]]] = field(default_factory=list)
    processed: int = 0

    def final_seen(self) -> set[str]:
        return set(self.snapshots[-1]) if self.snapshots else set()


def priority_order(open_rows: list[tuple[str, str, int]]) -> list[tuple[str, int]]:
    """fetch.sql's `numbered`/`to_take` ordering over (url, origin, depth):
    cnt(url) = #rows of same HOST with depth <= row.depth (RANGE peers
    share), then sort by (cnt, depth, url).  The window key is the host
    — scheme stripped — matching fetch.sql's
    ``substring(page_url from '^https?://([^/]*)/')``."""
    by_host: dict[str, list[int]] = {}
    for _url, origin, depth in open_rows:
        by_host.setdefault(origin.split("://", 1)[-1], []).append(depth)
    for depths in by_host.values():
        depths.sort()
    import bisect

    ranked = []
    for url, origin, depth in open_rows:
        depths = by_host[origin.split("://", 1)[-1]]
        cnt = bisect.bisect_right(depths, depth)
        ranked.append((cnt, depth, url))
    ranked.sort()
    return [(url, depth) for _cnt, depth, url in ranked]


def oracle_crawl(cfg: CrawlConfig, web: WebProvider, max_waves: int | None = None) -> OracleResult:
    frontier: dict[str, PageState] = {}
    origins: dict[str, str] = {}
    for s in cfg.seeds:
        canon = canonicalize(s, cfg.boundaries.params)
        if canon is not None and canon not in frontier:
            frontier[canon] = PageState("open", None, 0)
            origins[canon] = origin_of(canon)

    robots_cache: dict[str, RobotExclusion | None] = {}
    result = OracleResult()
    processed = 0
    waves = 0

    while max_waves is None or waves < max_waves:
        remaining = cfg.quota - processed
        if remaining <= 0:
            break
        open_rows = [
            (url, origins[url], st.depth)
            for url, st in frontier.items()
            if st.status == "open" and st.depth <= cfg.max_depth
        ]
        batch = priority_order(open_rows)[: min(cfg.batch_size, remaining)]
        if not batch:
            break

        edges: set[tuple[str, str, str, int]] = set()
        for url, depth in batch:
            origin = origins[url]
            if origin not in robots_cache:
                txt = web.robots(origin)
                robots_cache[origin] = RobotExclusion(txt, cfg.user_agent) if txt else None
            robots = robots_cache[origin]
            st = frontier[url]

            if robots is not None and not robots.allows(url):
                st.status = "skipped"
                continue

            res = web.fetch(url)
            if res.status_code == 0:
                st.status = "error"
            elif 300 <= res.status_code < 400:
                # any 3xx follows Location (is_redirection(), downloader/mod.rs:92);
                # a 3xx without Location is a download error in the reference
                if res.location is None:
                    st.status = "error"
                else:
                    st.status, st.http_status = "closed", res.status_code
                    target = cfg.boundaries.clean_redirect(url, res.location)
                    if target is not None:
                        edges.add((url, "redirect", target, depth + 1))
            elif 200 <= res.status_code < 300:
                st.status, st.http_status = "closed", res.status_code
                for reason, to_url in cfg.boundaries.clean_links(url, res.links):
                    edges.add((url, reason, to_url, depth + 1))
            else:
                st.status, st.http_status = "closed", res.status_code

        # F4 seen-set dedup: min depth per target, first discovery sticks
        min_depth: dict[str, int] = {}
        for _f, _r, to_url, d in edges:
            if to_url not in min_depth or d < min_depth[to_url]:
                min_depth[to_url] = d
        for to_url, d in min_depth.items():
            if to_url not in frontier:
                frontier[to_url] = PageState("open", None, d)
                origins[to_url] = origin_of(to_url)

        processed += len(batch)
        result.wave_batches.append(set(batch))
        result.wave_edges.append(edges)
        result.snapshots.append(
            {u: (s.status, s.http_status, s.depth) for u, s in frontier.items()}
        )
        waves += 1

    result.processed = processed
    return result
