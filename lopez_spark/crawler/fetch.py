"""The batch fetch stage (operators S2, F7, F8, F12, F14).

One ``mapInPandas`` stage replaces the reference's per-URL async worker
task (``crawl_task``, ``lib-lopez/src/crawler/worker/mod.rs:299-329``):

  * input is the wave batch, partitioned by (salted) origin hash so one
    origin never spans two politeness contexts — the Spark analogue of
    lopez's ``hash(origin) % workers`` routing
    (``lib-lopez/src/crawler/master.rs:147-157``);
  * robots.txt is loaded once per origin per partition and cached
    (``Origins::get_origin_for_url``, ``origins.rs:91-114``);
  * politeness is a per-origin virtual clock: request *i* to an origin
    is scheduled at ``i * delay``; with ``n_salts`` subpartitions for a
    hot origin each subclock ticks at ``delay * n_salts`` with offset
    ``salt * delay``, preserving the global per-origin rate exactly
    while parallelizing hot hosts (this engine's salted-politeness
    design; lopez serializes the hot host on one worker).  Simulated
    (virtual) by default; wall-clock sleeping behind
    ``simulate_politeness=False``.

Errors are never dropped ("do not ever, EVER, filter elements of this
stream" — ``worker/mod.rs:351-352``): every input row comes out with a
status ∈ {closed, error, skipped}.
"""

from __future__ import annotations

import http.client
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .config import CrawlConfig
from .robots import RobotExclusion
from .web import WebProvider

# links travel as two parallel flat string arrays (not array<struct>):
# plain string lists cross the Arrow boundary ~5× faster than lists of
# structs, and the zip/explode happens JVM-side in expand_links
FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_hash", LongType()),
        StructField("origin", StringType()),
        StructField("depth", IntegerType()),
        StructField("status", StringType()),  # closed | error | skipped
        StructField("http_status", IntegerType()),  # null for error/skipped
        StructField("image_id", StringType()),  # content key (200 only)
        StructField("link_reasons", ArrayType(StringType())),
        StructField("link_raws", ArrayType(StringType())),
        StructField("politeness_wait_s", DoubleType()),
    ]
)


def make_fetch_fn(
    web: WebProvider,
    cfg: CrawlConfig,
    salt_counts: dict[str, int],
    wave_no: int = 0,
    origin_mult: dict[str, float] | None = None,
):
    """Build the mapInPandas function. ``salt_counts`` maps hot origins
    to their n_salts (1 for everyone else).  ``wave_no`` names the
    optional per-task WARC archives (``cfg.warc_dir``).  ``origin_mult``
    maps backed-off origins to their AIMD politeness multiplier
    (``cfg.adaptive_politeness``; absent origins run at 1.0 — the
    configured ceiling rate)."""
    origin_mult = origin_mult or {}

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        robots_cache: dict[str, RobotExclusion | None] = {}
        warc_recs: list[dict] = []
        # virtual next-allowed offset per (origin, salt) within this task
        clock: dict[tuple[str, int], float] = {}

        for pdf in batches:
            out = {k: [] for k in FETCH_SCHEMA.fieldNames()}
            # iterate plain lists: pandas Series iteration boxes every
            # element through numpy scalars (~2x the loop overhead on
            # this 450k-row/wave hot path — guide §4.2)
            for url, url_hash, origin, depth, salt in zip(
                pdf["url"].tolist(),
                pdf["url_hash"].tolist(),
                pdf["origin"].tolist(),
                pdf["depth"].tolist(),
                pdf["salt"].tolist(),
            ):
                if origin not in robots_cache:
                    txt = web.robots(origin)
                    robots_cache[origin] = (
                        RobotExclusion(txt, cfg.user_agent) if txt else None
                    )
                robots = robots_cache[origin]

                status = "closed"
                http_status: int | None = None
                image_id: str | None = None
                reasons: list[str] = []
                raws: list[str] = []
                wait_s = 0.0

                if robots is not None and not robots.allows(url):
                    # crawl_task: disallowed pages are registered but never
                    # fetched or closed (worker/mod.rs:314-317)
                    status = "skipped"
                else:
                    n_salts = salt_counts.get(origin, 1)
                    mult = origin_mult.get(origin, 1.0)
                    delay = cfg.min_interval(
                        robots.crawl_delay if robots else None
                    ) * mult
                    if mult > 1.0 and delay == 0.0:
                        # an origin with no configured rate limit would
                        # otherwise never actually slow down despite its
                        # AIMD multiplier climbing (ADVICE r5): give the
                        # backoff a small floor so mult has teeth
                        delay = cfg.politeness_floor_s * mult
                    key = (origin, int(salt))
                    t = clock.get(key, int(salt) * delay)
                    wait_s = t
                    clock[key] = t + delay * n_salts
                    if not cfg.simulate_politeness:
                        time.sleep(delay * n_salts)  # pragma: no cover

                    try:
                        res = web.fetch(url)
                    except Exception:
                        # F14: errors are recorded, never dropped and never
                        # task-fatal ("do not ever, EVER, filter elements of
                        # this stream", worker/mod.rs:351-352)
                        res = None
                    if res is None or res.status_code == 0:
                        status = "error"
                    elif 300 <= res.status_code < 400:
                        # any 3xx is a redirect (`status_code.is_redirection()`,
                        # downloader/mod.rs:92-101); a redirect without a
                        # Location header is a download error there
                        if res.location is not None:
                            http_status = res.status_code
                            reasons, raws = ["redirect"], [res.location]
                        else:
                            status = "error"
                    elif 200 <= res.status_code < 300:
                        http_status = res.status_code
                        image_id = res.image_id
                        if res.links:
                            reasons = [r for r, _ in res.links]
                            raws = [raw for _, raw in res.links]
                        # a CR/LF-bearing URL would make build_warc raise
                        # for the whole task archive; canonicalization
                        # strips whitespace, so this is belt-and-braces —
                        # skip the one record rather than lose the archive
                        if (
                            cfg.warc_dir is not None
                            and res.body is not None
                            and "\r" not in url
                            and "\n" not in url
                        ):
                            # ISO 28500 response record: the payload is
                            # a full HTTP message (status line + headers
                            # + body) so warcio-style consumers parse it
                            reason = http.client.responses.get(
                                res.status_code, "Unknown"
                            )
                            mime = res.content_type or "application/octet-stream"
                            http_msg = (
                                f"HTTP/1.1 {res.status_code} {reason}\r\n"
                                f"Content-Type: {mime}\r\n"
                                f"Content-Length: {len(res.body)}\r\n\r\n"
                            ).encode() + res.body
                            warc_recs.append(
                                {
                                    "rec_type": "response",
                                    # unique per (wave, url): re-fetches
                                    # in later waves get their own id
                                    "rec_id": f"urn:xxh:{wave_no}-{url_hash}",
                                    "target_uri": url,
                                    "date": time.strftime(
                                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                                    ),
                                    "content_type": (
                                        "application/http;msgtype=response"
                                    ),
                                    "payload": http_msg,
                                }
                            )
                    else:
                        http_status = res.status_code  # BadStatus: close, no links

                out["url"].append(url)
                out["url_hash"].append(url_hash)
                out["origin"].append(origin)
                out["depth"].append(depth)
                out["status"].append(status)
                out["http_status"].append(http_status)
                out["image_id"].append(image_id)
                out["link_reasons"].append(reasons)
                out["link_raws"].append(raws)
                out["politeness_wait_s"].append(wait_s)
            yield pd.DataFrame(out)

        if cfg.warc_dir is not None and warc_recs:
            # one .warc.gz per fetch task.  The tmp name is ATTEMPT-
            # unique (speculative/zombie attempts must not interleave
            # writes into one file); the atomic rename publishes whole
            # archives only, so whichever attempt finishes last wins
            # with identical content.  The directory must be a mount
            # shared by the executors (see CrawlConfig.warc_dir).
            import os

            from pyspark import TaskContext

            from ..sources.warc import build_warc

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            attempt = ctx.taskAttemptId() if ctx is not None else 0
            os.makedirs(cfg.warc_dir, exist_ok=True)
            path = os.path.join(
                cfg.warc_dir, f"wave{wave_no:05d}-part{pid:05d}.warc.gz"
            )
            tmp = f"{path}.{attempt}.tmp"
            with open(tmp, "wb") as fh:
                fh.write(build_warc(warc_recs))
            os.replace(tmp, path)

    return fetch_batches


def aimd_update(
    mult: dict[str, float], results, cfg: CrawlConfig
) -> dict[str, float]:
    """One AIMD step of the adaptive-politeness multipliers from a
    wave's (persisted) fetch results — driver-side, tiny by
    construction: the keyed aggregate is filtered to error rows plus
    currently-tracked origins, so only origins in distress or still
    recovering ever reach the driver (same bounded-collect discipline
    as hot-origin counts in priority_batch_and_origin_counts).

    Multiplicative increase on any congestion-signal fetch (status ==
    "error": network error / timeout / malformed redirect — 404s close
    normally and are NOT congestion), additive decrease per clean wave,
    multiplier dropped at 1.0.  Tracked origins absent from the wave's
    batch hold their multiplier (no evidence either way).  See
    CrawlConfig.adaptive_politeness."""
    from pyspark.sql import functions as F

    cond = F.col("status") == "error"
    tracked = list(mult)
    if tracked:
        cond = cond | F.col("origin").isin(tracked)
    rows = (
        results.filter(cond)
        # recovery evidence must come from fetches that actually ran:
        # a tracked origin whose only rows this wave were
        # robots-skipped was never probed, so it holds its multiplier
        # instead of silently recovering (ADVICE r5)
        .filter(F.col("status").isin("closed", "error"))
        .groupBy("origin")
        .agg(F.count_if(F.col("status") == "error").alias("n_err"))
        .collect()
    )
    out = dict(mult)
    for r in rows:
        o = r["origin"]
        if r["n_err"] > 0:
            out[o] = min(
                cfg.politeness_max_backoff,
                out.get(o, 1.0) * cfg.politeness_backoff,
            )
        elif o in out:
            nv = out[o] - cfg.politeness_recover
            if nv <= 1.0:
                del out[o]
            else:
                out[o] = nv
    return out
