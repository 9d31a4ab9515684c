"""Wall-clock politeness (``simulate_politeness=False``): the one fetch
branch the parity suite leaves untouched, pinned here at small scale.

``make_fetch_fn`` is a plain pandas-batch generator, so the branch is
driven without Spark: two origins × three URLs through one task, with a
recording web provider timestamping each fetch.  Assertions are
timing-tolerant (lower bounds at 80% of nominal, generous upper bound)
so hypervisor jitter cannot flake them.
"""

import time

import pandas as pd

from lopez_spark import fixtures as fx
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.fetch import make_fetch_fn
from lopez_spark.crawler.web import SyntheticWeb, WebProvider

_HPS = 10.0  # → 0.1 s nominal inter-hit delay per origin


class _RecordingWeb(WebProvider):
    def __init__(self, n: int):
        self.inner = SyntheticWeb(n)
        self.hits: list[tuple[str, float]] = []

    def fetch(self, url: str):
        self.hits.append((url.rsplit("/", 1)[0], time.monotonic()))
        return self.inner.fetch(url)

    def robots(self, origin: str):
        return self.inner.robots(origin)


def _batch(n_per_origin: int = 3) -> pd.DataFrame:
    urls = [
        fx.url_of(fx.image_id_of(i))
        for i in range(200)
        if fx.http_status(fx.image_id_of(i)) == 200
    ]
    by_origin: dict[str, list[str]] = {}
    for u in urls:
        origin = u.rsplit("/", 1)[0]
        idx = int(origin.split("//h", 1)[1].split(".", 1)[0])
        # avoid fixture hosts with robots rules (every 7th sets
        # Crawl-delay: 1, which would override max_hits_per_sec here)
        if idx % 7 == 0 or idx % 5 == 0 or idx % 13 == 0:
            continue
        by_origin.setdefault(origin, []).append(u)
    two = [o for o, us in by_origin.items() if len(us) >= n_per_origin][:2]
    assert len(two) == 2
    rows = [(u, hash(u), o, 1, 0) for o in two for u in by_origin[o][:n_per_origin]]
    return pd.DataFrame(rows, columns=["url", "url_hash", "origin", "depth", "salt"])


def _run(simulate: bool):
    web = _RecordingWeb(200)
    cfg = CrawlConfig(
        seeds=(),
        boundaries=Boundaries(allowed=(r"^https://h\d+\.example\.test/",)),
        max_hits_per_sec=_HPS,
        simulate_politeness=simulate,
    )
    pdf = _batch()
    t0 = time.monotonic()
    out = pd.concat(list(make_fetch_fn(web, cfg, {})([pdf])))
    return web, out, time.monotonic() - t0


def test_wall_clock_politeness_sleeps_between_hits():
    web, out, elapsed = _run(simulate=False)
    assert list(out["status"]) == ["closed"] * 6
    # 6 fetches × 0.1 s nominal sleep each, sequentially in one task
    assert elapsed >= 6 * (1.0 / _HPS) * 0.8
    # per-origin inter-hit gaps honor the delay (the politeness contract)
    for origin in {o for o, _ in web.hits}:
        ts = [t for o, t in web.hits if o == origin]
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert gaps and all(g >= (1.0 / _HPS) * 0.8 for g in gaps)


def test_simulated_politeness_does_not_sleep():
    web, out, elapsed = _run(simulate=True)
    assert list(out["status"]) == ["closed"] * 6
    assert elapsed < 0.5  # virtual clocks only — no wall-clock sleeping
    # the virtual clock still advances per origin: offsets 0, d, 2d
    waits = sorted(round(w, 6) for w in out["politeness_wait_s"])
    d = 1.0 / _HPS
    assert waits == sorted([0.0, d, 2 * d] * 2)
