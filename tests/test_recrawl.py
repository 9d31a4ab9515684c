"""Freshness-driven recrawl scheduler (crawler/recrawl.py): the Cho &
Garcia-Molina estimator against a straight-line Python replica, tier
policy edges, and recrawl_seeds' frontier re-opening semantics
(including that the engine's priority selection then picks exactly the
re-opened rows)."""

from __future__ import annotations

import math

from lopez_spark.crawler.frontier import priority_batch
from lopez_spark.crawler.recrawl import change_rates, recrawl_seeds

from pyspark.sql import functions as F


def _history_rows():
    # url 1: 4 obs over 3 days, 3 changed  -> hot
    # url 2: 4 obs over 3 days, 0 changed  -> cold
    # url 3: 3 obs over 6 days, 1 changed  -> middling
    # url 4: 1 obs                          -> dropped (no rate info)
    # url 5: 2 obs, zero span               -> dropped
    day = 86_400_000_000
    rows = []
    for i, ts in enumerate(range(0, 4 * day, day)):
        rows.append((1, ts, i > 0))  # 3 of 4 changed
        rows.append((2, ts, False))
    for i, ts in enumerate(range(0, 9 * day, 3 * day)):
        rows.append((3, ts, i == 1))
    rows.append((4, 0, True))
    rows.append((5, 7 * day, True))
    rows.append((5, 7 * day, True))
    return rows


def _expected_lambda_e6(n_obs, n_changed, span_us):
    r = -math.log((n_obs - n_changed + 0.5) / (n_obs + 0.5))
    per_day = r * (n_obs - 1) * 86_400_000_000.0 / span_us
    return round(1_000_000.0 * per_day)


def test_change_rates_matches_straightline_math(spark):
    df = spark.createDataFrame(
        _history_rows(), "url_hash long, ts_us long, changed boolean"
    )
    got = {
        r["url_hash"]: (r["n_obs"], r["n_changed"], r["span_us"], r["lambda_e6"], r["tier"])
        for r in change_rates(df).collect()
    }
    assert set(got) == {1, 2, 3}  # 4 (single obs) and 5 (zero span) dropped
    day = 86_400_000_000
    for key, (n, x, span) in {
        1: (4, 3, 3 * day),
        2: (4, 0, 3 * day),
        3: (3, 1, 6 * day),
    }.items():
        n_obs, n_changed, span_us, lam, tier = got[key]
        assert (n_obs, n_changed, span_us) == (n, x, span)
        assert lam == _expected_lambda_e6(n, x, span)
    # ordering: the frequently-changing page outranks the static one
    assert got[1][3] > got[3][3] > got[2][3]
    assert got[1][4] == 0  # hottest tier
    assert got[2][4] == 3  # coldest tier


def test_recrawl_seeds_reopens_only_selected_closed(spark):
    frontier = spark.createDataFrame(
        [
            ("https://a.test/hot", 1, "https://a.test", "closed", 200, 1),
            ("https://a.test/cold", 2, "https://a.test", "closed", 200, 1),
            ("https://a.test/err", 6, "https://a.test", "error", None, 1),
            ("https://a.test/open", 7, "https://a.test", "open", None, 2),
        ],
        "url string, url_hash long, origin string, status string, "
        "http_status int, depth int",
    )
    day = 86_400_000_000
    hist = spark.createDataFrame(
        [(1, 0, False), (1, day, True), (2, 0, False), (2, day, False),
         (6, 0, True), (6, day, True)],
        "url_hash long, ts_us long, changed boolean",
    )
    rates = change_rates(hist)
    out = recrawl_seeds(frontier, rates, max_tier=0)
    st = {r["url_hash"]: (r["status"], r["http_status"]) for r in out.collect()}
    assert st[1] == ("open", None)  # hot + closed -> reopened
    assert st[2] == ("closed", 200)  # cold stays closed
    assert st[6] == ("error", None)  # hot but errored: NOT silently retried
    assert st[7] == ("open", None)  # already open untouched
    assert out.columns == frontier.columns
    # and the engine's priority selection now picks exactly the
    # re-opened row plus the already-open one
    batch = priority_batch(
        out.filter(F.col("status") == "open"), batch_size=10, max_depth=7
    )
    assert sorted(r["url_hash"] for r in batch.collect()) == [1, 7]
