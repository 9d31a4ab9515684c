"""Differential tests of F2 priority selection against a brute-force
implementation of fetch.sql's order (cnt, depth, url) — including the
peer-class cutoff case (many origins sharing the boundary (cnt, depth))
that a per-origin accumulation would get wrong."""

import bisect
import random
from collections import defaultdict

from lopez_spark.crawler.frontier import priority_batch_and_origin_counts

SCHEMA = "url string, origin string, status string, http_status int, depth int, url_hash long"


def brute_force(rows, batch_size):
    by_o = defaultdict(list)
    for u, o, _s, _h, d, _i in rows:
        by_o[o].append(d)
    for v in by_o.values():
        v.sort()
    ranked = sorted(
        (bisect.bisect_right(by_o[o], d), d, u) for u, o, _s, _h, d, _i in rows
    )
    return sorted(u for _c, _d, u in ranked[:batch_size])


def test_singleton_peer_class_cutoff(spark):
    # 100 origins, one depth-1 row each → every row is a peer at (1, 1)
    rows = [
        (f"https://o{i:03d}.test/u", f"https://o{i:03d}.test", "open", None, 1, i)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    batch, counts, n_sel = priority_batch_and_origin_counts(df, 40, 10)
    got = sorted(r["url"] for r in batch.collect())
    assert got == brute_force(rows, 40)
    assert len(got) == 40
    assert n_sel == 40  # cutoff arithmetic predicts the batch size exactly


def test_randomized_differential(spark):
    random.seed(7)
    for trial, (n, hosts, b) in enumerate([(500, 12, 123), (300, 3, 77), (200, 200, 60)]):
        rows = []
        for i in range(n):
            o = f"https://h{random.randrange(hosts)}.test"
            rows.append((f"{o}/u{i:04d}", o, "open", None, random.randrange(4), i))
        df = spark.createDataFrame(rows, SCHEMA)
        batch, counts, n_sel = priority_batch_and_origin_counts(df, b, 10)
        got = sorted(r["url"] for r in batch.collect())
        assert got == brute_force(rows, b), f"trial {trial}"
        assert sum(counts.values()) >= len(got)  # counts are an upper bound
        assert n_sel == len(got)  # predicted count matches, cutoff or not


def test_batch_larger_than_eligible(spark):
    rows = [(f"https://o.test/u{i}", "https://o.test", "open", None, 0, i) for i in range(5)]
    df = spark.createDataFrame(rows, SCHEMA)
    batch, counts, n_sel = priority_batch_and_origin_counts(df, 100, 10)
    assert batch.count() == 5
    assert counts == {"https://o.test": 5}
    assert n_sel == 5  # everything-fits path: histogram total


def test_max_depth_filter(spark):
    rows = [
        ("https://o.test/shallow", "https://o.test", "open", None, 1, 1),
        ("https://o.test/deep", "https://o.test", "open", None, 9, 2),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    batch, _, _n = priority_batch_and_origin_counts(df, 10, 3)
    assert [r["url"] for r in batch.collect()] == ["https://o.test/shallow"]


def test_high_origin_cardinality_no_histogram_collect(spark):
    """10^5 origins: every driver round-trip in the selection must be
    bounded — the size-probe CollectLimit holds at most
    _DRIVER_HIST_MAX + 1 histogram rows (a few MB at ANY origin
    cardinality), and beyond the probe the driver sees only the cutoff
    class row and the (empty here) hot-origin counts — never the full
    histogram (the round-1 driver bottleneck).  Patches the CLASSIC
    DataFrame class: in Spark 4 `pyspark.sql.DataFrame` is an abstract
    base whose subclass defines collect, so patching the base
    intercepts nothing (the pre-round-4 version of this test was
    vacuously green because of exactly that)."""
    from pyspark.sql.classic import dataframe as _classic_mod

    from lopez_spark.crawler.frontier import _DRIVER_HIST_MAX

    DataFrame = _classic_mod.DataFrame

    n = 100_000
    df = (
        spark.range(n)
        .selectExpr(
            "concat('https://o', id, '.test/u') AS url",
            "concat('https://o', id, '.test') AS origin",
            "'open' AS status",
            "CAST(NULL AS int) AS http_status",
            "CAST(id % 4 AS int) AS depth",
            "id AS url_hash",
        )
    )
    collect_sizes: list[int] = []
    orig_collect = DataFrame.collect

    def counting_collect(self):
        rows = orig_collect(self)
        collect_sizes.append(len(rows))
        return rows

    DataFrame.collect = counting_collect
    try:
        batch, counts, n_sel = priority_batch_and_origin_counts(
            df, 500, 10, hot_threshold=1000
        )
        n_batch = batch.count()
    finally:
        DataFrame.collect = orig_collect
    assert n_batch == 500
    assert n_sel == 500
    assert counts == {}  # nothing is hot: every origin has ≤4 rows
    assert collect_sizes, "interception failed — no collect observed"
    # the size probe is the one bounded round-trip; everything after it
    # is metadata-sized (the cutoff class row, zero hot counts)
    assert max(collect_sizes) <= _DRIVER_HIST_MAX + 1, collect_sizes
    assert sum(s for s in collect_sizes if s <= 100) <= 2, collect_sizes
    assert sum(s > 100 for s in collect_sizes) <= 1, collect_sizes
