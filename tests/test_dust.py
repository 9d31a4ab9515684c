"""DUST rule mining (crawler/dust.py): parse → mine → strip.

Covers DustBuster's (Bar-Yossef 2007) rule lifecycle on hand-built
evidence: support accumulation, refutation by content-bearing params,
paramless-twin evidence, and one-pass multi-param stripping at
link-clean time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lopez_spark.crawler.dust import (
    mine_param_rules,
    parse_params,
    strip_irrelevant_params,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash long")


def test_parse_params_explodes_pairs_and_bare(spark):
    df = _pages(
        spark,
        [
            ("https://a.test/x?s=1&p=2", 10),
            ("https://a.test/x", 11),
        ],
    )
    got = {
        (r.param_name, r.param_value, r.base)
        for r in parse_params(df).collect()
    }
    assert got == {
        ("s", "1", "https://a.test/x?p=2"),
        ("p", "2", "https://a.test/x?s=1"),
        ("", "", "https://a.test/x"),
    }


def test_parse_params_base_removes_only_its_pair(spark):
    df = _pages(spark, [("https://a.test/x?page=2&session=99", 1)])
    rows = {r.param_name: r.base for r in parse_params(df).collect()}
    assert rows["page"] == "https://a.test/x?session=99"
    assert rows["session"] == "https://a.test/x?page=2"


def test_mine_supports_and_refutes(spark):
    rows = []
    # 9 bases where session varies but content doesn't -> 9 support
    for b in range(9):
        rows.append((f"https://h.test/d/{b}?session=1", 100 + b))
        rows.append((f"https://h.test/d/{b}?session=2", 100 + b))
    # page param changes content on the same bases -> refuted
    for b in range(3):
        rows.append((f"https://h.test/d/{b}?page=1", 200 + b))
        rows.append((f"https://h.test/d/{b}?page=2", 300 + b))
    out = {
        r.param_name: r
        for r in mine_param_rules(_pages(spark, rows), min_support=8).collect()
    }
    assert out["session"].support == 9
    assert out["session"].counterexamples == 0
    assert out["session"].is_irrelevant
    assert out["page"].counterexamples == 3
    assert not out["page"].is_irrelevant


def test_mine_below_min_support_not_flagged(spark):
    rows = []
    for b in range(3):
        rows.append((f"https://h.test/d/{b}?sid=1", b))
        rows.append((f"https://h.test/d/{b}?sid=2", b))
    out = mine_param_rules(_pages(spark, rows), min_support=8).collect()
    (r,) = out
    assert r.support == 3 and not r.is_irrelevant


def test_mine_paramless_twin_counts_as_evidence_value(spark):
    # one observed value + the paramless twin = 2 distinct values
    rows = []
    for b in range(8):
        rows.append((f"https://h.test/d/{b}?tag=x", 50 + b))
        rows.append((f"https://h.test/d/{b}", 50 + b))
    out = mine_param_rules(_pages(spark, rows), min_support=8).collect()
    (r,) = out
    assert r.param_name == "tag" and r.support == 8 and r.is_irrelevant


def test_mine_rules_are_per_host(spark):
    rows = []
    for b in range(8):
        rows.append((f"https://good.test/d/{b}?s=1", b))
        rows.append((f"https://good.test/d/{b}?s=2", b))
    # same param name is content-bearing on the other host
    for b in range(8):
        rows.append((f"https://bad.test/d/{b}?s=1", 1000 + 2 * b))
        rows.append((f"https://bad.test/d/{b}?s=2", 1001 + 2 * b))
    out = {
        (r.host, r.param_name): r.is_irrelevant
        for r in mine_param_rules(_pages(spark, rows), min_support=8).collect()
    }
    assert out[("good.test", "s")] is True
    assert out[("bad.test", "s")] is False


def test_strip_removes_all_flagged_params_one_pass(spark):
    rules = spark.createDataFrame(
        [
            ("h.test", "session", 9, 0, True),
            ("h.test", "ref", 9, 0, True),
            ("h.test", "page", 0, 3, False),
        ],
        "host string, param_name string, support long, "
        "counterexamples long, is_irrelevant boolean",
    )
    links = spark.createDataFrame(
        [
            ("https://h.test/a?session=1&page=2&ref=z",),
            ("https://h.test/a?session=1&ref=z",),
            ("https://h.test/plain",),
            ("https://other.test/a?session=1",),
        ],
        "url string",
    )
    got = {r.url for r in strip_irrelevant_params(links, rules).collect()}
    assert got == {
        "https://h.test/a?page=2",
        "https://h.test/a",
        "https://h.test/plain",
        "https://other.test/a?session=1",  # no rule for that host
    }


def test_strip_preserves_row_count_and_columns(spark):
    rules = spark.createDataFrame(
        [("h.test", "s", 9, 0, True)],
        "host string, param_name string, support long, "
        "counterexamples long, is_irrelevant boolean",
    )
    links = spark.createDataFrame(
        [("https://h.test/a?s=1", 3), ("https://h.test/b", 4)],
        "url string, depth int",
    )
    out = strip_irrelevant_params(links, rules)
    assert out.columns == ["url", "depth"]
    rows = {(r.url, r.depth) for r in out.collect()}
    assert rows == {("https://h.test/a", 3), ("https://h.test/b", 4)}


def test_strip_collapses_aliases_for_seen_set(spark):
    """The point of DUST: alias URLs converge to one frontier entry."""
    rules = spark.createDataFrame(
        [("h.test", "sid", 9, 0, True)],
        "host string, param_name string, support long, "
        "counterexamples long, is_irrelevant boolean",
    )
    links = spark.createDataFrame(
        [(f"https://h.test/doc?sid={i}",) for i in range(20)], "url string"
    )
    out = strip_irrelevant_params(links, rules).select("url").distinct()
    assert out.count() == 1


def test_mine_plan_has_no_python(spark):
    df = _pages(spark, [("https://h.test/d?s=1", 1)])
    plan = mine_param_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize(
    "url",
    [
        "https://h.test/a?x=%3D%26&y=2",  # encoded separators stay inert
        "https://h.test/a?empty=&y=2",
        "https://h.test/a?noval",
    ],
)
def test_parse_params_hostile_shapes_do_not_crash(spark, url):
    rows = parse_params(_pages(spark, [(url, 1)])).collect()
    assert len(rows) >= 1
