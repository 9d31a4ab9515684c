"""Compiler ≡ interpreter parity over every aggregator (A1-A8),
extractor (E1-E11) and transformer (T1-T20), on the fixture page DOMs.
Plus the reference's own `pretty` golden vectors
(``transformer.rs:67-80``)."""

import math

import pytest

from lopez_spark import fixtures as fx
from lopez_spark.analyses import Analyzer, elements_column, elements_py
from lopez_spark.directives.interpreter import _pretty
from lopez_spark.directives.parser import parse_directives
from pyspark.sql import functions as F

# exercises: count, count(expr), first, collect, distinct, sum, group,
# !explode, every extractor, and a broad transformer set
DSL = r"""
select html {
    page-hash: first(html hash);
    cap-len: first(text length);
    noun: first(text capture "a photo of (?P<noun>\w+)" get "noun");
    word-lens: first(text all-captures "(\w+)" each(get "1" length));
    any-long: first(text all-captures "(\w+)" each(get "1" length) any(greater-than 5));
    all-short: first(text all-captures "(\w+)" each(get "1" length) all(lesser-than 100));
    sorted-lens: first(text all-captures "(\w+)" each(get "1" length) sort);
    filtered-lens: first(text all-captures "(\w+)" each(get "1" length) filter(greater-or-equal 4));
    devowel: first(text replace "[aeiou]" with "_");
    has-photo: first(text matches "photo");
    pretty-cap: first(text pretty);
    missing-attr: first(attr "nope");
    missing-is-null: first(attr "nope" is-null);
    eqs: first(name equals "html");
    in-strs: first(name in ["html", "body"]);
    bet: first(text length between 10 and 100);
    as-str: first(text length as-string);
    as-num-bad: first(text as-number);
    inner: first(inner-html);
}
select img {
    src: first(attr "src");
    width-num: first(attr "width" as-number);
    is-big: first(attr "width" as-number greater-or-equal 30);
    fmt-in: first(attr "fmt" in ["raw", "qraw"]);
    img-attrs: first(attrs get "fmt");
    img-id: first(id);
    alt-count: count(attr "alt" is-not-null);
}
select p.caption {
    cap: first(text);
    n-caps: count;
    first-class: first(classes get 0);
    class-list: collect(classes !explode);
    sorted-by-neg: first(text all-captures "(\w+)" each(get "1") sort-by(length));
}
select * {
    n-elements: count;
    names: distinct(name) sort;
    name-count: group(name, count);
    grouped-texts: group(name, collect(text)) get "p";
    word-groups: group(text all-captures "(\w+)" each(get "1") !explode, count);
    word-names: group(text all-captures "(\w+)" each(get "1") !explode, distinct(name) sort);
    total-width: sum(attr "width" as-number);
    kid-names: first(children(name));
    parent-name: first(parent(name));
    p-texts: first(select-all(text, p.caption));
    any-p: first(select-any(text, p));
    empty-any: first(select-any(text, h6));
}
select body > img { direct-imgs: count; }
select html img { desc-imgs: count; }
select p:not([class]) { unclassed-p: count; }
select in "img-0000000[0-3]$" p { early-cap: first(text); }
"""


@pytest.fixture(scope="module")
def analyzer():
    return Analyzer(parse_directives(DSL))


def normalize(v):
    if isinstance(v, dict):
        return {k: normalize(x) for k, x in sorted(v.items())}
    if isinstance(v, (list, tuple)):
        return [normalize(x) for x in v]
    if isinstance(v, float):
        assert not math.isnan(v)
        return round(v, 9)
    return v


def test_compiler_matches_interpreter(spark, analyzer):
    n = 12
    pdf = fx.images_pandas(n)
    sdf = spark.createDataFrame(pdf).withColumn(
        "url", F.concat(F.lit("https://x.test/"), F.col("image_id"))
    )
    sdf = sdf.withColumn(
        "elements",
        elements_column(F.col("image_id"), F.col("w"), F.col("h"), F.col("fmt"), F.col("caption")),
    )
    got_rows = {r["image_id"]: r.asDict(recursive=True) for r in analyzer.apply(sdf).collect()}

    rule_names = [name for name, _ in analyzer.schema]
    for i in range(n):
        row = pdf.iloc[i]
        elements = elements_py(row.image_id, int(row.w), int(row.h), row.fmt, row.caption)
        want = analyzer.analyze_py(elements, f"https://x.test/{row.image_id}")
        got = got_rows[row.image_id]
        for name in rule_names:
            assert normalize(got[name]) == normalize(want[name]), (
                f"{name} mismatch on {row.image_id}: "
                f"spark={got[name]!r} python={want[name]!r}"
            )


def test_schema_is_static(analyzer):
    types = dict(analyzer.schema)
    assert str(types["page-hash"]) == "number"
    assert str(types["names"]) == "array[string]"
    assert str(types["name-count"]) == "map[string, number]"
    assert str(types["word-lens"]) == "array[number]"
    assert str(types["p-texts"]) == "array[string]"


def test_pretty_reference_vectors():
    # transformer.rs:67-80 golden vectors
    assert _pretty("\n\n\n\n\t    \r\r\n\n ") == ""
    assert _pretty("\n\na\n\n\t    \r\rb\n\n ") == "a\nb\n"
    assert _pretty("\n\n\na\n\t    \r\r\n\n ") == "a\n"
    assert _pretty("\n\n\na\n\t    \r\r\n\n c") == "a\nc\n"


def test_pretty_spark_matches_reference_vectors(spark):
    from lopez_spark.directives.compiler import _pretty as spark_pretty

    uglies = [
        "\n\n\n\n\t    \r\r\n\n ",
        "\n\na\n\n\t    \r\rb\n\n ",
        "\n\n\na\n\t    \r\r\n\n ",
        "\n\n\na\n\t    \r\r\n\n c",
        "hello   world\n\n  foo\tbar  ",
    ]
    df = spark.createDataFrame([(u,) for u in uglies], ["s"]).select(
        "s", spark_pretty(F.col("s")).alias("p")
    )
    for r in df.collect():
        assert r["p"] == _pretty(r["s"]), repr(r["s"])


def test_expected_values_spot_check(analyzer):
    """Semantic spot checks against hand-computed values."""
    row = fx.image_row(3)
    elements = elements_py(row.image_id, row.w, row.h, row.fmt, row.caption)
    got = analyzer.analyze_py(elements, f"https://x.test/{row.image_id}")
    assert got["n-elements"] == 4.0
    assert got["names"] == ["body", "html", "img", "p"]
    assert got["name-count"] == {"html": 1.0, "body": 1.0, "img": 1.0, "p": 1.0}
    assert got["src"] == row.image_id
    assert got["width-num"] == float(row.w)
    assert got["cap"] == row.caption
    assert got["kid-names"] == ["body"]  # children of html
    assert got["parent-name"] == "html"  # first non-null parent name
    assert got["direct-imgs"] == 1.0
    assert got["desc-imgs"] == 1.0
    assert got["unclassed-p"] == 0.0
    assert got["noun"] == row.caption.split()[3]
    assert got["early-cap"] == row.caption  # img-00000003 matches in-page regex
    assert got["missing-attr"] is None
    assert got["missing-is-null"] is True
    assert got["total-width"] == float(row.w)
    assert got["grouped-texts"] == [row.caption]
