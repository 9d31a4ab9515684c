"""Parser golden tests: the reference's own directive files must parse
and type-check (SURVEY §5 — parser round-trips are the bulk of the
reference's test surface)."""

import glob

import pytest

from lopez_spark.directives.ast import Directives
from lopez_spark.directives.parser import ParseError, load_directives, parse_directives
from lopez_spark.directives.types import TypeError_

REF = "/root/reference"


@pytest.mark.parametrize(
    "path",
    sorted(
        glob.glob(f"{REF}/examples/*.lcd")
        + glob.glob(f"{REF}/std-lopez/*.lcd")
        + glob.glob(f"{REF}/std-lopez/*/*.lcd")
    ),
)
def test_reference_file_parses(path):
    d = load_directives(path)
    assert isinstance(d, Directives)
    d.rules()  # type-check every rule


def test_github_example_contents():
    d = load_directives(f"{REF}/examples/lopez-github.lcd")
    assert d.seeds == ("https://github.com/tokahuke/lopez",)
    assert d.variables["quota"] == 100
    names = dict(d.rules())
    assert str(names["wiki-title"]) == "string"
    assert str(names["issue-status"]) == "string"
    assert str(names["seo.h2s"]) == "array[string]"
    assert str(names["seo.page-hash"]) == "number"


def test_rule_set_grammar_vectors():
    # parse.rs:407-421 rule_set_test — grammar-level vectors (the third
    # one would not type-check: `pretty` on array[string]; the reference
    # tests these parse-only too)
    from lopez_spark.directives.parser import parse_items

    for src in [
        'select td > a[href^="https"] { foo: first ( text ) ; }',
        "select ul { list: group(text, first(text pretty)); }",
        "select ul { list: collect(select-all(text, li) pretty); }",
    ]:
        assert len(parse_items(src)["rule_sets"]) == 1


def test_duplicate_rule_rejected():
    with pytest.raises(ParseError, match="more than once"):
        parse_directives("select a { x: count; x: count; }")


def test_type_errors_fail_fast():
    with pytest.raises(TypeError_):
        parse_directives("select a { x: sum(text); }")  # sum of string
    with pytest.raises(TypeError_):
        parse_directives("select a { x: first(text not); }")  # not of string
    with pytest.raises(TypeError_):
        parse_directives("select a { x: count(text); }")  # count(expr) needs bool
    with pytest.raises(TypeError_):
        parse_directives("select a { x: first(classes get \"k\"); }")  # map get on array


def test_set_variable_validation():
    d = parse_directives('set quota = 50; set user_agent = "x";')
    assert d.variables == {"quota": 50.0, "user_agent": "x"}
    with pytest.raises(ParseError, match="unknown variable"):
        parse_directives("set nonsense = 1;")
    with pytest.raises(ParseError, match="expected"):
        parse_directives('set quota = "not a number";')


def test_boundaries_and_params():
    d = parse_directives(
        'allow "^https://a/"; disallow "/x"; frontier "/f";\n'
        'use param "id"; ignore param "utm"; use param *;'
    )
    kinds = [b.kind for b in d.boundaries]
    assert kinds == ["allow", "disallow", "frontier", "use-param", "ignore-param", "use-all-params"]


def test_webdriver_parsed_not_executed():
    d = parse_directives('use webdriver on "wiki";')
    assert d.webdriver_rules == ("wiki",)


def test_explode_and_comments():
    d = parse_directives(
        "// comment\nselect a { /// doc\n x: count(classes each(is-not-null) !explode); }"
    )
    (_, agg), = d.rule_sets[0].aggregators
    assert agg.aggregator.expr.explodes


def test_to_crawl_config():
    from lopez_spark.directives.parser import to_crawl_config

    d = parse_directives(
        'seed "https://h0.example.test/img-00000000";\n'
        'allow "example";\nset quota = 7; set max_depth = 2;'
    )
    cfg = to_crawl_config(d)
    assert cfg.quota == 7 and cfg.max_depth == 2
    assert cfg.max_hits_per_sec == 2.5  # default (variable.rs:87)
    assert cfg.seeds == ("https://h0.example.test/img-00000000",)
