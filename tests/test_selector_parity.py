"""CSS selector parity: the Python matcher and the Spark Column
predicate are built from the same parsed form — this pins them together
over randomized DOM trees and a selector pool covering every supported
combinator (descendant, child, adjacent sibling, general sibling, mixed
chains ≥3 levels deep), exactly the cases the round-1 Column side got
wrong (order-insensitive ancestor containment, no siblings)."""

import random

from pyspark.sql import functions as F

from lopez_spark.analyses import ELEMENT_FIELDS
from lopez_spark.directives.selector import parse_selector

NAMES = ["div", "p", "a", "span", "ul", "li"]
CLASSES = ["x", "y", "caption"]

SELECTORS = [
    "div p",
    "div > p",
    "p + a",
    "p ~ a",
    "li + li",
    "div > p ~ span",
    ".x + .y",
    "div .x > a",
    "p:not(.x) + a",
    "span, p + a",
    "div p a",  # exact 3-level descendant
    "div > ul > li",  # exact 3-level child chain
    "a + p + span",  # chained adjacency
    "ul li ~ li",  # mixed descendant + sibling
    "div ~ div > p",  # sibling then child
]


def random_tree(rng: random.Random, n: int) -> list[dict]:
    """Random DOM in document order: parent of node i is any earlier
    node (or root); path = ancestor indices root..parent."""
    elements: list[dict] = []
    for i in range(n):
        if i == 0:
            path: list[int] = []
        else:
            parent = rng.randrange(-1, i)  # -1 = root-level sibling of 0
            path = [] if parent < 0 else elements[parent]["path"] + [parent]
        elements.append(
            {
                "pos": i,
                "name": rng.choice(NAMES),
                "id": f"n{i}" if rng.random() < 0.2 else None,
                "classes": [c for c in CLASSES if rng.random() < 0.25],
                "attrs": {"k": "v"} if rng.random() < 0.3 else {},
                "text": "",
                "html": "",
                "inner_html": "",
                "path": path,
            }
        )
    return elements


def test_selector_column_matches_python_on_random_doms(spark):
    rng = random.Random(20260816)
    trees = [random_tree(rng, rng.randrange(4, 14)) for _ in range(30)]
    rows = [
        (ti, [tuple(e[k] for k in (
            "pos", "name", "id", "classes", "attrs", "text", "html",
            "inner_html", "path")) for e in tree])
        for ti, tree in enumerate(trees)
    ]
    df = spark.createDataFrame(
        rows, f"tree_id int, elements array<struct<{ELEMENT_FIELDS.replace(', ', ',')}>>"
    )
    for src in SELECTORS:
        sel = parse_selector(src)
        got_rows = df.select(
            "tree_id",
            F.transform(
                F.filter(
                    F.col("elements"), lambda e: sel.pred(e, F.col("elements"))
                ),
                lambda e: e["pos"],
            ).alias("hits"),
        ).collect()
        got = {r["tree_id"]: list(r["hits"]) for r in got_rows}
        for ti, tree in enumerate(trees):
            want = [e["pos"] for e in tree if sel.matches(e, tree)]
            assert got[ti] == want, f"selector {src!r} tree {ti}: {got[ti]} != {want}"


def test_sibling_combinators_semantics():
    """Hand-built sanity: + is the immediately preceding sibling, ~ any
    preceding sibling; both require the same parent."""
    tree = [
        {"pos": 0, "name": "div", "id": None, "classes": [], "attrs": {},
         "text": "", "html": "", "inner_html": "", "path": []},
        {"pos": 1, "name": "p", "id": None, "classes": [], "attrs": {},
         "text": "", "html": "", "inner_html": "", "path": [0]},
        {"pos": 2, "name": "a", "id": None, "classes": [], "attrs": {},
         "text": "", "html": "", "inner_html": "", "path": [1, 0][:1] + [1]},
        {"pos": 3, "name": "a", "id": None, "classes": [], "attrs": {},
         "text": "", "html": "", "inner_html": "", "path": [0]},
        {"pos": 4, "name": "span", "id": None, "classes": [], "attrs": {},
         "text": "", "html": "", "inner_html": "", "path": [0]},
    ]
    # p(1) and a(3) and span(4) are siblings under div(0); a(2) is inside p
    assert [e["pos"] for e in tree if parse_selector("p + a").matches(e, tree)] == [3]
    assert [e["pos"] for e in tree if parse_selector("p ~ span").matches(e, tree)] == [4]
    assert [e["pos"] for e in tree if parse_selector("a + span").matches(e, tree)] == [4]
    # a(2) has no siblings → no sibling selector matches it
    assert not parse_selector("p + a").matches(tree[2], tree)
