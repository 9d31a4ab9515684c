"""DSL → Spark Column compiler (operator O1 + §2.3-2.5).

Every aggregator / extractor / transformer compiles to *built-in*
column expressions over an ``elements`` array<struct> column (one DOM
per page row) — no Python anywhere in the compiled plan; whole-stage
codegen applies end-to-end.  A "page" is a row and "selector-matched
elements" is a filtered array, so aggregators are array folds
(``F.aggregate``/``F.transform``), not groupBys — document order is the
array order, which preserves the reference's ``first``/``collect``
ordering semantics (``aggregator.rs:207-219``).

Evaluation parity: ``interpreter.py`` implements the same semantics in
pure Python; ``tests/test_dsl_parity.py`` pins them together.

Null-propagation rule: every transformer is Null→Null except
``is-null``/``is-not-null`` (``transformer.rs:457``).  Spark built-ins
propagate this naturally except where noted (hash, capture).

Documented divergences from the reference (intentional):
  * ``greater-or-equal`` is ``>=`` (reference bug: evals ``>``,
    ``transformer.rs:333-335``); numeric ``equals`` is exact
    (reference: ±1e-6, ``:342-344``).
  * ``hash`` is xxhash64 (not SipHash24) cast to Number.
  * ``capture``/``all-captures`` emit all groups with null for
    non-participating/empty captures (reference omits them from the
    map); regexes are Java-flavor at runtime (named groups converted
    from the Rust/Python ``(?P<n>…)`` spelling).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ast import AggregatorExpr, ExplodingExtractorExpr, Extractor, ExtractorExpr, RuleSet, Transformer
from .types import BOOL, NUMBER, STRING, Ty, array_of, map_of


def _java_regex(pat: str) -> str:
    return pat.replace("(?P<", "(?<")


def _group_names(pat: str) -> list[str]:
    """Keys of the capture map: group index as string, or its name
    (``capture_json``, ``expressions/transformer.rs:10-26``)."""
    compiled = _re.compile(pat)
    names = {v: k for k, v in compiled.groupindex.items()}
    return [names.get(i, str(i)) for i in range(compiled.groups + 1)]


def _cmp(l: Column, r: Column) -> Column:
    """Total order with nulls first (``cmp_json``,
    ``transformer.rs:93-116``: Null < everything)."""
    return (
        F.when(l.isNull() & r.isNull(), F.lit(0))
        .when(l.isNull(), F.lit(-1))
        .when(r.isNull(), F.lit(1))
        .when(l < r, F.lit(-1))
        .when(l > r, F.lit(1))
        .otherwise(F.lit(0))
    )


def compile_transformer(tr: Transformer, col: Column, t: Ty) -> tuple[Column, Ty]:
    op = tr.op
    out_t = tr.type_of(t)
    if op == "is-null":
        return col.isNull(), out_t
    if op == "is-not-null":
        return col.isNotNull(), out_t
    if op == "not":
        return ~col, out_t
    if op == "hash":
        # xxhash64(NULL) would hash the seed — enforce Null→Null
        return F.when(col.isNull(), F.lit(None)).otherwise(
            F.xxhash64(col).cast("double")
        ), out_t
    if op == "as-number":
        return col.try_cast("double"), out_t
    if op == "greater-than":
        return col > F.lit(tr.num), out_t
    if op == "lesser-than":
        return col < F.lit(tr.num), out_t
    if op == "greater-or-equal":
        return col >= F.lit(tr.num), out_t
    if op == "lesser-or-equal":
        return col <= F.lit(tr.num), out_t
    if op == "between":
        return (col >= F.lit(tr.num)) & (col <= F.lit(tr.num2)), out_t
    if op == "equals-num":
        return col == F.lit(tr.num), out_t
    if op == "in-nums":
        return col.isin(*tr.nums) if tr.nums else F.when(col.isNotNull(), F.lit(False)), out_t
    if op == "length":
        n = F.length(col) if t.kind == "string" else F.size(col)
        return n.cast("double"), out_t
    if op == "is-empty":
        n = F.length(col) if t.kind == "string" else F.size(col)
        return n == 0, out_t
    if op == "get-idx":
        return F.try_element_at(col, F.lit(int(tr.num) + 1)), out_t
    if op == "get-key":
        return F.try_element_at(col, F.lit(tr.s)), out_t
    if op == "flatten":
        return F.flatten(F.filter(col, lambda x: x.isNotNull())), out_t
    if op == "each":
        if t.kind == "array":
            return F.transform(col, lambda x: compile_chain(tr.chain, x, t.inner)[0]), out_t
        return F.transform_values(
            col, lambda _k, v: compile_chain(tr.chain, v, t.inner)[0]
        ), out_t
    if op == "filter":
        if t.kind == "array":
            return F.filter(
                col, lambda x: F.coalesce(compile_chain(tr.chain, x, t.inner)[0], F.lit(False))
            ), out_t
        return F.map_filter(
            col, lambda _k, v: F.coalesce(compile_chain(tr.chain, v, t.inner)[0], F.lit(False))
        ), out_t
    if op == "any":
        return F.exists(
            col, lambda x: F.coalesce(compile_chain(tr.chain, x, t.inner)[0], F.lit(False))
        ), out_t
    if op == "all":
        return F.forall(
            col, lambda x: F.coalesce(compile_chain(tr.chain, x, t.inner)[0], F.lit(False))
        ), out_t
    if op == "sort":
        return F.array_sort(col, _cmp), out_t
    if op == "sort-by":
        return F.array_sort(
            col,
            lambda l, r: _cmp(
                compile_chain(tr.chain, l, t.inner)[0],
                compile_chain(tr.chain, r, t.inner)[0],
            ),
        ), out_t
    if op == "as-string":
        return col.cast("string"), out_t
    if op == "pretty":
        return _pretty(col), out_t
    if op == "equals-str":
        return col == F.lit(tr.s), out_t
    if op == "in-strs":
        return col.isin(*tr.strs) if tr.strs else F.when(col.isNotNull(), F.lit(False)), out_t
    if op == "capture":
        return _capture(col, tr.s), out_t
    if op == "all-captures":
        return _all_captures(col, tr.s), out_t
    if op == "matches":
        return col.rlike(_java_regex(tr.s)), out_t
    if op == "replace":
        return F.regexp_replace(col, _java_regex(tr.s), tr.s2), out_t
    raise NotImplementedError(op)


def _pretty(col: Column) -> Column:
    """T15 whitespace normalization, exact ``pretty`` semantics
    (``transformer.rs:29-65``): per-paragraph word-joining with single
    spaces, empty paragraphs dropped, trailing newline iff non-empty.
    Golden vectors from ``pretty_test`` in tests/test_dsl_parity.py."""
    s = F.regexp_replace(col, r"[^\S\n]+", " ")  # collapse intra-line ws (incl \r, \t)
    s = F.regexp_replace(s, r"(?m)^ +| +$", "")  # trim line edges
    s = F.regexp_replace(s, r"\n{2,}", "\n")  # drop empty paragraphs
    s = F.regexp_replace(s, r"^\n+|\n+$", "")  # trim outer newlines
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.when(F.length(s) > 0, F.concat(s, F.lit("\n"))).otherwise(F.lit(""))
    )


def _capture(col: Column, pat: str) -> Column:
    names = _group_names(pat)
    jpat = _java_regex(pat)
    keys = F.array(*[F.lit(n) for n in names])
    vals = F.array(
        *[F.nullif(F.regexp_extract(col, jpat, i), F.lit("")) for i in range(len(names))]
    )
    return F.when(col.rlike(jpat), F.map_from_arrays(keys, vals))


def _all_captures(col: Column, pat: str) -> Column:
    names = _group_names(pat)
    jpat = _java_regex(pat)
    full = F.regexp_extract_all(col, F.lit(jpat), F.lit(0))
    groups = [F.regexp_extract_all(col, F.lit(jpat), F.lit(i)) for i in range(len(names))]
    keys = F.array(*[F.lit(n) for n in names])

    def one(j: Column) -> Column:
        vals = F.array(*[F.nullif(F.element_at(g, j), F.lit("")) for g in groups])
        return F.map_from_arrays(keys, vals)

    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.when(F.size(full) == 0, F.array().cast(f"array<map<string,string>>")).otherwise(
            F.transform(F.sequence(F.lit(1), F.size(full)), one)
        )
    )


def compile_chain(chain: tuple[Transformer, ...], col: Column, t: Ty) -> tuple[Column, Ty]:
    for tr in chain:
        col, t = compile_transformer(tr, col, t)
    return col, t


# ---------------------------------------------------------------- extractors


def compile_extractor(ex: Extractor, e: Column, elements: Column) -> Column:
    op = ex.op
    if op == "name":
        return e["name"]
    if op == "text":
        return e["text"]
    if op == "html":
        return e["html"]
    if op == "inner-html":
        return e["inner_html"]
    if op == "attr":
        return F.try_element_at(e["attrs"], F.lit(ex.attr))
    if op == "attrs":
        return e["attrs"]
    if op == "classes":
        return e["classes"]
    if op == "id":
        return e["id"]
    if op == "parent":
        parent = F.get(elements, F.try_element_at(e["path"], F.lit(-1)))
        return compile_extractor_expr(ex.inner, parent, elements)
    if op == "children":
        kids = F.filter(
            elements, lambda c: F.try_element_at(c["path"], F.lit(-1)) == e["pos"]
        )
        return F.transform(kids, lambda c: compile_extractor_expr(ex.inner, c, elements))
    if op in ("select-any", "select-all"):
        desc = F.filter(
            elements,
            lambda d: F.array_contains(d["path"], e["pos"])
            & ex.selector.pred(d, elements),
        )
        mapped = F.transform(desc, lambda d: compile_extractor_expr(ex.inner, d, elements))
        return F.get(mapped, F.lit(0)) if op == "select-any" else mapped
    raise NotImplementedError(op)


def compile_extractor_expr(xe: ExtractorExpr, e: Column, elements: Column) -> Column:
    col = compile_extractor(xe.extractor, e, elements)
    col, _t = compile_chain(xe.chain, col, xe.extractor.type_of())
    return col


def compile_stream(xx: ExplodingExtractorExpr, elems: Column, elements: Column) -> Column:
    """Value stream of an (optionally exploding) extractor expression
    over the matched elements (``ExplodingExtractorExpression``,
    ``expressions/extractor.rs:55-118``)."""
    vals = F.transform(elems, lambda e: compile_extractor_expr(xx.expr, e, elements))
    if xx.explodes:
        return F.flatten(F.filter(vals, lambda v: v.isNotNull()))
    return vals


# ---------------------------------------------------------------- aggregators


def compile_aggregator_expr(
    agg_expr: AggregatorExpr, elems: Column, elements: Column
) -> Column:
    agg = agg_expr.aggregator
    if agg.op == "count":
        col: Column = F.size(elems).cast("double")
        t = NUMBER
    elif agg.op == "count-not-null":
        vals = compile_stream(agg.expr, elems, elements)
        col = F.size(F.filter(vals, lambda v: F.coalesce(v, F.lit(False)))).cast("double")
        t = NUMBER
    elif agg.op == "first":
        vals = compile_stream(agg.expr, elems, elements)
        col = F.get(F.filter(vals, lambda v: v.isNotNull()), F.lit(0))
        t = agg.expr.type_of()
    elif agg.op == "collect":
        col = compile_stream(agg.expr, elems, elements)
        t = array_of(agg.expr.type_of())
    elif agg.op == "distinct":
        col = F.array_distinct(compile_stream(agg.expr, elems, elements))
        t = array_of(agg.expr.type_of())
    elif agg.op == "sum":
        vals = compile_stream(agg.expr, elems, elements)
        col = F.aggregate(vals, F.lit(0.0), lambda a, v: a + F.coalesce(v, F.lit(0.0)))
        t = NUMBER
    elif agg.op == "group":
        # reference semantics (aggregator.rs:237-248): per element,
        # extract its key(s) — one, or many when the key expression
        # ``!explode``s (extractor.rs:95-118) — and feed the ELEMENT to
        # each non-null key's sub-aggregator, once per key occurrence
        # (duplicate keys in one element feed it twice).  BTreeMap →
        # sorted keys.
        if agg.key.explodes:
            keys_per_elem = F.transform(
                elems,
                lambda e: F.coalesce(
                    compile_extractor_expr(agg.key.expr, e, elements), F.array()
                ),
            )
        else:
            keys_per_elem = F.transform(
                elems, lambda e: F.array(compile_extractor_expr(agg.key.expr, e, elements))
            )
        tagged = F.zip_with(
            keys_per_elem, elems, lambda ks, e: F.struct(ks.alias("ks"), e.alias("e"))
        )
        dkeys = F.array_sort(
            F.array_distinct(
                F.filter(F.flatten(keys_per_elem), lambda k: k.isNotNull())
            )
        )
        col = F.map_from_entries(
            F.transform(
                dkeys,
                lambda k: F.struct(
                    k.alias("key"),
                    compile_aggregator_expr(
                        agg.sub,
                        F.flatten(
                            F.transform(
                                tagged,
                                lambda x: F.array_repeat(
                                    x["e"],
                                    F.size(F.filter(x["ks"], lambda kk: kk == k)),
                                ),
                            )
                        ),
                        elements,
                    ).alias("value"),
                ),
            )
        )
        t = map_of(agg.sub.type_of())
    else:
        raise NotImplementedError(agg.op)
    col, _t = compile_chain(agg_expr.chain, col, t)
    return col


def compile_rule_set(
    rs: RuleSet, elements: Column, url: Column
) -> list[tuple[str, Column]]:
    """One column per rule of the set; non-matching ``in``-page rows get
    null (the reference emits no row: ``directives.rs:584-590``)."""
    elems = F.filter(elements, lambda e: rs.selector.pred(e, elements))
    out = []
    for name, agg_expr in rs.aggregators:
        col = compile_aggregator_expr(agg_expr, elems, elements)
        if rs.in_page is not None:
            col = F.when(url.rlike(_java_regex(rs.in_page)), col)
        out.append((name, col))
    return out
