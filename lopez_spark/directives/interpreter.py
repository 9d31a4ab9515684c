"""Pure-Python interpreter of the directives DSL — the parity oracle
for the Spark Column compiler (SURVEY §5.3).

Operates on plain element dicts::

    {pos, name, id, classes, attrs, text, html, inner_html, path}

with ``path`` = list of ancestor positions root→parent.  Implements
*identical* semantics to compiler.py (same documented divergences from
the reference), so ``tests/test_dsl_parity.py`` can assert
value-for-value equality between the two backends on every construct.
"""

from __future__ import annotations

import re as _re

from .ast import AggregatorExpr, ExplodingExtractorExpr, Extractor, ExtractorExpr, RuleSet, Transformer
from .types import Ty
from ..hashing import xxhash64_str


def _cmp_key(v):
    # nulls first, then value (homogeneous typed arrays)
    return (0, 0) if v is None else (1, v)


def eval_transformer(tr: Transformer, v, t: Ty):
    op = tr.op
    if op == "is-null":
        return v is None
    if op == "is-not-null":
        return v is not None
    if v is None:
        return None  # Null in → Null out (transformer.rs:457)
    if op == "not":
        return not v
    if op == "hash":
        return float(xxhash64_str(v))
    if op == "as-number":
        try:
            return float(v)
        except ValueError:
            return None
    if op == "greater-than":
        return v > tr.num
    if op == "lesser-than":
        return v < tr.num
    if op == "greater-or-equal":
        return v >= tr.num
    if op == "lesser-or-equal":
        return v <= tr.num
    if op == "between":
        return tr.num <= v <= tr.num2
    if op == "equals-num":
        return v == tr.num
    if op == "in-nums":
        return v in tr.nums
    if op == "length":
        return float(len(v))
    if op == "is-empty":
        return len(v) == 0
    if op == "get-idx":
        i = int(tr.num)
        return v[i] if 0 <= i < len(v) else None
    if op == "get-key":
        return v.get(tr.s)
    if op == "flatten":
        out = []
        for sub in v:
            if sub is not None:
                out.extend(sub)
        return out
    if op == "each":
        if isinstance(v, dict):
            return {k: eval_chain(tr.chain, x, t.inner) for k, x in v.items()}
        return [eval_chain(tr.chain, x, t.inner) for x in v]
    if op == "filter":
        if isinstance(v, dict):
            return {k: x for k, x in v.items() if eval_chain(tr.chain, x, t.inner) is True}
        return [x for x in v if eval_chain(tr.chain, x, t.inner) is True]
    if op == "any":
        return any(eval_chain(tr.chain, x, t.inner) is True for x in v)
    if op == "all":
        return all(eval_chain(tr.chain, x, t.inner) is True for x in v)
    if op == "sort":
        return sorted(v, key=_cmp_key)
    if op == "sort-by":
        return sorted(v, key=lambda x: _cmp_key(eval_chain(tr.chain, x, t.inner)))
    if op == "as-string":
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return _java_double_str(v)
        return str(v)
    if op == "pretty":
        return _pretty(v)
    if op == "equals-str":
        return v == tr.s
    if op == "in-strs":
        return v in tr.strs
    if op == "capture":
        return _capture(v, tr.s)
    if op == "all-captures":
        return _all_captures(v, tr.s)
    if op == "matches":
        return _re.search(tr.s, v) is not None
    if op == "replace":
        return _re.sub(tr.s, _rust_to_py_replacement(tr.s2), v)
    raise NotImplementedError(op)


def _java_double_str(v: float) -> str:
    """Match Spark's double→string cast for the common range."""
    if v != v or v in (float("inf"), float("-inf")):
        return {float("inf"): "Infinity", float("-inf"): "-Infinity"}.get(v, "NaN")
    if v == int(v) and abs(v) < 1e16:
        return f"{int(v)}.0"
    return repr(v)


def _rust_to_py_replacement(rep: str) -> str:
    # $1 → \1 (Java/Rust replacement syntax → Python re.sub)
    return _re.sub(r"\$(\d+)", r"\\\1", rep)


def _pretty(s: str) -> str:
    paragraphs = [" ".join(p.split()) for p in s.split("\n")]
    joined = "\n".join(p for p in paragraphs if p)
    return joined + "\n" if joined else ""


def _group_names(pat: str) -> list[str]:
    compiled = _re.compile(pat)
    names = {v: k for k, v in compiled.groupindex.items()}
    return [names.get(i, str(i)) for i in range(compiled.groups + 1)]


def _capture(v: str, pat: str):
    m = _re.search(pat, v)
    if m is None:
        return None
    names = _group_names(pat)
    out = {}
    for i, name in enumerate(names):
        g = m.group(i)
        out[name] = g if g else None  # empty == non-participating (divergence doc'd)
    return out


def _all_captures(v: str, pat: str):
    names = _group_names(pat)
    out = []
    for m in _re.finditer(pat, v):
        out.append({name: (m.group(i) if m.group(i) else None) for i, name in enumerate(names)})
    return out


def eval_chain(chain: tuple[Transformer, ...], v, t: Ty):
    for tr in chain:
        v = eval_transformer(tr, v, t)
        t = tr.type_of(t)
    return v


# ---------------------------------------------------------------- extractors


def eval_extractor(ex: Extractor, e: dict, elements: list[dict]):
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
        return (e.get("attrs") or {}).get(ex.attr)
    if op == "attrs":
        return dict(e.get("attrs") or {})
    if op == "classes":
        return list(e.get("classes") or [])
    if op == "id":
        return e.get("id")
    if op == "parent":
        if not e["path"]:
            return None
        return eval_extractor_expr(ex.inner, elements[e["path"][-1]], elements)
    if op == "children":
        kids = [c for c in elements if c["path"] and c["path"][-1] == e["pos"]]
        return [eval_extractor_expr(ex.inner, c, elements) for c in kids]
    if op in ("select-any", "select-all"):
        desc = [
            d
            for d in elements
            if e["pos"] in d["path"] and ex.selector.matches(d, elements)
        ]
        mapped = [eval_extractor_expr(ex.inner, d, elements) for d in desc]
        if op == "select-any":
            return mapped[0] if mapped else None
        return mapped
    raise NotImplementedError(op)


def eval_extractor_expr(xe: ExtractorExpr, e: dict | None, elements: list[dict]):
    if e is None:
        return None
    v = eval_extractor(xe.extractor, e, elements)
    return eval_chain(xe.chain, v, xe.extractor.type_of())


def eval_stream(xx: ExplodingExtractorExpr, elems: list[dict], elements: list[dict]):
    vals = [eval_extractor_expr(xx.expr, e, elements) for e in elems]
    if xx.explodes:
        out = []
        for v in vals:
            if v is not None:
                out.extend(v)
        return out
    return vals


# ---------------------------------------------------------------- aggregators


def eval_aggregator_expr(agg_expr: AggregatorExpr, elems: list[dict], elements: list[dict]):
    agg = agg_expr.aggregator
    if agg.op == "count":
        v = float(len(elems))
        t = agg.type_of()
    elif agg.op == "count-not-null":
        vals = eval_stream(agg.expr, elems, elements)
        v = float(sum(1 for x in vals if x is True))
        t = agg.type_of()
    elif agg.op == "first":
        vals = [x for x in eval_stream(agg.expr, elems, elements) if x is not None]
        v = vals[0] if vals else None
        t = agg.type_of()
    elif agg.op == "collect":
        v = eval_stream(agg.expr, elems, elements)
        t = agg.type_of()
    elif agg.op == "distinct":
        seen, v = set(), []
        for x in eval_stream(agg.expr, elems, elements):
            key = repr(x)
            if key not in seen:
                seen.add(key)
                v.append(x)
        t = agg.type_of()
    elif agg.op == "sum":
        v = float(sum(x for x in eval_stream(agg.expr, elems, elements) if x is not None))
        t = agg.type_of()
    elif agg.op == "group":
        # per element: its key(s) — many when the key !explodes — and
        # the element feeds each non-null key's sub-aggregator once per
        # key occurrence (aggregator.rs:237-248)
        per_elem = [eval_extractor_expr(agg.key.expr, e, elements) for e in elems]
        if agg.key.explodes:
            key_lists = [list(ks) if ks is not None else [] for ks in per_elem]
        else:
            key_lists = [[k] for k in per_elem]
        v = {}
        for k in sorted({k for ks in key_lists for k in ks if k is not None}):
            sub_elems = []
            for ks, e in zip(key_lists, elems):
                sub_elems.extend([e] * sum(1 for kk in ks if kk == k))
            v[k] = eval_aggregator_expr(agg.sub, sub_elems, elements)
        t = agg.type_of()
    else:
        raise NotImplementedError(agg.op)
    return eval_chain(agg_expr.chain, v, t)


def eval_rule_set(rs: RuleSet, elements: list[dict], url: str) -> dict:
    if rs.in_page is not None and _re.search(rs.in_page, url) is None:
        return {name: None for name, _ in rs.aggregators}
    elems = [e for e in elements if rs.selector.matches(e, elements)]
    return {
        name: eval_aggregator_expr(agg, elems, elements) for name, agg in rs.aggregators
    }
