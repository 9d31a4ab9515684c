"""Parser for ``.lcd`` directive files (operator S1).

Recursive-descent port of the reference's nom grammar
(``lib-lopez/src/directives/parse.rs``, ``expressions/parse.rs``):

  item      := import | seed | boundary | set-variable | webdriver | rule-set
  import    := "import" string ";"
  seed      := "seed" string ";"
  boundary  := ("allow"|"disallow"|"frontier") string ";"
             | "use" "param" (string | "*") ";" | "ignore" "param" string ";"
  set-var   := "set" ident "=" literal ";"
  webdriver := "use" "webdriver" "on" string ";"   (parsed; S3 out of scope)
  rule-set  := "select" ["in" string] css-selector "{" (ident ":" agg-expr ";")* "}"
  agg-expr  := aggregator transformer*
  aggregator:= "count" | ("count"|"first"|"collect"|"distinct"|"sum") "(" xx-expr ")"
             | "group" "(" xx-expr "," agg-expr ")"
  xx-expr   := extractor transformer* ["!explode"]

CSS selectors are captured with the reference's bracket-level scan
(``parse.rs:92-119``): read until the boundary char at bracket level 0.
Comments: ``//`` and ``///`` to end of line.

Module resolution: ``import "super.seo"`` resolves like the reference's
module paths (``directives.rs:67-84``) against the importing file's
directory; each module is loaded once.
"""

from __future__ import annotations

import os
import re

from .ast import (
    Aggregator,
    AggregatorExpr,
    Boundary,
    Directives,
    ExplodingExtractorExpr,
    Extractor,
    ExtractorExpr,
    RuleSet,
    SetVariable,
    Transformer,
)
from .selector import parse_selector


class ParseError(Exception):
    pass


_IDENT = re.compile(r"[A-Za-z][A-Za-z0-9_-]*")
_NUMBER = re.compile(r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


class _P:
    def __init__(self, src: str):
        self.src = src
        self.pos = 0

    # ------------------------------------------------------------- low level
    def ws(self) -> None:
        while self.pos < len(self.src):
            c = self.src[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif self.src.startswith("//", self.pos):
                nl = self.src.find("\n", self.pos)
                self.pos = len(self.src) if nl < 0 else nl + 1
            else:
                return

    def eof(self) -> bool:
        self.ws()
        return self.pos >= len(self.src)

    def peek_word(self) -> str:
        self.ws()
        m = _IDENT.match(self.src, self.pos)
        return m.group(0) if m else ""

    def try_tag(self, tag: str) -> bool:
        self.ws()
        if self.src.startswith(tag, self.pos):
            # keyword tags must not run into identifier chars
            end = self.pos + len(tag)
            if tag[-1].isalnum() and end < len(self.src) and (
                self.src[end].isalnum() or self.src[end] in "_-"
            ):
                return False
            self.pos = end
            return True
        return False

    def expect(self, tag: str) -> None:
        if not self.try_tag(tag):
            raise ParseError(f"expected {tag!r} at ...{self.src[self.pos:self.pos + 40]!r}")

    def string(self) -> str:
        self.ws()
        if self.pos >= len(self.src) or self.src[self.pos] != '"':
            raise ParseError(f"expected string at ...{self.src[self.pos:self.pos + 40]!r}")
        out = []
        i = self.pos + 1
        while i < len(self.src):
            c = self.src[i]
            if c == "\\" and i + 1 < len(self.src):
                nxt = self.src[i + 1]
                if nxt in ('"', "\\"):
                    out.append(nxt)
                elif nxt in ("n", "t", "r"):
                    out.append({"n": "\n", "t": "\t", "r": "\r"}[nxt])
                else:
                    # regex escapes like \. \? \d pass through verbatim
                    out.append(c + nxt)
                i += 2
            elif c == '"':
                self.pos = i + 1
                return "".join(out)
            else:
                out.append(c)
                i += 1
        raise ParseError("unterminated string")

    def number(self) -> float:
        self.ws()
        m = _NUMBER.match(self.src, self.pos)
        if not m:
            raise ParseError(f"expected number at ...{self.src[self.pos:self.pos + 40]!r}")
        self.pos = m.end()
        return float(m.group(0))

    def ident(self) -> str:
        self.ws()
        m = _IDENT.match(self.src, self.pos)
        if not m:
            raise ParseError(f"expected identifier at ...{self.src[self.pos:self.pos + 40]!r}")
        self.pos = m.end()
        return m.group(0)

    def css_until(self, boundary: str) -> str:
        """Bracket-level scan (parse.rs:92-119)."""
        self.ws()
        level = 0
        i = self.pos
        while i < len(self.src) and (level != 0 or self.src[i] != boundary):
            if self.src[i] == "[":
                level += 1
            elif self.src[i] == "]":
                level -= 1
            i += 1
        if i == self.pos:
            raise ParseError(f"expected css selector at ...{self.src[self.pos:self.pos + 40]!r}")
        out = self.src[self.pos : i].strip()
        self.pos = i
        return out

    # ---------------------------------------------------------- transformers
    _T0 = {
        "is-null": "is-null",
        "is-not-null": "is-not-null",
        "hash": "hash",
        "not": "not",
        "as-number": "as-number",
        "length": "length",
        "is-empty": "is-empty",
        "flatten": "flatten",
        "sort-by": None,  # handled via chain ops
        "sort": "sort",
        "as-string": "as-string",
        "pretty": "pretty",
    }

    def transformer(self) -> Transformer | None:
        self.ws()
        w = self.peek_word()
        if not w:
            return None
        # nullary (longest-first where prefixes collide)
        for name in (
            "is-not-null",
            "is-null",
            "hash",
            "as-number",
            "not",
            "length",
            "is-empty",
            "flatten",
            "as-string",
            "pretty",
        ):
            if w == name:
                self.try_tag(name)
                return Transformer(name)
        if w == "sort-by":
            self.try_tag("sort-by")
            self.expect("(")
            chain = self.transformer_chain()
            self.expect(")")
            return Transformer("sort-by", chain=chain)
        if w == "sort":
            self.try_tag("sort")
            return Transformer("sort")
        if w in ("greater-than", "lesser-than", "greater-or-equal", "lesser-or-equal"):
            self.try_tag(w)
            return Transformer(w, num=self.number())
        if w == "between":
            self.try_tag("between")
            lo = self.number()
            self.expect("and")
            return Transformer("between", num=lo, num2=self.number())
        if w == "equals":
            self.try_tag("equals")
            self.ws()
            if self.src[self.pos] == '"':
                return Transformer("equals-str", s=self.string())
            return Transformer("equals-num", num=self.number())
        if w == "in":
            self.try_tag("in")
            self.expect("[")
            self.ws()
            if self.src[self.pos] == '"':
                items_s = [self.string()]
                while self.try_tag(","):
                    items_s.append(self.string())
                self.expect("]")
                return Transformer("in-strs", strs=tuple(items_s))
            items_n = []
            self.ws()
            if self.src[self.pos] != "]":
                items_n.append(self.number())
                while self.try_tag(","):
                    items_n.append(self.number())
            self.expect("]")
            return Transformer("in-nums", nums=tuple(items_n))
        if w == "get":
            self.try_tag("get")
            self.ws()
            if self.src[self.pos] == '"':
                return Transformer("get-key", s=self.string())
            n = self.number()
            if n != int(n):
                raise ParseError("get <idx> must be an integer")
            return Transformer("get-idx", num=n)
        if w in ("each", "filter", "any", "all"):
            self.try_tag(w)
            self.expect("(")
            chain = self.transformer_chain()
            self.expect(")")
            return Transformer(w, chain=chain)
        if w in ("capture", "all-captures", "matches"):
            self.try_tag(w)
            return Transformer(w, s=self.string())
        if w == "replace":
            self.try_tag("replace")
            pat = self.string()
            self.expect("with")
            return Transformer("replace", s=pat, s2=self.string())
        return None

    def transformer_chain(self) -> tuple[Transformer, ...]:
        out = []
        while True:
            save = self.pos
            t = self.transformer()
            if t is None:
                self.pos = save
                return tuple(out)
            out.append(t)

    # ------------------------------------------------------------ extractors
    def extractor(self) -> Extractor:
        w = self.peek_word()
        for name in ("inner-html", "name", "text", "html", "attrs", "classes", "id"):
            if w == name:
                self.try_tag(name)
                return Extractor(name)
        if w == "attr":
            self.try_tag("attr")
            return Extractor("attr", attr=self.string())
        if w in ("parent", "children"):
            self.try_tag(w)
            self.expect("(")
            inner = self.extractor_expr()
            self.expect(")")
            return Extractor(w, inner=inner)
        if w in ("select-any", "select-all"):
            self.try_tag(w)
            self.expect("(")
            inner = self.extractor_expr()
            self.expect(",")
            sel = parse_selector(self.css_until(")"))
            self.expect(")")
            return Extractor(w, inner=inner, selector=sel)
        raise ParseError(f"expected extractor at ...{self.src[self.pos:self.pos + 40]!r}")

    def extractor_expr(self) -> ExtractorExpr:
        ex = self.extractor()
        return ExtractorExpr(ex, self.transformer_chain())

    def exploding_expr(self) -> ExplodingExtractorExpr:
        expr = self.extractor_expr()
        explodes = self.try_tag("!explode")
        return ExplodingExtractorExpr(expr, explodes)

    # ------------------------------------------------------------ aggregators
    def aggregator(self) -> Aggregator:
        w = self.peek_word()
        if w == "count":
            self.try_tag("count")
            if self.try_tag("("):
                expr = self.exploding_expr()
                self.expect(")")
                return Aggregator("count-not-null", expr=expr)
            return Aggregator("count")
        if w in ("first", "collect", "distinct", "sum"):
            self.try_tag(w)
            self.expect("(")
            expr = self.exploding_expr()
            self.expect(")")
            return Aggregator(w, expr=expr)
        if w == "group":
            self.try_tag("group")
            self.expect("(")
            key = self.exploding_expr()
            self.expect(",")
            sub = self.aggregator_expr()
            self.expect(")")
            return Aggregator("group", key=key, sub=sub)
        raise ParseError(f"expected aggregator at ...{self.src[self.pos:self.pos + 40]!r}")

    def aggregator_expr(self) -> AggregatorExpr:
        agg = self.aggregator()
        return AggregatorExpr(agg, self.transformer_chain())

    # ----------------------------------------------------------------- items
    def literal(self):
        self.ws()
        if self.src[self.pos] == '"':
            return self.string()
        if self.try_tag("true"):
            return True
        if self.try_tag("false"):
            return False
        return self.number()

    def rule_set(self, module: str) -> RuleSet:
        in_page = None
        if self.try_tag("in"):
            in_page = self.string()
        sel = parse_selector(self.css_until("{"))
        self.expect("{")
        aggs = []
        names = set()
        while not self.try_tag("}"):
            name = self.ident()
            self.expect(":")
            agg = self.aggregator_expr()
            self.expect(";")
            full = f"{module}.{name}" if module else name
            if full in names:
                raise ParseError(f"rule `{full}` defined more than once")
            names.add(full)
            aggs.append((full, agg))
        return RuleSet(sel, tuple(aggs), in_page)


def parse_items(src: str, module: str = "") -> dict:
    """Parse one module's items (no import resolution)."""
    p = _P(src)
    out = {
        "imports": [],
        "seeds": [],
        "boundaries": [],
        "rule_sets": [],
        "variables": {},
        "webdriver": [],
    }
    while not p.eof():
        w = p.peek_word()
        if w == "import":
            p.expect("import")
            out["imports"].append(p.string())
            p.expect(";")
        elif w == "seed":
            p.expect("seed")
            out["seeds"].append(p.string())
            p.expect(";")
        elif w in ("allow", "disallow", "frontier"):
            p.expect(w)
            out["boundaries"].append(Boundary(w, p.string()))
            p.expect(";")
        elif w == "use":
            p.expect("use")
            if p.try_tag("webdriver"):
                p.expect("on")
                out["webdriver"].append(p.string())
                p.expect(";")
            else:
                p.expect("param")
                p.ws()
                if p.try_tag("*"):
                    out["boundaries"].append(Boundary("use-all-params"))
                else:
                    out["boundaries"].append(Boundary("use-param", p.string()))
                p.expect(";")
        elif w == "ignore":
            p.expect("ignore")
            p.expect("param")
            out["boundaries"].append(Boundary("ignore-param", p.string()))
            p.expect(";")
        elif w == "set":
            p.expect("set")
            name = p.ident()
            p.expect("=")
            out["variables"][name] = p.literal()
            p.expect(";")
        elif w == "select":
            p.expect("select")
            out["rule_sets"].append(p.rule_set(module))
        else:
            raise ParseError(f"unexpected item at ...{p.src[p.pos:p.pos + 60]!r}")
    return out


def load_directives(
    path: str,
    search_paths: tuple[str, ...] = (),
    _seen: set | None = None,
    _module: str = "",
) -> Directives:
    """``Directives::load`` (``directives.rs:372-394``): parse + resolve
    transitive imports + validate (type-check every rule).  Imports
    resolve against the importing file's directory, then
    ``search_paths``, then a sibling ``std-lopez/`` directory (the
    reference installs its stdlib on a search path via entalator)."""
    _seen = _seen if _seen is not None else set()
    real = os.path.realpath(path)

    merged = {"seeds": [], "boundaries": [], "rule_sets": [], "variables": {}, "webdriver": []}

    def load_module(p: str, module: str):
        rp = os.path.realpath(p)
        if rp in _seen:
            return
        _seen.add(rp)
        with open(rp) as f:
            items = parse_items(f.read(), module)
        for imp in items["imports"]:
            # module path: "super.frontiers.internet-archives" →
            # frontiers/internet-archives.lcd relative to the search roots
            # (`super`/`root` prefixes collapse to the importing dir /
            # stdlib root — directives.rs:67-84)
            segs = [s for s in imp.split(".") if s not in ("super", "root")]
            rel = os.path.join(*segs) + ".lcd"
            here = os.path.dirname(rp)
            candidates = [os.path.join(here, rel)]
            candidates += [os.path.join(sp, rel) for sp in search_paths]
            candidates.append(os.path.join(here, "..", "std-lopez", rel))
            for cand in candidates:
                if os.path.exists(cand):
                    load_module(cand, segs[-1])
                    break
            else:
                raise ParseError(f"cannot resolve import {imp!r} from {rp}")
        merged["seeds"].extend(items["seeds"])
        merged["boundaries"].extend(items["boundaries"])
        merged["rule_sets"].extend(items["rule_sets"])
        merged["variables"].update(items["variables"])
        merged["webdriver"].extend(items["webdriver"])

    load_module(real, _module)
    d = Directives(
        seeds=tuple(merged["seeds"]),
        boundaries=tuple(merged["boundaries"]),
        rule_sets=tuple(merged["rule_sets"]),
        variables=merged["variables"],
        webdriver_rules=tuple(merged["webdriver"]),
    )
    validate(d)
    return d


def parse_directives(src: str) -> Directives:
    """Parse a single-module directive string (no imports) + validate."""
    items = parse_items(src)
    if items["imports"]:
        raise ParseError("imports need load_directives(path)")
    d = Directives(
        seeds=tuple(items["seeds"]),
        boundaries=tuple(items["boundaries"]),
        rule_sets=tuple(items["rule_sets"]),
        variables=items["variables"],
        webdriver_rules=tuple(items["webdriver"]),
    )
    validate(d)
    return d


KNOWN_VARIABLES = {
    # name: (python type check, default) — variable.rs:61-141
    "user_agent": str,
    "quota": float,
    "max_depth": float,
    "max_hits_per_sec": float,
    "request_timeout": float,
    "max_body_size": float,
    "enable_page_rank": bool,
}


def validate(d: Directives) -> None:
    """Semantic analysis (``directives.rs:297-369``): type-check every
    rule, check set-variables, compile boundary regexes."""
    for name, agg in [(n, a) for rs in d.rule_sets for (n, a) in rs.aggregators]:
        agg.type_of()  # raises TypeError_ on mismatch
    for name, value in d.variables.items():
        if name not in KNOWN_VARIABLES:
            raise ParseError(f"unknown variable `{name}`")
        want = KNOWN_VARIABLES[name]
        if not isinstance(value, want) or (want is float and isinstance(value, bool)):
            raise ParseError(f"variable `{name}`: expected {want.__name__}")
    for b in d.boundaries:
        if b.kind in ("allow", "disallow", "frontier"):
            re.compile(b.value)


def to_crawl_config(d: Directives, **overrides):
    """Directives → CrawlConfig (the reference's
    ``DirectivesConfiguration``, ``directives/mod.rs:87-160``)."""
    from ..crawler.config import Boundaries as CfgBoundaries
    from ..crawler.config import CrawlConfig
    from ..urlnorm import ParamPolicy

    allow = tuple(b.value for b in d.boundaries if b.kind == "allow")
    disallow = tuple(b.value for b in d.boundaries if b.kind == "disallow")
    frontier = tuple(b.value for b in d.boundaries if b.kind == "frontier")
    use_all = any(b.kind == "use-all-params" for b in d.boundaries)
    use = frozenset(b.value for b in d.boundaries if b.kind == "use-param")
    ignore = frozenset(b.value for b in d.boundaries if b.kind == "ignore-param")

    v = d.variables
    kwargs = dict(
        seeds=tuple(d.seeds),
        boundaries=CfgBoundaries(
            allowed=allow,
            disallowed=disallow,
            frontier=frontier,
            params=ParamPolicy(use_all=use_all, use=use, ignore=ignore),
        ),
        quota=int(v.get("quota", 1000)),
        max_depth=int(v.get("max_depth", 7)),
        max_hits_per_sec=float(v.get("max_hits_per_sec", 2.5)),
        request_timeout=float(v.get("request_timeout", 60.0)),
        max_body_size=int(v.get("max_body_size", 10_000_000)),
        enable_page_rank=bool(v.get("enable_page_rank", True)),
        user_agent=str(v.get("user_agent", "lopez-spark/0.1")),
    )
    kwargs.update(overrides)
    return CrawlConfig(**kwargs)
