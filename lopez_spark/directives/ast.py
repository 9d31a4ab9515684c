"""AST of the directives DSL + static type checking.

Mirrors the reference's expression structure exactly:
``aggregator( extractor transformer* [!explode] ) transformer*``
(``expressions/parse.rs:267-329``, ``aggregator.rs:13-25``,
``extractor.rs:13-33``, ``transformer.rs:118-160``), and the item set
``Seed | Boundary | Module | RuleSet | SetVariable | WebDriver``
(``directives/parse.rs:638-647``).

Typing rules ported from ``transformer.rs:220-310``,
``aggregator.rs:48-85``, ``extractor.rs:58-75``.  Documented
divergences from the reference (implemented *correctly* here, flagged
in tests): ``greater-or-equal`` is a real ``>=`` (reference evals ``>``
at ``transformer.rs:333-335``); numeric ``equals`` is exact (reference
is ±1e-6, ``:342-344``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .types import ANY, BOOL, NUMBER, STRING, Ty, TypeError_, array_of, map_of

# --------------------------------------------------------------- transformers


@dataclass(frozen=True)
class Transformer:
    op: str
    # payload depends on op: number(s), string(s), nested chain
    num: float | None = None
    num2: float | None = None
    nums: tuple[float, ...] | None = None
    s: str | None = None
    s2: str | None = None
    strs: tuple[str, ...] | None = None
    chain: "tuple[Transformer, ...] | None" = None

    def type_of(self, t: Ty) -> Ty:
        op = self.op
        if op in ("is-null", "is-not-null"):
            return BOOL  # accepts any input (transformer.rs:222-223)
        if op == "not":
            _req(t, BOOL, op)
            return BOOL
        if op == "hash":
            _req(t, STRING, op)
            return NUMBER
        if op == "as-number":
            _req(t, STRING, op)
            return NUMBER
        if op in ("greater-than", "lesser-than", "greater-or-equal", "lesser-or-equal"):
            _req(t, NUMBER, op)
            return BOOL
        if op == "between":
            _req(t, NUMBER, op)
            return BOOL
        if op == "equals-num" or op == "in-nums":
            _req(t, NUMBER, op)
            return BOOL
        if op == "length":
            if t.kind not in ("string", "array", "map"):
                raise TypeError_(f"length of {t}")
            return NUMBER
        if op == "is-empty":
            if t.kind not in ("string", "array", "map"):
                raise TypeError_(f"is-empty of {t}")
            return BOOL
        if op == "get-idx":
            if t.kind != "array":
                raise TypeError_(f"get <idx> of {t}")
            return t.inner
        if op == "get-key":
            if t.kind != "map":
                raise TypeError_(f'get "key" of {t}')
            return t.inner
        if op == "flatten":
            if t.kind != "array" or t.inner.kind != "array":
                raise TypeError_(f"flatten of {t}")
            return t.inner
        if op == "each":
            if t.kind == "array":
                return array_of(chain_type(self.chain, t.inner))
            if t.kind == "map":
                return map_of(chain_type(self.chain, t.inner))
            raise TypeError_(f"each of {t}")
        if op == "filter":
            if t.kind not in ("array", "map"):
                raise TypeError_(f"filter of {t}")
            inner_out = chain_type(self.chain, t.inner)
            _req(inner_out, BOOL, "filter chain")
            return t
        if op in ("any", "all"):
            if t.kind != "array":
                raise TypeError_(f"{op} of {t}")
            _req(chain_type(self.chain, t.inner), BOOL, f"{op} chain")
            return BOOL
        if op == "sort":
            if t.kind != "array":
                raise TypeError_(f"sort of {t}")
            return t
        if op == "sort-by":
            if t.kind != "array":
                raise TypeError_(f"sort-by of {t}")
            chain_type(self.chain, t.inner)
            return t
        if op == "as-string":
            if t.kind not in ("string", "number", "bool"):
                raise TypeError_(f"as-string of {t}")
            return STRING
        if op == "pretty":
            _req(t, STRING, op)
            return STRING
        if op == "equals-str" or op == "in-strs":
            _req(t, STRING, op)
            return BOOL
        if op == "capture":
            _req(t, STRING, op)
            return map_of(STRING)
        if op == "all-captures":
            _req(t, STRING, op)
            return array_of(map_of(STRING))
        if op == "matches":
            _req(t, STRING, op)
            return BOOL
        if op == "replace":
            _req(t, STRING, op)
            return STRING
        raise TypeError_(f"unknown transformer {op}")


def _req(t: Ty, want: Ty, what: str) -> None:
    if t != want and t != ANY:
        raise TypeError_(f"{what}: expected {want}, got {t}")


def chain_type(chain: tuple[Transformer, ...], t: Ty) -> Ty:
    for tr in chain:
        t = tr.type_of(t)
    return t


# ---------------------------------------------------------------- extractors


@dataclass(frozen=True)
class Extractor:
    op: str  # name|text|html|inner-html|attr|attrs|classes|id|parent|children|select-any|select-all
    attr: str | None = None
    inner: "ExtractorExpr | None" = None
    selector: "object | None" = None  # SelectorGroup

    def type_of(self) -> Ty:
        op = self.op
        if op in ("name", "text", "html", "inner-html", "id", "attr"):
            return STRING
        if op == "attrs":
            return map_of(STRING)
        if op == "classes":
            return array_of(STRING)
        if op == "parent":
            return self.inner.type_of()
        if op in ("children", "select-all"):
            return array_of(self.inner.type_of())
        if op == "select-any":
            return self.inner.type_of()
        raise TypeError_(f"unknown extractor {op}")


@dataclass(frozen=True)
class ExtractorExpr:
    extractor: Extractor
    chain: tuple[Transformer, ...] = ()

    def type_of(self) -> Ty:
        return chain_type(self.chain, self.extractor.type_of())


@dataclass(frozen=True)
class ExplodingExtractorExpr:
    expr: ExtractorExpr
    explodes: bool = False

    def type_of(self) -> Ty:
        t = self.expr.type_of()
        if self.explodes:
            if t.kind != "array":
                raise TypeError_(f"!explode of non-array {t}")
            return t.inner
        return t


# ---------------------------------------------------------------- aggregators


@dataclass(frozen=True)
class Aggregator:
    op: str  # count|count-not-null|first|collect|distinct|sum|group
    expr: ExplodingExtractorExpr | None = None
    key: ExplodingExtractorExpr | None = None
    sub: "AggregatorExpr | None" = None

    def type_of(self) -> Ty:
        op = self.op
        if op == "count":
            return NUMBER
        if op == "count-not-null":
            _req(self.expr.type_of(), BOOL, "count(expr)")
            return NUMBER
        if op == "first":
            return self.expr.type_of()
        if op in ("collect", "distinct"):
            return array_of(self.expr.type_of())
        if op == "sum":
            _req(self.expr.type_of(), NUMBER, "sum(expr)")
            return NUMBER
        if op == "group":
            _req(self.key.type_of(), STRING, "group key")
            return map_of(self.sub.type_of())
        raise TypeError_(f"unknown aggregator {op}")


@dataclass(frozen=True)
class AggregatorExpr:
    aggregator: Aggregator
    chain: tuple[Transformer, ...] = ()

    def type_of(self) -> Ty:
        return chain_type(self.chain, self.aggregator.type_of())


# --------------------------------------------------------------------- items


@dataclass(frozen=True)
class RuleSet:
    selector: object  # SelectorGroup
    aggregators: tuple[tuple[str, AggregatorExpr], ...]
    in_page: str | None = None  # url regex filter (directives.rs:584-590)


@dataclass(frozen=True)
class SetVariable:
    name: str
    value: object


@dataclass(frozen=True)
class Boundary:
    kind: str  # allow|disallow|frontier|use-param|ignore-param|use-all-params
    value: str | None = None


@dataclass(frozen=True)
class Directives:
    """Validated directive file: the IR (``Directives``,
    ``directives.rs:96-105``)."""

    seeds: tuple[str, ...] = ()
    boundaries: tuple[Boundary, ...] = ()
    rule_sets: tuple[RuleSet, ...] = ()
    variables: dict = field(default_factory=dict)
    webdriver_rules: tuple[str, ...] = ()  # parsed, not executed (S3 out of scope)

    def rules(self) -> list[tuple[str, Ty]]:
        """Absolute rule names + types (``Directives::rules``,
        ``directives.rs:450-471``)."""
        out = []
        for rs in self.rule_sets:
            for name, agg in rs.aggregators:
                out.append((name, agg.type_of()))
        return out
