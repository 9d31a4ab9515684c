"""CSS selector subset (SURVEY §2.3 rule-set selectors).

The reference uses the full ``selectors`` crate over real HTML.  This
engine's element model is a struct array per page (document order =
array order), so selectors compile to predicates over element structs.

Supported subset (covers every selector in the reference's shipped
directives — std-lopez/*.lcd and examples/):
  * compound simple selectors: ``tag``, ``*``, ``.class``, ``#id``,
    ``[attr]``, ``[attr="v"]``, ``[attr^="v"]``, ``[attr$="v"]``,
    ``[attr*="v"]``, ``:not(<simple>)``
  * combinators: descendant (whitespace), child (``>``), adjacent
    sibling (``+``), general sibling (``~``) — mixed chains of any
    depth, exact ordered matching on both backends
  * selector groups: ``a, b``

Each selector provides BOTH a Python matcher (interpreter oracle /
test_url) and a Spark Column predicate builder (compiler) from the
same parsed form — parity by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


class SelectorError(Exception):
    pass


@dataclass(frozen=True)
class Simple:
    tag: str | None = None  # None = '*'
    id_: str | None = None
    classes: tuple[str, ...] = ()
    attrs: tuple[tuple[str, str, str | None], ...] = ()  # (name, op, value)
    nots: tuple["Simple", ...] = ()

    # ---- python matcher over an element dict
    def matches(self, e: dict) -> bool:
        if self.tag is not None and e["name"] != self.tag:
            return False
        if self.id_ is not None and e.get("id") != self.id_:
            return False
        for c in self.classes:
            if c not in (e.get("classes") or []):
                return False
        for name, op, value in self.attrs:
            actual = (e.get("attrs") or {}).get(name)
            if actual is None:
                return False
            if op == "=" and actual != value:
                return False
            if op == "^=" and not actual.startswith(value):
                return False
            if op == "$=" and not actual.endswith(value):
                return False
            if op == "*=" and value not in actual:
                return False
        return all(not n.matches(e) for n in self.nots)

    # ---- spark predicate over an element struct column
    def pred(self, e: Column) -> Column:
        conds = [F.lit(True)]
        if self.tag is not None:
            conds.append(e["name"] == self.tag)
        if self.id_ is not None:
            conds.append(e["id"] == self.id_)
        for c in self.classes:
            conds.append(F.array_contains(e["classes"], c))
        for name, op, value in self.attrs:
            a = F.try_element_at(e["attrs"], F.lit(name))
            conds.append(a.isNotNull())
            if op == "=":
                conds.append(a == value)
            elif op == "^=":
                conds.append(a.startswith(value))
            elif op == "$=":
                conds.append(a.endswith(value))
            elif op == "*=":
                conds.append(a.contains(value))
        for n in self.nots:
            conds.append(~n.pred(e))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out


@dataclass(frozen=True)
class Compound:
    """A full complex selector ``s1 c1 s2 c2 … sn``: ``chain`` of simple
    selectors joined by ``combinators`` (each of ``' '`` descendant,
    ``'>'`` child, ``'+'`` adjacent sibling, ``'~'`` general sibling);
    the target is ``chain[-1]``.  Matching is EXACT ordered CSS
    semantics in both backends — the Column predicate evaluates the same
    recursion the Python matcher does, via nested higher-order functions
    over the element array (siblinghood = equal ``path``, document
    order = ``pos``)."""

    chain: tuple[Simple, ...]
    combinators: tuple[str, ...] = ()  # len == len(chain) - 1

    def matches(self, e: dict, elements: list[dict]) -> bool:
        def match(i: int, el: dict) -> bool:
            if not self.chain[i].matches(el):
                return False
            if i == 0:
                return True
            c = self.combinators[i - 1]
            if c == ">":
                return bool(el["path"]) and match(i - 1, elements[el["path"][-1]])
            if c == " ":
                return any(match(i - 1, elements[p]) for p in el["path"])
            sibs = [
                s
                for s in elements
                if s["path"] == el["path"] and s["pos"] < el["pos"]
            ]
            if c == "+":
                return bool(sibs) and match(i - 1, sibs[-1])
            return any(match(i - 1, s) for s in sibs)  # '~'

        return match(len(self.chain) - 1, e)

    def pred(self, e: Column, elements: Column) -> Column:
        def pred_at(i: int, el: Column) -> Column:
            cond = self.chain[i].pred(el)
            if i == 0:
                return cond
            c = self.combinators[i - 1]
            if c == ">":
                parent = F.get(elements, F.try_element_at(el["path"], F.lit(-1)))
                return cond & F.coalesce(
                    F.when(parent.isNotNull(), pred_at(i - 1, parent)), F.lit(False)
                )
            if c == " ":
                return cond & F.exists(
                    el["path"], lambda p: pred_at(i - 1, F.get(elements, p))
                )
            sibs = F.filter(
                elements,
                lambda s: (s["path"] == el["path"]) & (s["pos"] < el["pos"]),
            )
            if c == "+":
                prev = F.try_element_at(sibs, F.lit(-1))
                return cond & F.coalesce(
                    F.when(prev.isNotNull(), pred_at(i - 1, prev)), F.lit(False)
                )
            return cond & F.exists(sibs, lambda s: pred_at(i - 1, s))  # '~'

        return pred_at(len(self.chain) - 1, e)


@dataclass(frozen=True)
class SelectorGroup:
    source: str
    compounds: tuple[Compound, ...] = ()

    def matches(self, e: dict, elements: list[dict]) -> bool:
        return any(c.matches(e, elements) for c in self.compounds)

    def pred(self, e: Column, elements: Column) -> Column:
        out = F.lit(False)
        for c in self.compounds:
            out = out | c.pred(e, elements)
        return out


_SIMPLE_TOKEN = re.compile(
    r"""(?P<tag>\*|[a-zA-Z][\w-]*)
      | \#(?P<id>[\w-]+)
      | \.(?P<cls>[\w-]+)
      | \[(?P<attr>[\w-]+)(?:(?P<op>[\^\$\*]?=)"(?P<val>[^"]*)")?\s*(?:i\s*)?\]
      | :not\((?P<not>[^)]*)\)
    """,
    re.VERBOSE,
)


def _parse_simple(s: str) -> Simple:
    s = s.strip()
    tag = None
    id_ = None
    classes: list[str] = []
    attrs: list[tuple[str, str, str | None]] = []
    nots: list[Simple] = []
    pos = 0
    while pos < len(s):
        m = _SIMPLE_TOKEN.match(s, pos)
        if not m:
            raise SelectorError(f"unsupported selector syntax at {s[pos:]!r} in {s!r}")
        if m.group("tag"):
            tag = None if m.group("tag") == "*" else m.group("tag")
        elif m.group("id"):
            id_ = m.group("id")
        elif m.group("cls"):
            classes.append(m.group("cls"))
        elif m.group("attr"):
            attrs.append((m.group("attr"), m.group("op") or "", m.group("val")))
        elif m.group("not") is not None:
            nots.append(_parse_simple(m.group("not")))
        pos = m.end()
    return Simple(tag, id_, tuple(classes), tuple(attrs), tuple(nots))


def parse_selector(source: str) -> SelectorGroup:
    compounds = []
    for alt in source.split(","):
        # tokenize on combinators, keeping explicit '>' '+' '~' markers;
        # bare whitespace between simples is the descendant combinator
        parts = re.split(r"\s*([>+~])\s*|\s+", alt.strip())
        parts = [p for p in parts if p]
        chain: list[Simple] = []
        combinators: list[str] = []
        pending: str | None = None
        for p in parts:
            if p in (">", "+", "~"):
                if not chain or pending is not None:
                    raise SelectorError(f"dangling combinator {p!r} in {alt!r}")
                pending = p
                continue
            if chain:
                combinators.append(pending or " ")
            pending = None
            chain.append(_parse_simple(p))
        if pending is not None:
            raise SelectorError(f"dangling combinator {pending!r} in {alt!r}")
        if not chain:
            raise SelectorError(f"empty selector in {source!r}")
        compounds.append(Compound(tuple(chain), tuple(combinators)))
    return SelectorGroup(source.strip(), tuple(compounds))
