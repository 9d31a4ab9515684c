"""Public Suffix List compiler: a rule list (publicsuffix.org/list/
format — plain suffixes, ``*.`` wildcards, ``!`` exceptions) compiled
to pure-SQL expressions implementing the PSL longest-match algorithm,
shared VERBATIM between Spark plans (via ``F.expr``) and DuckDB
oracles.

Registrable-domain (eTLD+1) granularity is where a real crawler runs
politeness, quotas, and trap budgets — hostname granularity is useless
against blogspot-style subdomain farms, and the reference only has
per-host ``max_hits_per_sec``.  The full PSL is ~10k rules; compiled
here they become CASE/IN whole-stage-codegen expressions (the
broadcast-join degenerate form — IN lists compile to hash-set probes),
so extraction costs ZERO shuffles at any corpus size.

Algorithm (publicsuffix.org spec): among all rules matching a host
label-suffix-wise, an exception rule prevails outright (its suffix is
the rule minus its leading label); otherwise the longest rule
prevails; if none match, the implicit default rule ``*`` makes the
bare TLD the suffix.  The registrable domain is the suffix plus one
preceding label — absent when the host IS a suffix.

Engine surface of the oracle-gated ``crawl_etld1_domains`` query
(plans/driver_queries.py), which compiles its embedded rule subset —
including the spec's own canonical wildcard/exception examples
``*.ck`` / ``!www.ck`` — through this module for BOTH engines."""

from __future__ import annotations

from dataclasses import dataclass


def _nlabels(rule: str) -> int:
    return rule.count(".") + 1


def _quote(v: str) -> str:
    if "'" in v or "\\" in v or any(c.isspace() for c in v):
        raise ValueError(f"malformed PSL rule: {v!r}")
    return f"'{v}'"


@dataclass(frozen=True)
class PslExprs:
    """SQL expression strings implementing the PSL match.  Apply in
    stages (each expression references columns produced by the
    previous one, mirroring a CTE chain):

    1. ``nlabels`` + ``labels[i]`` → columns ``nlabels``, ``s<i>``
       (computed over column ``host``)
    2. ``suffix_len`` → column ``suffix_len`` (over ``s<i>``/``nlabels``)
    3. ``public_suffix`` / ``etld1`` (over ``suffix_len`` + ``s<i>``;
       ``etld1`` is ``''`` when the host IS a public suffix)
    """

    nlabels: str
    labels: dict[int, str]
    suffix_len: str
    public_suffix: str
    etld1: str


def compile_psl(rules: list[str] | tuple[str, ...]) -> PslExprs:
    """Compile PSL rules to the staged SQL expressions above.

    Supports every rule class of the spec: plain rules of any label
    count, ``*.tail`` wildcards (one extra label beyond ``tail``), and
    ``!rule`` exceptions (prevail outright; effective suffix drops the
    leading label).  Rules are trusted literals from code/config —
    quotes and whitespace are rejected, not escaped."""
    exceptions: list[str] = []
    normals: dict[int, list[str]] = {}
    wilds: dict[int, list[str]] = {}
    for r in rules:
        if r.startswith("!"):
            exceptions.append(r[1:])
        elif r.startswith("*."):
            tail = r[2:]
            wilds.setdefault(_nlabels(tail) + 1, []).append(tail)
        elif r:
            normals.setdefault(_nlabels(r), []).append(r)

    # deepest label suffix any expression needs: the longest matching
    # rule, plus one more label for the registrable domain
    max_rule = max(
        [1]
        + [_nlabels(e) for e in exceptions]
        + list(normals)
        + list(wilds)
    )
    deepest = max_rule + 1

    nlabels = "(length(host) - length(replace(host, '.', '')) + 1)"
    labels: dict[int, str] = {}
    for i in range(1, deepest + 1):
        pat = "([^.]+" + "[.][^.]+" * (i - 1) + ")$"
        ex = f"NULLIF(regexp_extract(host, '{pat}', 1), '')"
        labels[i] = (
            f"COALESCE({ex}, host)" if i == 1 else f"COALESCE({ex}, '')"
        )

    branches: list[str] = []
    # exception rules prevail over everything (spec step: "if more
    # than one rule matches, the prevailing rule is the exception")
    for e in sorted(exceptions):
        le = _nlabels(e)
        branches.append(f"WHEN s{le} = {_quote(e)} THEN {le - 1}")
    # then the longest match, wildcards counted at their full length
    for le in sorted(set(normals) | set(wilds), reverse=True):
        conds: list[str] = []
        if le in normals:
            vals = ", ".join(_quote(v) for v in sorted(normals[le]))
            conds.append(f"s{le} IN ({vals})")
        for tail in sorted(wilds.get(le, [])):
            conds.append(
                f"(s{le - 1} = {_quote(tail)} AND nlabels >= {le})"
            )
        branches.append(f"WHEN {' OR '.join(conds)} THEN {le}")
    # implicit default rule '*': the bare TLD is the suffix
    suffix_len = "CASE " + " ".join(branches) + " ELSE 1 END"

    def _pick(base: int) -> str:
        # s<suffix_len + base> without dynamic indexing
        out = f"s{1 + base}"
        for le in range(2, max_rule + 1):
            out = f"CASE WHEN suffix_len = {le} THEN s{le + base} ELSE {out} END"
        return out

    public_suffix = _pick(0)
    etld1 = (
        f"CASE WHEN nlabels > suffix_len THEN {_pick(1)} ELSE '' END"
    )
    return PslExprs(
        nlabels=nlabels,
        labels=labels,
        suffix_len=suffix_len,
        public_suffix=public_suffix,
        etld1=etld1,
    )


def with_registrable_domain(df, rules, host_col: str = "host"):
    """Spark-side convenience: add ``public_suffix`` and ``etld1``
    columns to a DataFrame with a host column — all whole-stage-codegen
    expressions, zero shuffles, intermediates dropped."""
    from pyspark.sql import functions as F

    e = compile_psl(rules)
    out_cols = list(df.columns) + ["public_suffix", "etld1"]
    staged = df
    if host_col != "host":
        staged = staged.withColumn("host", F.col(host_col))
    staged = staged.withColumn("nlabels", F.expr(e.nlabels))
    for i, expr in e.labels.items():
        staged = staged.withColumn(f"s{i}", F.expr(expr))
    staged = (
        staged.withColumn("suffix_len", F.expr(e.suffix_len))
        .withColumn("public_suffix", F.expr(e.public_suffix))
        .withColumn("etld1", F.expr(e.etld1))
    )
    return staged.select(*out_cols)
