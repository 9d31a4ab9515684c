"""DUST rule mining: detecting URL query parameters that never change
page content ("Do not crawl in the DUST: different URLs with similar
text", Bar-Yossef, Keidar & Schonfeld, WWW 2007).

A crawler at 10^10-URL scale wastes a large frontier fraction on
aliases — URLs that differ only in a session id, tracking tag, or
other content-free query parameter.  DustBuster's insight is that such
rules are *learnable from the crawl's own evidence*: if, across many
(base URL, parameter) groups on one host, varying the parameter's
value never changes the fetched content, the parameter is DUST and can
be stripped at link-clean time, collapsing the alias space before the
seen-set ever sees it.

The reference has no counterpart (lib-lopez canonicalizes
syntactically — lowercase host, sorted params, stripped fragments,
``lib-lopez/src/origins.rs`` — but never learns semantic parameter
irrelevance); this is the scale-path complement, in the same spirit as
the engine's spider-trap accounting (see ``driver_queries.py``
``crawl_trap_detect``).

Mining is two hash aggregations over (url, content signature) pairs —
the exact evidence a crawl wave already produces — and rule
application is a pure codegen regexp rewrite followed by the engine's
normal canonicalization gate.  No Python on either path.

Semantics (per host h, parameter name p):

* an *evidence group* is a (h, p, base) triple — ``base`` is the URL
  with the ``p=value`` pair removed — holding every observed value of
  p (including "absent", when a paramless twin of the base exists);
* a group *supports* the rule "strip p on h" when ≥2 distinct values
  of p map to exactly ONE distinct content signature;
* a group *refutes* it when its values map to >1 signature (the
  parameter provably carries content, e.g. ``?page=``);
* the rule holds when ``support ≥ min_support`` and refutations = 0 —
  DustBuster's "likely rule + refutation scan" collapsed into one
  aggregate because content signatures make the refutation test local
  to the group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: minimum supporting evidence groups before a rule is trusted — small
#: enough to fire on a per-host sample, large enough that one template
#: page can't establish a rule by itself.
MIN_SUPPORT = 8


def _host(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)


def parse_params(pages: DataFrame, url: str = "url") -> DataFrame:
    """Explode each URL into one row per query parameter.

    Adds (host, base, param_name, param_value); a URL with no query
    string yields one row with ``param_name = ''`` so paramless twins
    stay visible as evidence.  ``base`` is the URL with the parameter
    removed and the query separators re-normalized, i.e. the URL the
    strip rule would produce — group equality on it is exactly "these
    rows differ only in p".  Pure codegen string expressions; the
    explode is JVM-side.
    """
    u = F.col(url)
    qs = F.when(u.contains("?"), F.substring_index(u, "?", -1)).otherwise(F.lit(""))
    pre = F.substring_index(u, "?", 1)
    parsed = pages.withColumn("_pre", pre).withColumn(
        "_params",
        F.when(qs == "", F.array(F.lit(""))).otherwise(F.split(qs, "&")),
    )
    one = parsed.select(
        "*",
        F.explode("_params").alias("_pair"),
    )
    name = F.when(
        F.col("_pair") == "", F.lit("")
    ).otherwise(F.substring_index("_pair", "=", 1))
    # base = URL minus this pair: drop `p=v` plus one adjacent separator,
    # then normalize a dangling '?'/'&' left at the boundary
    base = F.when(F.col("_pair") == "", u).otherwise(
        F.regexp_replace(
            F.regexp_replace(
                u,
                F.concat(
                    F.lit("[?&]"),
                    F.regexp_replace("_pair", r"([^A-Za-z0-9])", r"\\$1"),
                ),
                "",
            ),
            r"^([^?]*)&",
            r"$1?",
        )
    )
    return one.select(
        *[c for c in pages.columns],
        _host(u).alias("host"),
        base.alias("base"),
        name.alias("param_name"),
        F.when(F.col("_pair") == "", F.lit("")).otherwise(
            F.substring_index("_pair", "=", -1)
        ).alias("param_value"),
    )


def mine_param_rules(
    pages: DataFrame,
    url: str = "url",
    content: str = "content_hash",
    min_support: int = MIN_SUPPORT,
) -> DataFrame:
    """(url, content signature) evidence → per-(host, param) DUST rules.

    Returns (host, param_name, support, counterexamples,
    is_irrelevant).  Scale shape: one parse/explode pass, then TWO hash
    aggregations — groupBy(host, param_name, base) for the evidence
    groups, groupBy(host, param_name) for the verdicts.  Both partial-
    aggregate map-side; nothing leaves the JVM.  At a 10^10 frontier
    the input is the (url, simhash) pair stream a wave already emits,
    so rule mining rides the crawl's own shuffle grain.
    """
    u = F.col(url)
    parsed = parse_params(pages, url=url)
    with_params = parsed.filter(F.col("param_name") != "")
    # paramless twins: a URL with no query string is evidence value ''
    # for EVERY parameter of its host — joining that in exactly requires
    # the (host, base) match the strip rule would create, which the
    # base column already encodes for single-param URLs; multi-param
    # absent-evidence is intentionally not synthesized (DustBuster §4.1
    # mines from observed pairs only).  Derived straight from the input
    # (a bare URL is its own base), skipping the explode branch.
    bare = pages.filter(~u.contains("?")).select(
        _host(u).alias("host"),
        u.alias("bare_base"),
        F.col(content).alias("bare_content"),
    )
    names = with_params.select("host", "param_name").distinct()
    bare_ev = bare.join(names, "host").select(
        "host",
        "param_name",
        F.col("bare_base").alias("base"),
        F.lit("").alias("param_value"),
        F.col("bare_content").alias("_content"),
    )
    ev = with_params.select(
        "host", "param_name", "base", "param_value", F.col(content).alias("_content")
    ).unionByName(bare_ev)
    groups = ev.groupBy("host", "param_name", "base").agg(
        F.countDistinct("param_value").alias("n_vals"),
        F.countDistinct("_content").alias("n_contents"),
    )
    return groups.groupBy("host", "param_name").agg(
        F.sum(
            F.when((F.col("n_vals") >= 2) & (F.col("n_contents") == 1), 1).otherwise(0)
        ).alias("support"),
        F.sum(F.when(F.col("n_contents") > 1, 1).otherwise(0)).alias(
            "counterexamples"
        ),
    ).select(
        "host",
        "param_name",
        F.col("support").cast("long").alias("support"),
        F.col("counterexamples").cast("long").alias("counterexamples"),
        (
            (F.col("support") >= min_support) & (F.col("counterexamples") == 0)
        ).alias("is_irrelevant"),
    )


def strip_irrelevant_params(
    links: DataFrame, rules: DataFrame, url: str = "url"
) -> DataFrame:
    """Apply mined DUST rules to a link stream: remove every
    (host, param) pair flagged ``is_irrelevant`` from matching URLs.

    The rules table is tiny (≤ params×hosts), so it collapses to one
    array of stripped names per host and broadcast-joins into the link
    stream — no shuffle on the big side.  The rewrite splits the query
    string once and drops flagged pairs with a JVM higher-order
    ``filter`` (all names stripped in one pass, so multi-param URLs
    need no iteration).  Downstream the engine's normal
    ``canonicalize`` (sorted params) runs as usual, so DUST stripping
    composes with — never replaces — syntactic canonicalization.
    """
    u = F.col(url)
    per_host = (
        rules.filter(F.col("is_irrelevant"))
        .groupBy("host")
        .agg(F.collect_set("param_name").alias("_strips"))
    )
    joined = links.withColumn("host", _host(u)).join(
        F.broadcast(per_host), "host", "left"
    )
    pre = F.substring_index(u, "?", 1)
    qs = F.substring_index(u, "?", -1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: ~F.array_contains(
            F.col("_strips"), F.substring_index(p, "=", 1)
        ),
    )
    rewritten = F.when(F.col("_strips").isNull() | ~u.contains("?"), u).otherwise(
        F.concat(
            pre,
            F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit("")),
        )
    )
    return joined.withColumn(url, rewritten).select(*links.columns)
