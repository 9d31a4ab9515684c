"""PSL compiler (lopez_spark/psl.py): the publicsuffix.org algorithm's
canonical vectors (incl. the spec's own wildcard `*.ck` / exception
`!www.ck` examples), cross-engine agreement (the compiled SQL must
evaluate identically in Spark and DuckDB), deeper-than-gate rule
depths, and malformed-rule rejection."""

from __future__ import annotations

import duckdb
import pytest

from lopez_spark.psl import compile_psl, with_registrable_domain

RULES = (
    "com", "org", "net", "io", "uk", "jp", "au", "de",
    "co.uk", "ac.uk", "co.jp", "com.au", "github.io",
    "*.ck", "!www.ck",
)

# host -> (public_suffix, etld1); '' = no registrable domain.
# Vectors follow the PSL spec's checkPublicSuffix examples where our
# rule subset covers them.
VECTORS = {
    "example.com": ("com", "example.com"),
    "www.example.com": ("com", "example.com"),
    "a.b.example.com": ("com", "example.com"),
    "example.ck": ("example.ck", ""),  # wildcard: host IS the suffix
    "www.example.ck": ("example.ck", "www.example.ck"),
    "www.ck": ("ck", "www.ck"),  # exception beats the wildcard
    "www.www.ck": ("ck", "www.ck"),
    "ac.uk": ("ac.uk", ""),
    "foo.ac.uk": ("ac.uk", "foo.ac.uk"),
    "a.b.foo.ac.uk": ("ac.uk", "foo.ac.uk"),
    "user.github.io": ("github.io", "user.github.io"),
    "a.user.github.io": ("github.io", "user.github.io"),
    "example.test": ("test", "example.test"),  # implicit default rule
    "localhost": ("localhost", ""),
    "shop.co.uk": ("co.uk", "shop.co.uk"),
    "uk": ("uk", ""),
}


def _duckdb_eval(rules, hosts):
    e = compile_psl(rules)
    labels = ", ".join(f"{x} AS s{i}" for i, x in e.labels.items())
    names = ", ".join(f"s{i}" for i in e.labels)
    values = ", ".join(f"('{h}')" for h in hosts)
    sql = f"""
    WITH hosts(host) AS (VALUES {values}),
    lab AS (SELECT host, {e.nlabels} AS nlabels, {labels} FROM hosts),
    ruled AS (SELECT host, nlabels, {names}, {e.suffix_len} AS suffix_len FROM lab)
    SELECT host, {e.public_suffix} AS ps, {e.etld1} AS e1 FROM ruled
    """
    return {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}


def test_spec_vectors_duckdb():
    got = _duckdb_eval(RULES, list(VECTORS))
    assert got == VECTORS


def test_cross_engine_agreement(spark):
    hosts = list(VECTORS)
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    sgot = {
        r["host"]: (r["public_suffix"], r["etld1"])
        for r in with_registrable_domain(df, RULES).collect()
    }
    assert sgot == VECTORS == _duckdb_eval(RULES, hosts)


def test_deeper_rules_than_gate():
    rules = ("c", "b.c", "a.b.c", "*.w.c", "!x.w.c")
    vec = {
        "a.b.c": ("a.b.c", ""),
        "x.a.b.c": ("a.b.c", "x.a.b.c"),
        "y.x.a.b.c": ("a.b.c", "x.a.b.c"),
        "b.c": ("b.c", ""),
        "q.b.c": ("b.c", "q.b.c"),
        "z.w.c": ("z.w.c", ""),  # wildcard at depth 3
        "p.z.w.c": ("z.w.c", "p.z.w.c"),
        "x.w.c": ("w.c", "x.w.c"),  # exception drops a label
    }
    assert _duckdb_eval(rules, list(vec)) == vec


def test_malformed_rules_rejected():
    for bad in ("o'reilly.com", "a b.com", "x\\y.com"):
        with pytest.raises(ValueError):
            compile_psl((bad,))
