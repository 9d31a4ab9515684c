"""Golden vectors for F10/F11: the reference's own checked_join test
(``lib-lopez/src/crawler/worker/mod.rs:124-134``) plus canonicalization
cases mandated by the north rule."""

from lopez_spark.urlnorm import (
    DROP_ALL_PARAMS,
    KEEP_ALL_PARAMS,
    ParamPolicy,
    canonicalize,
    checked_join,
    join_and_canonicalize,
    origin_of,
)


def test_checked_join_reference_vector():
    # worker/mod.rs:124-134
    assert (
        checked_join("https://querobolsa.com.br/mba", "/revista/assunto/especiais")
        == "https://querobolsa.com.br/revista/assunto/especiais"
    )


def test_checked_join_rejects():
    base = "https://example.com/page"
    assert checked_join(base, "") is None
    assert checked_join(base, "#section") is None
    assert checked_join(base, "mailto:a@b.c") is None
    assert checked_join(base, "ftp://example.com/f") is None
    assert checked_join(base, "http://127.0.0.1/x") is None  # IP: no domain
    assert checked_join(base, "relative/path") == "https://example.com/relative/path"


def test_canonicalize_lowercases_host_strips_fragment():
    assert (
        canonicalize("HTTPS://ExAmPle.COM:443/Path?b=2&a=1#frag", KEEP_ALL_PARAMS)
        == "https://example.com/Path?a=1&b=2"
    )


def test_canonicalize_sorts_and_filters_params():
    pol = ParamPolicy(use_all=True, ignore=frozenset({"utm_source"}))
    assert (
        canonicalize("http://a.com/x?z=1&utm_source=t&a=2", pol) == "http://a.com/x?a=2&z=1"
    )
    only = ParamPolicy(use=frozenset({"id"}))
    assert canonicalize("http://a.com/x?z=1&id=5", only) == "http://a.com/x?id=5"
    # empty query dropped (directives.rs:565-570)
    assert canonicalize("http://a.com/x?z=1", DROP_ALL_PARAMS) == "http://a.com/x"


def test_canonicalize_default_port_and_empty_path():
    assert canonicalize("http://a.com:80", KEEP_ALL_PARAMS) == "http://a.com/"
    assert canonicalize("http://a.com:8080/x", KEEP_ALL_PARAMS) == "http://a.com:8080/x"


def test_canonicalize_rejects_non_http():
    assert canonicalize("ftp://a.com/x") is None
    assert canonicalize("http://192.168.0.1/x") is None
    assert canonicalize("not a url") is None


def test_join_and_canonicalize_pipeline():
    assert (
        join_and_canonicalize("https://H0.Example.Test/a", "img-7#f", DROP_ALL_PARAMS)
        == "https://h0.example.test/img-7"
    )


def test_origin_of():
    assert origin_of("https://h3.example.test/img-1") == "https://h3.example.test"
