"""Property-based tests (hypothesis) for the pure kernels the whole
engine leans on: canonicalization, pretty, robots matching, bloom."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lopez_spark.crawler.robots import RobotExclusion, _Rule
from lopez_spark.directives.interpreter import _pretty
from lopez_spark.operators.seen import BloomFilter64
from lopez_spark.urlnorm import KEEP_ALL_PARAMS, canonicalize

url_paths = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters="/-._~"),
    max_size=40,
)
hosts = st.from_regex(r"[a-z]{1,10}\.[a-z]{2,5}", fullmatch=True)


@given(hosts, url_paths)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_canonicalize_idempotent(host, path):
    url = f"https://{host}/{path}"
    c1 = canonicalize(url, KEEP_ALL_PARAMS)
    if c1 is not None:
        assert canonicalize(c1, KEEP_ALL_PARAMS) == c1


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None, derandomize=True)
def test_pretty_idempotent_and_shaped(s):
    p = _pretty(s)
    assert _pretty(p) == p  # fixpoint
    if p:
        assert p.endswith("\n") and not p.endswith("\n\n")
        for line in p[:-1].split("\n"):
            assert line == " ".join(line.split()) and line != ""


@given(st.text(alphabet="ab*/x", min_size=1, max_size=12), st.text(alphabet="abx/", max_size=20))
@settings(max_examples=300, deadline=None, derandomize=True)
def test_robots_rule_never_crashes_and_prefix_rule_holds(pattern, route):
    r = _Rule.parse(pattern)
    r.matches(route)  # never raises
    # plain prefix rules (no wildcard/anchor) match iff route contains them
    if "*" not in pattern and not pattern.endswith("$") and pattern:
        assert _Rule.parse(pattern).matches(route) == (pattern in route)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None, derandomize=True)
def test_bloom_never_false_negative(keys):
    bf = BloomFilter64(capacity=1000, fpp=0.05)
    arr = np.array(keys, dtype=np.int64)
    bf.add_many(arr)
    assert bf.might_contain_many(arr).all()


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None, derandomize=True)
def test_robots_parser_never_crashes(junk):
    r = RobotExclusion("User-agent: *\n" + junk)
    r.allows("http://x.com/path")


# --------------------------------------------------------- fast-path contract

fastpath_urls = st.from_regex(
    r"https://[a-z0-9-]{1,8}(\.[a-z0-9-]{1,6}){1,3}/[A-Za-z0-9/\-._~]{0,20}",
    fullmatch=True,
)


@given(fastpath_urls)
@settings(max_examples=300, deadline=None, derandomize=True)
def test_fastpath_regex_implies_canonical_identity(url):
    """Every URL the JVM fast-path regex accepts must be a fixpoint of
    the exact Python canonicalizer — otherwise the fast and slow
    link-cleaning paths disagree (the round-1 dotless-host bug)."""
    import re

    from lopez_spark.crawler.frontier import _CANONICAL_FORM
    from lopez_spark.urlnorm import DROP_ALL_PARAMS

    if re.match(_CANONICAL_FORM, url):
        assert canonicalize(url, DROP_ALL_PARAMS) == url


def test_fastpath_regex_rejects_dotless_hosts():
    import re

    from lopez_spark.crawler.frontier import _CANONICAL_FORM

    for u in ("https://intranet/page", "https://localhost/x", "https://foo/"):
        assert re.match(_CANONICAL_FORM, u) is None
