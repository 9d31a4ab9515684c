"""robots.txt parsing and matching (operator F8).

Reference: ``RobotExclusion`` in ``lib-lopez/src/crawler/robots.rs:16-88``:
  * choose the UA section for "lopez" (fall back to ``*``),
  * keep only Disallow rules,
  * crawl-delay from ``Crawl-delay`` or ``Request-rate`` (seconds/requests),
  * rule matching: ``*`` wildcards split the pattern into fragments that
    must appear in order; a trailing ``$`` anchors the match at the end.

Divergence (documented, intentional): the reference's ``Match::matches``
advances only to the *start* of each found fragment
(``robots.rs:77-83``), so ``Disallow: /foo$`` never matches ``/foo``.
We implement the correct protocol semantics (advance past the fragment)
and record the delta in tests/test_robots.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

DEFAULT_AGENT = "lopez"


@dataclass(frozen=True)
class _Rule:
    fragments: tuple[str, ...]
    is_strict: bool  # trailing '$'

    @classmethod
    def parse(cls, path: str) -> "_Rule":
        is_strict = path.endswith("$")
        if is_strict:
            path = path[:-1]
        return cls(tuple(path.split("*")), is_strict)

    def matches(self, route: str) -> bool:
        # empty pattern: "random corner case I have found people use"
        # (robots.rs:73-75) — never matches.
        if len(self.fragments) == 1 and self.fragments[0] == "":
            return False
        pos = 0
        for frag in self.fragments:
            found = route.find(frag, pos)
            if found < 0:
                return False
            pos = found + len(frag)
        return not self.is_strict or pos == len(route)


class RobotExclusion:
    """Parsed robots.txt for one origin, as seen by one user agent."""

    def __init__(self, robots_str: str, agent: str = DEFAULT_AGENT):
        sections: list[tuple[list[str], list[str], float | None]] = []
        cur_agents: list[str] = []
        cur_disallow: list[str] = []
        cur_delay: float | None = None
        in_rules = False

        def flush():
            nonlocal cur_agents, cur_disallow, cur_delay, in_rules
            if cur_agents:
                sections.append((cur_agents, cur_disallow, cur_delay))
            cur_agents, cur_disallow, cur_delay, in_rules = [], [], None, False

        for raw_line in robots_str.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if in_rules:
                    flush()
                cur_agents.append(value.lower())
            elif key in ("disallow", "allow", "crawl-delay", "request-rate"):
                in_rules = True
                if key == "disallow" and value:
                    cur_disallow.append(value)
                elif key == "crawl-delay":
                    try:
                        cur_delay = float(value)
                    except ValueError:
                        pass
                elif key == "request-rate" and cur_delay is None:
                    try:
                        reqs, _, secs = value.partition("/")
                        if int(reqs) > 0:
                            cur_delay = float(secs) / int(reqs)
                    except ValueError:
                        pass
        flush()

        chosen: tuple[list[str], list[str], float | None] | None = None
        agent_l = agent.lower()
        best_len = -1
        for agents, dis, delay in sections:
            for a in agents:
                if a != "*" and (a in agent_l or agent_l in a) and len(a) > best_len:
                    chosen, best_len = (agents, dis, delay), len(a)
        if chosen is None:
            for agents, dis, delay in sections:
                if "*" in agents:
                    chosen = (agents, dis, delay)
                    break

        self.disallow: list[_Rule] = [_Rule.parse(p) for p in (chosen[1] if chosen else [])]
        self.crawl_delay: float | None = chosen[2] if chosen else None

    def allows(self, url: str) -> bool:
        """True iff no Disallow rule matches the path+query of ``url``
        (reference matches ``url[Position::BeforePath..]``)."""
        parts = urlsplit(url)
        route = parts.path or "/"
        if parts.query:
            route += "?" + parts.query
        return not any(rule.matches(route) for rule in self.disallow)


def get_robots(fetch, base_url: str) -> str | None:
    """robots.txt resolution (operator S4): try ``/robots.txt`` for the
    exact origin, following ≤5 redirects (``do_get_robots``,
    ``lib-lopez/src/crawler/robots.rs:125-148``), then walk up the
    domain hierarchy until found or only a TLD remains (``get_robots``,
    ``:151-179``).

    ``fetch(url) -> (status_code, body_or_location)``: 2xx → body,
    3xx → Location, else miss.  Injected so the synthetic web, tests,
    and a real HTTP provider share the protocol logic.
    """
    parts = urlsplit(base_url)
    scheme, host = parts.scheme, parts.hostname or ""
    while True:
        url = f"{scheme}://{host}/robots.txt"
        for _ in range(5):  # patience is finite (robots.rs:133-147)
            status, payload = fetch(url)
            if 300 <= status < 400 and payload:
                url = payload
            elif 200 <= status < 300:
                return payload
            else:
                break
        # redirect budget exhausted or miss: either way this host has no
        # usable robots.txt — walk up the domain hierarchy like the
        # reference's get_robots loop (robots.rs:151-179), which treats a
        # do_get_robots None as "try the parent domain"
        parts_one_up = host.split(".")[1:]
        if len(parts_one_up) <= 1:  # reached a TLD: makes no sense
            return None
        host = ".".join(parts_one_up)
