"""F8 golden vectors, including the reference's own robots.txt test
corpus (``lib-lopez/src/crawler/robots.rs:90-122``)."""

from lopez_spark.crawler.robots import RobotExclusion

REFERENCE_ROBOTS = """
# See http://www.robotstxt.org/wc/norobots.html
# Ban Grapeshot
User-Agent: grapeshot
Disallow: /

# Ban oauth urls
User-Agent: *
Disallow: /auth/
Disallow: /busca-cursos/resultados
Disallow: /login
Disallow: /pre-matricula
Disallow: /revista/admin/
Disallow: /intercambio/estudar-no-exterior
Disallow: /intercambio?

# Ban api urls
Disallow: /api/

Sitemap: https://example.com/sitemap_index.xml
"""


def test_reference_vector_chooses_star_section():
    r = RobotExclusion(REFERENCE_ROBOTS, "lopez")
    base = "https://querobolsa.com.br"
    assert not r.allows(base + "/auth/callback")
    assert not r.allows(base + "/login")
    assert not r.allows(base + "/intercambio?x=1")
    assert not r.allows(base + "/api/v1/things")
    assert r.allows(base + "/mba")
    assert r.allows(base + "/intercambio")  # '?' rule needs the query


def test_specific_section_wins():
    r = RobotExclusion(REFERENCE_ROBOTS, "grapeshot")
    assert not r.allows("https://x.com/anything")


def test_wildcard_and_anchor():
    r = RobotExclusion("User-agent: *\nDisallow: /private*/data\nDisallow: /tmp$\n")
    assert not r.allows("http://x.com/private1/data")
    assert not r.allows("http://x.com/privateXYZ/stuff/data")
    assert r.allows("http://x.com/private")
    # '$' anchor: correct protocol semantics (divergence from the
    # reference, whose Match::matches at robots.rs:77-83 advances only to
    # the *start* of a fragment, so '/tmp$' can never match '/tmp').
    assert not r.allows("http://x.com/tmp")
    assert r.allows("http://x.com/tmp/file")


def test_empty_disallow_never_matches():
    r = RobotExclusion("User-agent: *\nDisallow:\n")
    assert r.allows("http://x.com/anything")


def test_crawl_delay_and_request_rate():
    r = RobotExclusion("User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert r.crawl_delay == 2.5
    r2 = RobotExclusion("User-agent: *\nRequest-rate: 2/10\n")
    assert r2.crawl_delay == 5.0
    r3 = RobotExclusion("User-agent: *\nDisallow: /x\n")
    assert r3.crawl_delay is None


def test_multiple_ua_lines_share_section():
    r = RobotExclusion("User-agent: a\nUser-agent: lopez\nDisallow: /y\n")
    assert not r.allows("http://x.com/y")


def test_redirect_exhaustion_falls_through_to_walkup():
    """≤5 redirect hops per host; on exhaustion the resolution walks up
    the domain hierarchy instead of giving up (robots.rs:151-179)."""
    from lopez_spark.crawler.robots import get_robots

    calls = []

    def fetch(url):
        calls.append(url)
        if url.startswith("https://a.b.example.com/"):
            return 302, url + "?hop"  # endless redirect loop on the subdomain
        if url == "https://b.example.com/robots.txt":
            return 200, "User-agent: *\nDisallow: /private"
        return 404, None

    body = get_robots(fetch, "https://a.b.example.com/page")
    assert body == "User-agent: *\nDisallow: /private"
    # exactly 5 attempts on the looping host before walking up
    assert sum(u.startswith("https://a.b.example.com/") for u in calls) == 5
