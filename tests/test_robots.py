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
