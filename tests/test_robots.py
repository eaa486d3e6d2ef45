"""functions/robots.py — RFC 9309 parsing and longest-match rules."""

from core_spark.functions.robots import RobotsPolicy, parse_robots

SIMPLE = """
# demo
User-agent: BadBot
Disallow: /

User-agent: *
Disallow: /private  # members
Allow: /private/pub
Crawl-delay: 3
"""


def test_star_group_selected_not_badbot():
    pol = parse_robots(SIMPLE)
    assert pol.disallows == ["/private"]
    assert pol.allows == ["/private/pub"]
    assert pol.crawl_delay == 3


def test_specific_agent_overrides_star():
    pol = parse_robots(SIMPLE, agent="badbot")
    assert pol.disallows == ["/"]
    assert not pol.decide("/anything")[0]


def test_longest_match_wins():
    pol = RobotsPolicy(allows=["/private/pub"], disallows=["/private"])
    assert pol.decide("/private/pub/x") == (True, "/private/pub")
    assert pol.decide("/private/secret") == (False, "/private")
    assert pol.decide("/docs/x") == (True, "")


def test_tie_goes_to_allow():
    pol = RobotsPolicy(allows=["/a"], disallows=["/a"])
    assert pol.decide("/a/x") == (True, "/a")


def test_empty_disallow_means_allow_all():
    pol = parse_robots("User-agent: *\nDisallow:\n")
    assert pol.disallows == []
    assert pol.decide("/anything")[0]


def test_shared_group_multiple_agents():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(txt, agent="b").disallows == ["/x"]
    # no * group and no match -> empty policy, allow everything
    assert parse_robots(txt, agent="c").decide("/x/1")[0]


def test_directive_before_any_group_ignored():
    pol = parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n")
    assert pol.disallows == ["/y"]


def test_bad_crawl_delay_ignored():
    pol = parse_robots("User-agent: *\nCrawl-delay: soon\n")
    assert pol.crawl_delay is None
