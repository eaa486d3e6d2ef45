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


def test_matching_groups_merge_rfc_2_2_1():
    """Multiple groups naming the same agent combine into one policy
    (the appended-robots-files shape); Crawl-delay merges to the
    politest (minimum)."""
    pol = parse_robots(
        "User-agent: *\nDisallow: /a\nCrawl-delay: 7\n\n"
        "User-agent: *\nDisallow: /b\nCrawl-delay: 3\n"
    )
    assert pol.decide("/a/x") == (False, "/a")
    assert pol.decide("/b/x") == (False, "/b")
    assert pol.crawl_delay == 3
    # specific groups never mix with * groups
    pol = parse_robots(
        "User-agent: gbot\nDisallow: /g\n\nUser-agent: *\nDisallow: /s\n",
        agent="gbot",
    )
    assert pol.decide("/s/x")[0] is True
    assert pol.decide("/g/x")[0] is False


def test_wildcard_and_anchor_rules_rfc_2_2_3():
    """'*' spans any character run, one trailing '$' anchors the end;
    rule length (wildcards counted) still ranks; ties go to Allow."""
    pol = parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
    assert pol.decide("/report.pdf") == (False, "/*.pdf$")
    assert pol.decide("/report.pdfx")[0] is True  # anchor honored
    pol = parse_robots("User-agent: *\nDisallow: /private*/data\n")
    assert pol.decide("/private2024/data/x")[0] is False
    assert pol.decide("/private2024/info")[0] is True
    pol = parse_robots("User-agent: *\nDisallow: /p\nAllow: /p$\n")
    assert pol.decide("/p") == (True, "/p$")
    assert pol.decide("/pq")[0] is False


def test_crawl_delay_inf_ignored():
    """int(float('inf')) raises OverflowError, not ValueError — junk
    delays of every shape are ignored, never a task-killing raise."""
    for bad in ("inf", "Infinity", "-inf", "nan"):
        pol = parse_robots(f"User-agent: *\nCrawl-delay: {bad}\n")
        assert pol.crawl_delay is None


def test_trailing_ruleless_group_allows_all_rfc_2_2_1():
    """A matching group with no rules means allow-all for that agent
    (RFC 9309 §2.2.1) even at EOF — it must not fall back to '*'."""
    txt = "User-agent: *\nDisallow: /\n\nUser-agent: mybot"
    assert parse_robots(txt, agent="mybot").decide("/x")[0] is True
    assert parse_robots(txt, agent="other").decide("/x")[0] is False
    # mid-file the same lines are NOT a rule-less group: consecutive
    # user-agent lines with no rules between them share one group
    # (RFC 9309 §2.2.1), so mybot joins the '*' rules here
    txt2 = "User-agent: mybot\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(txt2, agent="mybot").decide("/x")[0] is False


def test_sitemap_directive_is_global_and_group_neutral():
    """Sitemap lines are group-independent discovery seeds: every
    agent sees them all, and a Sitemap between two User-agent lines
    must not terminate the shared group."""
    txt = (
        "Sitemap: https://a.com/s1.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.com/s2.xml\n\n"
        "User-agent: bot\nAllow: /\n"
    )
    for agent in ("*", "bot", "other"):
        assert parse_robots(txt, agent).sitemaps == [
            "https://a.com/s1.xml", "https://a.com/s2.xml"
        ]
    txt2 = "User-agent: a\nSitemap: https://s\nUser-agent: b\nDisallow: /p\n"
    assert parse_robots(txt2, "a").decide("/p/x")[0] is False
    assert parse_robots(txt2, "b").decide("/p/x")[0] is False
