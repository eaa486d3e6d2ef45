"""robots.txt parsing and longest-match rule evaluation (REP,
RFC 9309) — the crawl-politeness gate that sits between URL
canonicalization (functions/urls.py) and the fetch frontier.

Implements the Google/RFC semantics a production crawler uses:

- records are grouped by ``User-agent`` lines; a group applies to us
  if it names ``*`` or our agent token (case-insensitive); multiple
  consecutive ``User-agent`` lines share one rule group; when MORE
  THAN ONE group matches, their rules are combined into one group
  (RFC 9309 §2.2.1 — appended/concatenated robots files are common);
  specific-agent groups take precedence over ``*`` groups and the
  two tiers are never mixed;
- ``Allow`` / ``Disallow`` / ``Crawl-delay`` directives are read per
  group; ``Sitemap`` lines are collected GLOBALLY (they are
  group-independent per the sitemaps.org extension and never open,
  extend, or terminate a rule group) as discovery seeds for
  functions/sitemap.py; unknown directives, comments (``#`` to end
  of line), blank lines and junk delay values are skipped;
- an empty ``Disallow:`` value means "allow everything";
- rules support the ``*`` (any character run) and trailing ``$``
  (end anchor) special characters crawlers MUST honor
  (RFC 9309 §2.2.3); a ``$`` anywhere else is literal;
- matching is longest-rule-wins across Allow and Disallow together
  (rule length in characters, wildcards counted — the public
  google/robotstxt ranking); on a length tie Allow wins; no matching
  rule means allowed.

Reference scope: gazette moves opaque bytes (message/
interfaces.go:121-124); crawl-policy logic like this lives in
consumer pipelines — here it is a first-class declared query
(q_crawl_robots) with a DuckDB oracle that recomputes each verdict
by integer arithmetic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache


@lru_cache(maxsize=4096)
def _rule_rx(rule: str) -> re.Pattern:
    """Compile one rule to a start-anchored regex: ``*`` → ``.*``,
    one trailing ``$`` → end anchor, everything else literal."""
    anchored = rule.endswith("$")
    core = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(seg) for seg in core.split("*"))
    return re.compile(pat + ("$" if anchored else ""))


def _rule_matches(rule: str, path: str) -> bool:
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)  # fast path: literal prefix
    return _rule_rx(rule).match(path) is not None


@dataclass
class RobotsPolicy:
    """Rules applying to one user-agent after group resolution."""

    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay: int | None = None
    # Sitemap lines are GLOBAL (outside any group, RFC 9309 §2.3 /
    # the sitemaps.org extension every crawler honors) — discovery
    # seeds for functions/sitemap.py
    sitemaps: list[str] = field(default_factory=list)

    def decide(self, path: str) -> tuple[bool, str]:
        """(allowed, winning_rule_path). Longest rule wins; ties go
        to Allow; no match allows."""
        best_len = -1
        allowed = True
        rule = ""
        for p in self.disallows:
            if p and len(p) > best_len and _rule_matches(p, path):
                best_len, allowed, rule = len(p), False, p
        for p in self.allows:
            if p and len(p) >= best_len and _rule_matches(p, path):
                best_len, allowed, rule = len(p), True, p
        return allowed, rule

    def _merge(self, other: "RobotsPolicy") -> None:
        self.allows.extend(other.allows)
        self.disallows.extend(other.disallows)
        self.sitemaps.extend(other.sitemaps)
        if other.crawl_delay is not None:
            self.crawl_delay = (
                other.crawl_delay
                if self.crawl_delay is None
                else min(self.crawl_delay, other.crawl_delay)
            )


def parse_robots(text: str, agent: str = "*") -> RobotsPolicy:
    """Parse robots.txt, returning the policy for ``agent``. ALL
    groups naming the agent merge into one policy (falling back to
    the merged ``*`` groups when no specific group matches); on
    merged Crawl-delays the minimum — the politest — wins."""
    agent = agent.lower()
    groups: list[tuple[list[str], RobotsPolicy]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur: RobotsPolicy | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            # group-independent: applies regardless of User-agent and
            # must not open or extend a rule group
            if val:
                sitemaps.append(val)
            continue
        if key == "user-agent":
            if cur is not None:
                groups.append((cur_agents, cur))
                cur_agents, cur = [], None
            cur_agents.append(val.lower())
        else:
            if cur is None:
                if not cur_agents:
                    # directive before any User-agent line: ignore
                    continue
                cur = RobotsPolicy()
            if key == "allow":
                cur.allows.append(val)
            elif key == "disallow":
                if val:
                    cur.disallows.append(val)
            elif key == "crawl-delay":
                try:
                    cur.crawl_delay = int(float(val))
                except (ValueError, OverflowError):
                    pass  # junk delay ("soon", "inf"): ignore
    if cur is not None:
        groups.append((cur_agents, cur))
    elif cur_agents:
        # Trailing rule-less group at EOF: RFC 9309 §2.2.1 — a group
        # that matches but carries no rules means allow-all for that
        # agent (it must NOT fall through to the ``*`` tier).
        groups.append((cur_agents, RobotsPolicy()))

    specific = RobotsPolicy()
    star = RobotsPolicy()
    any_specific = any_star = False
    for agents, pol in groups:
        if agent != "*" and agent in agents:
            specific._merge(pol)
            any_specific = True
        if "*" in agents:
            star._merge(pol)
            any_star = True
    if any_specific:
        specific.sitemaps = list(sitemaps)
        return specific
    if any_star:
        star.sitemaps = list(sitemaps)
        return star
    return RobotsPolicy(sitemaps=list(sitemaps))
