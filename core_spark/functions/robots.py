"""robots.txt parsing and longest-match rule evaluation (REP,
RFC 9309) — the crawl-politeness gate that sits between URL
canonicalization (functions/urls.py) and the fetch frontier.

Implements the Google/RFC semantics a production crawler uses:

- records are grouped by ``User-agent`` lines; a group applies to us
  if it names ``*`` or our agent token (case-insensitive); multiple
  consecutive ``User-agent`` lines share one rule group;
- only ``Allow`` / ``Disallow`` / ``Crawl-delay`` directives are
  read; unknown directives, comments (``#`` to end of line) and
  blank lines are skipped;
- an empty ``Disallow:`` value means "allow everything";
- matching is longest-path-wins across Allow and Disallow together;
  on a length tie Allow wins; no matching rule means allowed.

Reference scope: gazette moves opaque bytes (message/
interfaces.go:121-124); crawl-policy logic like this lives in
consumer pipelines — here it is a first-class declared query
(q_crawl_robots) with a DuckDB oracle that recomputes each verdict
by integer arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsPolicy:
    """Rules applying to one user-agent after group resolution."""

    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay: int | None = None

    def decide(self, path: str) -> tuple[bool, str]:
        """(allowed, winning_rule_path). Longest match wins; ties go
        to Allow; no match allows."""
        best_len = -1
        allowed = True
        rule = ""
        for p in self.disallows:
            if p and path.startswith(p) and len(p) > best_len:
                best_len, allowed, rule = len(p), False, p
        for p in self.allows:
            if p and path.startswith(p) and len(p) >= best_len:
                best_len, allowed, rule = len(p), True, p
        return allowed, rule


def parse_robots(text: str, agent: str = "*") -> RobotsPolicy:
    """Parse robots.txt, returning the policy for ``agent`` (falling
    back to the ``*`` group when no specific group matches)."""
    agent = agent.lower()
    groups: list[tuple[list[str], RobotsPolicy]] = []
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
                except ValueError:
                    pass
    if cur is not None:
        groups.append((cur_agents, cur))

    specific = None
    star = None
    for agents, pol in groups:
        if agent != "*" and agent in agents and specific is None:
            specific = pol
        if "*" in agents and star is None:
            star = pol
    return specific or star or RobotsPolicy()
