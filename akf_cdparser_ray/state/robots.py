"""RFC 9309 robots.txt parser/evaluator.

The crawl gate previously used a prefix-Disallow-only evaluator good
enough for the synthetic fixture robots. This module is the production
wire-format parser a real fetch stack needs (the reference has no robots
machinery at all — this belongs to the engine's crawl tier):

- group collection per RFC 9309 §2.2.1: consecutive ``User-agent`` lines
  open one group; groups naming the same agent merge their rules.
- agent selection §2.2.1: the group whose product token is the longest
  case-insensitive prefix of the crawler's product token wins; ``*`` is
  the fallback group; no group → everything allowed.
- rule evaluation §2.2.2: ``Allow``/``Disallow`` with longest-match
  precedence (octet length of the pattern); equivalent-length tie →
  Allow. Empty ``Disallow:`` is a no-op rule (allows all).
- special characters §2.2.3: ``*`` matches any octet sequence, ``$``
  anchors the end of the path; both are translated once into a compiled
  regex at parse time (the gate evaluates millions of paths against a
  handful of rules — parse-once, match-vectorized-ish).
- percent-encoding §2.2.2: patterns and paths are compared after
  uppercasing percent-triplets (``%7e`` == ``%7E``); unreserved
  characters are left as sent.
- extensions: ``Crawl-delay`` (non-RFC but ubiquitous) is captured per
  group; ``Sitemap`` lines are collected file-wide. Unknown directives
  are ignored per §2.2.4. Lines are also split on a lone CR for
  robustness, and a UTF-8 BOM on the first line is dropped (§2.3).
"""

from __future__ import annotations

import re

_PCT_RE = re.compile(r"%[0-9a-fA-F]{2}")


def _norm(s: str) -> str:
    """Uppercase percent-triplets so %7e and %7E compare equal."""
    return _PCT_RE.sub(lambda m: m.group(0).upper(), s)


def _pattern_regex(pattern: str) -> re.Pattern:
    """robots pattern → anchored-at-start regex (* = any run, $ = end)."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(seg) for seg in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile(body + ("\\Z" if anchored_end else ""))


class _Rule:
    __slots__ = ("allow", "pattern", "length", "regex")

    def __init__(self, allow: bool, pattern: str):
        self.allow = allow
        self.pattern = _norm(pattern)
        self.length = len(self.pattern.rstrip("$"))
        self.regex = _pattern_regex(self.pattern)


class _Group:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self):
        self.agents: list[str] = []
        self.rules: list[_Rule] = []
        self.crawl_delay: float | None = None


class RobotsTxt:
    """Parsed robots.txt; evaluate with ``allowed(path, agent)``."""

    def __init__(self, text: str):
        self.groups: list[_Group] = []
        self.sitemaps: list[str] = []
        self._by_agent: dict[str, _Group] = {}

        cur: _Group | None = None
        collecting_agents = False
        first = True
        for raw in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
            if first:
                raw = raw.lstrip("\ufeff")
                first = False
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                token = val.lower()
                if not collecting_agents:
                    cur = _Group()
                    self.groups.append(cur)
                    collecting_agents = True
                cur.agents.append(token)
            elif key in ("allow", "disallow"):
                collecting_agents = False
                if cur is None:
                    continue  # rules before any user-agent line: ignored
                if val == "":
                    continue  # empty pattern matches nothing (§2.2.2)
                cur.rules.append(_Rule(key == "allow", val))
            elif key == "crawl-delay":
                collecting_agents = False
                if cur is not None:
                    try:
                        cur.crawl_delay = float(val)
                    except ValueError:
                        pass
            elif key == "sitemap":
                self.sitemaps.append(val)
            else:
                collecting_agents = False  # unknown directive ends the
                # user-agent run but stays inside the group (§2.2.4)

        # merge groups naming the same agent (§2.2.1 "combined")
        merged: dict[str, _Group] = {}
        for g in self.groups:
            for agent in g.agents:
                m = merged.get(agent)
                if m is None:
                    m = merged[agent] = _Group()
                    m.agents.append(agent)
                m.rules.extend(g.rules)
                if m.crawl_delay is None:
                    m.crawl_delay = g.crawl_delay
        self._by_agent = merged

    # ------------------------------------------------------------------
    def _group_for(self, agent: str) -> _Group | None:
        """Longest product-token prefix match, '*' fallback (§2.2.1)."""
        token = agent.lower()
        best: _Group | None = None
        best_len = -1
        for name, g in self._by_agent.items():
            if name == "*":
                continue
            if token.startswith(name) and len(name) > best_len:
                best, best_len = g, len(name)
        if best is not None:
            return best
        return self._by_agent.get("*")

    def allowed(self, path: str, agent: str = "*") -> bool:
        group = self._group_for(agent)
        if group is None:
            return True
        path = _norm(path or "/")
        verdict = True  # no matching rule → allowed
        best_len = -1
        for rule in group.rules:
            if rule.regex.match(path) and (
                rule.length > best_len
                or (rule.length == best_len and rule.allow and not verdict)
            ):
                # longest match wins; equal length → Allow wins (§2.2.2)
                verdict, best_len = rule.allow, rule.length
        return verdict

    def allowed_many(self, paths, agent: str = "*"):
        """Vectorized ``allowed`` over an array-like of paths — verdicts
        byte-identical to the scalar evaluator (test-pinned). One pandas
        C-level string op per RULE over the whole path array (plain
        prefixes use ``str.startswith``; ``*``/``$`` patterns the
        compiled regex via ``str.match``); the longest-match / Allow-tie
        precedence is the same sequential update the scalar loop runs,
        expressed per-path with numpy where-masks. The gate evaluates
        thousands of paths against a handful of rules per wave — this
        turns its per-row Python loop into len(rules) vector ops."""
        import numpy as np
        import pandas as pd

        group = self._group_for(agent)
        n = len(paths)
        if group is None or not group.rules:
            return np.ones(n, dtype=bool)
        s = pd.Series(paths, dtype=object)
        s = s.where(~s.isna() & (s != ""), "/")
        pct = s.str.contains("%", regex=False).to_numpy()
        if pct.any():
            s = s.copy()
            s[pct] = s[pct].map(_norm)
        verdict = np.ones(n, dtype=bool)
        best_len = np.full(n, -1, dtype=np.int64)
        for rule in group.rules:
            if "*" in rule.pattern or rule.pattern.endswith("$"):
                m = s.str.match(rule.regex).to_numpy(dtype=bool)
            else:
                m = s.str.startswith(rule.pattern).to_numpy(dtype=bool)
            upd = m & ((rule.length > best_len)
                       | ((rule.length == best_len) & rule.allow & ~verdict))
            verdict = np.where(upd, rule.allow, verdict)
            best_len = np.where(upd, rule.length, best_len)
        return verdict

    def crawl_delay(self, agent: str = "*") -> float | None:
        group = self._group_for(agent)
        return group.crawl_delay if group is not None else None
