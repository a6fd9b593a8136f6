"""Per-host politeness budget + robots rules (SURVEY.md §2.3 ST6).

Deterministic by construction: the budget is expressed in *fetches per wave*
(token-bucket refill per crawl step), never wall-clock — so the same seed
list + budget always yields the same crawl ordering (replay invariant,
BASELINE.json north rule).
"""

from __future__ import annotations

from .robots import RobotsTxt

DEFAULT_BUDGET = {"per_wave": 8, "burst": 16}


class TokenBucket:
    """Wave-refilled token bucket: ``per_wave`` tokens added per wave,
    capped at ``burst``; spending is integer and deterministic."""

    def __init__(self, per_wave: int, burst: int):
        self.per_wave = per_wave
        self.burst = burst
        self.tokens = burst
        self.wave = 0

    def refill(self, wave: int) -> None:
        if wave > self.wave:
            self.tokens = min(self.burst, self.tokens + (wave - self.wave) * self.per_wave)
            self.wave = wave

    def try_take(self, n: int = 1) -> bool:
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False


def synth_robots_txt(host: str) -> str:
    """Deterministic synthetic robots.txt per host (FIXTURES.md §3):
    every host disallows one year-directory derived from its name."""
    num = sum(ord(c) for c in host) % 17
    denied_year = 1999 + num
    return f"User-agent: *\nDisallow: /{denied_year}/\nDisallow: /private/\n"


class RobotsRules:
    """Gate-facing robots evaluator: full RFC 9309 semantics via
    ``state.robots.RobotsTxt`` (groups, longest-match Allow/Disallow,
    ``*``/``$`` wildcards, agent selection). For plain prefix-Disallow
    files — the synthetic fixtures — the verdicts are identical to the
    old prefix matcher, so crawl replay traces are unchanged."""

    def __init__(self, text: str, agent: str = "*"):
        self._robots = RobotsTxt(text)
        self._agent = agent

    def allowed(self, path: str) -> bool:
        return self._robots.allowed(path, self._agent)

    def allowed_many(self, paths):
        """Vectorized ``allowed`` (same verdicts; see RobotsTxt)."""
        return self._robots.allowed_many(paths, self._agent)

    def crawl_delay(self) -> float | None:
        return self._robots.crawl_delay(self._agent)


class PolitenessState:
    """Robots cache + token buckets for the hosts one gate actor owns.

    Held inside a ``map_groups`` callable class (actor pool): robots text is
    fetched/parsed once per host per actor and cached across batches.
    """

    def __init__(self, budgets: dict | None = None, robots_fetch=synth_robots_txt,
                 wave_seconds: float = 1.0):
        self.budgets = budgets or {}
        self.robots_fetch = robots_fetch
        # nominal wall-clock length of one wave, used ONLY to translate a
        # robots Crawl-delay into a deterministic per-wave token budget
        # (the crawl itself never reads wall clocks — replay invariant)
        self.wave_seconds = wave_seconds
        self.robots_cache: dict[str, RobotsRules] = {}
        self.buckets: dict[str, TokenBucket] = {}

    def rules_for(self, host: str) -> RobotsRules:
        rules = self.robots_cache.get(host)
        if rules is None:
            rules = RobotsRules(self.robots_fetch(host))
            self.robots_cache[host] = rules
        return rules

    def bucket_for(self, host: str, n_salts: int = 1) -> TokenBucket:
        """Hot hosts are salted over several gate groups; each salted bucket
        gets 1/n_salts of the host budget (shared-budget split)."""
        b = self.buckets.get(host)
        if b is None:
            cfg = self.budgets.get(host)
            if cfg is None:
                cfg = DEFAULT_BUDGET
                # no explicit operator budget: honor the host's robots
                # Crawl-delay (≤ 1 fetch per `delay` seconds → at most
                # wave_seconds/delay tokens per wave, min 1)
                delay = self.rules_for(host).crawl_delay()
                if delay and delay > 0:
                    per = max(1, int(self.wave_seconds / delay))
                    cfg = {"per_wave": min(per, DEFAULT_BUDGET["per_wave"]),
                           "burst": min(per, DEFAULT_BUDGET["burst"])}
            per_wave = max(1, cfg["per_wave"] // n_salts)
            burst = max(1, cfg["burst"] // n_salts)
            b = TokenBucket(per_wave, burst)
            self.buckets[host] = b
        return b
