"""Per-host politeness: token-bucket allowances + robots.txt rules.

Maps the reference's limiter stack onto per-host budgets:
- fixed-window rate counters (/root/reference/providers/limiting/
  inmemoryRateLimiter.js:17-36) -> per-epoch allowance = rate x window
- token benching with `benchUntil` (/root/reference/providers/fetcher/
  tokenFactory.js:74-86) -> per-host cooldown carried as `not_before`
  deferral on frontier rows (deferDelay analogue,
  /root/reference/lib/crawlerFactory.js:74)
- robots.txt: simple prefix Disallow + Crawl-delay parsing (the
  reference crawls one host — api.github.com — so robots generalizes
  the token-pool "traits" idea to per-host fetch capabilities).

All state is deterministic; the engine injects the epoch clock.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class RobotsRules:
    disallow: tuple[str, ...] = ()
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        return not any(path.startswith(p) for p in self.disallow if p)


def parse_robots(text: str, agent: str = "*") -> RobotsRules:
    """Minimal robots.txt parser: honors the `User-agent: *` group's
    Disallow prefixes and Crawl-delay."""
    disallow: list[str] = []
    delay: float | None = None
    active = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            active = value == agent or value == "*"
        elif active and key == "disallow" and value:
            disallow.append(value)
        elif active and key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return RobotsRules(tuple(disallow), delay)


@dataclass
class PolitenessPolicy:
    """Per-epoch allowance computation over a batch of frontier rows."""

    host_rate_per_sec: float = 10.0
    epoch_seconds: float = 1.0
    defer_delay_sec: float = 0.5
    robots: dict[str, RobotsRules] = field(default_factory=dict)

    def allowance(self, host: str) -> int:
        rate = self.host_rate_per_sec
        rules = self.robots.get(host)
        if rules and rules.crawl_delay:
            rate = min(rate, 1.0 / rules.crawl_delay)
        return max(1, int(rate * self.epoch_seconds))

    def admit_mask(self, hosts: np.ndarray) -> np.ndarray:
        """Bool mask admitting at most `allowance(host)` rows per host,
        in row order (rows are already priority-sorted). Vectorized:
        cumulative per-host ordinal < allowance."""
        n = len(hosts)
        if n == 0:
            return np.zeros(0, dtype=bool)
        uniq, inv = np.unique(hosts, return_inverse=True)
        # ordinal of each row within its host, in row order
        ordinal = np.zeros(n, dtype=np.int64)
        counts = np.zeros(len(uniq), dtype=np.int64)
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        # positions within equal-inv runs
        run_start = np.r_[0, np.flatnonzero(np.diff(sorted_inv)) + 1]
        run_ordinals = np.arange(n) - np.repeat(
            run_start, np.diff(np.r_[run_start, n])
        )
        ordinal[order] = run_ordinals
        allowances = np.array([self.allowance(str(h)) for h in uniq])
        return ordinal < allowances[inv]


@dataclass
class ComputeBudget:
    """Adaptive per-key compute limiter (reference T6,
    /root/reference/providers/limiting/computeLimiter.js:27-77 wired at
    lib/crawlerFactory.js:306-346): each fetch charges its duration
    OVERAGE above a baseline (the fastest latency observed — the
    network floor) against a per-key budget of `limit_ms` busy
    milliseconds per `window_sec` window; an exhausted key is benched
    until ``now + window/4`` (the reference's computed reset). The
    baseline refreshes as a rolling min so a structurally-slow epoch
    re-calibrates (reference: 4-probe mean every 60 s).

    Deterministic: the caller injects the clock (``now_us``).
    """

    limit_ms: float = 15_000.0
    window_sec: float = 15.0
    baseline_ms: float = 0.0
    _used_ms: dict[str, float] = field(default_factory=dict)
    _window_start_us: dict[str, int] = field(default_factory=dict)
    _bench_until_us: dict[str, int] = field(default_factory=dict)
    _rolling_min_ms: float = float("inf")

    def observe_baseline(self, elapsed_ms: float) -> None:
        """Feed a latency sample; baseline = rolling min (the cheapest
        request approximates pure network time)."""
        if elapsed_ms < self._rolling_min_ms:
            self._rolling_min_ms = elapsed_ms
            self.baseline_ms = elapsed_ms

    def benched_until(self, key: str, now_us: int) -> int | None:
        """Epoch-clock timestamp until which `key` is benched, if any."""
        until = self._bench_until_us.get(key)
        if until is not None and until > now_us:
            return until
        return None

    def consume(self, key: str, elapsed_ms: float, now_us: int) -> int | None:
        """Charge one request's compute overage. Returns the bench-until
        timestamp if this charge exhausted the key's budget, else None
        (reference consume(): over -> exhaust(resetTime))."""
        self.observe_baseline(elapsed_ms)
        window_us = int(self.window_sec * 1e6)
        start = self._window_start_us.get(key)
        if start is None or now_us - start >= window_us:
            self._window_start_us[key] = now_us
            self._used_ms[key] = 0.0
        charge = max(0.0, elapsed_ms - self.baseline_ms)
        self._used_ms[key] = self._used_ms.get(key, 0.0) + charge
        if self._used_ms[key] > self.limit_ms:
            until = now_us + window_us // 4
            self._bench_until_us[key] = until
            return until
        return None
