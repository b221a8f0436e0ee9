"""Multi-identity fetch pool: token specs, trait matching, benching.

Reference semantics:
- token spec parsing (M7): ``"value#trait1,trait2;value2#..."`` →
  ``[{value, traits}]`` (/root/reference/providers/fetcher/
  tokenFactory.js:6-29)
- trait-matched selection with benching (T7): given ordered fallback
  trait sets, the first set with ANY matching token wins; among its
  un-benched candidates one is chosen at random; if every candidate is
  benched, the soonest bench-expiry time is returned instead of a
  token; no match at all → None (tokenFactory.js:31-67)
- ``exhaust``: bench a token until a timestamp, never shortening an
  existing bench (tokenFactory.js:69-86)
- per-token call cap (T8): a fixed-window rate counter per token
  prefix; exceeding the cap benches the token for window/4
  (limitedTokenFactory.js:19-51, caps at lib/crawlerFactory.js:68-69).

Determinism: callers inject the clock (``now_us``) and the RNG seed —
no wall clock, no unseeded randomness (SURVEY O5). Scale note: a pool
is PER FETCH WORKER (each worker owns a disjoint identity subset on a
real cluster); nothing here is shared mutable state across actors.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field


@dataclass
class Token:
    value: str
    traits: tuple[str, ...] = ()
    bench_until_us: int = 0


def parse_token_specs(spec) -> list[Token]:
    """M7 token spec parser (tokenFactory.js:6-29): ``;``-separated
    ``value#trait1,trait2`` entries; lists pass through."""
    if not spec:
        return []
    if isinstance(spec, list):
        return [t if isinstance(t, Token) else Token(**t) for t in spec]
    out = []
    for part in spec.split(";"):
        if not part:
            continue
        value, _, traitstr = part.partition("#")
        traits = tuple(t for t in traitstr.split(",") if t)
        out.append(Token(value, traits))
    return out


def _traits_match(available: tuple[str, ...], desired) -> bool:
    """tokenFactory.js:88-102: empty desired matches anything; a str is
    one required trait; a list requires ALL of its traits."""
    if not desired:
        return True
    if isinstance(desired, str):
        return desired in available
    if isinstance(desired[0], str):
        return all(t in available for t in desired)
    return False


class TokenPool:
    """T7 TokenFactory: trait-matched selection over benchable
    identities, seeded randomness."""

    def __init__(self, tokens, *, seed: int = 0) -> None:
        self.set_tokens(tokens)
        self._rng = random.Random(seed)

    def set_tokens(self, spec) -> None:
        self.tokens: list[Token] = parse_token_specs(spec)

    def get_token(self, desired_trait_sets, now_us: int):
        """First fallback trait set with any match wins; returns the
        token value, or the soonest bench-expiry (int) if every match
        is benched, or None if nothing matches (tokenFactory.js:31-45).
        """
        sets = desired_trait_sets or [[]]
        for desired in sets:
            got = self._get_one(desired, now_us)
            if got is not None:
                return got
        return None

    def _get_one(self, desired, now_us: int):
        min_bench = None
        candidates = []
        for tok in self.tokens:
            if not _traits_match(tok.traits, desired):
                continue
            if not tok.bench_until_us or now_us > tok.bench_until_us:
                candidates.append(tok)
            elif min_bench is None or tok.bench_until_us < min_bench:
                min_bench = tok.bench_until_us
        if not candidates:
            return min_bench  # int (soonest restore) or None (no match)
        return self._rng.choice(candidates).value

    def exhaust(self, value: str, until_us: int, now_us: int):
        """Bench `value` until `until_us` unless it is already benched
        into the future (tokenFactory.js:69-86). Returns the effective
        restore time, or None if the token is unknown."""
        result = None
        for tok in self.tokens:
            if tok.value != value:
                continue
            if not tok.bench_until_us or now_us > tok.bench_until_us:
                tok.bench_until_us = until_us
            result = tok.bench_until_us
        return result


@dataclass
class _Window:
    start_us: int = 0
    calls: int = 0


class LimitedTokenPool:
    """T8 LimitedTokenFactory: call-cap rate limiting layered on a
    TokenPool. Exceeding `call_cap` calls within `window_sec` benches
    the token for window/4 and returns the restore time
    (limitedTokenFactory.js:26-41; defaults callCapLimit=30/1 s,
    lib/crawlerFactory.js:68-69)."""

    def __init__(
        self,
        pool: TokenPool,
        *,
        call_cap: int = 30,
        window_sec: float = 1.0,
    ) -> None:
        self.pool = pool
        self.call_cap = call_cap
        self.window_us = int(window_sec * 1e6)
        self._windows: dict[str, _Window] = {}

    def set_tokens(self, spec) -> None:
        self.pool.set_tokens(spec)

    def exhaust(self, value: str, until_us: int, now_us: int):
        return self.pool.exhaust(value, until_us, now_us)

    def get_token(self, desired_trait_sets, now_us: int):
        got = self.pool.get_token(desired_trait_sets, now_us)
        if got is None or isinstance(got, int):
            return got
        # key by prefix like the reference (token.slice(0, 4)) so the
        # limiter state survives token-list refreshes
        key = got[:4]
        w = self._windows.setdefault(key, _Window(start_us=now_us))
        if now_us - w.start_us >= self.window_us:
            w.start_us, w.calls = now_us, 0
        w.calls += 1
        if w.calls > self.call_cap:
            restore = self.pool.exhaust(
                got, now_us + self.window_us // 4, now_us
            )
            return restore if restore is not None else now_us
        return got
