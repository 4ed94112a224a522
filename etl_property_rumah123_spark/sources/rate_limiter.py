"""Adaptive client-side rate limiter (op S2).

Same control law as the reference's RateLimiter
(/root/reference/src/extract.py:12-59), re-implemented for use inside a
Spark DataSourceReader partition: jittered base sleep before each
request, multiplicative-increase backoff on HTTP 429 (x1.5, capped),
multiplicative decrease after consecutive successes (x0.9 / x0.7 / x0.5
after 1 / 3 / 5, floored at ``min_sleep``).

Catalyst has no analog for this — it is a per-partition client concern
(SURVEY §2 op S2). ``sleep_fn`` and ``rng`` are injectable so tests run
with a fake clock and a seeded RNG; production uses the defaults.

At scale: each input partition (page range) runs its own limiter, so a
1000-partition read self-throttles per connection rather than globally —
matching how a polite distributed scraper must behave (global budgets
would need an external token service, out of engine scope).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable


class AdaptiveRateLimiter:
    def __init__(
        self,
        base_sleep: float = 1.0,
        min_sleep: float = 1.0,
        max_sleep: float = 600.0,
        sleep_fn: Callable[[float], None] = time.sleep,
        rng: random.Random | None = None,
    ) -> None:
        self.base_sleep = base_sleep
        self.min_sleep = min_sleep
        self.max_sleep = max_sleep
        self._sleep = sleep_fn
        self._rng = rng or random.Random()
        self.consecutive_429s = 0
        self.consecutive_successes = 0

    def wait(self) -> float:
        """Pre-request pause: base sleep with 0.8-1.2 jitter
        (/root/reference/src/extract.py:21-25). Returns the slept time."""
        dt = self.base_sleep * self._rng.uniform(0.8, 1.2)
        self._sleep(dt)
        return dt

    def on_success(self) -> None:
        """Multiplicative decrease after consecutive successes
        (/root/reference/src/extract.py:27-42)."""
        self.consecutive_successes += 1
        self.consecutive_429s = 0
        if self.consecutive_successes >= 5:
            factor = 0.5
        elif self.consecutive_successes >= 3:
            factor = 0.7
        else:
            factor = 0.9
        candidate = max(self.min_sleep, self.base_sleep * factor)
        if candidate < self.base_sleep:
            self.base_sleep = candidate

    def on_rate_limit(self) -> float:
        """429: exponential backoff x1.5 capped at ``max_sleep``, then an
        immediate backoff sleep of base x uniform(1.0, 1.5)
        (/root/reference/src/extract.py:44-54). Returns the slept time."""
        self.consecutive_successes = 0
        self.consecutive_429s += 1
        self.base_sleep = min(self.max_sleep, self.base_sleep * 1.5)
        dt = self.base_sleep * self._rng.uniform(1.0, 1.5)
        self._sleep(dt)
        return dt

    def on_other_error(self) -> float:
        """Non-429 failure: flat 1.5x pause, success streak reset
        (/root/reference/src/extract.py:56-59). Returns the slept time."""
        self.consecutive_successes = 0
        dt = self.base_sleep * 1.5
        self._sleep(dt)
        return dt
