"""Source-read retry policy (reference operator A25/P5).

The reference's gRPC client retries UNAVAILABLE upstreams: 4 attempts,
exponential backoff 10ms -> 1s cap, x2 multiplier
(/root/reference/internal/client/hermes/client.go:12-29). Spark gives
task-level retries (`spark.task.maxFailures`) for executor-side work;
this helper covers the driver-side source adapter — listing a feed,
opening a JDBC connection, polling an upstream — where a transient
failure should not abort the whole StreamingQuery (the reference's
failed tick logs and waits for the next one, employees.go:69-71).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

# client.go:12-23 defaults
ATTEMPTS = 4
INITIAL_BACKOFF_S = 0.010
MAX_BACKOFF_S = 1.0
MULTIPLIER = 2.0


def retry_call(
    fn: Callable[[], T],
    attempts: int = ATTEMPTS,
    initial_backoff_s: float = INITIAL_BACKOFF_S,
    max_backoff_s: float = MAX_BACKOFF_S,
    multiplier: float = MULTIPLIER,
    retry_on: tuple[type[BaseException], ...] = (IOError, ConnectionError, TimeoutError),
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fn`` with the reference's backoff schedule.

    Retries only on ``retry_on`` (the analogue of gRPC's
    UNAVAILABLE-only policy); anything else propagates immediately.
    The final failure re-raises the last retryable error.
    """
    backoff = initial_backoff_s
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except retry_on:
            if attempt == attempts:
                raise
            sleep(backoff)
            backoff = min(backoff * multiplier, max_backoff_s)
    raise AssertionError("unreachable")
