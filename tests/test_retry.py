"""A25/P5: retry schedule must match the reference policy — 4 attempts,
10ms initial, x2 multiplier, 1s cap, retryable errors only."""

from __future__ import annotations

import pytest

from hephaestus_spark.sources.retry import retry_call


def test_succeeds_after_transient_failures():
    calls, sleeps = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("upstream UNAVAILABLE")
        return "ok"

    assert retry_call(flaky, sleep=sleeps.append) == "ok"
    assert len(calls) == 3
    assert sleeps == [0.010, 0.020]  # 10ms, then x2


def test_exhausts_attempts_and_reraises():
    sleeps = []

    def dead():
        raise TimeoutError("still down")

    with pytest.raises(TimeoutError):
        retry_call(dead, sleep=sleeps.append)
    # 4 attempts -> 3 backoffs: 10ms, 20ms, 40ms
    assert sleeps == [0.010, 0.020, 0.040]


def test_backoff_caps_at_max():
    sleeps = []

    def dead():
        raise IOError("down")

    with pytest.raises(IOError):
        retry_call(dead, attempts=10, sleep=sleeps.append)
    assert max(sleeps) == 1.0  # capped
    assert sleeps[:3] == [0.010, 0.020, 0.040]


def test_non_retryable_propagates_immediately():
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("bad request — not UNAVAILABLE")

    with pytest.raises(ValueError):
        retry_call(broken)
    assert len(calls) == 1
