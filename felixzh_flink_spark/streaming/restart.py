"""Restart strategies — the driver-level supervision Flink configures
via `env.setRestartStrategy(...)` (reference:
format/src/main/java/com/felixzh/flink/format/json/Json2Json.java:21,
canal_json/Kafka2Print.java:22 — `RestartStrategies.noRestart()`),
re-expressed for Spark's execution model.

Flink restarts failed jobs inside the cluster from the last completed
checkpoint; Structured Streaming's analog is a driver loop that
restarts the query against the SAME checkpointLocation — the offset log
replays the in-flight micro-batch, so a restart resumes exactly where
the failure struck (the semantics the reference relies on). This module
implements Flink's four policies as small deterministic objects plus
the supervision loops that apply them to a plain job callable
(`run_with_restart`) or a StreamingQuery factory
(`run_streaming_with_restart`).

Clock and sleep are injectable so the policy math is unit-testable
without real waiting; the streaming loop is proven end-to-end in
tests/test_restart.py with a query that crashes mid-stream and resumes
from its checkpoint.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Callable


class RestartPolicy:
    """Base: `next_delay(now)` records a failure at monotonic time
    `now` and returns the backoff seconds before the next attempt, or
    None when the policy gives up (the supervisor re-raises)."""

    def next_delay(self, now: float) -> float | None:  # pragma: no cover
        raise NotImplementedError


class NoRestart(RestartPolicy):
    """Fail fast — the reference's configured choice
    (RestartStrategies.noRestart())."""

    def next_delay(self, now: float) -> float | None:
        return None


@dataclass
class FixedDelay(RestartPolicy):
    """Flink fixedDelayRestart(attempts, delay): up to `attempts`
    restarts, constant delay between them."""

    attempts: int
    delay_s: float
    _used: int = field(default=0, init=False)

    def next_delay(self, now: float) -> float | None:
        if self._used >= self.attempts:
            return None
        self._used += 1
        return self.delay_s


@dataclass
class FailureRate(RestartPolicy):
    """Flink failureRateRestart(max, interval, delay): give up when
    MORE than `max_failures` land inside a sliding `interval_s`
    window; otherwise restart after `delay_s`. Failures older than the
    window stop counting — a long-stable job earns back its budget."""

    max_failures: int
    interval_s: float
    delay_s: float
    _times: deque = field(default_factory=deque, init=False)

    def next_delay(self, now: float) -> float | None:
        self._times.append(now)
        while self._times and now - self._times[0] > self.interval_s:
            self._times.popleft()
        if len(self._times) > self.max_failures:
            return None
        return self.delay_s


@dataclass
class ExponentialDelay(RestartPolicy):
    """Flink exponentialDelayRestart: delay grows by `multiplier` per
    consecutive failure up to `max_s`, and resets to `initial_s` after
    `reset_after_s` of stable running (measured between failures).
    Never gives up — the policy for must-stay-up pipelines."""

    initial_s: float
    max_s: float
    multiplier: float = 2.0
    reset_after_s: float = float("inf")
    _streak: int = field(default=0, init=False)
    _last: float | None = field(default=None, init=False)
    _last_delay: float = field(default=0.0, init=False)

    def next_delay(self, now: float) -> float | None:
        # stable-RUNNING time, like Flink's reset-backoff-threshold:
        # the gap between failures includes the backoff sleep itself,
        # so subtract the previously granted delay — otherwise any
        # reset_after_s <= the current delay resets the streak on every
        # crash-loop iteration and the backoff never grows
        if self._last is not None and \
                now - self._last - self._last_delay > self.reset_after_s:
            self._streak = 0
        self._last = now
        delay = min(self.max_s,
                    self.initial_s * self.multiplier ** self._streak)
        self._streak += 1
        self._last_delay = delay
        return delay


def run_with_restart(job: Callable[[], object], policy: RestartPolicy,
                     *, sleep: Callable[[float], None] = time.sleep,
                     clock: Callable[[], float] = time.monotonic,
                     on_restart: Callable[[int, BaseException], None]
                     | None = None):
    """Run `job()` under `policy`: on exception consult the policy,
    sleep the returned backoff and retry; re-raise when it gives up.
    Returns the first successful result. The batch-mode face of U6."""
    attempt = 0
    while True:
        try:
            return job()
        except Exception as exc:
            delay = policy.next_delay(clock())
            if delay is None:
                raise
            attempt += 1
            if on_restart is not None:
                on_restart(attempt, exc)
            sleep(delay)


def run_streaming_with_restart(start: Callable[[], "object"],
                               policy: RestartPolicy,
                               *, sleep: Callable[[float], None] = time.sleep,
                               clock: Callable[[], float] = time.monotonic,
                               on_restart: Callable[[int, BaseException],
                                                    None] | None = None
                               ) -> None:
    """Supervise a StreamingQuery factory: `start()` must launch the
    query against a FIXED checkpointLocation and may run it to
    completion (processAllAvailable + stop for tests, awaitTermination
    in production wrappers). A StreamingQueryException consults the
    policy; the restart re-runs `start()`, and Structured Streaming's
    offset log resumes the failed micro-batch exactly — state, offsets
    and sink idempotence all ride the checkpoint, which is what makes
    this the faithful Spark analog of Flink's in-cluster restart."""
    run_with_restart(start, policy, sleep=sleep, clock=clock,
                     on_restart=on_restart)


def policy_from_properties(props: dict) -> RestartPolicy:
    """Build a policy from Flink-shaped properties (the reference
    configures restarts next to its other job properties):
    `restart-strategy` = none | fixed-delay | failure-rate |
    exponential-delay plus the strategy's numeric knobs (seconds)."""
    kind = str(props.get("restart-strategy", "none")).strip().lower()
    if kind in ("none", "no", "norestart", "no-restart"):
        return NoRestart()
    if kind == "fixed-delay":
        return FixedDelay(
            attempts=int(props.get("restart-strategy.fixed-delay.attempts",
                                   3)),
            delay_s=float(props.get("restart-strategy.fixed-delay.delay",
                                    1.0)))
    if kind == "failure-rate":
        return FailureRate(
            max_failures=int(props.get(
                "restart-strategy.failure-rate.max-failures-per-interval",
                3)),
            interval_s=float(props.get(
                "restart-strategy.failure-rate.failure-rate-interval",
                300.0)),
            delay_s=float(props.get("restart-strategy.failure-rate.delay",
                                    1.0)))
    if kind == "exponential-delay":
        return ExponentialDelay(
            initial_s=float(props.get(
                "restart-strategy.exponential-delay.initial-backoff", 1.0)),
            max_s=float(props.get(
                "restart-strategy.exponential-delay.max-backoff", 60.0)),
            multiplier=float(props.get(
                "restart-strategy.exponential-delay.backoff-multiplier",
                2.0)),
            reset_after_s=float(props.get(
                "restart-strategy.exponential-delay.reset-backoff-threshold",
                float("inf"))))
    raise ValueError(f"unknown restart-strategy '{kind}'")
