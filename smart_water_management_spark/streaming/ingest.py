"""Ingestion resilience layer (SURVEY.md §2.11 T2/T3/T4).

The reference guards its API polling with a circuit breaker
(`src/enhanced_ingestion.py:99-137`: CLOSED/OPEN/HALF_OPEN, failure
threshold 3, recovery 300 s) and inter-call rate limiting
(`src/enhanced_ingestion.py:264-269`). These are driver-side concerns —
they wrap the fetch function a Structured Streaming ``foreachBatch``
source calls, they are not Spark operators. The engine keeps them as a
dependency-free library so any source (HTTP poller, object-store lister,
CDC tail) gets the same failure semantics.

Batch lineage (T4) is a column stamp applied inside the micro-batch,
mirroring `src/enhanced_ingestion.py:360,524-525`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, TypeVar

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

T = TypeVar("T")


class CircuitOpenError(RuntimeError):
    """Raised when a call is refused because the circuit is OPEN."""


@dataclass
class CircuitBreaker:
    """CLOSED → (failures ≥ threshold) → OPEN → (recovery elapsed) →
    HALF_OPEN → one trial call → CLOSED on success / OPEN on failure.

    Same state machine and defaults as the reference
    (`src/enhanced_ingestion.py:99-137`); ``clock`` is injectable for
    deterministic tests.
    """

    failure_threshold: int = 3
    recovery_seconds: float = 300.0
    clock: Callable[[], float] = time.monotonic
    state: str = "CLOSED"
    failure_count: int = 0
    opened_at: float | None = None

    def call(self, fn: Callable[[], T]) -> T:
        if self.state == "OPEN":
            if self.clock() - self.opened_at >= self.recovery_seconds:
                self.state = "HALF_OPEN"
            else:
                raise CircuitOpenError(
                    f"circuit OPEN for {self.clock() - self.opened_at:.0f}s"
                )
        try:
            result = fn()
        except Exception:
            self.failure_count += 1
            if self.state == "HALF_OPEN" or self.failure_count >= self.failure_threshold:
                self.state = "OPEN"
                self.opened_at = self.clock()
            raise
        else:
            self.state = "CLOSED"
            self.failure_count = 0
            self.opened_at = None
            return result


@dataclass
class RateLimiter:
    """Minimum-interval limiter (reference sleeps between API calls,
    `src/enhanced_ingestion.py:264-269`); ``sleeper``/``clock`` injectable."""

    min_interval_seconds: float
    clock: Callable[[], float] = time.monotonic
    sleeper: Callable[[float], None] = time.sleep
    _last_call: float | None = field(default=None, repr=False)

    def wait(self) -> float:
        """Block until the interval has elapsed; returns seconds slept."""
        now = self.clock()
        slept = 0.0
        if self._last_call is not None:
            remaining = self.min_interval_seconds - (now - self._last_call)
            if remaining > 0:
                self.sleeper(remaining)
                slept = remaining
        self._last_call = self.clock()
        return slept


def stamp_lineage(
    df: DataFrame, batch_id: int, pipeline_version: str = "2.0"
) -> DataFrame:
    """T4: batch lineage columns inside foreachBatch
    (reference src/enhanced_ingestion.py:360,524-525)."""
    return df.withColumns(
        {
            "batch_id": F.lit(batch_id).cast("long"),
            "pipeline_version": F.lit(pipeline_version),
            "ingestion_timestamp": F.current_timestamp(),
        }
    )


@dataclass
class SourceHealth:
    """Per-source health roll-up the orchestrator reports
    (reference production_ingestion.py:363-380)."""

    name: str
    n_success: int = 0
    n_failure: int = 0
    n_refused: int = 0

    @property
    def success_rate(self) -> float:
        total = self.n_success + self.n_failure
        return self.n_success / total if total else 1.0


def resilient_call(
    breaker: CircuitBreaker,
    limiter: RateLimiter | None,
    health: SourceHealth,
    fn: Callable[[], T],
) -> T | None:
    """One guarded source fetch: rate-limit → circuit-check → call,
    recording health. Returns None when the circuit refuses the call
    (the polling loop just skips the tick, like the reference)."""
    if limiter is not None:
        limiter.wait()
    try:
        result = breaker.call(fn)
    except CircuitOpenError:
        health.n_refused += 1
        return None
    except Exception:
        health.n_failure += 1
        raise
    health.n_success += 1
    return result
