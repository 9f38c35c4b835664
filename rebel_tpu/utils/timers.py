"""Phase timers and metric counters.

Ports the reference's hand-rolled profiling utilities
(/root/reference/cfvpy/utils.py:28-95, 144-170): named-phase wall-clock
accumulators driving the ``timing/*`` and ``timing_pct/*`` metrics, and
the fraction/max accumulators used for per-epoch metric dicts.  For deep
performance work use ``jax.profiler`` traces (see ``bench.py --profile``);
these lightweight timers are for steady-state metric reporting.
"""

from __future__ import annotations

import time
from collections import defaultdict


class StopWatchTimer:
    """Start/stop accumulator (utils.py:28-47)."""

    def __init__(self, auto_start: bool = True):
        self.elapsed = 0.0
        self._started: float | None = None
        if auto_start:
            self.start()

    def start(self) -> None:
        self._started = time.time()

    def stop(self) -> None:
        if self._started is not None:
            self.elapsed += time.time() - self._started
            self._started = None

    @property
    def running_time(self) -> float:
        extra = time.time() - self._started if self._started is not None else 0
        return self.elapsed + extra


class MultiStopWatchTimer:
    """Accumulates time per named phase; starting a phase stops the
    previous one (utils.py:50-67)."""

    def __init__(self):
        self._timings: dict[str, float] = defaultdict(float)
        self._current: str | None = None
        self._started = 0.0

    def start(self, name: str) -> None:
        now = time.time()
        if self._current is not None:
            self._timings[self._current] += now - self._started
        self._current = name
        self._started = now

    def stop(self) -> None:
        if self._current is not None:
            self._timings[self._current] += time.time() - self._started
            self._current = None

    @property
    def timings(self) -> dict[str, float]:
        return dict(self._timings)

    def metrics(self, denominator: float = 1.0) -> dict[str, float]:
        """timing/* and timing_pct/* metric dict (selfplay.py:574-579)."""
        out = {}
        total = 1e-5
        for k, v in self._timings.items():
            out[f"timing/{k}"] = v / denominator
            total += v
        for k, v in self._timings.items():
            out[f"timing_pct/{k}"] = v * 100 / total
        return out


class FractionCounter:
    """Weighted-average accumulator (utils.py:144-158)."""

    def __init__(self):
        self._num = 0.0
        self._denom = 0.0

    def update(self, numerator, denominator=1.0) -> None:
        self._num += float(numerator)
        self._denom += float(denominator)

    def value(self) -> float:
        return self._num / self._denom if self._denom else 0.0


class MaxCounter:
    """Running max (utils.py:161-170)."""

    def __init__(self):
        self._value: float | None = None

    def update(self, value) -> None:
        v = float(value)
        self._value = v if self._value is None else max(self._value, v)

    def value(self) -> float:
        return self._value if self._value is not None else 0.0
