"""Phase timer (parity: fsql/timer.scala:3-16, used at
fsql/parser.scala:414-423 to time the `parser` and `resolve` phases).
We add the `plan` phase; timings feed bench.py."""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.phases: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1000.0
            self.phases[name] = self.phases.get(name, 0.0) + ms
            if self.enabled:
                print(f"[timer] {name}: {ms:.2f} ms")

    def reset(self):
        self.phases.clear()
