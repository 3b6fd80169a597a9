"""Dispatch watchdog: self-diagnosis for anomalous device launches.

Round 3 observed a one-off 1694 s fused-megarun dispatch whose fresh-process
repeats took 4.1 s (docs/BENCHMARKS.md round-3 anomaly note); the mitigation
(the FUSE_MAX_PBS cap) is kept, but the executor had no instrumentation that
would let a recurrence be *attributed* (relay stall vs XLA recompile vs
donation bug).  This module is that instrumentation (VERDICT r3 #8): a
per-launch-shape exponential moving average of wall time; when a launch
exceeds ``ratio`` x its established EMA (and an absolute floor, so cheap
launches never alarm), a structured warning is logged with the shape key,
the elapsed time, and the expectation it violated.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

logger = logging.getLogger("fhe_regex_tpu.watchdog")


class LaunchWatchdog:
    """EMA-based anomaly detector for repeated same-shape launches.

    ``observe(key, seconds)`` returns a warning string (also logged) when
    the launch is anomalous, else None.  The first ``warmup`` observations
    of a key only train the EMA — cold compiles are expected to be slow and
    must not alarm.
    """

    def __init__(self, ratio: float = 10.0, floor_seconds: float = 5.0,
                 alpha: float = 0.3, warmup: int = 1):
        self.ratio = ratio
        self.floor = floor_seconds
        self.alpha = alpha
        self.warmup = warmup
        self._ema: Dict[Tuple, float] = {}
        self._seen: Dict[Tuple, int] = {}

    def observe(self, key: Tuple, seconds: float) -> Optional[str]:
        seen = self._seen.get(key, 0)
        self._seen[key] = seen + 1
        if seen < self.warmup:
            return None        # cold compile: discard, don't train the EMA
        ema = self._ema.get(key)
        if ema is None:
            self._ema[key] = seconds       # first warm observation seeds it
            return None
        if seconds > self.floor and seconds > self.ratio * ema:
            warning = (
                f"anomalous launch: shape {key} took {seconds:.1f}s vs "
                f"EMA {ema:.2f}s (> {self.ratio:.0f}x) — suspect relay "
                f"stall / silent XLA recompile / host contention; see "
                f"docs/BENCHMARKS.md round-3 anomaly note")
            logger.warning(warning)
            # do NOT fold the anomaly into the EMA: one stall must not
            # desensitize the detector to the next one
            return warning
        self._ema[key] = (1 - self.alpha) * ema + self.alpha * seconds
        return None
