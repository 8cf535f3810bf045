"""Structured logging (the reference uses bare prints throughout —
SURVEY.md §5 metrics/logging)."""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


def get_logger(name: str = "fi_tpu", level: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, "%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(level or os.environ.get("FI_TPU_LOGLEVEL", "INFO"))
        logger.propagate = False
    return logger


class StageTimer:
    """Per-stage wall-clock accounting for the video pipeline (decode / H2D /
    step / encode), feeding the fps north-star metric (SURVEY.md §5 tracing).

    Usage::

        timer = StageTimer()
        with timer.stage("decode"):
            ...
        timer.summary()  # {'decode': {'seconds': ..., 'count': ...}, ...}
    """

    def __init__(self):
        self.totals: dict = {}

    class _Ctx:
        def __init__(self, timer: "StageTimer", name: str):
            self.timer = timer
            self.name = name

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            entry = self.timer.totals.setdefault(self.name,
                                                 {"seconds": 0.0, "count": 0})
            entry["seconds"] += dt
            entry["count"] += 1

    def stage(self, name: str) -> "StageTimer._Ctx":
        return StageTimer._Ctx(self, name)

    def summary(self) -> dict:
        return {k: dict(v) for k, v in self.totals.items()}

    def log_summary(self, log_fn=print):
        total = sum(v["seconds"] for v in self.totals.values()) or 1e-9
        for name, v in sorted(self.totals.items(),
                              key=lambda kv: -kv[1]["seconds"]):
            log_fn(f"  {name:12s} {v['seconds']:8.3f}s "
                   f"({100 * v['seconds'] / total:5.1f}%)  x{v['count']}")
