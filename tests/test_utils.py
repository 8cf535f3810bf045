"""utils: stage timers, loggers, profiling hooks."""

import time

from ai_based_frame_interpolation_tpu.utils.logging import (StageTimer,
                                                            get_logger)
from ai_based_frame_interpolation_tpu.utils.profiling import (
    device_memory_stats, trace)


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("encode"):
        pass
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert s["decode"]["seconds"] >= 0.02
    lines = []
    t.log_summary(lines.append)
    assert any("decode" in ln for ln in lines)


def test_logger_singleton():
    a = get_logger("fi_test")
    b = get_logger("fi_test")
    assert a is b and a.handlers


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not require a profiler backend


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
