"""Shared utilities: metrics sinks, timers, profiler hooks."""

from transgo_tpu.utils.metrics import MetricLogger  # noqa: F401
