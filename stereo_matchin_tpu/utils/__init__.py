"""Shared utilities: relay-safe profiling/tracing."""

from .profiling import Stopwatch, device_sync, trace

__all__ = ["Stopwatch", "device_sync", "trace"]
