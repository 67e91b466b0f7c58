"""Shared utilities: relay-safe profiling/tracing, compile cache."""

from .compilation_cache import enable_compilation_cache
from .profiling import Stopwatch, device_sync, trace

__all__ = ["Stopwatch", "device_sync", "enable_compilation_cache", "trace"]
