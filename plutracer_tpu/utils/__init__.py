"""Utilities: profiling, metrics, structured logging."""

from plutracer_tpu.utils.profiling import PhaseTimer, RenderStats, profile_trace

__all__ = ["PhaseTimer", "RenderStats", "profile_trace"]
