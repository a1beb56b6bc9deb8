"""Differentiable / inverse rendering."""

from plutracer_tpu.diff.optimize import InverseRenderConfig, optimize_scene

__all__ = ["InverseRenderConfig", "optimize_scene"]
