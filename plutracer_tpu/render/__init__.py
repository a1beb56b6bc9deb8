"""Rendering: wavefront path-tracing integrator + render drivers."""

from plutracer_tpu.render.integrator import ray_color
from plutracer_tpu.render.renderer import render, render_image

__all__ = ["ray_color", "render", "render_image"]
