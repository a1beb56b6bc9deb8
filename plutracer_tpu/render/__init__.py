"""Rendering: wavefront path-tracing integrator + render drivers.

Drivers, least to most machinery: ``render``/``render_image`` (one
process, one device), ``progressive.render_with_checkpoint`` (resumable
accumulation), ``elastic.render_elastic`` (device-mesh sharded with a
topology-free checkpoint), ``supervisor.supervise_render`` (worker
subprocess + failure detection + auto-restart).
"""

from plutracer_tpu.render.integrator import ray_color
from plutracer_tpu.render.renderer import render, render_image

__all__ = ["ray_color", "render", "render_image"]
