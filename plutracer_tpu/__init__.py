"""plutracer-tpu: a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
plutracer reference renderer (C++14, CPU):

- the **urn** scene-description DSL (tokenizer / values / evaluator / stdlib / REPL)
- a scene compiler producing structure-of-arrays scene representations
- wavefront path tracing with next-event estimation + MIS on megabatches of rays
- sphere / box / triangle-mesh geometry, BVH acceleration
- Lambert / specular-reflection / specular-transmission / glass BSDFs,
  procedural + image textures
- point and diffuse-area lights
- Reinhard tonemapping, BMP I/O, bitmap-font watermarks
- end-to-end differentiability (pixel loss -> material/texture/light params)
- multi-chip scaling via jax.sharding meshes + shard_map

Architecture is TPU-first: scenes are arrays, rays are megabatches, the bounce
loop is a fixed-depth `lax.scan` with alive masks, RNG is counter-based
`jax.random`, and accelerator control flow is branchless masked select.
"""

__version__ = "0.1.0"

from plutracer_tpu.semantics import RenderOptions  # noqa: F401
