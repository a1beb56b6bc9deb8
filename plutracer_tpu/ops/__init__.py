"""Compute ops: batched, branchless kernels over SceneArrays.

Everything operates on megabatches of rays (shape (B, ...)) against the
scene's SoA primitive/material/light tables. Discrete choices (primitive
type, material type, light type) are masked selects, never Python branches,
so the whole render step traces into a single XLA program.
"""
