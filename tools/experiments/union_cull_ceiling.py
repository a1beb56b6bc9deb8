#!/usr/bin/env python
"""Measure the ceiling of tile-granular chunk culling on mesh1.

For realistic bounce-1 rays (random asteroid surface points, cosine
directions), compute per-chunk AABB ray hits, then compare:
  per-ray hit fraction   — what a perfect per-ray traversal would test
  per-tile union (4096)  — what ANY whole-tile skip scheme can achieve,
                           under several sort keys
If the union fraction is ~1, tile-granular culling is structurally dead
on incoherent bounces regardless of sort quality (the r4/r5 conclusion);
the per-ray fraction is the prize a per-lane scheme would win.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from plutracer_tpu.scene import compile_scene, load_scene_file
from plutracer_tpu.ops.pallas.integrator_kernel import pack_mega_np, PCHUNK

rng = np.random.default_rng(0)

d = load_scene_file("/root/repo/scenes/mesh1.urn", ["/res", "64x64"])
s = compile_scene(d)
mega = pack_mega_np(s)
tbl = np.concatenate([t for t in (mega.sph, mega.box, mega.tri) if t.size], 0)
nch = tbl.shape[0] // PCHUNK
cmin = tbl[::PCHUNK, 32:35]  # (nch, 3)
cmax = tbl[::PCHUNK, 35:38]
print(f"P={tbl.shape[0]} chunks={nch}")

# realistic shading points: uniform over triangle rows
tri = np.asarray(s.prim_type) == 2
a = np.asarray(s.prim_a)[tri]; b = np.asarray(s.prim_b)[tri]; c = np.asarray(s.prim_c)[tri]
N = 65536
idx = rng.integers(0, a.shape[0], N)
u = rng.random((N, 2))
w = 1.0 - u.sum(1, keepdims=True)
p = a[idx] * u[:, :1] + b[idx] * u[:, 1:] + c[idx] * np.clip(w, 0, 1)
n = np.cross(b[idx] - a[idx], c[idx] - a[idx])
n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
# cosine hemisphere about n (isotropic diffuse bounce)
dirs = rng.normal(size=(N, 3))
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
flip = np.sign((dirs * n).sum(1, keepdims=True))
dirs *= np.where(flip == 0, 1.0, flip)

def slab_hits(p, d):
    """(N, nch) bool: ray hits chunk AABB with tmax>=0."""
    rinv = 1.0 / np.where(d == 0.0, 1e-20, d)
    t1 = (cmin[None] - p[:, None]) * rinv[:, None]
    t2 = (cmax[None] - p[:, None]) * rinv[:, None]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    return (tmax >= tmin) & (tmax >= 0.0)

B = 8192  # chunked to bound memory
hits = np.zeros((N, nch), bool)
for i in range(0, N, B):
    hits[i:i + B] = slab_hits(p[i:i + B], dirs[i:i + B])

per_ray = hits.mean()
print(f"per-ray chunk hit fraction: {per_ray:.3f}")

def morton(pp):
    lo, hi = pp.min(0), pp.max(0)
    g = np.clip((pp - lo) / np.maximum(hi - lo, 1e-9), 0, 1)
    q = (g * 1023).astype(np.uint64)
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)

def union_frac(order, tile=4096):
    h = hits[order]
    fr = []
    for i in range(0, N, tile):
        fr.append(h[i:i + tile].any(0).mean())
    return float(np.mean(fr))

keys = {
    "unsorted": np.arange(N),
    "morton(origin)": np.argsort(morton(p)),
    "octant+morton": np.argsort(
        (((dirs[:, 0] >= 0) * 4 + (dirs[:, 1] >= 0) * 2 + (dirs[:, 2] >= 0)).astype(np.uint64) << 30)
        | morton(p)),
    "fine-dir+morton": np.argsort(
        ((np.clip(((dirs[:, 0] + 1) * 4).astype(np.uint64), 0, 7) << 36)
         | (np.clip(((dirs[:, 1] + 1) * 4).astype(np.uint64), 0, 7) << 33)
         | (np.clip(((dirs[:, 2] + 1) * 4).astype(np.uint64), 0, 7) << 30)
         | morton(p))),
}
for nm, order in keys.items():
    for tile in (4096, 1024):
        print(f"union frac [{nm:16s}] tile={tile}: {union_frac(order, tile):.3f}")
