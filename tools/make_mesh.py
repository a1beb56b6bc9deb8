"""Generate the bundled original test meshes (deterministic, no deps).

scenes/asteroid.obj: an icosphere displaced by a few low-frequency
sinusoids — ~1-5k triangles of irregular, BVH-unfriendly geometry with
vertex normals and spherical texcoords. Regenerate with:

    python tools/make_mesh.py [subdivisions]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def icosahedron():
    p = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
            [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
            [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    return v, f


def subdivide(v, f):
    """Split each triangle into 4, reprojecting midpoints onto the sphere."""
    cache = {}
    verts = list(v)

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in cache:
            m = (verts[a] + verts[b]) / 2.0
            m = m / np.linalg.norm(m)
            cache[key] = len(verts)
            verts.append(m)
        return cache[key]

    out = []
    for a, b, c in f:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        out += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
    return np.array(verts), np.array(out, np.int64)


def displace(v):
    """Low-frequency sinusoidal radial displacement (an 'asteroid')."""
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    r = (
        1.0
        + 0.22 * np.sin(3.1 * x + 1.3) * np.cos(2.7 * y)
        + 0.15 * np.sin(4.3 * z + 0.7) * np.sin(2.2 * x + 2.1)
        + 0.09 * np.cos(5.9 * y + 4.2) * np.cos(3.8 * z)
    )
    return v * r[:, None]


def vertex_normals(v, f):
    n = np.zeros_like(v)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    fn = np.cross(e1, e2)
    for i in range(3):
        np.add.at(n, f[:, i], fn)
    return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)


def spherical_uv(v):
    d = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-20)
    u = 0.5 + np.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi)
    w = 0.5 - np.arcsin(np.clip(d[:, 1], -1, 1)) / np.pi
    return np.stack([u, w], 1)


def write_obj(path, v, f, n, uv):
    with open(path, "w") as out:
        out.write("# asteroid.obj — original procedural mesh (tools/make_mesh.py)\n")
        for p in v:
            out.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for t in uv:
            out.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        for p in n:
            out.write(f"vn {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for a, b, c in f + 1:
            out.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")


def main(subdiv: int = 3, name: str = "asteroid.obj") -> None:
    v, f = icosahedron()
    for _ in range(subdiv):
        v, f = subdivide(v, f)
    v = displace(v)
    n = vertex_normals(v, f)
    uv = spherical_uv(v)
    out = REPO / "scenes" / name
    write_obj(out, v, f, n, uv)
    print(f"wrote {out}: {len(v)} vertices, {len(f)} triangles")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 3,
        sys.argv[2] if len(sys.argv) > 2 else "asteroid.obj",
    )
