"""Procedural meshes: unit cube + a Sylveon-class high-poly stand-in.

The reference's showcase asset `scenes/Sylveon.obj` is stripped from the
snapshot (.MISSING_LARGE_BLOBS); `bumpy_sphere` generates a displaced UV
sphere of comparable triangle count for configs 3-5.  `box_mesh` reproduces
the Blender default cube of scenes/box.obj (8 verts at ±1, 6 quads → 12 tris
after fan triangulation) without parsing the reference asset.
"""

from __future__ import annotations

import numpy as np


def box_mesh():
    """Axis-aligned ±1 cube, quads fan-triangulated like tinyobjloader.

    Returns (vertices [8,3] f32, indices [12,3] i32).
    """
    v = np.array(
        [
            [1, 1, -1],
            [1, -1, -1],
            [1, 1, 1],
            [1, -1, 1],
            [-1, 1, -1],
            [-1, -1, -1],
            [-1, 1, 1],
            [-1, -1, 1],
        ],
        np.float32,
    )
    # Six quads (outward-facing, Blender cube winding), 0-based.
    quads = np.array(
        [
            [0, 4, 6, 2],  # +Y
            [3, 2, 6, 7],  # +Z
            [7, 6, 4, 5],  # -X
            [5, 1, 3, 7],  # -Y
            [1, 0, 2, 3],  # +X
            [5, 4, 0, 1],  # -Z
        ],
        np.int32,
    )
    tris = []
    for q in quads:
        tris.append([q[0], q[1], q[2]])
        tris.append([q[0], q[2], q[3]])
    return v, np.asarray(tris, np.int32)


def bumpy_sphere(n_lat: int = 128, n_lon: int = 256, radius: float = 1.0,
                 bump: float = 0.15, seed: int = 0):
    """Displaced UV sphere — Sylveon-class stand-in.

    Triangle count = 2 * (n_lat - 1) * n_lon (minus pole degenerates pruned).
    Default ≈ 65k triangles; n_lat=256,n_lon=512 ≈ 260k.
    Returns (vertices [V,3] f32, indices [T,3] i32).
    """
    lat = np.linspace(0.0, np.pi, n_lat + 1)
    lon = np.linspace(0.0, 2.0 * np.pi, n_lon, endpoint=False)
    theta, phi = np.meshgrid(lat, lon, indexing="ij")  # [n_lat+1, n_lon]
    # Smooth multi-frequency displacement (deterministic).
    r = radius * (
        1.0
        + bump * np.sin(5 * theta) * np.cos(7 * phi + seed)
        + 0.5 * bump * np.sin(11 * phi) * np.sin(3 * theta + seed)
    )
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.cos(theta)
    z = r * np.sin(theta) * np.sin(phi)
    verts = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)

    def vid(i, j):
        return i * n_lon + (j % n_lon)

    tris = []
    # Outward-facing winding (the integrator shades with unflipped geometric
    # normals, matching raytrace_comp.comp:189 — inward winding renders black).
    for i in range(n_lat):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i + 1, j)
            c, d = vid(i + 1, j + 1), vid(i, j + 1)
            if i > 0:  # skip degenerate top-pole fan halves
                tris.append([a, d, b])
            if i < n_lat - 1:
                tris.append([b, d, c])
    return verts, np.asarray(tris, np.int32)
