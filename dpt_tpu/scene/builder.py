"""Scene assembly: OBJ/procedural geometry + lights + materials → Scene.

Mirrors the reference's scene setup (VulkanRayTracer.cpp:64-162: OBJ parse,
index/material flattening, one hardcoded area light) but with the light list,
materials and mesh source as arguments.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dpt_tpu.scene import procedural
from dpt_tpu.scene.obj import load_obj
from dpt_tpu.scene.scene import Lights, Materials, Scene, default_lights


def _scene_from_arrays(vertices, indices, uvs=None, mat_idx=None,
                       materials=None, lights=None) -> Scene:
    n_tri = len(indices)
    if uvs is None:
        uvs = np.zeros((n_tri, 3, 2), np.float32)
    if mat_idx is None:
        mat_idx = np.zeros((n_tri,), np.int32)
    if materials is None:
        materials = Materials.default(int(np.max(mat_idx)) + 1 if n_tri else 1)
    if lights is None:
        lights = default_lights()
    return Scene(
        vertices=jnp.asarray(vertices, jnp.float32),
        indices=jnp.asarray(indices, jnp.int32),
        uvs=jnp.asarray(uvs, jnp.float32),
        mat_idx=jnp.asarray(mat_idx, jnp.int32),
        materials=materials,
        lights=lights,
    )


def load_scene(path: str, lights: Lights | None = None,
               materials: Materials | None = None) -> Scene:
    """Load any .obj into a Scene (replaces the hardcoded path at
    VulkanRayTracer.cpp:66)."""
    mesh = load_obj(path)
    if materials is None:
        materials = Materials.default(mesh.material_albedo.shape[0])
        materials = Materials(
            albedo=jnp.asarray(mesh.material_albedo, jnp.float32),
            roughness=materials.roughness,
            emission=materials.emission,
            sss_albedo=materials.sss_albedo,
            sss_radius=materials.sss_radius,
        )
    return _scene_from_arrays(
        mesh.vertices, mesh.indices, mesh.uvs, mesh.mat_idx, materials, lights
    )


def cornell_box_scene(lights: Lights | None = None) -> Scene:
    """±1 cube + the reference's single area light — the box.obj setup
    (scenes/box.obj, VulkanRayTracer.cpp:149-162)."""
    v, idx = procedural.box_mesh()
    return _scene_from_arrays(v, idx, lights=lights)


def procedural_scene(n_tris_target: int = 65_000,
                     lights: Lights | None = None) -> Scene:
    """Sylveon-class stand-in scene (the reference asset is missing from the
    snapshot; see BASELINE.md)."""
    # 2 * n_lat * n_lon ≈ target with n_lon = 2 n_lat.
    n_lat = max(int(np.sqrt(n_tris_target / 4.0)), 8)
    v, idx = procedural.bumpy_sphere(n_lat=n_lat, n_lon=2 * n_lat)
    return _scene_from_arrays(v, idx, lights=lights)


def knot_scene(n_tris_target: int = 65_000,
               lights: Lights | None = None) -> Scene:
    """Second Sylveon-class family: a self-shadowing (2,3) torus knot —
    validates that the flagship traversal config is not tuned to the
    near-convex sphere (BASELINE.md second-scene row)."""
    # 2 * n_seg * n_ring ≈ target with n_seg = 8 n_ring.
    n_ring = max(int(np.sqrt(n_tris_target / 16.0)), 8)
    v, idx = procedural.torus_knot(n_seg=8 * n_ring, n_ring=n_ring)
    return _scene_from_arrays(v, idx, lights=lights)
