"""Scene containers — flat SoA float32/int32 arrays, registered as pytrees.

The reference packs the scene into six SSBOs (vertex/index/BVH/light/UV/matIdx,
VulkanRayTracer.cpp:100-311); here the same data lives in a Scene pytree that
jit/pjit can replicate or shard.  Differentiable fields (vertices, materials,
light parameters) are leaves, so `jax.grad` w.r.t. a Scene works directly.

Deviation from the reference: the shader indexes the texcoord array with the
*vertex* index (raytrace_comp.comp:151-153 uses indices[], which holds
tinyobj vertex_index — VulkanRayTracer.cpp:79), which misaddresses UVs for any
mesh where texcoord topology differs from position topology.  We store
per-corner UVs [T, 3, 2] resolved through the OBJ texcoord indices instead.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Lights:
    """Rectangular area lights, GPU-layout parallel arrays (Light.h:6-12)."""

    position: jax.Array  # [L, 3]
    normal: jax.Array  # [L, 3], normalised (Light.cpp:28)
    intensity: jax.Array  # [L, 3]
    size: jax.Array  # [L, 2] width, height

    @property
    def count(self) -> int:
        return self.position.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Materials:
    """Per-material shading parameters.

    The reference fetches matIdx (raytrace_comp.comp:192) but then shades with
    hardcoded constants (albedo 0.8 at :341, SSS albedo (1, .2, .1) and radius
    1.0 at :371-373).  Here they are per-material *parameters* (north-star
    requirement); the default material reproduces the reference constants.
    """

    albedo: jax.Array  # [M, 3]
    roughness: jax.Array  # [M]
    emission: jax.Array  # [M, 3]
    sss_albedo: jax.Array  # [M, 3]
    sss_radius: jax.Array  # [M]

    @staticmethod
    def default(n: int = 1) -> "Materials":
        # roughness is the Oren–Nayar sigma (render/shading.py); 0 = Lambert,
        # which reproduces the reference's shading exactly.
        return Materials(
            albedo=jnp.full((n, 3), 0.8, jnp.float32),
            roughness=jnp.zeros((n,), jnp.float32),
            emission=jnp.zeros((n, 3), jnp.float32),
            sss_albedo=jnp.tile(
                jnp.array([[1.0, 0.2, 0.1]], jnp.float32), (n, 1)
            ),
            sss_radius=jnp.full((n,), 1.0, jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    vertices: jax.Array  # [V, 3] float32
    indices: jax.Array  # [T, 3] int32 (static topology)
    uvs: jax.Array  # [T, 3, 2] float32 per-corner texcoords
    mat_idx: jax.Array  # [T] int32
    materials: Materials
    lights: Lights

    @property
    def n_triangles(self) -> int:
        return self.indices.shape[0]

    def tri_vertices(self):
        """Gathered triangle corners (v0, v1, v2), each [T, 3]."""
        idx = self.indices
        return (
            self.vertices[idx[:, 0]],
            self.vertices[idx[:, 1]],
            self.vertices[idx[:, 2]],
        )


def make_area_lights(positions, normals, intensities, sizes) -> Lights:
    """Pack parallel python/numpy lists into a Lights pytree (Light.cpp:16-33).

    Normals are normalised on pack, as in Light.cpp:28.
    """
    normals = np.asarray(normals, np.float32)
    normals = normals / np.maximum(
        np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20
    )
    return Lights(
        position=jnp.asarray(np.asarray(positions, np.float32)),
        normal=jnp.asarray(normals),
        intensity=jnp.asarray(np.asarray(intensities, np.float32)),
        size=jnp.asarray(np.asarray(sizes, np.float32)),
    )


def default_lights() -> Lights:
    """The reference's single hardcoded area light (VulkanRayTracer.cpp:149-162):
    position (0, 2, 0), normal (0, -1, 0), intensity (10, 10, 10), size 2.5x2.5.
    """
    return make_area_lights(
        positions=[[0.0, 2.0, 0.0]],
        normals=[[0.0, -1.0, 0.0]],
        intensities=[[10.0, 10.0, 10.0]],
        sizes=[[2.5, 2.5]],
    )
