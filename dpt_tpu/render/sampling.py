"""Monte-Carlo sampling routines (vectorised, fixed draw schedule).

Each routine reproduces the corresponding GLSL function in
raytrace_comp.comp and threads RNG state functionally.  All inputs/outputs
are batched along leading axes; vectors are [..., 3] float32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dpt_tpu.render.rng import rng_next

_PI = np.float32(3.14159265358979323846)


def random_gaussian(state):
    """Box–Muller 2-D Gaussian (raytrace_comp.comp:218-226).

    Returns (state, g) with g[..., 2].
    """
    state, u1 = rng_next(state)
    state, u2 = rng_next(state)
    u1 = jnp.maximum(jnp.float32(1e-38), u1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = 2.0 * _PI * u2
    return state, jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def _orthonormal_basis(normal):
    """Tangent frame used by sampleHemisphere (raytrace_comp.comp:238-240).

    up = +Z unless |n.z| >= 0.999, then +X.
    """
    nz = jnp.abs(normal[..., 2]) < 0.999
    up = jnp.where(
        nz[..., None],
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    tangent = jnp.cross(up, normal)
    # Safe normalise: masked lanes may carry a zero normal.
    tlen = jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-20)
    tangent = tangent / tlen
    bitangent = jnp.cross(normal, tangent)
    return tangent, bitangent


def sample_hemisphere(normal, state):
    """Cosine-weighted hemisphere about `normal` (raytrace_comp.comp:229-243)."""
    state, r1 = rng_next(state)
    state, r2 = rng_next(state)
    theta = jnp.arccos(jnp.sqrt(jnp.clip(1.0 - r1, 0.0, 1.0)))
    phi = 2.0 * _PI * r2
    st = jnp.sin(theta)
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)
    tangent, bitangent = _orthonormal_basis(normal)
    d = (
        tangent * local[..., 0:1]
        + bitangent * local[..., 1:2]
        + normal * local[..., 2:3]
    )
    return state, d


def sample_sphere(state, shape=()):
    """Uniform direction on the unit sphere (raytrace_comp.comp:246-253)."""
    state, u1 = rng_next(state)
    state, u2 = rng_next(state)
    z = 2.0 * u1 - 1.0
    theta = 2.0 * _PI * u2
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return state, jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


def light_basis(normal):
    """Rectangular-light tangent frame (raytrace_comp.comp:261-264).

    basis = +Y unless |n.y| >= 0.999, then +X; right = normalize(n × basis);
    up = right × n.  `normal` is assumed normalised (Light.cpp:28).
    """
    ny = jnp.abs(normal[..., 1]) < 0.999
    basis = jnp.where(
        ny[..., None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    right = jnp.cross(normal, basis)
    rlen = jnp.maximum(jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-20)
    right = right / rlen
    up = jnp.cross(right, normal)
    return right, up


def sample_area_light(light_pos, light_normal, light_size, state):
    """Uniform point on a rectangular area light (raytrace_comp.comp:255-268)."""
    state, u = rng_next(state)
    state, v = rng_next(state)
    u = u * 2.0 - 1.0
    v = v * 2.0 - 1.0
    right, up = light_basis(light_normal)
    point = (
        light_pos
        + right * (u * light_size[..., 0] * 0.5)[..., None]
        + up * (v * light_size[..., 1] * 0.5)[..., None]
    )
    return state, point


def intersect_area_light(origin, direction, light_pos, light_normal, light_size):
    """Ray ∩ finite rectangle (raytrace_comp.comp:271-298).

    Returns (hit_mask, t).  `light_normal` assumed normalised.
    """
    denom = jnp.sum(light_normal * direction, axis=-1)
    parallel = jnp.abs(denom) < 1e-4
    safe_denom = jnp.where(parallel, 1.0, denom)
    t = jnp.sum(light_normal * (light_pos - origin), axis=-1) / safe_denom
    hit_pos = origin + direction * t[..., None]
    right, up = light_basis(light_normal)
    to_hit = hit_pos - light_pos
    u = jnp.sum(to_hit * right, axis=-1)
    v = jnp.sum(to_hit * up, axis=-1)
    inside = (jnp.abs(u) <= light_size[..., 0] * 0.5) & (
        jnp.abs(v) <= light_size[..., 1] * 0.5
    )
    hit = (~parallel) & (t > 0.0) & inside
    return hit, t
