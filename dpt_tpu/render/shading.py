"""Shading terms beyond the reference's fixed Lambert: UV textures and the
Oren–Nayar rough-diffuse factor.

The reference interpolates per-corner UVs at every hit
(raytrace_comp.comp:151-157) but never consumes them, and fetches matIdx
(:192) but shades with hardcoded constants (:341).  Here both become live,
differentiable material parameters (north-star requirement):

  - `interpolate_uv` reproduces the shader's barycentric interpolation.
  - `checker_albedo` modulates albedo by a procedural UV checker
    (cfg.uv_texture='checker'); 'none' preserves reference shading exactly.
  - `oren_nayar_factor` scales the NEE diffuse term by the qualitative
    Oren–Nayar model (Fujii fast form).  sigma = material roughness;
    sigma=0 gives exactly 1.0 → bit-identical to the reference's Lambert
    (the default material), so roughness is a *parameter with a nonzero
    gradient* without changing baseline images.

The scalar twins (suffix `_s`) keep oracle/scalar.py in lockstep — the
oracle-equality tests cover every branch here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def interpolate_uv(uv_corners, u, v):
    """Barycentric UV interpolation (raytrace_comp.comp:151-157).

    uv_corners: [R, 3, 2] per-corner texcoords of the hit triangle;
    u, v: [R] Möller–Trumbore barycentrics of corners 1 and 2.
    """
    w = (1.0 - u - v)[:, None]
    return (
        w * uv_corners[:, 0]
        + u[:, None] * uv_corners[:, 1]
        + v[:, None] * uv_corners[:, 2]
    )


def checker_albedo(albedo, uv, scale: float):
    """Albedo × procedural checker: cells alternate 1.0 / 0.25."""
    cell = jnp.floor(uv[:, 0] * scale) + jnp.floor(uv[:, 1] * scale)
    parity = jnp.mod(cell, 2.0)
    factor = jnp.where(parity < 1.0, 1.0, 0.25)
    return albedo * factor[:, None]


def checker_albedo_s(albedo, uv, scale: float):
    cell = math.floor(uv[0] * scale) + math.floor(uv[1] * scale)
    factor = 1.0 if (cell % 2.0) < 1.0 else 0.25
    return tuple(a * factor for a in albedo)


def oren_nayar_factor(n, l, v, sigma):
    """Qualitative Oren–Nayar factor (Fujii fast form), vectorized.

    n: [R,3] shading normal; l: [R,3] light dir; v: [R,3] view dir
    (toward the camera, i.e. -ray.d); sigma: [R] roughness.
    sigma == 0 → exactly 1.0 (Lambert / reference parity).
    """
    cos_i = jnp.sum(n * l, axis=-1)
    cos_r = jnp.sum(n * v, axis=-1)
    s = jnp.sum(l * v, axis=-1) - cos_i * cos_r
    t = jnp.where(s > 0.0, jnp.maximum(jnp.maximum(cos_i, cos_r), 1e-6), 1.0)
    s2 = sigma * sigma
    a = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b = 0.45 * s2 / (s2 + 0.09)
    return a + b * jnp.maximum(s, 0.0) / t


def oren_nayar_factor_s(n, l, v, sigma):
    cos_i = sum(n[k] * l[k] for k in range(3))
    cos_r = sum(n[k] * v[k] for k in range(3))
    s = sum(l[k] * v[k] for k in range(3)) - cos_i * cos_r
    t = max(max(cos_i, cos_r), 1e-6) if s > 0.0 else 1.0
    s2 = sigma * sigma
    a = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b = 0.45 * s2 / (s2 + 0.09)
    return a + b * max(s, 0.0) / t


def interpolate_uv_s(uv_corners, u, v):
    w = 1.0 - u - v
    return (
        w * uv_corners[0][0] + u * uv_corners[1][0] + v * uv_corners[2][0],
        w * uv_corners[0][1] + u * uv_corners[1][1] + v * uv_corners[2][1],
    )
