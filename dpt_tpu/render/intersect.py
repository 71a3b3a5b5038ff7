"""Geometric intersection kernels (vectorised, branch-free).

Möller–Trumbore and slab-AABB tests matching raytrace_comp.comp:102-157, as
masked arithmetic over ray/triangle batches — no divergent control flow, so
every op maps onto the TPU VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

T_MAX = np.float32(1e30)


def intersect_aabb(origin, inv_dir, box_min, box_max):
    """Slab test (raytrace_comp.comp:102-112).

    origin/inv_dir: [..., 3]; box_min/box_max: [..., 3] broadcastable.
    Returns (hit, t_min, t_max).
    """
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    t_min = jnp.max(t_near, axis=-1)
    t_max = jnp.min(t_far, axis=-1)
    return (t_min <= t_max) & (t_max >= 0.0), t_min, t_max


def moller_trumbore(origin, direction, v0, v1, v2, eps=1e-6):
    """Ray/triangle test (raytrace_comp.comp:114-149), branch-free.

    All args broadcast; origin/direction [..., 3], v0/v1/v2 [..., 3].
    Returns (hit, t, u, v): hit is the boolean validity mask, t the ray
    parameter (garbage where ~hit), (u, v) barycentrics of v1/v2.
    """
    edge1 = v1 - v0
    edge2 = v2 - v0
    pvec = jnp.cross(direction, edge2)
    det = jnp.sum(edge1 * pvec, axis=-1)
    parallel = jnp.abs(det) < eps
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    tvec = origin - v0
    u = inv_det * jnp.sum(tvec * pvec, axis=-1)
    qvec = jnp.cross(tvec, edge1)
    v = inv_det * jnp.sum(direction * qvec, axis=-1)
    t = inv_det * jnp.sum(edge2 * qvec, axis=-1)
    hit = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    return hit, t, u, v


def brute_force_nearest(origin, direction, tri_v0, tri_v1, tri_v2, eps=1e-6):
    """Nearest hit by testing every triangle (the reference's traceRay
    semantics minus the BVH, raytrace_comp.comp:159-204).

    origin/direction: [R, 3]; tri_v*: [T, 3].
    Returns (hit [R], t [R], tri_idx [R] int32, u [R], v [R]).
    Ties in t resolve to the lowest triangle index.
    """
    o = origin[:, None, :]
    d = direction[:, None, :]
    hit, t, u, v = moller_trumbore(o, d, tri_v0[None], tri_v1[None], tri_v2[None], eps)
    t_masked = jnp.where(hit, t, T_MAX)
    tri_idx = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    r = jnp.arange(origin.shape[0])
    best_t = t_masked[r, tri_idx]
    any_hit = best_t < T_MAX
    return any_hit, best_t, tri_idx, u[r, tri_idx], v[r, tri_idx]


def brute_force_occluded(origin, direction, max_dist, tri_v0, tri_v1, tri_v2,
                         eps=1e-6):
    """Any-hit query: does any triangle intersect with t < max_dist?

    Matches the shadow predicate in raytrace_comp.comp:359 (occluded ⇔
    shadowHit.t < lightDist - OFFSET): nearest-t < thresh ⇔ any-t < thresh.
    origin/direction [R,3], max_dist [R]; returns occluded [R] bool.
    """
    o = origin[:, None, :]
    d = direction[:, None, :]
    hit, t, _, _ = moller_trumbore(o, d, tri_v0[None], tri_v1[None], tri_v2[None], eps)
    return jnp.any(hit & (t < max_dist[:, None]), axis=1)


def reintersect(origin, direction, tri_idx, vertices, indices, eps=1e-6,
                uvs=None):
    """Differentiably re-intersect the *selected* triangle.

    BVH / brute-force searches only decide *which* triangle is nearest (a
    piecewise-constant integer, detached); the continuous quantities (t, u, v,
    position, geometric normal) are recomputed here so gradients flow to
    vertex positions without differentiating through the search loop.

    Returns dict with t, u, v, position, normal ([R] / [R,3]).
    Normal = normalize(cross(v1-v0, v2-v0)) — unflipped geometric normal,
    matching raytrace_comp.comp:189.  When `uvs` ([T,3,2] per-corner
    texcoords) is given, the record also carries the barycentric-
    interpolated "uv" [R,2] (raytrace_comp.comp:151-157).
    """
    tri_idx = jax.lax.stop_gradient(tri_idx)
    idx = indices[tri_idx]  # [R, 3]
    v0 = vertices[idx[:, 0]]
    v1 = vertices[idx[:, 1]]
    v2 = vertices[idx[:, 2]]
    _, t, u, v = moller_trumbore(origin, direction, v0, v1, v2, eps)
    position = origin + direction * t[:, None]
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    rec = {"t": t, "u": u, "v": v, "position": position, "normal": n}
    if uvs is not None:
        from dpt_tpu.render.shading import interpolate_uv

        rec["uv"] = interpolate_uv(uvs[tri_idx], u, v)
    return rec
