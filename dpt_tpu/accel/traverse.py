"""Per-ray masked BVH traversal (lax.while_loop, lockstep lanes).

TPU re-architecture of the shader's divergent per-thread stack walk
(raytrace_comp.comp:159-204): every ray keeps a private stack slice in a
[R, S] array; all rays advance in lockstep through one while_loop whose cond
is "any ray still has stack entries".  Inactive lanes are masked, never
branched.  Leaf triangle tests unroll to the static build leaf size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpt_tpu.render.intersect import T_MAX, intersect_aabb, moller_trumbore


def _safe_inv(d):
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0, tiny, -tiny), d)


def _zero_like_rays(origin):
    """int32 zeros [R] derived from `origin` (0*x folds away in XLA) so that
    while_loop carry inits carry the same varying-manual-axes type as the ray
    state under shard_map — its vma check then passes without check_vma=False
    (same convention as integrator.trace_paths)."""
    return (origin[:, 0] * 0.0).astype(jnp.int32)


def bvh_nearest(origin, direction, bvh, v0, v1, v2, cfg):
    """Nearest hit via per-ray stacks.  Returns (hit [R], t [R], tri [R])."""
    bvh = _device_bvh(bvh)
    R = origin.shape[0]
    S = cfg.bvh_stack_depth
    leaf_size = cfg.bvh_leaf_size
    inv_d = _safe_inv(direction)
    rr = jnp.arange(R)
    n_slots = bvh.tri_order.shape[0]

    z = _zero_like_rays(origin)
    stack = jnp.zeros((R, S), jnp.int32) + z[:, None]  # root (0) pre-pushed
    sp = 1 + z
    best_t = jnp.full((R,), T_MAX, jnp.float32) + z.astype(jnp.float32)
    best_tri = z

    def cond(c):
        return jnp.any(c[0] > 0)

    def body(c):
        sp, stack, best_t, best_tri = c
        active = sp > 0
        node = stack[rr, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)

        nmin = bvh.node_min[node]
        nmax = bvh.node_max[node]
        box_hit, tmin, _ = intersect_aabb(origin, inv_d, nmin, nmax)
        box_hit = box_hit & active & (tmin <= best_t)

        left = bvh.node_left[node]
        right = bvh.node_right[node]
        is_leaf = left < 0

        # Leaf: up to leaf_size triangle tests, statically unrolled.
        for k in range(leaf_size):
            valid = box_hit & is_leaf & (k < -left)
            slot = jnp.clip(right + k, 0, n_slots - 1)
            tri = bvh.tri_order[slot]
            hit_k, t_k, _, _ = moller_trumbore(
                origin, direction, v0[tri], v1[tri], v2[tri], cfg.eps
            )
            upd = valid & hit_k & (t_k < best_t)
            best_t = jnp.where(upd, t_k, best_t)
            best_tri = jnp.where(upd, tri, best_tri)

        # Internal: push right then left (left pops first, mirroring the
        # pre-order layout; garbage writes above non-pushing rays' tops are
        # never read).
        push = box_hit & (~is_leaf)
        stack = stack.at[rr, jnp.minimum(sp, S - 1)].set(right)
        sp1 = sp + push.astype(jnp.int32)
        stack = stack.at[rr, jnp.minimum(sp1, S - 1)].set(left)
        sp = sp1 + push.astype(jnp.int32)
        return sp, stack, best_t, best_tri

    sp, stack, best_t, best_tri = jax.lax.while_loop(
        cond, body, (sp, stack, best_t, best_tri)
    )
    hit = best_t < T_MAX
    return hit, best_t, jnp.where(hit, best_tri, 0)


def bvh_occluded(origin, direction, max_dist, bvh, v0, v1, v2, cfg):
    """Any-hit query with per-ray early termination: returns occluded [R].

    A ray resolves as soon as one triangle with t < max_dist is found; its
    stack is cleared, so the lockstep loop ends when the slowest ray does —
    typically far sooner than a full nearest-hit walk.
    """
    bvh = _device_bvh(bvh)
    R = origin.shape[0]
    S = cfg.bvh_stack_depth
    leaf_size = cfg.bvh_leaf_size
    inv_d = _safe_inv(direction)
    rr = jnp.arange(R)
    n_slots = bvh.tri_order.shape[0]

    z = _zero_like_rays(origin)
    stack = jnp.zeros((R, S), jnp.int32) + z[:, None]
    sp = 1 + z
    occ = z > 0

    def cond(c):
        return jnp.any(c[0] > 0)

    def body(c):
        sp, stack, occ = c
        active = sp > 0
        node = stack[rr, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)

        box_hit, tmin, _ = intersect_aabb(
            origin, inv_d, bvh.node_min[node], bvh.node_max[node]
        )
        box_hit = box_hit & active & (tmin < max_dist)

        left = bvh.node_left[node]
        right = bvh.node_right[node]
        is_leaf = left < 0

        for k in range(leaf_size):
            valid = box_hit & is_leaf & (k < -left)
            slot = jnp.clip(right + k, 0, n_slots - 1)
            tri = bvh.tri_order[slot]
            hit_k, t_k, _, _ = moller_trumbore(
                origin, direction, v0[tri], v1[tri], v2[tri], cfg.eps
            )
            occ = occ | (valid & hit_k & (t_k < max_dist))

        push = box_hit & (~is_leaf)
        stack = stack.at[rr, jnp.minimum(sp, S - 1)].set(right)
        sp1 = sp + push.astype(jnp.int32)
        stack = stack.at[rr, jnp.minimum(sp1, S - 1)].set(left)
        sp = sp1 + push.astype(jnp.int32)
        sp = jnp.where(occ, 0, sp)  # early exit for resolved rays
        return sp, stack, occ

    _, _, occ = jax.lax.while_loop(cond, body, (sp, stack, occ))
    return occ

def _device_bvh(bvh):
    """Lift numpy-leaf trees (host builders) to jnp; tracer/device leaves
    pass through.  Direct callers may hand in a host tree — build_accel
    uploads once, but the traversal must not crash on numpy leaves."""
    import dataclasses as _dc

    import jax.numpy as _jnp

    return _dc.replace(
        bvh,
        node_min=_jnp.asarray(bvh.node_min),
        node_max=_jnp.asarray(bvh.node_max),
        node_left=_jnp.asarray(bvh.node_left),
        node_right=_jnp.asarray(bvh.node_right),
        tri_order=_jnp.asarray(bvh.tri_order),
    )
