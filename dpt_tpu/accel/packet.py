"""Packet BVH traversal — one shared stack per ray tile (TPU-native default).

Instead of per-lane stacks and per-lane node gathers (which a vector machine
hates), rays are grouped into tiles of `cfg.packet_tile`; each tile walks the
tree with ONE stack: the node fetch is a [P]-sized gather (P = number of
tiles, 256x smaller than per-ray), the AABB/triangle tests are dense [P, K]
vector ops.  A subtree is visited if ANY ray in the tile hits its box — the
classic packet/speculative traversal mapped onto `lax.while_loop`.

Coherent primary rays share node sequences almost perfectly; incoherent
bounce rays cost extra node visits but every op stays dense and fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpt_tpu.render.intersect import T_MAX, intersect_aabb, moller_trumbore
from dpt_tpu.accel.traverse import _safe_inv


def packet_nearest(origin, direction, bvh, v0, v1, v2, cfg):
    """Nearest hit via per-tile shared stacks.

    Returns (hit [R], t [R], tri [R]).  R is padded internally to a multiple
    of cfg.packet_tile.
    """
    bvh = _device_bvh(bvh)
    R = origin.shape[0]
    K = min(cfg.packet_tile, R)
    P = -(-R // K)
    pad = P * K - R
    if pad:
        far = jnp.full((pad, 3), 1e9, jnp.float32)
        origin = jnp.concatenate([origin, far])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))]
        )
    o_t = origin.reshape(P, K, 3)
    d_t = direction.reshape(P, K, 3)
    inv_t = _safe_inv(d_t)
    pp = jnp.arange(P)
    S = cfg.bvh_stack_depth
    leaf_size = cfg.bvh_leaf_size
    n_slots = bvh.tri_order.shape[0]

    # Carry inits derived from the (possibly tile-sharded) ray state so the
    # shard_map vma check passes (see integrator.trace_paths).
    z = (o_t[:, 0, 0] * 0.0).astype(jnp.int32)  # [P]
    zk = (o_t[:, :, 0] * 0.0).astype(jnp.int32)  # [P, K]
    stack = jnp.zeros((P, S), jnp.int32) + z[:, None]
    sp = 1 + z
    best_t = jnp.full((P, K), T_MAX, jnp.float32) + zk.astype(jnp.float32)
    best_tri = zk

    def cond(c):
        return jnp.any(c[0] > 0)

    def body(c):
        sp, stack, best_t, best_tri = c
        active = sp > 0
        node = stack[pp, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)

        nmin = bvh.node_min[node][:, None, :]  # [P, 1, 3]
        nmax = bvh.node_max[node][:, None, :]
        box_hit, tmin, _ = intersect_aabb(o_t, inv_t, nmin, nmax)  # [P, K]
        box_hit = box_hit & active[:, None] & (tmin <= best_t)
        any_box = jnp.any(box_hit, axis=1)  # [P]

        left = bvh.node_left[node]
        right = bvh.node_right[node]
        is_leaf = left < 0

        for k in range(leaf_size):
            valid = any_box & is_leaf & (k < -left)  # [P]
            slot = jnp.clip(right + k, 0, n_slots - 1)
            tri = bvh.tri_order[slot]  # [P]
            hit_k, t_k, _, _ = moller_trumbore(
                o_t, d_t, v0[tri][:, None, :], v1[tri][:, None, :],
                v2[tri][:, None, :], cfg.eps,
            )
            upd = valid[:, None] & hit_k & (t_k < best_t)
            best_t = jnp.where(upd, t_k, best_t)
            best_tri = jnp.where(upd, tri[:, None], best_tri)

        push = any_box & (~is_leaf)
        stack = stack.at[pp, jnp.minimum(sp, S - 1)].set(right)
        sp1 = sp + push.astype(jnp.int32)
        stack = stack.at[pp, jnp.minimum(sp1, S - 1)].set(left)
        sp = sp1 + push.astype(jnp.int32)
        return sp, stack, best_t, best_tri

    sp, stack, best_t, best_tri = jax.lax.while_loop(
        cond, body, (sp, stack, best_t, best_tri)
    )
    best_t = best_t.reshape(-1)[:R]
    best_tri = best_tri.reshape(-1)[:R]
    hit = best_t < T_MAX
    return hit, best_t, jnp.where(hit, best_tri, 0)


def packet_occluded(origin, direction, max_dist, bvh, v0, v1, v2, cfg):
    """Any-hit packet query with tile early exit: returns occluded [R].

    A tile stops as soon as every live ray is occluded (its stack is
    cleared); unresolved rays keep the walk going.
    """
    bvh = _device_bvh(bvh)
    R = origin.shape[0]
    K = min(cfg.packet_tile, R)
    P = -(-R // K)
    pad = P * K - R
    if pad:
        far = jnp.full((pad, 3), 1e9, jnp.float32)
        origin = jnp.concatenate([origin, far])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))]
        )
        max_dist = jnp.concatenate([max_dist, jnp.full((pad,), -1.0, jnp.float32)])
    o_t = origin.reshape(P, K, 3)
    d_t = direction.reshape(P, K, 3)
    md_t = max_dist.reshape(P, K)
    inv_t = _safe_inv(d_t)
    pp = jnp.arange(P)
    S = cfg.bvh_stack_depth
    leaf_size = cfg.bvh_leaf_size
    n_slots = bvh.tri_order.shape[0]

    z = (o_t[:, 0, 0] * 0.0).astype(jnp.int32)  # varying-typed zeros [P]
    stack = jnp.zeros((P, S), jnp.int32) + z[:, None]
    sp = 1 + z
    occ = jnp.zeros((P, K), bool)
    # Padded rays (max_dist < 0) can never be occluded; count them resolved.
    resolved_init = md_t <= 0.0

    def cond(c):
        return jnp.any(c[0] > 0)

    def body(c):
        sp, stack, occ = c
        active = sp > 0
        node = stack[pp, jnp.maximum(sp - 1, 0)]
        sp = jnp.where(active, sp - 1, sp)

        nmin = bvh.node_min[node][:, None, :]
        nmax = bvh.node_max[node][:, None, :]
        box_hit, tmin, _ = intersect_aabb(o_t, inv_t, nmin, nmax)
        live = (~occ) & (~resolved_init)
        box_hit = box_hit & active[:, None] & (tmin < md_t) & live
        any_box = jnp.any(box_hit, axis=1)

        left = bvh.node_left[node]
        right = bvh.node_right[node]
        is_leaf = left < 0

        for k in range(leaf_size):
            valid = any_box & is_leaf & (k < -left)
            slot = jnp.clip(right + k, 0, n_slots - 1)
            tri = bvh.tri_order[slot]
            hit_k, t_k, _, _ = moller_trumbore(
                o_t, d_t, v0[tri][:, None, :], v1[tri][:, None, :],
                v2[tri][:, None, :], cfg.eps,
            )
            occ = occ | (valid[:, None] & hit_k & (t_k < md_t))

        push = any_box & (~is_leaf)
        stack = stack.at[pp, jnp.minimum(sp, S - 1)].set(right)
        sp1 = sp + push.astype(jnp.int32)
        stack = stack.at[pp, jnp.minimum(sp1, S - 1)].set(left)
        sp = sp1 + push.astype(jnp.int32)
        all_done = jnp.all(occ | resolved_init, axis=1)
        sp = jnp.where(all_done, 0, sp)
        return sp, stack, occ

    _, _, occ = jax.lax.while_loop(cond, body, (sp, stack, occ))
    return occ.reshape(-1)[:R]

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
