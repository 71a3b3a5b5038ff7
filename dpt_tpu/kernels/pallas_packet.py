"""Pallas (Mosaic-TPU) packet-BVH traversal kernel — the hot path.

TPU-native replacement for the shader's per-thread BVH walk
(raytrace_comp.comp:159-204).  One grid step = one ray tile (K rays as a
[K/128, 128] vreg block); the tile walks the tree depth-first with a scalar
stack in SMEM, so each tile runs its own full traversal inside a single
kernel invocation — no cross-tile convoy effect and no XLA while-loop
dispatch overhead (the weaknesses of the lax packet path in accel/packet.py).

Memory layout (see scripts/probe_pallas2.py — dynamic lane indexing is not
supported by Mosaic, dynamic sublane rows + dynamic roll are):
  - nodes: [ceil(N/16), 128] f32 — 16 nodes/row x 8 lanes each:
    (minx,miny,minz,maxx,maxy,maxz, pad, pad); fetch = dynamic row load +
    roll((node%16)*8) + static lane extracts.
  - children: [ceil(N/64), 128] i32 — 64 nodes/row x 2 lanes (left, right).
  - triangles: [ceil(T/8), 128] f32 — 8 tris/row x 16 lanes:
    (v0x..v2z, orig_id, pad...); stored in BVH tri_order so leaves address
    consecutive slots; orig_id is exact in f32 for meshes < 2^24 triangles.

The whole scene lives in VMEM: ~56 B/triangle + ~36 B/node → a 100k-triangle
mesh fits comfortably in the ~16 MB budget.  Larger scenes need HBM
streaming (future work; the lax path in accel/packet.py has no such limit).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_MAX = 1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasAccel:
    """BVH + triangles packed for the Mosaic kernel (see module docstring)."""

    nodes: jax.Array  # [ceil(N/16), 128] f32
    children: jax.Array  # [ceil(N/64), 128] i32
    tris: jax.Array  # [ceil(T/8), 128] f32


def pack_accel(bvh, v0, v1, v2) -> PallasAccel:
    """Pack an accel.bvh.BVH + triangle soup into kernel layout (host-side).

    Node lane 6 holds a per-octant near-child bitmask for ordered
    (front-to-back) traversal: bit o (octant o = sx*4+sy*2+sz of the ray
    direction signs) is 1 when the LEFT child is nearer along that octant's
    direction.  The kernel pushes the far child first so the near child pops
    first, tightening best_t early — the vector-machine analog of the
    per-thread ordered descent a scalar GPU walk gets for free.
    """
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    order = np.asarray(bvh.tri_order)
    N = nmin.shape[0]
    T = order.shape[0]

    # Per-octant near-child mask (internal nodes only).
    center = 0.5 * (nmin + nmax)  # [N, 3]
    internal = left >= 0
    lc = center[np.where(internal, left, 0)]  # [N, 3]
    rc = center[np.where(internal, right, 0)]
    mask = np.zeros(N, np.float32)
    for o in range(8):
        s = np.array(
            [1.0 if o & 4 else -1.0,
             1.0 if o & 2 else -1.0,
             1.0 if o & 1 else -1.0],
            np.float32,
        )
        left_near = (lc @ s) <= (rc @ s)
        mask += np.where(internal & left_near, float(1 << o), 0.0)

    n_rows = -(-N // 16)
    nodes = np.zeros((n_rows, 128), np.float32)
    flat = np.zeros((N, 8), np.float32)
    flat[:, 0:3] = nmin
    flat[:, 3:6] = nmax
    flat[:, 6] = mask
    nodes.reshape(-1, 8)[:N] = flat

    c_rows = -(-N // 64)
    children = np.zeros((c_rows, 128), np.int32)
    cf = np.stack([left, right], axis=1).astype(np.int32)
    children.reshape(-1, 2)[:N] = cf

    t_rows = -(-T // 8)
    tris = np.zeros((t_rows, 128), np.float32)
    tf = np.zeros((T, 16), np.float32)
    tf[:, 0:3] = np.asarray(v0)[order]
    tf[:, 3:6] = np.asarray(v1)[order]
    tf[:, 6:9] = np.asarray(v2)[order]
    tf[:, 9] = order.astype(np.float32)  # exact for < 2^24 triangles
    tris.reshape(-1, 16)[:T] = tf

    return PallasAccel(
        nodes=jnp.asarray(nodes),
        children=jnp.asarray(children),
        tris=jnp.asarray(tris),
    )


def _fetch_row(ref, row, group, group_lanes):
    """Load ref[row, :] and roll the addressed group to lane 0."""
    r = ref[row, :].reshape(1, 128)
    return pltpu.roll(r, shift=-group * group_lanes, axis=1)


def _traverse_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, md_ref,
    nodes_ref, children_ref, tris_ref,
    t_ref, tri_ref,
    stack_ref,
    *, leaf_size: int, stack_depth: int, mode: str,
):
    """mode: 'nearest' (full best-hit walk) or 'occluded' (any-hit, early
    exit when every ray in the tile is resolved)."""
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]
    tiny = 1e-20

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v >= 0, tiny, -tiny), v)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    max_d = md_ref[:, :] if mode == "occluded" else None

    # Tile direction octant (majority vote) for ordered descent.  After the
    # coherence sort (render/compaction.py) tiles are octant-pure, so the
    # vote is exact; unsorted tiles just get a best-effort ordering.
    if mode == "nearest":
        octant = (
            jnp.where(jnp.sum(jnp.sign(dx)) >= 0.0, 4.0, 0.0)
            + jnp.where(jnp.sum(jnp.sign(dy)) >= 0.0, 2.0, 0.0)
            + jnp.where(jnp.sum(jnp.sign(dz)) >= 0.0, 1.0, 0.0)
        )
        octant_pow = jnp.exp2(octant)

    stack_ref[0] = 0

    shape = ox.shape
    best_t = jnp.full(shape, T_MAX, jnp.float32)
    best_i = jnp.zeros(shape, jnp.int32)
    occ = jnp.zeros(shape, jnp.int32)  # 0/1; Mosaic scf.if cannot return bool vectors

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, best_t, best_i, occ = c
        node = stack_ref[sp - 1]
        sp = sp - 1

        nrow = _fetch_row(nodes_ref, node // 16, node % 16, 8)
        minx = nrow[0, 0]
        miny = nrow[0, 1]
        minz = nrow[0, 2]
        maxx = nrow[0, 3]
        maxy = nrow[0, 4]
        maxz = nrow[0, 5]

        t0 = (minx - ox) * ix
        t1 = (maxx - ox) * ix
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (miny - oy) * iy
        t1 = (maxy - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (minz - oz) * iz
        t1 = (maxz - oz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        if mode == "occluded":
            box_hit = (tn <= tf) & (tf >= 0.0) & (tn < max_d) & (occ == 0)
        else:
            box_hit = (tn <= tf) & (tf >= 0.0) & (tn <= best_t)
        any_hit = jnp.any(box_hit)

        crow = _fetch_row(children_ref, node // 64, node % 64, 2)
        left = crow[0, 0]
        right = crow[0, 1]
        is_leaf = left < 0

        def leaf_case(args):
            best_t, best_i, occ = args
            for k in range(leaf_size):
                valid = k < -left
                slot = right + k
                trow = _fetch_row(tris_ref, slot // 8, slot % 8, 16)
                v0x = trow[0, 0]
                v0y = trow[0, 1]
                v0z = trow[0, 2]
                e1x = trow[0, 3] - v0x
                e1y = trow[0, 4] - v0y
                e1z = trow[0, 5] - v0z
                e2x = trow[0, 6] - v0x
                e2y = trow[0, 7] - v0y
                e2z = trow[0, 8] - v0z
                oid = trow[0, 9].astype(jnp.int32)

                # Möller–Trumbore, scalar triangle vs vector rays
                # pvec = d × e2
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                parallel = jnp.abs(det) < 1e-6
                inv_det = 1.0 / jnp.where(parallel, 1.0, det)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = inv_det * (tx * px + ty * py + tz * pz)
                # qvec = tvec × e1
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = inv_det * (dx * qx + dy * qy + dz * qz)
                t = inv_det * (e2x * qx + e2y * qy + e2z * qz)
                tri_hit = (
                    (~parallel)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > 1e-6)
                )
                if mode == "occluded":
                    newly = valid & tri_hit & (t < max_d)
                    occ = jnp.maximum(occ, newly.astype(jnp.int32))
                else:
                    upd = valid & tri_hit & (t < best_t)
                    best_t = jnp.where(upd, t, best_t)
                    best_i = jnp.where(upd, oid, best_i)
            return best_t, best_i, occ

        best_t, best_i, occ = jax.lax.cond(
            is_leaf & any_hit, leaf_case, lambda a: a, (best_t, best_i, occ)
        )

        push = any_hit & (~is_leaf)

        if mode == "nearest":
            # bit `octant` of lane-6 mask: 1 → left child is nearer.
            left_near = jnp.mod(jnp.floor(nrow[0, 6] / octant_pow), 2.0) >= 1.0
            first = jnp.where(left_near, right, left)  # far child: pushed first
            second = jnp.where(left_near, left, right)  # near child: pops first
        else:
            first, second = right, left

        @pl.when(push)
        def _():
            stack_ref[sp] = first
            stack_ref[sp + 1] = second

        sp = sp + 2 * push.astype(jnp.int32)
        if mode == "occluded":
            # Tile-level early exit once every ray is resolved.
            all_done = jnp.all((occ == 1) | (max_d <= 0.0))
            sp = jnp.where(all_done, 0, sp)
        return sp, best_t, best_i, occ

    sp, best_t, best_i, occ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), best_t, best_i, occ)
    )
    if mode == "occluded":
        t_ref[:, :] = occ.astype(jnp.float32)
        tri_ref[:, :] = occ
    else:
        t_ref[:, :] = best_t
        tri_ref[:, :] = best_i


def _to_tiles(arr, K):
    """[R] → ([R_pad/128, 128], n_row_blocks) padded."""
    R = arr.shape[0]
    pad = (-R) % K
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,), arr.dtype)])
    return arr.reshape(-1, 128)


@functools.partial(
    jax.jit, static_argnames=("packet_tile", "leaf_size", "stack_depth", "mode")
)
def _pallas_traverse(origin, direction, max_dist, accel: PallasAccel,
                     packet_tile: int, leaf_size: int, stack_depth: int,
                     mode: str):
    R = origin.shape[0]
    # Mosaic block shapes need the sublane dim divisible by 8 → the minimum
    # (and vreg-optimal) tile is 8x128 = 1024 rays.
    K = max(1024, -(-packet_tile // 1024) * 1024)
    KS = K // 128

    def prep(a, fill):
        pad = (-R) % K
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(-1, 128)

    ox = prep(origin[:, 0], 1e9)
    oy = prep(origin[:, 1], 1e9)
    oz = prep(origin[:, 2], 1e9)
    dx = prep(direction[:, 0], 0.0)
    dy = prep(direction[:, 1], 0.0)
    dz = prep(direction[:, 2], 1.0)
    md = prep(max_dist, -1.0) if mode == "occluded" else prep(
        jnp.zeros((R,), jnp.float32), 0.0
    )

    n_rows = ox.shape[0]
    P = n_rows // KS

    ray_spec = pl.BlockSpec((KS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel, leaf_size=leaf_size, stack_depth=stack_depth,
        mode=mode,
    )
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=[ray_spec] * 7 + [full_spec] * 3,
        out_specs=(
            pl.BlockSpec((KS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        # Tests and the virtual CPU mesh run the same kernel interpreted.
        interpret=jax.default_backend() != "tpu",
    )(ox, oy, oz, dx, dy, dz, md, accel.nodes, accel.children, accel.tris)
    return out_t.reshape(-1)[:R], out_tri.reshape(-1)[:R]


def pallas_nearest(origin, direction, accel: PallasAccel, cfg):
    """Nearest hit via the Mosaic kernel: (hit [R], t [R], tri [R])."""
    t, tri = _pallas_traverse(
        origin, direction, jnp.zeros((origin.shape[0],), jnp.float32), accel,
        cfg.packet_tile, cfg.bvh_leaf_size, cfg.bvh_stack_depth,
        "nearest",
    )
    hit = t < T_MAX
    return hit, t, jnp.where(hit, tri, 0)


def pallas_occluded(origin, direction, max_dist, accel: PallasAccel, cfg):
    """Any-hit query via the Mosaic kernel: occluded [R] bool."""
    _, occ = _pallas_traverse(
        origin, direction, max_dist, accel,
        cfg.packet_tile, cfg.bvh_leaf_size, cfg.bvh_stack_depth,
        "occluded",
    )
    return occ.astype(bool)
