"""Four-wide BVH packet kernel (Mosaic-TPU) — round-3 hot path.

Successor of kernels/pallas_wide.py (paired-children, binary).  The round-3
breakdown (scripts/r3_breakdown.py) showed the walk is bound by the
per-iteration pop → dynamic-row-load → roll → test → push chain, not by
vector math: the winning config was ONE maximal tile per kernel step
(packet_tile=4096, interleave=1).  The direct lever is therefore fewer,
fatter iterations:

  - **Collapse two binary levels per record.**  A quad record packs FOUR
    grandchildren AABBs + pointers + the three per-octant near masks of the
    collapsed binary splits into one 32-lane group (4 records/row).  One
    pop resolves what the binary kernel needed three pops for, and tests
    4 boxes instead of 6 (the two intermediate child boxes are skipped).
  - **Ordered descent preserved.**  Lane 28/29/30 hold 8-bit per-octant
    "left is nearer" masks for the top / left / right collapsed splits;
    the 4 children are pushed far-to-near, exactly reproducing the binary
    kernel's front-to-back order (pallas_wide.py's octmask, applied twice).
  - Leaf rows and inline leaf intersection are identical to pallas_wide
    (1 row = up to 8 triangles x 16 lanes).

Semantics match the binary walk bit-for-bit (same Möller–Trumbore, same
tie-breaking by traversal order); parity is asserted in
tests/test_pallas_quad.py against accel/traverse.py and brute force.

Reference analog: the per-thread stack walk at raytrace_comp.comp:159-204;
this is its vector-machine re-architecture, two tree levels at a time.

Timing rule (hard-won): the axon TPU relay memoizes executions with
identical inputs — benchmarks MUST vary inputs per call.
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_MAX = 1e30
_log = logging.getLogger(__name__)
_logged_mode = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuadAccel:
    """4-wide BVH + row-aligned leaves, packed for the quad kernel.

    Two node layouts are packed: `nodes_flat` (1-D, for SMEM residence —
    the fast path: every per-record quantity is a scalar-core load, the
    vector units only run slab math against broadcast scalars; measured 2x
    over the row layout, scripts/r3_smem_proto.py) and `nodes` (row layout
    for the VMEM fallback when the table exceeds the ~1 MB SMEM budget)."""

    nodes: jax.Array  # [ceil(W/4), 128] f32 — 4 quad records/row (VMEM)
    nodes_flat: jax.Array  # [W*32] f32 — record-major flat (SMEM path)
    tris: jax.Array  # [n_leaf_rows, 128] f32 — 1 leaf/row, 8 tris x 16 lanes
    n_wide: int = dataclasses.field(metadata=dict(static=True))
    # Depth of the QUAD tree.  Each pop pushes at most 3 extra entries
    # (4 children minus the one descended into), so the stack never holds
    # more than 3*max_depth + 1 entries.
    max_depth: int = dataclasses.field(default=0, metadata=dict(static=True))


# SMEM is ~1 MB on v5e; leave headroom for the traversal stack and compiler
# spills.  Tables above this fall back to the VMEM row layout.
_SMEM_NODE_BUDGET_BYTES = 768 * 1024

# VMEM is 16 MB on v5e; leaf-row tables above this stay in HBM and rows are
# DMA'd per leaf visit (stream_tris mode — see _kernel docstring).  The
# budget leaves room for the node table fallback, ray blocks and outputs.
_VMEM_TRIS_BUDGET_BYTES = 8 * 1024 * 1024


# Empty slots must NEVER pass the slab test.  An "inverted" box cannot
# guarantee that: the test takes min/max of the two slab distances, which
# normalizes the inversion away, and near-zero direction components turn
# into ±inf slabs that pass.  NaN bounds make every comparison False — a
# guaranteed miss on any ray, including padded lanes.
_EMPTY_BOX = np.full(6, np.nan, np.float32)


def _octant_near_mask(ca: np.ndarray, cb: np.ndarray) -> float:
    """8-bit mask: bit o = 1 when center `ca` is nearer than `cb` along
    direction-octant o (same encoding as pallas_wide.pack_wide)."""
    m = 0.0
    for o in range(8):
        s = np.array(
            [1.0 if o & 4 else -1.0,
             1.0 if o & 2 else -1.0,
             1.0 if o & 1 else -1.0],
            np.float32,
        )
        if float(ca @ s) <= float(cb @ s):
            m += float(1 << o)
    return m


# Sign vector of each direction octant, for the vectorized near-mask.
_OCT_SIGNS = np.array(
    [[1.0 if o & 4 else -1.0,
      1.0 if o & 2 else -1.0,
      1.0 if o & 1 else -1.0] for o in range(8)],
    np.float32,
)  # [8, 3]
_OCT_BITS = (1 << np.arange(8)).astype(np.float32)  # [8]


def _octant_near_masks(ca: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Vectorized _octant_near_mask over center pairs [k, 3] -> [k]."""
    da = ca @ _OCT_SIGNS.T  # [k, 8]
    db = cb @ _OCT_SIGNS.T
    return ((da <= db).astype(np.float32) * _OCT_BITS).sum(axis=1)


def pack_quad(bvh, v0, v1, v2) -> QuadAccel:
    """Collapse a binary accel.bvh.BVH into the 4-wide layout — vectorized.

    Identical collapse structure and record contents as `pack_quad_loop`
    (the readable executable spec below), but record ids are assigned in
    level order (BFS) instead of DFS discovery order and every level is
    packed with numpy array ops.  Traversal results are bit-identical —
    the walk's descent order depends only on record geometry, never on
    record numbering (parity: tests/test_pallas_quad.py).  Packing a
    Sylveon-class 66k-tri SAH tree drops from ~4.6 s (per-record Python
    loop) to well under a second; the reference builds its whole BVH at
    startup in trivial time (VulkanRayTracer.cpp:94), and the packer must
    not become the framework's startup bottleneck at 1M tris.
    """
    nmin = np.asarray(bvh.node_min, np.float32)
    nmax = np.asarray(bvh.node_max, np.float32)
    left = np.asarray(bvh.node_left, np.int64)
    right = np.asarray(bvh.node_right, np.int64)
    order = np.asarray(bvh.tri_order, np.int64)
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)

    is_leaf = left < 0
    counts = np.where(is_leaf, -left, 0)
    if is_leaf.any():
        assert counts[is_leaf].max() <= 8, (
            "pallas-quad requires bvh_leaf_size <= 8"
        )
    center = 0.5 * (nmin + nmax)

    # --- leaf rows (same layout as pack_quad_loop, flat scatter) ---
    leaf_rows = np.cumsum(is_leaf) - 1  # valid where is_leaf
    leaf_ids = np.nonzero(is_leaf)[0]
    L = max(int(leaf_ids.size), 1)
    tris = np.zeros((L, 128), np.float32)
    if leaf_ids.size:
        c = counts[leaf_ids]
        first = right[leaf_ids]
        rows_rep = np.repeat(np.arange(leaf_ids.size), c)
        slot = np.arange(int(c.sum())) - np.repeat(np.cumsum(c) - c, c)
        tids = order[np.repeat(first, c) + slot]
        trows = tris.reshape(-1, 8, 16)
        trows[rows_rep, slot, 0:3] = v0[tids]
        trows[rows_rep, slot, 3:6] = v1[tids] - v0[tids]
        trows[rows_rep, slot, 6:9] = v2[tids] - v0[tids]
        trows[rows_rep, slot, 9] = tids.astype(np.float32)
        trows[rows_rep, slot, 10] = 1.0

    if is_leaf[0]:
        # Degenerate single-leaf tree: one record, slot 0 = the leaf.
        rec = np.zeros((1, 32), np.float32)
        for s in range(4):
            rec[0, 6 * s:6 * s + 6] = _EMPTY_BOX
        rec[0, 28:31] = 255.0
        rec[0, 0:3] = nmin[0]
        rec[0, 3:6] = nmax[0]
        rec[0, 24] = float(-(leaf_rows[0] + 1))
        return QuadAccel(
            nodes=_pad_rows(rec),
            nodes_flat=jnp.asarray(rec.reshape(-1)),
            tris=jnp.asarray(tris),
            n_wide=1,
            max_depth=1,
        )

    # --- level-order collapse: anchors of level k+1 are the internal
    # grandchildren (or internal leaf-adjacent children's children) of
    # level k's anchors, in row-major (anchor, slot) order.
    level_blocks = []  # per-level [F, 32] record blocks
    level_children = []  # per-level [F, 4] quad child record ids (-1: none)
    frontier = np.array([0], np.int64)
    n_assigned = 1  # record ids handed out so far (root = 0)

    while frontier.size:
        F = frontier.size
        rec = np.zeros((F, 32), np.float32)
        for s in range(4):
            rec[:, 6 * s:6 * s + 6] = _EMPTY_BOX
        rec[:, 28:31] = 255.0

        l, r = left[frontier], right[frontier]
        rec[:, 28] = _octant_near_masks(center[l], center[r])

        # slot_node[f, s]: binary node occupying slot s (-1 = empty).
        slot_node = np.full((F, 4), -1, np.int64)
        for child, s0, mask_lane in ((l, 0, 29), (r, 2, 30)):
            child_leaf = is_leaf[child]
            # Leaf child -> occupies slot s0 alone.
            slot_node[:, s0] = np.where(child_leaf, child, slot_node[:, s0])
            # Internal child -> its two children fill the pair; mask lane
            # records their near-order.
            ci = np.nonzero(~child_leaf)[0]
            if ci.size:
                cl, cr = left[child[ci]], right[child[ci]]
                slot_node[ci, s0] = cl
                slot_node[ci, s0 + 1] = cr
                rec[ci, mask_lane] = _octant_near_masks(center[cl], center[cr])

        valid = slot_node >= 0
        sn = np.where(valid, slot_node, 0)
        for s in range(4):
            v_s = valid[:, s]
            rec[v_s, 6 * s:6 * s + 3] = nmin[sn[v_s, s]]
            rec[v_s, 6 * s + 3:6 * s + 6] = nmax[sn[v_s, s]]

        # Pointers: leaf slot -> -(leaf_row+1); internal slot -> the next
        # level's record id, assigned in row-major (anchor, slot) order.
        slot_leaf = valid & is_leaf[sn]
        slot_int = valid & ~is_leaf[sn]
        ptr = np.zeros((F, 4), np.float32)
        ptr[slot_leaf] = -(leaf_rows[sn[slot_leaf]] + 1)
        n_new = int(slot_int.sum())
        new_ids = n_assigned + np.arange(n_new)
        ptr[slot_int] = new_ids
        rec[:, 24:28] = ptr

        child_ids = np.full((F, 4), -1, np.int64)
        child_ids[slot_int] = new_ids
        level_blocks.append(rec)
        level_children.append(child_ids)
        frontier = sn[slot_int]
        n_assigned += n_new

    rec_arr = np.concatenate(level_blocks, axis=0)
    W = rec_arr.shape[0]

    # Quad-tree depth: bottom-up over levels (children always live one
    # level deeper, so each level's depth needs only the next level's).
    depth = np.zeros(W, np.int64)
    lo = W
    for rec_blk, child_ids in zip(reversed(level_blocks),
                                  reversed(level_children)):
        lo -= rec_blk.shape[0]
        cd = np.where(child_ids >= 0, depth[np.maximum(child_ids, 0)], 0)
        depth[lo:lo + rec_blk.shape[0]] = 1 + cd.max(axis=1) * (
            child_ids >= 0
        ).any(axis=1)

    return QuadAccel(
        nodes=_pad_rows(rec_arr),
        nodes_flat=jnp.asarray(rec_arr.reshape(-1)),
        tris=jnp.asarray(tris),
        n_wide=W,
        max_depth=int(depth[0]),
    )


def refit_quad(accel: QuadAccel, vertices, indices) -> QuadAccel:
    """On-device accel refit for moving vertices (VERDICT r4 next #2).

    The quad layout bakes leaf vertex data (v0/e1/e2) and node AABBs at
    pack time; the reference can build once because its geometry is static
    (VulkanRayTracer.cpp:94), but vertex optimisation moves `vertices`
    every step — hit *selection* would run against stale geometry while
    reintersect uses the new one.  With fixed topology the cure is a
    refit, jittable and cheap: regather leaf rows from the current
    vertices, then recompute every slot AABB bottom-up (`max_depth`
    sweeps of a full-width gather — each sweep lifts correct boxes one
    quad level; ~15 sweeps x W records is microseconds next to a render).
    Pointers, leaf assignment and the per-octant near masks stay fixed:
    descent ORDER degrades gracefully as geometry drifts, correctness
    needs only boxes that bound the current triangles, which these do
    exactly (min/max are order-independent, so refitting with unchanged
    vertices is bit-identical to packing — tests/test_pallas_quad.py).
    """
    vertices = jax.lax.stop_gradient(vertices)
    W = accel.n_wide

    # --- leaf rows: regather v0/e1/e2 for every slot's triangle ---
    trows = accel.tris.reshape(-1, 8, 16)
    tids = trows[:, :, 9].astype(jnp.int32)
    valid = trows[:, :, 10] > 0.0
    vm = valid[..., None]
    idx = indices[jnp.maximum(tids, 0)]  # [L, 8, 3]
    v0 = vertices[idx[..., 0]]
    v1 = vertices[idx[..., 1]]
    v2 = vertices[idx[..., 2]]
    new_rows = trows
    new_rows = new_rows.at[:, :, 0:3].set(jnp.where(vm, v0, 0.0))
    new_rows = new_rows.at[:, :, 3:6].set(jnp.where(vm, v1 - v0, 0.0))
    new_rows = new_rows.at[:, :, 6:9].set(jnp.where(vm, v2 - v0, 0.0))
    tris = new_rows.reshape(accel.tris.shape)

    # Exact leaf AABBs: min/max over the valid slots' three RAW corners
    # (v0 + e1 would re-round away from the builder's v1 and break the
    # unchanged-vertices ≡ packed bit-identity).
    inf = jnp.float32(np.inf)
    corners = jnp.stack([v0, v1, v2], axis=2)  # [L, 8, 3, 3]
    cmask = vm[:, :, None, :]
    leaf_min = jnp.where(cmask, corners, inf).min(axis=(1, 2))  # [L, 3]
    leaf_max = jnp.where(cmask, corners, -inf).max(axis=(1, 2))

    # --- node records: bottom-up slot-AABB sweeps ---
    rec_all = accel.nodes.reshape(-1, 32)
    rec = rec_all[:W]
    ptr = rec[:, 24:28]  # [W, 4]
    # Empty slots are NaN-boxed at pack time — the static topology mask.
    empty = jnp.isnan(rec[:, 0:24:6])  # [W, 4]
    leaf_slot = (~empty) & (ptr < 0.0)
    leaf_row = jnp.clip((-ptr - 1.0).astype(jnp.int32), 0, None)
    child_id = jnp.clip(ptr, 0.0, None).astype(jnp.int32)

    nan = jnp.float32(np.nan)
    lmin = leaf_min[leaf_row]  # [W, 4, 3]
    lmax = leaf_max[leaf_row]
    smin = jnp.where(leaf_slot[..., None], lmin, inf)
    smax = jnp.where(leaf_slot[..., None], lmax, -inf)
    for _ in range(max(accel.max_depth, 1)):
        rmin = jnp.where(empty[..., None], inf, smin).min(axis=1)  # [W, 3]
        rmax = jnp.where(empty[..., None], -inf, smax).max(axis=1)
        smin = jnp.where(
            leaf_slot[..., None], lmin,
            jnp.where(empty[..., None], nan, rmin[child_id])
        )
        smax = jnp.where(
            leaf_slot[..., None], lmax,
            jnp.where(empty[..., None], nan, rmax[child_id])
        )

    new_rec = rec
    for s in range(4):
        new_rec = new_rec.at[:, 6 * s:6 * s + 3].set(smin[:, s])
        new_rec = new_rec.at[:, 6 * s + 3:6 * s + 6].set(smax[:, s])
    nodes = rec_all.at[:W].set(new_rec).reshape(accel.nodes.shape)
    return dataclasses.replace(
        accel,
        nodes=nodes,
        nodes_flat=new_rec.reshape(-1),
        tris=tris,
    )


def _pad_rows(rec_arr: np.ndarray) -> jax.Array:
    """Pack [W, 32] records into the [ceil(W/4), 128] VMEM row layout; pad
    records keep NaN boxes so a stray read can never hit."""
    W = rec_arr.shape[0]
    n_rows = -(-W // 4)
    pad = np.zeros((n_rows * 4 - W, 32), np.float32)
    for s in range(4):
        pad[:, 6 * s:6 * s + 6] = _EMPTY_BOX
    nodes = np.concatenate([rec_arr, pad], axis=0).reshape(n_rows, 128)
    return jnp.asarray(nodes)


def pack_quad_loop(bvh, v0, v1, v2) -> QuadAccel:
    """Reference collapse of a binary accel.bvh.BVH into the 4-wide layout —
    the readable per-record executable spec that `pack_quad` (vectorized)
    is parity-tested against (tests/test_pallas_quad.py).

    Quad record (32 lanes): 4x AABB (min3,max3 at lanes 6s..6s+5),
    ptr0..3 (lanes 24-27), topmask/leftmask/rightmask (lanes 28-30), pad.
    ptr >= 0 → quad record id; ptr < 0 → leaf row id encoded as -(row+1).
    Empty slots carry an inverted AABB (never hit).
    """
    nmin = np.asarray(bvh.node_min, np.float32)
    nmax = np.asarray(bvh.node_max, np.float32)
    left = np.asarray(bvh.node_left, np.int64)
    right = np.asarray(bvh.node_right, np.int64)
    order = np.asarray(bvh.tri_order, np.int64)
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)

    n = nmin.shape[0]
    is_leaf = left < 0
    counts = np.where(is_leaf, -left, 0)
    if is_leaf.any():
        assert counts[is_leaf].max() <= 8, (
            "pallas-quad requires bvh_leaf_size <= 8"
        )
    center = 0.5 * (nmin + nmax)

    # --- leaf rows (identical layout to pallas_wide) ---
    leaf_rows = np.cumsum(is_leaf) - 1  # valid where is_leaf
    L = max(int(is_leaf.sum()), 1)
    tris = np.zeros((L, 128), np.float32)
    trows = tris.reshape(-1, 8, 16)
    for nid in np.nonzero(is_leaf)[0]:
        row = leaf_rows[nid]
        first, c = right[nid], counts[nid]
        tids = order[first:first + c]
        trows[row, :c, 0:3] = v0[tids]
        trows[row, :c, 3:6] = v1[tids] - v0[tids]
        trows[row, :c, 6:9] = v2[tids] - v0[tids]
        trows[row, :c, 9] = tids.astype(np.float32)
        trows[row, :c, 10] = 1.0

    def leaf_ptr(nid):
        return float(-(leaf_rows[nid] + 1))

    # --- collapse: one quad record per "anchor" binary internal; its four
    # slots are the anchor's grandchildren (or a child directly, when that
    # child is a leaf). Anchors are discovered top-down: the root, then the
    # internal grandchildren of every anchor.
    records = []  # list of np[32] f32
    wide_id_of = {}  # binary internal id -> quad record id
    pending = []  # (record idx, slot, binary internal id) to patch

    def new_record():
        rec = np.zeros(32, np.float32)
        for s in range(4):
            rec[6 * s:6 * s + 6] = _EMPTY_BOX
        rec[28] = 255.0
        rec[29] = 255.0
        rec[30] = 255.0
        return rec

    if is_leaf[0]:
        # Degenerate single-leaf tree: one record, slot 0 = the leaf.
        rec = new_record()
        rec[0:3] = nmin[0]
        rec[3:6] = nmax[0]
        rec[24] = leaf_ptr(0)
        records.append(rec)
    else:
        stack = [0]
        wide_id_of[0] = 0
        records.append(None)  # placeholder, filled below
        while stack:
            b = stack.pop()
            rid = wide_id_of[b]
            rec = new_record()
            l, r = int(left[b]), int(right[b])
            rec[28] = _octant_near_mask(center[l], center[r])

            def fill_pair(child, s0, mask_lane):
                """Expand `child` into slots (s0, s0+1); returns nothing.
                Internal child → its two children occupy the pair; leaf
                child → slot s0 only."""
                if is_leaf[child]:
                    rec[6 * s0:6 * s0 + 3] = nmin[child]
                    rec[6 * s0 + 3:6 * s0 + 6] = nmax[child]
                    rec[24 + s0] = leaf_ptr(child)
                    return
                cl, cr = int(left[child]), int(right[child])
                rec[mask_lane] = _octant_near_mask(center[cl], center[cr])
                for s, g in ((s0, cl), (s0 + 1, cr)):
                    rec[6 * s:6 * s + 3] = nmin[g]
                    rec[6 * s + 3:6 * s + 6] = nmax[g]
                    if is_leaf[g]:
                        rec[24 + s] = leaf_ptr(g)
                    else:
                        if g not in wide_id_of:
                            wide_id_of[g] = len(records)
                            records.append(None)
                            stack.append(g)
                        rec[24 + s] = float(wide_id_of[g])

            fill_pair(l, 0, 29)
            fill_pair(r, 2, 30)
            records[rid] = rec

    W = len(records)
    rec_arr = np.stack(records)
    n_rows = -(-W // 4)
    nodes = np.zeros((n_rows, 128), np.float32)
    # Pad records keep inverted boxes so a stray read can never hit.
    pad = np.zeros((n_rows * 4 - W, 32), np.float32)
    for s in range(4):
        pad[:, 6 * s:6 * s + 6] = _EMPTY_BOX
    nodes.reshape(-1, 32)[:] = np.concatenate([rec_arr, pad], axis=0)

    # Quad-tree depth via the wide child graph.
    depth = np.zeros(W, np.int64)
    children = [[] for _ in range(W)]
    for rid in range(W):
        for s in range(4):
            p = rec_arr[rid, 24 + s]
            if p >= 0.0 and rec_arr[rid, 6 * s] < 1e29:
                children[rid].append(int(p))
    stack2 = [(0, False)]
    while stack2:
        rid, expanded = stack2.pop()
        if expanded:
            depth[rid] = 1 + max((depth[c] for c in children[rid]), default=0)
        else:
            stack2.append((rid, True))
            stack2.extend((c, False) for c in children[rid])

    return QuadAccel(
        nodes=jnp.asarray(nodes),
        nodes_flat=jnp.asarray(rec_arr.reshape(-1)),
        tris=jnp.asarray(tris),
        n_wide=W,
        max_depth=int(depth[0]),
    )


def _kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, md_ref,
    nodes_ref, tris_ref,
    t_ref, tri_ref,
    stack_ref, trow_ref, tsem_ref,
    *, stack_depth: int, mode: str, interleave: int, smem_nodes: bool,
    stream_tris: bool,
):
    """P = `interleave` independent 4-wide packet walks per loop iteration.

    smem_nodes=True: `nodes_ref` is the flat [W*32] table in SMEM — every
    per-record scalar is a scalar-core load (the 2x fast path).
    False: `nodes_ref` is the [rows,128] VMEM layout — dynamic row load +
    roll + lane extraction per quantity (fallback for tables over the SMEM
    budget).

    stream_tris=True: `tris_ref` lives in HBM (pltpu.ANY) — leaf rows that
    no longer fit VMEM (>~130k tris) are DMA'd one row at a time into the
    `trow_ref` scratch as leaves are visited.  Each visit pays one ~512 B
    DMA round trip instead of holding the whole table resident; this is
    what makes 260k/1M-tri scenes runnable at all on a 16 MB-VMEM chip
    (VERDICT r4 next #9 uncovered the old whole-table spec OOMing)."""
    P = interleave
    KS = ox_ref.shape[0] // P
    tiny = 1e-20

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v >= 0, tiny, -tiny), v)

    chains = []
    for p in range(P):
        sl = slice(p * KS, (p + 1) * KS)
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        md = md_ref[sl, :] if mode == "occluded" else None
        octant = (
            jnp.where(jnp.sum(jnp.sign(dx)) >= 0.0, 4.0, 0.0)
            + jnp.where(jnp.sum(jnp.sign(dy)) >= 0.0, 2.0, 0.0)
            + jnp.where(jnp.sum(jnp.sign(dz)) >= 0.0, 1.0, 0.0)
        )
        chains.append(dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            ix=safe_inv(dx), iy=safe_inv(dy), iz=safe_inv(dz),
            md=md, octant_pow=jnp.exp2(octant),
        ))
        stack_ref[p, 0] = 0

    shape = (KS, 128)

    def aabb(ch, getf, s):
        b = 6 * s
        t0 = (getf(b + 0) - ch["ox"]) * ch["ix"]
        t1 = (getf(b + 3) - ch["ox"]) * ch["ix"]
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (getf(b + 1) - ch["oy"]) * ch["iy"]
        t1 = (getf(b + 4) - ch["oy"]) * ch["iy"]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (getf(b + 2) - ch["oz"]) * ch["iz"]
        t1 = (getf(b + 5) - ch["oz"]) * ch["iz"]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return tn, tf

    def leaf_case(ch, row_f, args):
        """Intersect all 8 slots of leaf row (-row_f - 1) — identical to
        pallas_wide._kernel.leaf_case."""
        best_t, best_i, occ = args
        row = (-row_f - 1.0).astype(jnp.int32)
        if stream_tris:
            dma = pltpu.make_async_copy(
                tris_ref.at[pl.ds(row, 1), :], trow_ref, tsem_ref
            )
            dma.start()
            dma.wait()
            trow = trow_ref[:].reshape(1, 128)
        else:
            trow = tris_ref[row, :].reshape(1, 128)
        ox, oy, oz = ch["ox"], ch["oy"], ch["oz"]
        dx, dy, dz = ch["dx"], ch["dy"], ch["dz"]
        for s in range(8):
            b = s * 16
            v0x = trow[0, b + 0]
            v0y = trow[0, b + 1]
            v0z = trow[0, b + 2]
            e1x = trow[0, b + 3]
            e1y = trow[0, b + 4]
            e1z = trow[0, b + 5]
            e2x = trow[0, b + 6]
            e2y = trow[0, b + 7]
            e2z = trow[0, b + 8]
            oid = trow[0, b + 9].astype(jnp.int32)
            valid = trow[0, b + 10] > 0.5

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
                & valid
            )
            if mode == "occluded":
                newly = tri_hit & (t < ch["md"])
                occ = jnp.maximum(occ, newly.astype(jnp.int32))
            else:
                upd = tri_hit & (t < best_t)
                best_t = jnp.where(upd, t, best_t)
                best_i = jnp.where(upd, oid, best_i)
        return best_t, best_i, occ

    def cond(c):
        sps = c[0]
        alive = sps[0] > 0
        for p in range(1, P):
            alive = alive | (sps[p] > 0)
        return alive

    def chain_step(p, sp, best_t, best_i, occ):
        ch = chains[p]
        live = sp > 0
        spm = jnp.maximum(sp - 1, 0)
        rid = stack_ref[p, spm]
        sp = spm

        if smem_nodes:
            r32 = rid * 32

            def getf(lane):
                return nodes_ref[r32 + lane]
        else:
            row = nodes_ref[rid // 4, :].reshape(1, 128)
            row = pltpu.roll(row, shift=-(rid % 4) * 32, axis=1)

            def getf(lane):
                return row[0, lane]

        hits = []
        ptrs = []
        for s in range(4):
            tn, tf = aabb(ch, getf, s)
            if mode == "occluded":
                h = (tn <= tf) & (tf >= 0.0) & (tn < ch["md"]) & (occ == 0)
            else:
                h = (tn <= tf) & (tf >= 0.0) & (tn <= best_t)
            hits.append(jnp.any(h) & live)
            ptrs.append(getf(24 + s))

        # Leaf children resolve inline (any order; best_t handles it).
        for s in range(4):
            best_t, best_i, occ = jax.lax.cond(
                hits[s] & (ptrs[s] < 0.0),
                lambda a, s=s: leaf_case(ch, ptrs[s], a),
                lambda a: a,
                (best_t, best_i, occ),
            )

        # Internal children get pushed far-first so near pops first; the
        # near→far order re-applies the binary ordered descent twice.
        def near_bit(lane):
            return jnp.mod(jnp.floor(getf(lane) / ch["octant_pow"]), 2.0) >= 1.0

        push = [hits[s] & (ptrs[s] >= 0.0) for s in range(4)]
        if mode == "occluded":
            ranks = (0, 1, 2, 3)  # order is irrelevant for any-hit
        else:
            nearA = near_bit(28)
            nearB = near_bit(29)
            nearC = near_bit(30)
            l_near = jnp.where(nearB, 0, 1)
            r_near = jnp.where(nearC, 2, 3)
            l_far = 1 - l_near
            r_far = 5 - r_near
            ranks = (
                jnp.where(nearA, l_near, r_near),
                jnp.where(nearA, l_far, r_far),
                jnp.where(nearA, r_near, l_near),
                jnp.where(nearA, r_far, l_far),
            )

        def pick(idx, vals):
            out = vals[3]
            for s in (2, 1, 0):
                out = jnp.where(idx == s, vals[s], out)
            return out

        for k in (3, 2, 1, 0):  # far → near
            if mode == "occluded":
                do, pt = push[k], ptrs[k]
            else:
                idx = ranks[k]
                do = pick(idx, push)
                pt = pick(idx, ptrs)

            @pl.when(do)
            def _(do=do, pt=pt, sp=sp):
                stack_ref[p, sp] = pt.astype(jnp.int32)

            sp = sp + do.astype(jnp.int32)

        if mode == "occluded":
            all_done = jnp.all((occ == 1) | (ch["md"] <= 0.0))
            sp = jnp.where(all_done, 0, sp)
        return sp, best_t, best_i, occ

    def body(c):
        sps, best_ts, best_is, occs = c
        out = [chain_step(p, sps[p], best_ts[p], best_is[p], occs[p])
               for p in range(P)]
        return (tuple(o[0] for o in out), tuple(o[1] for o in out),
                tuple(o[2] for o in out), tuple(o[3] for o in out))

    init = (
        tuple(jnp.int32(1) for _ in range(P)),
        tuple(jnp.full(shape, T_MAX, jnp.float32) for _ in range(P)),
        tuple(jnp.zeros(shape, jnp.int32) for _ in range(P)),
        tuple(jnp.zeros(shape, jnp.int32) for _ in range(P)),
    )
    _, best_ts, best_is, occs = jax.lax.while_loop(cond, body, init)
    for p in range(P):
        sl = slice(p * KS, (p + 1) * KS)
        if mode == "occluded":
            t_ref[sl, :] = occs[p].astype(jnp.float32)
            tri_ref[sl, :] = occs[p]
        else:
            t_ref[sl, :] = best_ts[p]
            tri_ref[sl, :] = best_is[p]


def table_modes(accel: QuadAccel) -> tuple[str, str]:
    """(node_mode, tris_mode) the kernel will use for this accel:
    nodes 'smem' (flat table scalar-loads) or 'vmem' (row layout);
    tris 'resident' (whole table in VMEM) or 'streamed' (HBM + per-leaf
    DMA).  Reported by bench.py so scale-row artifacts record which memory
    path actually ran."""
    node = ("smem" if accel.nodes_flat.size * 4 <= _SMEM_NODE_BUDGET_BYTES
            else "vmem")
    tris = ("resident" if accel.tris.size * 4 <= _VMEM_TRIS_BUDGET_BYTES
            else "streamed")
    return node, tris


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def kernel_mode() -> str:
    """The mode the quad kernel will execute in on this process's devices —
    printed by bench.py so the artifact proves COMPILED-MOSAIC ran."""
    return "INTERPRET" if _use_interpret() else "COMPILED-MOSAIC"


def _log_mode_once(interpret: bool):
    global _logged_mode
    if not _logged_mode:
        _logged_mode = True
        _log.info(
            "pallas_quad kernel mode: %s (platform=%s)",
            "INTERPRET" if interpret else "COMPILED-MOSAIC",
            jax.devices()[0].platform,
        )


@functools.partial(
    jax.jit,
    static_argnames=("packet_tile", "stack_depth", "mode", "interleave"),
)
def _traverse(origin, direction, max_dist, accel: QuadAccel,
              packet_tile: int, stack_depth: int, mode: str,
              interleave: int = 1):
    R = origin.shape[0]
    K = max(128, -(-packet_tile // 128) * 128)
    KS = K // 128
    P = max(1, min(interleave, -(-R // K)))

    def prep(a, fill):
        pad = (-R) % (K * P)
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
    n_steps = n_rows // (KS * P)

    ray_spec = pl.BlockSpec((KS * P, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    # Node layout: flat table in SMEM when it fits (2x faster walk —
    # scalar-core loads instead of per-quantity lane extraction), VMEM row
    # layout otherwise.
    smem_nodes = accel.nodes_flat.size * 4 <= _SMEM_NODE_BUDGET_BYTES
    node_arr = accel.nodes_flat if smem_nodes else accel.nodes
    node_spec = pl.BlockSpec(
        memory_space=pltpu.SMEM if smem_nodes else pltpu.VMEM
    )
    # Leaf-row table: VMEM-resident while it fits; above the budget it
    # stays in HBM and leaf rows are DMA'd on demand (Sylveon-class 66k
    # tris ≈ 5.7 MB stays resident; 260k/1M-tri tables of 22/87 MB would
    # OOM the 16 MB VMEM — BASELINE scale rows).
    stream_tris = accel.tris.size * 4 > _VMEM_TRIS_BUDGET_BYTES
    tris_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if stream_tris else pltpu.VMEM
    )

    kernel = functools.partial(_kernel, stack_depth=stack_depth, mode=mode,
                               interleave=P, smem_nodes=smem_nodes,
                               stream_tris=stream_tris)
    interpret = _use_interpret()
    _log_mode_once(interpret)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[ray_spec] * 7 + [node_spec, tris_spec],
        out_specs=(
            pl.BlockSpec((KS * P, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KS * P, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((P, stack_depth), jnp.int32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, md, node_arr, accel.tris)
    return out_t.reshape(-1)[:R], out_tri.reshape(-1)[:R]


def _check_stack(accel: QuadAccel, cfg):
    need = 3 * accel.max_depth + 2
    if need > cfg.bvh_stack_depth:
        raise ValueError(
            f"quad BVH depth {accel.max_depth} needs stack_depth >= {need}, "
            f"got {cfg.bvh_stack_depth}"
        )


def quad_nearest(origin, direction, accel: QuadAccel, cfg):
    """Nearest hit via the 4-wide kernel: (hit, t, tri)."""
    _check_stack(accel, cfg)
    t, tri = _traverse(
        origin, direction, jnp.zeros((origin.shape[0],), jnp.float32), accel,
        cfg.packet_tile, cfg.bvh_stack_depth, "nearest",
        getattr(cfg, "interleave", 1),
    )
    hit = t < T_MAX
    return hit, t, jnp.where(hit, tri, 0)


def quad_occluded(origin, direction, max_dist, accel: QuadAccel, cfg):
    """Any-hit query via the 4-wide kernel: occluded [R] bool."""
    _check_stack(accel, cfg)
    _, occ = _traverse(
        origin, direction, max_dist, accel,
        cfg.packet_tile, cfg.bvh_stack_depth, "occluded",
        getattr(cfg, "interleave", 1),
    )
    return occ.astype(bool)
