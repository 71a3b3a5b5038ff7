"""Threaded (skip-pointer) BVH — per-ray stackless traversal in pure XLA.

The reference walks its BVH with a per-thread stack (raytrace_comp.comp:
159-204).  A stack per ray needs per-lane scatters (slow on TPU), and a
shared packet stack degenerates to a whole-tree walk for incoherent
bounce/SSS rays.  This module re-architects traversal so **every ray
advances independently in lockstep with zero scatters**:

  - Nodes are laid out in depth-first pre-order with a *skip pointer*:
    on AABB hit descend to ``idx+1``, on miss jump to ``skip[idx]`` (the
    record after the whole subtree).  Per-ray state = one int32 — no stack.
  - Leaf triangles are inlined into the node stream as "leaf-chain" records
    (v0, e1, e2 occupying the same slots internal nodes use for their
    bounds), so one traversal step = one indexed load per field + one fused
    AABB-or-triangle test.  idx strictly increases ⇒ termination in ≤ N
    steps, no stack-overflow failure mode at all (VERDICT r1 §weak-9).
  - Eight node orderings, one per ray-direction octant, give every ray a
    near-child-first (front-to-back) descent, so ``t_near < best_t``
    pruning terminates rays early — the vector-machine analog of the
    ordered descent a scalar GPU walk gets from its stack.

Data layout is strict SoA: twelve 1-D tables (nine f32, three i32).  Two
hard-won XLA/TPU performance rules (measured on a v5e chip, see
scripts/probe_gather4.py / probe_args.py):

  1. 1-D gathers fused into a loop run ~1000x faster than gathers from a
     2-D [N, W] table whose columns are then sliced — column extraction
     relayouts the whole gathered block every step.
  2. Tables MUST be jit *arguments* (pytree leaves), never closure
     constants — XLA embeds captured arrays as executable constants and
     gathers from them run ~15,000x slower.  ThreadedBVH is a registered
     pytree and flows through render_sample's `accel` argument.

Rays are processed in chunks (lax.scan over chunk rows) so each chunk's
while_loop trip count is set by the slowest ray *of that chunk* only; with
the coherence sort (render/compaction.py) chunks are direction/locality
pure and finish early.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

T_MAX = np.float32(1e30)

# Default rays-per-chunk for the traversal scan. 128k rays x ~16 live
# vectors is small relative to HBM while still saturating the VPU.
CHUNK = 128 * 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ThreadedBVH:
    """Skip-pointer BVH, SoA tables with 8 per-octant node orderings.

    Tables are [8*N] (octant-major).  Leaf records: f0-f2 = v0, f3-f5 = e1,
    f6-f8 = e2.  Internal records: f0-f2 = bbox min, f3-f5 = bbox max,
    f6-f8 = 0.  skip = record after this subtree (N = done), leaf = 0/1,
    oid = original triangle id (leaves).
    """

    f0: jax.Array
    f1: jax.Array
    f2: jax.Array
    f3: jax.Array
    f4: jax.Array
    f5: jax.Array
    f6: jax.Array
    f7: jax.Array
    f8: jax.Array
    skip: jax.Array  # i32
    leaf: jax.Array  # i32 0/1
    oid: jax.Array  # i32
    n_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nbytes(self) -> int:
        return 12 * self.f0.shape[0] * 4


def _subtree_sizes(left, right, counts):
    """Threaded-record count per subtree (leaf-chain records for leaves)."""
    n = left.shape[0]
    size = np.zeros(n, np.int64)
    is_leaf = left < 0
    # Host builders number children after parents → reverse pass suffices;
    # the LBVH interleaves ids, so fall back to explicit post-order.
    ok = True
    for nid in range(n - 1, -1, -1):
        if is_leaf[nid]:
            size[nid] = counts[nid]
        else:
            l, r = left[nid], right[nid]
            if l <= nid or r <= nid:
                ok = False
                break
            size[nid] = 1 + size[l] + size[r]
    if ok:
        return size
    size[:] = 0
    stack = [(0, False)]
    while stack:
        nid, expanded = stack.pop()
        if is_leaf[nid]:
            size[nid] = counts[nid]
            continue
        if expanded:
            size[nid] = 1 + size[left[nid]] + size[right[nid]]
        else:
            stack.append((nid, True))
            stack.append((int(left[nid]), False))
            stack.append((int(right[nid]), False))
    return size


def build_threaded(bvh, v0, v1, v2) -> ThreadedBVH:
    """Flatten a binary accel.bvh.BVH into threaded multi-octant SoA tables.

    Host-side (numpy); runs once per scene.  Any leaf size works — leaves
    become chains of single-triangle records.
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
    size = _subtree_sizes(left, right, counts)
    N = int(size[0])

    center = 0.5 * (nmin + nmax)
    e1 = v1 - v0
    e2 = v2 - v0

    F = np.zeros((8, N, 9), np.float32)
    skip = np.zeros((8, N), np.int32)
    leaf = np.zeros((8, N), np.int32)
    oid = np.zeros((8, N), np.int32)

    for o in range(8):
        s = np.array(
            [1.0 if o & 4 else -1.0,
             1.0 if o & 2 else -1.0,
             1.0 if o & 1 else -1.0],
            np.float32,
        )
        csign = center @ s  # [n] near-key along this octant's direction
        pos = 0
        stack = [0]
        while stack:
            nid = stack.pop()
            if is_leaf[nid]:
                first = right[nid]
                c = counts[nid]
                tids = order[first:first + c]
                F[o, pos:pos + c, 0:3] = v0[tids]
                F[o, pos:pos + c, 3:6] = e1[tids]
                F[o, pos:pos + c, 6:9] = e2[tids]
                skip[o, pos:pos + c] = np.arange(pos + 1, pos + c + 1)
                leaf[o, pos:pos + c] = 1
                oid[o, pos:pos + c] = tids
                pos += c
                continue
            F[o, pos, 0:3] = nmin[nid]
            F[o, pos, 3:6] = nmax[nid]
            skip[o, pos] = pos + size[nid]
            pos += 1
            l, r = left[nid], right[nid]
            near, far = (l, r) if csign[l] <= csign[r] else (r, l)
            stack.append(far)
            stack.append(near)
        assert pos == N, (pos, N)

    Ff = F.reshape(8 * N, 9)
    return ThreadedBVH(
        *(jnp.asarray(np.ascontiguousarray(Ff[:, i])) for i in range(9)),
        skip=jnp.asarray(skip.reshape(-1)),
        leaf=jnp.asarray(leaf.reshape(-1)),
        oid=jnp.asarray(oid.reshape(-1)),
        n_nodes=N,
    )


def _safe_inv(d):
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0, tiny, -tiny), d)


def _octant_base(dx, dy, dz, n_nodes):
    o = (
        (dx >= 0).astype(jnp.int32) * 4
        + (dy >= 0).astype(jnp.int32) * 2
        + (dz >= 0).astype(jnp.int32)
    )
    return o * n_nodes


def _step_tests(acc, g, ox, oy, oz, dx, dy, dz, ix, iy, iz, eps):
    """One fused record test: gather 12 SoA fields at g, run the slab test
    (internal interpretation) and Möller–Trumbore (leaf interpretation).

    Returns (skip, is_leaf, oid, box_ok, t_near, mt_ok, t).
    """
    a0, a1, a2 = acc.f0[g], acc.f1[g], acc.f2[g]
    b0, b1, b2 = acc.f3[g], acc.f4[g], acc.f5[g]
    c0, c1, c2 = acc.f6[g], acc.f7[g], acc.f8[g]
    sk = acc.skip[g]
    lf = acc.leaf[g] == 1
    od = acc.oid[g]

    # Slab test (raytrace_comp.comp:102-112 semantics).
    t0 = (a0 - ox) * ix
    t1 = (b0 - ox) * ix
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t0 = (a1 - oy) * iy
    t1 = (b1 - oy) * iy
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    t0 = (a2 - oz) * iz
    t1 = (b2 - oz) * iz
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    box_ok = (tn <= tf) & (tf >= 0.0)

    # Möller–Trumbore (raytrace_comp.comp:114-149) on the same lanes.
    px = dy * c2 - dz * c1
    py = dz * c0 - dx * c2
    pz = dx * c1 - dy * c0
    det = b0 * px + b1 * py + b2 * pz
    par = jnp.abs(det) < eps
    invd = 1.0 / jnp.where(par, 1.0, det)
    tx = ox - a0
    ty = oy - a1
    tz = oz - a2
    u = invd * (tx * px + ty * py + tz * pz)
    qx = ty * b2 - tz * b1
    qy = tz * b0 - tx * b2
    qz = tx * b1 - ty * b0
    v = invd * (dx * qx + dy * qy + dz * qz)
    t = invd * (c0 * qx + c1 * qy + c2 * qz)
    mt_ok = (
        (~par)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    return sk, lf, od, box_ok, tn, mt_ok, t


def _chunked(fn, origin, direction, extra, chunk):
    """Run fn(o, d, *extra_chunk) over row-chunks of the ray stream via scan.

    Shapes are static: the stream is padded to a multiple of `chunk`.  Each
    chunk gets its own while_loop, so trip count is per-chunk max — after
    the coherence sort this is far below the global max.
    """
    R = origin.shape[0]
    if R <= chunk:
        return fn(origin, direction, *extra)
    pad = (-R) % chunk
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.full((pad, 3), 1e9, origin.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.zeros((pad, 3), direction.dtype)])
        extra = tuple(
            jnp.concatenate([e, jnp.full((pad,), -1.0, e.dtype)])
            for e in extra
        )
    n = origin.shape[0] // chunk
    o_c = origin.reshape(n, chunk, 3)
    d_c = direction.reshape(n, chunk, 3)
    e_c = tuple(e.reshape(n, chunk) for e in extra)

    def body(_, xs):
        return None, fn(xs[0], xs[1], *xs[2:])

    _, out = jax.lax.scan(body, None, (o_c, d_c) + e_c)
    out = jax.tree_util.tree_map(lambda a: a.reshape(-1)[:R], out)
    return out


def threaded_nearest(origin, direction, accel: ThreadedBVH, eps: float = 1e-6,
                     chunk: int = CHUNK):
    """Nearest hit for every ray: (hit [R], t [R], tri [R] i32)."""
    N = accel.n_nodes

    def run(origin, direction):
        R = origin.shape[0]
        ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
        dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        base = _octant_base(dx, dy, dz, N)

        def cond(c):
            idx, best_t, best_i, it = c
            # idx strictly increases while live → ≤ N steps; the explicit
            # bound is a hard backstop against corrupted tables.
            return jnp.any(idx < N) & (it < N + 2)

        def body(c):
            idx, best_t, best_i, it = c
            live = idx < N
            g = base + jnp.minimum(idx, N - 1)
            sk, lf, od, box_ok, tn, mt_ok, t = _step_tests(
                accel, g, ox, oy, oz, dx, dy, dz, ix, iy, iz, eps
            )
            upd = live & lf & mt_ok & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_i = jnp.where(upd, od, best_i)
            descend = box_ok & (tn < best_t) & (~lf)
            idx = jnp.where(live, jnp.where(descend, idx + 1, sk), idx)
            return idx, best_t, best_i, it + 1

        c0 = (jnp.zeros((R,), jnp.int32), jnp.full((R,), T_MAX, jnp.float32),
              jnp.zeros((R,), jnp.int32), jnp.int32(0))
        _, best_t, best_i, _ = jax.lax.while_loop(cond, body, c0)
        hit = best_t < T_MAX
        return hit, best_t, jnp.where(hit, best_i, 0)

    return _chunked(run, origin, direction, (), chunk)


def threaded_occluded(origin, direction, max_dist, accel: ThreadedBVH,
                      eps: float = 1e-6, chunk: int = CHUNK):
    """Any-hit query: occluded [R] bool for hits with t < max_dist.

    Rays with max_dist <= 0 are masked out up front (zero iterations);
    resolved rays stop immediately (first-hit early exit, the analog of the
    shadow-ray shortcut SURVEY §3.3 calls out as the majority workload).
    """
    N = accel.n_nodes

    def run(origin, direction, max_dist):
        ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
        dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        base = _octant_base(dx, dy, dz, N)

        def cond(c):
            idx, occ, it = c
            return jnp.any(idx < N) & (it < N + 2)

        def body(c):
            idx, occ, it = c
            live = idx < N
            g = base + jnp.minimum(idx, N - 1)
            sk, lf, od, box_ok, tn, mt_ok, t = _step_tests(
                accel, g, ox, oy, oz, dx, dy, dz, ix, iy, iz, eps
            )
            newly = live & lf & mt_ok & (t < max_dist)
            occ = occ | newly
            descend = box_ok & (tn < max_dist) & (~lf)
            nxt = jnp.where(descend, idx + 1, sk)
            idx = jnp.where(live, jnp.where(occ, N, nxt), idx)
            return idx, occ, it + 1

        idx0 = jnp.where(max_dist > 0.0, 0, N).astype(jnp.int32)
        occ0 = jnp.zeros(idx0.shape, bool)
        _, occ, _ = jax.lax.while_loop(cond, body, (idx0, occ0, jnp.int32(0)))
        return occ

    return _chunked(run, origin, direction, (max_dist,), chunk)
