"""Prototype: quad walk with the NODE TABLE IN SMEM (scalar memory).

Hypothesis (BASELINE.md speed-of-light section): the measured ~2 us/step of
the union walk is dominated by per-iteration scalar lane-extractions from
the VMEM node row (24 box bounds + 4 ptrs + 3 masks) plus the dynamic roll.
If node records live in SMEM, every per-record quantity is a cheap scalar
load on the scalar core, and the vector units only run the (KS,128) slab
arithmetic against broadcast scalars.

This probe reimplements the nearest-mode walk of kernels/pallas_quad.py
with nodes in SMEM (leaf rows stay in VMEM, leaf_case unchanged) and
A/B-times it against the production kernel on coherent and incoherent
streams.  If it wins, the layout gets promoted into pallas_quad itself.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.kernels.pallas_quad import T_MAX, quad_nearest
from dpt_tpu.render.raygen import generate_rays


def _kernel_smem(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 nodes_ref, tris_ref, t_ref, tri_ref, stack_ref,
                 *, stack_depth: int):
    KS = ox_ref.shape[0]
    tiny = 1e-20

    def safe_inv(v):
        return 1.0 / jnp.where(jnp.abs(v) < tiny,
                               jnp.where(v >= 0, tiny, -tiny), v)

    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    octant = (
        jnp.where(jnp.sum(jnp.sign(dx)) >= 0.0, 4.0, 0.0)
        + jnp.where(jnp.sum(jnp.sign(dy)) >= 0.0, 2.0, 0.0)
        + jnp.where(jnp.sum(jnp.sign(dz)) >= 0.0, 1.0, 0.0)
    )
    octant_pow = jnp.exp2(octant)
    stack_ref[0] = 0
    shape = (KS, 128)

    def aabb(r32, s):
        b = r32 + 6 * s
        t0 = (nodes_ref[b + 0] - ox) * ix
        t1 = (nodes_ref[b + 3] - ox) * ix
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (nodes_ref[b + 1] - oy) * iy
        t1 = (nodes_ref[b + 4] - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (nodes_ref[b + 2] - oz) * iz
        t1 = (nodes_ref[b + 5] - oz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return tn, tf

    def leaf_case(row_f, args):
        best_t, best_i = args
        row = (-row_f - 1.0).astype(jnp.int32)
        trow = tris_ref[row, :].reshape(1, 128)
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
            tri_hit = ((~parallel) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (t > 1e-6) & valid)
            upd = tri_hit & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_i = jnp.where(upd, oid, best_i)
        return best_t, best_i

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, best_t, best_i = c
        spm = jnp.maximum(sp - 1, 0)
        rid = stack_ref[spm]
        sp = spm
        r32 = rid * 32

        hits = []
        ptrs = []
        for s in range(4):
            tn, tf = aabb(r32, s)
            h = (tn <= tf) & (tf >= 0.0) & (tn <= best_t)
            hits.append(jnp.any(h))
            ptrs.append(nodes_ref[r32 + 24 + s])

        for s in range(4):
            best_t, best_i = jax.lax.cond(
                hits[s] & (ptrs[s] < 0.0),
                lambda a, s=s: leaf_case(ptrs[s], a),
                lambda a: a,
                (best_t, best_i),
            )

        def near_bit(lane):
            return jnp.mod(
                jnp.floor(nodes_ref[r32 + lane] / octant_pow), 2.0) >= 1.0

        push = [hits[s] & (ptrs[s] >= 0.0) for s in range(4)]
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

        for k in (3, 2, 1, 0):
            idx = ranks[k]
            do = pick(idx, push)
            pt = pick(idx, ptrs)

            @pl.when(do)
            def _(do=do, pt=pt, sp=sp):
                stack_ref[sp] = pt.astype(jnp.int32)

            sp = sp + do.astype(jnp.int32)
        return sp, best_t, best_i

    init = (jnp.int32(1), jnp.full(shape, T_MAX, jnp.float32),
            jnp.zeros(shape, jnp.int32))
    _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    t_ref[...] = best_t
    tri_ref[...] = best_i


@functools.partial(jax.jit, static_argnames=("packet_tile", "stack_depth"))
def smem_nearest(origin, direction, nodes_smem, tris, packet_tile,
                 stack_depth):
    R = origin.shape[0]
    K = max(128, -(-packet_tile // 128) * 128)
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
    n_rows = ox.shape[0]
    n_steps = n_rows // KS

    ray_spec = pl.BlockSpec((KS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_t, out_tri = pl.pallas_call(
        functools.partial(_kernel_smem, stack_depth=stack_depth),
        grid=(n_steps,),
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((KS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(ox, oy, oz, dx, dy, dz, nodes_smem, tris)
    return out_t.reshape(-1)[:R], out_tri.reshape(-1)[:R]


def main():
    tris_n = int(sys.argv[1]) if len(sys.argv) > 1 else 66_000
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    scene = procedural_scene(n_tris_target=tris_n)
    cam = OrbitCamera().camera()
    cfg = RenderConfig(width=1024, height=1024, traversal="quad",
                       bvh_builder="sah", bvh_leaf_size=8,
                       packet_tile=tile, interleave=1)
    accel = build_accel(scene, cfg)
    # NaN empty boxes break SMEM scalar compares the same way they protect
    # vector ones; keep them (comparisons with NaN are False on the scalar
    # core too).
    nodes_smem = jnp.asarray(
        np.asarray(accel.nodes).reshape(-1))  # [W4 * 32] 1-D (no padding)
    print(f"backend={jax.default_backend()} tile={tile} "
          f"nodes_smem={nodes_smem.shape} "
          f"({nodes_smem.size * 4 / 1024:.0f} KB)", flush=True)

    o, d, _ = generate_rays(cam, cfg, jnp.uint32(0))
    R = o.shape[0]
    rng = np.random.default_rng(0)
    perm = rng.permutation(R)
    o_b = jnp.asarray(np.asarray(o)[perm] + np.asarray(d)[perm] * 2.0)
    d_b = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    d_b = d_b / jnp.linalg.norm(d_b, axis=-1, keepdims=True)
    eps = [jnp.asarray(rng.normal(0, 1e-4, (R, 3)), np.float32)
           for _ in range(4)]

    # parity check on a small slice first
    t_ref_t, tri_ref_t = quad_nearest(o[:4096], d[:4096], accel, cfg)[1:3]
    t_new, tri_new = smem_nearest(o[:4096], d[:4096], nodes_smem, accel.tris,
                                  tile, cfg.bvh_stack_depth)
    np.testing.assert_allclose(np.asarray(t_ref_t),
                               np.asarray(jnp.minimum(t_new, T_MAX)),
                               rtol=1e-6)
    print("  parity ok", flush=True)

    def bench(fn, variants, n=3):
        jax.block_until_ready(fn(*variants[0]))
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = fn(*variants[i % len(variants)])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    base_coh = bench(lambda e: quad_nearest(o + e, d, accel, cfg)[1],
                     [(e,) for e in eps])
    new_coh = bench(lambda e: smem_nearest(o + e, d, nodes_smem, accel.tris,
                                           tile, cfg.bvh_stack_depth)[0],
                    [(e,) for e in eps])
    base_inc = bench(lambda e: quad_nearest(o_b + e, d_b, accel, cfg)[1],
                     [(e,) for e in eps])
    new_inc = bench(lambda e: smem_nearest(o_b + e, d_b, nodes_smem,
                                           accel.tris, tile,
                                           cfg.bvh_stack_depth)[0],
                    [(e,) for e in eps])
    print(f"  coh_near: vmem-row {base_coh:7.1f}  smem-nodes {new_coh:7.1f} ms/Mray",
          flush=True)
    print(f"  inc_near: vmem-row {base_inc:7.1f}  smem-nodes {new_inc:7.1f} ms/Mray",
          flush=True)


if __name__ == "__main__":
    main()
