"""Isolate the serializer in the interleaved wide kernel.

Variants (each at P=1 and P=8):
  A: pointer-chase + AABB pair + any() reduction         (known: pipelines)
  B: A + SMEM stack pop/push with pl.when
  C: B + 2 data-dependent lax.cond leaf cases (8-tri MT bodies)
  D: B + leaf cases executed UNCONDITIONALLY (masked, no branch)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 512
N_ROWS = 1024


def timeit(fn, args_list):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 3
    for i in range(1, n + 1):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def mt8(trow, ox, oy, oz, dx, dy, dz, best):
    for s in range(8):
        b = s * 16
        e1x, e1y, e1z = trow[0, b + 3], trow[0, b + 4], trow[0, b + 5]
        e2x, e2y, e2z = trow[0, b + 6], trow[0, b + 7], trow[0, b + 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-6, 1.0, det)
        tx, ty, tz = ox - trow[0, b], oy - trow[0, b + 1], oz - trow[0, b + 2]
        u = inv * (tx * px + ty * py + tz * pz)
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = inv * (dx * qx + dy * qy + dz * qz)
        t = inv * (e2x * qx + e2y * qy + e2z * qz)
        ok = (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
        best = jnp.where(ok & (t < best), t, best)
    return best


def make(P, variant):
    def kern(nodes_ref, tris_ref, *refs):
        ray_refs = refs[:P * 6]
        out_refs = refs[P * 6:P * 6 + P]
        stack_ref = refs[-1]
        rays = []
        for p in range(P):
            ox, oy, oz, dx, dy, dz = (r[:, :] for r in ray_refs[p * 6:(p + 1) * 6])
            ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
            iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
            iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
            rays.append((ox, oy, oz, dx, dy, dz, ix, iy, iz))
            stack_ref[p, 0] = jnp.int32(7 * p + 1)

        def aabb(row, b, r):
            ox, oy, oz = r[0], r[1], r[2]
            ix, iy, iz = r[6], r[7], r[8]
            t0 = (row[0, b + 0] - ox) * ix
            t1 = (row[0, b + 3] - ox) * ix
            tn = jnp.minimum(t0, t1)
            tf = jnp.maximum(t0, t1)
            t0 = (row[0, b + 1] - oy) * iy
            t1 = (row[0, b + 4] - oy) * iy
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            t0 = (row[0, b + 2] - oz) * iz
            t1 = (row[0, b + 5] - oz) * iz
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            return tn, tf

        def body(c):
            it, sps, accs = c
            new_sps = []
            new_accs = []
            for p in range(P):
                r = rays[p]
                sp = sps[p]
                spm = jnp.maximum(sp - 1, 0)
                rid = stack_ref[p, spm] if variant != "A" else sps[p] * 0 + (
                    stack_ref[p, 0])
                row = nodes_ref[rid // 8, :].reshape(1, 128)
                row = pltpu.roll(row, shift=-(rid % 8) * 16, axis=1)
                ltn, ltf = aabb(row, 0, r)
                rtn, rtf = aabb(row, 6, r)
                lhit = jnp.any((ltn <= ltf) & (ltf >= 0.0))
                rhit = jnp.any((rtn <= rtf) & (rtf >= 0.0))
                lptr = (row[0, 12].astype(jnp.int32) + rid) % (N_ROWS * 8)
                rptr = (row[0, 13].astype(jnp.int32) + rid) % (N_ROWS * 8)
                trow_id = rid % 512
                acc = accs[p]

                if variant == "A":
                    acc = acc + jnp.where((ltn <= ltf), ltn, rtn)
                    stack_ref[p, 0] = jnp.where(
                        lhit, lptr, rptr).astype(jnp.int32)
                    new_sps.append(sp)
                elif variant in ("B", "C", "D"):
                    if variant == "C":
                        # data-dependent branch ~50% taken
                        leaf_l = (row[0, 14] > 0.0) & lhit
                        trow = tris_ref[trow_id, :].reshape(1, 128)
                        acc = jax.lax.cond(
                            leaf_l,
                            lambda a: mt8(trow, r[0], r[1], r[2], r[3], r[4],
                                          r[5], a),
                            lambda a: a,
                            acc,
                        )
                    elif variant == "D":
                        trow = tris_ref[trow_id, :].reshape(1, 128)
                        acc = mt8(trow, r[0], r[1], r[2], r[3], r[4], r[5],
                                  acc)
                    sp2 = spm
                    both = lhit & rhit

                    @pl.when(both)
                    def _():
                        stack_ref[p, sp2] = lptr
                        stack_ref[p, sp2 + 1] = rptr

                    @pl.when(lhit ^ rhit)
                    def _():
                        stack_ref[p, sp2] = jnp.where(lhit, lptr, rptr)

                    nsp = sp2 + lhit.astype(jnp.int32) + rhit.astype(jnp.int32)
                    nsp = jnp.minimum(nsp, 30)
                    new_sps.append(jnp.maximum(nsp, 1))
                new_accs.append(acc)
            return it + 1, tuple(new_sps), tuple(new_accs)

        def cond(c):
            return c[0] < ITERS

        z = jnp.zeros((8, 128), jnp.float32)
        _, _, accs = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), tuple(jnp.int32(1) for _ in range(P)),
             tuple(z for _ in range(P))),
        )
        for p in range(P):
            out_refs[p][:, :] = accs[p]

    @jax.jit
    def go(nodes, tris, *rays_flat):
        return pl.pallas_call(
            kern,
            out_shape=tuple(
                jax.ShapeDtypeStruct((8, 128), jnp.float32) for _ in range(P)
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + P * 6),
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(P)
            ),
            scratch_shapes=[pltpu.SMEM((P, 32), jnp.int32)],
        )(nodes, tris, *rays_flat)

    return go


def main():
    rng = np.random.default_rng(0)
    variants_in = []
    for v in range(4):
        nodes = rng.normal(size=(N_ROWS, 128)).astype(np.float32)
        nodes[:, 12] = rng.integers(1, 97, N_ROWS)
        nodes[:, 13] = rng.integers(1, 97, N_ROWS)
        nodes[:, 14] = rng.choice([-1.0, 1.0], N_ROWS)
        tris = rng.normal(size=(512, 128)).astype(np.float32)
        variants_in.append((jnp.asarray(nodes), jnp.asarray(tris)))

    for variant in ("A", "B", "C", "D"):
        for P in (1, 8):
            rays = [jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
                    for _ in range(P * 6)]
            go = make(P, variant)
            args_list = [(n, t, *rays) for (n, t) in variants_in]
            dt = timeit(go, args_list)
            per = dt / ITERS
            print(f"{variant} P={P}:  {dt*1e3:8.3f} ms  {per*1e9:8.1f} ns/iter"
                  f"  {per/P*1e9:8.1f} ns/iter/chain", flush=True)


if __name__ == "__main__":
    main()
