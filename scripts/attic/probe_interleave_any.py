"""Decisive r2 probe: P independent walk chains per Mosaic while_loop step.

Mimics the wide kernel's iteration: dependent dynamic row load from a VMEM
node table + roll + paired AABB test on an (8,128) ray tile + scalar stack
ops.  With P chains interleaved, per-chain latency should hide behind the
other chains' work if the bottleneck is serial load/control latency.

Prints ns per iteration per chain for P in {1, 2, 4, 8}.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 512
N_ROWS = 1024  # node table rows


def timeit(fn, args_list):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 3
    for i in range(1, n + 1):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make(P):
    def kern(nodes_ref, *refs):
        ray_refs = refs[:P * 6]
        out_refs = refs[P * 6:P * 6 + P]
        rays = []
        for p in range(P):
            ox, oy, oz, dx, dy, dz = (r[:, :] for r in ray_refs[p * 6:(p + 1) * 6])
            ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
            iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
            iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)
            rays.append((ox, oy, oz, ix, iy, iz))

        def aabb(row, b, r):
            ox, oy, oz, ix, iy, iz = r
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
            it, idxs, accs = c
            new_idxs = []
            new_accs = []
            for p in range(P):
                rid = idxs[p]
                row = nodes_ref[rid // 8, :].reshape(1, 128)
                row = pltpu.roll(row, shift=-(rid % 8) * 16, axis=1)
                ltn, ltf = aabb(row, 0, rays[p])
                rtn, rtf = aabb(row, 6, rays[p])
                hit = (ltn <= ltf) & (ltf >= 0.0)
                acc = accs[p] + jnp.where(hit, ltn, rtn)
                # dependent next index THROUGH a vector->scalar reduction,
                # like the real kernel's any(lhit) descent decision
                any_hit = jnp.any(hit)
                nxt = (row[0, 12].astype(jnp.int32) + rid
                       + any_hit.astype(jnp.int32)) % (N_ROWS * 8)
                new_idxs.append(nxt)
                new_accs.append(acc)
            return it + 1, tuple(new_idxs), tuple(new_accs)

        def cond(c):
            return c[0] < ITERS

        z = jnp.zeros((8, 128), jnp.float32)
        _, _, accs = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), tuple(jnp.int32(7 * p + 1) for p in range(P)),
             tuple(z for _ in range(P))),
        )
        for p in range(P):
            out_refs[p][:, :] = accs[p]

    @jax.jit
    def go(nodes, *rays_flat):
        return pl.pallas_call(
            kern,
            out_shape=tuple(
                jax.ShapeDtypeStruct((8, 128), jnp.float32) for _ in range(P)
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + P * 6),
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(P)
            ),
        )(nodes, *rays_flat)

    return go


def main():
    rng = np.random.default_rng(0)
    variants = []
    for v in range(4):
        nodes = rng.normal(size=(N_ROWS, 128)).astype(np.float32)
        nodes[:, 12] = rng.integers(1, 97, N_ROWS)  # pointer field
        variants.append(jnp.asarray(nodes))

    for P in (1, 2, 4, 8):
        rays = [jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
                for _ in range(P * 6)]
        go = make(P)
        args_list = [(v, *rays) for v in variants]
        dt = timeit(go, args_list)
        per = dt / ITERS
        print(f"P={P}:  {dt*1e3:8.3f} ms  {per*1e9:8.1f} ns/iter  "
              f"{per/P*1e9:8.1f} ns/iter/chain", flush=True)


if __name__ == "__main__":
    main()
