"""Variant shootout for the threaded traversal on the real workload.

Variants:
  A while  : data-dependent while_loop (as in accel/threaded.py)
  B block  : outer while(any active) over inner fori blocks of K steps
  C fori   : fixed-trip fori (upper-bound steps) — no data-dependent cond
Each at REC_W 12 vs 16.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_bvh_median
from dpt_tpu.accel.threaded import build_threaded, _step_common, _safe_inv
from dpt_tpu.render.raygen import generate_rays

T_MAX = jnp.float32(1e30)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_nearest(table, N, variant, block=32, max_steps=2048):
    W = table.shape[1]

    def prep(origin, direction):
        ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
        dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        o = (
            (dx >= 0).astype(jnp.int32) * 4
            + (dy >= 0).astype(jnp.int32) * 2
            + (dz >= 0).astype(jnp.int32)
        )
        base = o * N
        return ox, oy, oz, dx, dy, dz, ix, iy, iz, base

    def step(c, rays):
        idx, best_t, best_i = c
        ox, oy, oz, dx, dy, dz, ix, iy, iz, base = rays
        live = idx < N
        rec = table[base + jnp.minimum(idx, N - 1)]
        skip, leaf, oid, box_ok, tn, mt_ok, t = _step_common(
            rec, ox, oy, oz, dx, dy, dz, ix, iy, iz, 1e-6
        )
        upd = live & leaf & mt_ok & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_i = jnp.where(upd, oid, best_i)
        descend = box_ok & (tn < best_t) & (~leaf)
        nxt = jnp.where(descend, idx + 1, skip)
        idx = jnp.where(live, nxt, idx)
        return idx, best_t, best_i

    @jax.jit
    def nearest(origin, direction):
        R = origin.shape[0]
        rays = prep(origin, direction)
        c0 = (jnp.zeros((R,), jnp.int32), jnp.full((R,), T_MAX),
              jnp.zeros((R,), jnp.int32))
        if variant == "while":
            c = jax.lax.while_loop(
                lambda c: jnp.any(c[0] < N), lambda c: step(c, rays), c0)
        elif variant == "block":
            def outer_cond(c):
                return jnp.any(c[0] < N)
            def outer_body(c):
                return jax.lax.fori_loop(0, block, lambda i, c: step(c, rays), c)
            c = jax.lax.while_loop(outer_cond, outer_body, c0)
        else:  # fori
            c = jax.lax.fori_loop(0, max_steps,
                                  lambda i, c: step(c, rays), c0)
        idx, best_t, best_i = c
        hit = best_t < T_MAX
        return hit, best_t, jnp.where(hit, best_i, 0)

    return nearest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=66_000)
    args = ap.parse_args()
    print("backend:", jax.default_backend())

    scene = procedural_scene(n_tris_target=args.tris)
    v0, v1, v2 = scene.tri_vertices()
    t0 = time.perf_counter()
    bvh = build_bvh_median(np.asarray(scene.vertices),
                           np.asarray(scene.indices), leaf_size=4,
                           use_native=False)
    t1 = time.perf_counter()
    acc = build_threaded(bvh, v0, v1, v2)
    t2 = time.perf_counter()
    N = acc.n_nodes
    print(f"build: bvh {t1-t0:.2f}s threaded {t2-t1:.2f}s N={N} "
          f"{acc.nbytes/1e6:.1f} MB")

    tab12 = acc.table
    tab16 = jnp.concatenate(
        [tab12, jnp.zeros((tab12.shape[0], 4), jnp.float32)], axis=1)

    cfg = RenderConfig(width=1024, height=1024)
    camera = OrbitCamera().camera()
    oc, dc, _ = generate_rays(camera, cfg, jnp.uint32(0))
    R = oc.shape[0]

    key = jax.random.PRNGKey(0)
    oi = jax.random.uniform(key, (R, 3), minval=-1.0, maxval=1.0)
    di = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)
    jax.block_until_ready((oc, oi))

    for W, tab in (("12", tab12), ("16", tab16)):
        for variant in ("while", "block", "fori"):
            ms = 512 if variant == "fori" else 2048
            nearest = make_nearest(tab, N, variant, block=64, max_steps=ms)
            dtc = timeit(nearest, oc, dc)
            dti = timeit(nearest, oi, di)
            print(f"W={W} {variant:6s}: coherent {dtc*1e3:8.1f} ms "
                  f"({R/dtc/1e6:7.2f} Mray/s) | incoh {dti*1e3:8.1f} ms "
                  f"({R/dti/1e6:7.2f} Mray/s)")


if __name__ == "__main__":
    main()
