"""Correctness + perf probe of the threaded skip-pointer traversal."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_bvh_median, build_bvh_sah
from dpt_tpu.accel.threaded import (build_threaded, threaded_nearest,
                                    threaded_occluded)
from dpt_tpu.render.intersect import brute_force_nearest
from dpt_tpu.render.raygen import generate_rays


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def correctness(builder):
    scene = procedural_scene(n_tris_target=2_000)
    v0, v1, v2 = scene.tri_vertices()
    bvh = builder(np.asarray(scene.vertices), np.asarray(scene.indices),
                  leaf_size=4)
    acc = build_threaded(bvh, v0, v1, v2)
    print(f"threaded N={acc.n_nodes} table={acc.table.shape} "
          f"{acc.nbytes/1e6:.1f} MB")

    key = jax.random.PRNGKey(0)
    R = 4096
    o = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    th, tt, ti = jax.jit(threaded_nearest)(o, d, acc)
    assert bool(jnp.all(bh == th)), "hit mismatch"
    assert bool(jnp.all(jnp.where(bh, jnp.abs(bt - tt) < 1e-4, True))), "t mismatch"
    # Tri ids may differ only on exact-tie t; check t equality is enough.
    md = jnp.where(bh, bt * 0.99, 1e-3)
    from dpt_tpu.render.intersect import brute_force_occluded
    bo = brute_force_occluded(o, d, md, v0, v1, v2)
    to = jax.jit(threaded_occluded)(o, d, md, acc)
    assert bool(jnp.all(bo == to)), "occlusion mismatch"
    print("correctness OK (nearest + occluded match brute force)")


def perf(n_tris, builder, leaf_size):
    scene = procedural_scene(n_tris_target=n_tris)
    v0, v1, v2 = scene.tri_vertices()
    t0 = time.perf_counter()
    bvh = builder(np.asarray(scene.vertices), np.asarray(scene.indices),
                  leaf_size=leaf_size)
    t1 = time.perf_counter()
    acc = build_threaded(bvh, v0, v1, v2)
    t2 = time.perf_counter()
    print(f"build: bvh {t1-t0:.2f}s threaded {t2-t1:.2f}s "
          f"N={acc.n_nodes} {acc.nbytes/1e6:.1f} MB")

    cfg = RenderConfig(width=1024, height=1024)
    camera = OrbitCamera().camera()
    o, d, _ = generate_rays(camera, cfg, jnp.uint32(0))
    R = o.shape[0]

    nearest = jax.jit(lambda o, d: threaded_nearest(o, d, acc))
    dt = timeit(nearest, o, d)
    print(f"coherent primary nearest: {dt*1e3:7.1f} ms {R/dt/1e6:8.2f} Mray/s")

    key = jax.random.PRNGKey(0)
    oi = jax.random.uniform(key, (R, 3), minval=-1.0, maxval=1.0)
    di = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)
    dt = timeit(nearest, oi, di)
    print(f"incoherent nearest:       {dt*1e3:7.1f} ms {R/dt/1e6:8.2f} Mray/s")

    from dpt_tpu.render.compaction import sort_permutation
    perm = sort_permutation(oi, di, jnp.ones(R, bool),
                            jnp.array([-1.0, -1.0, -1.0]),
                            jnp.array([1.0, 1.0, 1.0]))
    os_, ds_ = jax.block_until_ready((oi[perm], di[perm]))
    dt = timeit(nearest, os_, ds_)
    print(f"sorted incoherent:        {dt*1e3:7.1f} ms {R/dt/1e6:8.2f} Mray/s")

    occl = jax.jit(lambda o, d, m: threaded_occluded(o, d, m, acc))
    md = jnp.full((R,), 2.0, jnp.float32)
    dt = timeit(occl, os_, ds_, md)
    print(f"sorted occluded:          {dt*1e3:7.1f} ms {R/dt/1e6:8.2f} Mray/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=66_000)
    ap.add_argument("--builder", default="median", choices=["median", "sah"])
    ap.add_argument("--leaf", type=int, default=4)
    ap.add_argument("--skip-correctness", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    builder = build_bvh_median if args.builder == "median" else build_bvh_sah
    if not args.skip_correctness:
        correctness(builder)
    perf(args.tris, builder, args.leaf)
