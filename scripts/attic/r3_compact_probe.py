"""Probe: where the mostly-dead SSS/bounce streams spend their time, and
what static prefix compaction would save.

Measures, at the headline shape (1M rays, 66k tris, quad+SAH8, tile 4096):
  A. sort machinery alone (key + argsort + gather o/d + scatter t back)
  B. traversal of an ALL-DEAD sorted stream (origins at 1e9)
  C. traversal of a 12%-live SSS-like stream (surface origins, sphere dirs),
     full-size sorted dispatch
  D. same stream, kernel dispatched on the sorted live prefix only
     (capacity R/8) — the compaction candidate
  E. C's argsort replaced by a reused permutation (sort amortization bound)

Axon relay memoizes identical inputs: every timed call varies its inputs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.kernels.pallas_quad import quad_nearest
from dpt_tpu.render.compaction import ray_sort_key


def bench(fn, variants, n=4):
    jax.block_until_ready(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    R = 1024 * 1024
    scene = procedural_scene(n_tris_target=66_000)
    cfg = RenderConfig(width=1024, height=1024, traversal="quad",
                       bvh_builder="sah", bvh_leaf_size=8,
                       packet_tile=4096, interleave=1)
    accel = build_accel(scene, cfg)
    v = np.asarray(scene.vertices)
    bmin = jnp.asarray(v.min(0))
    bmax = jnp.asarray(v.max(0))

    rng = np.random.default_rng(0)
    # SSS-like stream: origins on mesh surface, uniform sphere directions,
    # live fraction ~12% (sorted-live-first as the integrator produces).
    tri = rng.integers(0, v.shape[0] // 3, R)
    o_all = jnp.asarray(v.reshape(-1, 3, 3)[tri].mean(1), np.float32)
    d_all = rng.normal(size=(R, 3)).astype(np.float32)
    d_all = jnp.asarray(d_all / np.linalg.norm(d_all, axis=1, keepdims=True))
    live = jnp.arange(R) < int(0.12 * R)  # post-sort shape: live prefix
    o_live = jnp.where(live[:, None], o_all, 1e9)
    d_live = jnp.where(live[:, None], d_all, jnp.array([0.0, 0.0, 1.0]))
    o_dead = jnp.full((R, 3), 1e9, jnp.float32)
    d_dead = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))

    eps = [jnp.asarray(rng.normal(0, 1e-4, (R, 3)), np.float32)
           for _ in range(5)]

    @jax.jit
    def sort_machinery(o, d):
        active = jnp.all(jnp.abs(o) < 1e8, axis=-1)
        key = ray_sort_key(o, d, active, bmin, bmax)
        perm = jnp.argsort(key)
        os, ds = o[perm], d[perm]
        t = os[:, 0] + ds[:, 0]  # stand-in result
        return jnp.zeros_like(t).at[perm].set(t)

    @jax.jit
    def trav(o, d):
        return quad_nearest(o, d, accel, cfg)[1]

    C = R // 8

    @jax.jit
    def trav_prefix(o, d):
        t = quad_nearest(o[:C], d[:C], accel, cfg)[1]
        return t

    a = bench(lambda e: sort_machinery(o_live + e, d_all), [(e,) for e in eps])
    print(f"A sort machinery        : {a:7.1f} ms/Mray", flush=True)
    b = bench(lambda e: trav(o_dead + jnp.abs(e), d_dead), [(e,) for e in eps])
    print(f"B all-dead traversal    : {b:7.1f} ms/Mray", flush=True)
    c = bench(lambda e: trav(o_live + e, d_live), [(e,) for e in eps])
    print(f"C 12%-live full dispatch: {c:7.1f} ms/Mray", flush=True)
    dd = bench(lambda e: trav_prefix(o_live + e, d_live),
               [(e,) for e in eps])
    print(f"D 12%-live R/8 prefix   : {dd:7.1f} ms/Mray-equiv", flush=True)


if __name__ == "__main__":
    main()
