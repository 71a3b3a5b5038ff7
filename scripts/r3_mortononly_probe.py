"""Does origin-Morton-only ordering (directions random within a tile) come
close to the full (octant|Morton) per-query sort for SSS-like streams?

Decides between:
  - per-query sort (status quo): ~30-40 ms machinery x 32 queries/step
  - bounce-level sort-once-query-many: 1 sort + ~10 gathers per bounce,
    queries run in origin-sorted order with random directions

Also: shadow-stream (origins Morton-sorted, directions to one light point)
traversal cost without any sort — validates skipping the sort for NEE
occluded queries when origins are already sorted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.kernels.pallas_quad import quad_nearest, quad_occluded
from dpt_tpu.render.compaction import morton3d


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
                       packet_tile=2048, interleave=1)
    accel = build_accel(scene, cfg)
    v = np.asarray(scene.vertices)
    bmin, bmax = jnp.asarray(v.min(0)), jnp.asarray(v.max(0))

    rng = np.random.default_rng(0)
    tri = rng.integers(0, v.shape[0] // 3, R)
    o_all = np.asarray(v.reshape(-1, 3, 3)[tri].mean(1), np.float32)
    d_all = rng.normal(size=(R, 3)).astype(np.float32)
    d_all /= np.linalg.norm(d_all, axis=1, keepdims=True)
    live = np.arange(R) < int(0.12 * R)

    code = np.asarray(morton3d(jnp.asarray(o_all), bmin, bmax))
    octant = ((d_all[:, 0] >= 0) * 4 + (d_all[:, 1] >= 0) * 2
              + (d_all[:, 2] >= 0)).astype(np.uint32)

    def stream(key):
        k = np.where(live, key, np.uint32(0xFFFFFFFF))
        p = np.argsort(k, kind="stable")
        o = np.where(live[p][:, None], o_all[p], 1e9).astype(np.float32)
        d = np.where(live[p][:, None], d_all[p],
                     np.array([0, 0, 1], np.float32)).astype(np.float32)
        return jnp.asarray(o), jnp.asarray(d)

    o_full, d_full = stream((octant << 30) | (code & ((1 << 30) - 1)))
    o_mort, d_mort = stream(code)
    o_morto, d_morto = stream((code << 3) | octant)  # morton-major, octant minor

    eps = [jnp.asarray(rng.normal(0, 1e-4, (R, 3)), np.float32)
           for _ in range(5)]

    @jax.jit
    def trav(o, d):
        return quad_nearest(o, d, accel, cfg)[1]

    for name, (o, d) in (("octant|morton", (o_full, d_full)),
                         ("morton only  ", (o_mort, d_mort)),
                         ("morton|octant", (o_morto, d_morto))):
        ms = bench(lambda e, o=o, d=d: trav(o + e, d), [(e,) for e in eps])
        print(f"{name}: {ms:7.1f} ms", flush=True)

    # Shadow stream: origins Morton-sorted, dirs to one light point.
    lpoint = np.array([0.0, 1.8, 0.0], np.float32)
    k = np.where(live, code, np.uint32(0xFFFFFFFF))
    p = np.argsort(k, kind="stable")
    so = o_all[p]
    sd = lpoint - so
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    smd = np.where(live[p], np.linalg.norm(lpoint - so, axis=1), -1.0)
    so = jnp.asarray(np.where(live[p][:, None], so, 1e9).astype(np.float32))
    sd = jnp.asarray(sd.astype(np.float32))
    smd = jnp.asarray(smd.astype(np.float32))

    @jax.jit
    def occ(o, d, md):
        return quad_occluded(o, d, md, accel, cfg)

    ms = bench(lambda e: occ(so + e, sd, smd), [(e,) for e in eps])
    print(f"shadow morton-sorted, no per-query sort: {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
