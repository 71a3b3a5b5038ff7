"""Post-SMEM re-sweep: (packet_tile, interleave) on the SSS-like stream.

The r3 pre-SMEM sweep picked tile 4096 / interleave 1 because the walk was
bound by the scalar pop->load chain.  SMEM node residence halved that chain,
so smaller tiles (tighter union -> fewer node visits) may now win on
incoherent streams.  Also times the sort-machinery pieces separately
(key+argsort vs gathers+scatter) to target the sort optimization.
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
    base = RenderConfig(width=1024, height=1024, traversal="quad",
                        bvh_builder="sah", bvh_leaf_size=8,
                        packet_tile=4096, interleave=1)
    accel = build_accel(scene, base)
    v = np.asarray(scene.vertices)
    bmin = jnp.asarray(v.min(0))
    bmax = jnp.asarray(v.max(0))

    rng = np.random.default_rng(0)
    tri = rng.integers(0, v.shape[0] // 3, R)
    o_all = np.asarray(v.reshape(-1, 3, 3)[tri].mean(1), np.float32)
    d_all = rng.normal(size=(R, 3)).astype(np.float32)
    d_all /= np.linalg.norm(d_all, axis=1, keepdims=True)
    live_frac = 0.12
    live = np.arange(R) < int(live_frac * R)
    o_live = jnp.asarray(np.where(live[:, None], o_all, 1e9))
    d_live = jnp.asarray(
        np.where(live[:, None], d_all, np.array([0, 0, 1], np.float32)))
    # sort the live prefix by the coherence key so the stream looks like the
    # integrator's post-sort dispatch
    key = np.asarray(ray_sort_key(jnp.asarray(o_all), jnp.asarray(d_all),
                                  jnp.asarray(live), bmin, bmax))
    perm = np.argsort(key, kind="stable")
    o_s = jnp.asarray(np.where(live[perm][:, None], o_all[perm], 1e9))
    d_s = jnp.asarray(np.where(live[perm][:, None], d_all[perm],
                               np.array([0, 0, 1], np.float32)))

    eps = [jnp.asarray(rng.normal(0, 1e-4, (R, 3)), np.float32)
           for _ in range(5)]

    print(f"backend={jax.default_backend()}", flush=True)
    for tile in (1024, 2048, 4096):
        for il in (1, 2, 4):
            cfg = base.replace(packet_tile=tile, interleave=il)

            @jax.jit
            def trav(o, d, cfg=cfg):
                return quad_nearest(o, d, accel, cfg)[1]

            ms = bench(lambda e: trav(o_s + e, d_s), [(e,) for e in eps])
            print(f"tile={tile:5d} il={il}  sss12%: {ms:7.1f} ms", flush=True)

    # sort-piece attribution
    @jax.jit
    def piece_key_argsort(o, d):
        active = jnp.all(jnp.abs(o) < 1e8, axis=-1)
        k = ray_sort_key(o, d, active, bmin, bmax)
        return jnp.argsort(k)

    @jax.jit
    def piece_full(o, d):
        active = jnp.all(jnp.abs(o) < 1e8, axis=-1)
        k = ray_sort_key(o, d, active, bmin, bmax)
        p = jnp.argsort(k)
        os_, ds_ = o[p], d[p]
        t = os_[:, 0] + ds_[:, 0]
        return jnp.zeros_like(t).at[p].set(t)

    a = bench(lambda e: piece_key_argsort(o_live + e, d_all),
              [(e,) for e in eps])
    b = bench(lambda e: piece_full(o_live + e, d_all), [(e,) for e in eps])
    print(f"key+argsort: {a:6.1f} ms   +gather/scatter: {b:6.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
