"""Round-3 step-time breakdown: per-query-stream cost on the real chip.

Measures, at the headline workload shape (1M rays, 66k tris, SAH leaf 8):
  - coherent primary nearest (sorted / unsorted)
  - incoherent bounce-like nearest (sorted / unsorted)
  - shadow occluded (sorted / unsorted)
  - the sort machinery alone (argsort + gather + scatter)
Inputs vary per call (axon relay memoizes identical executions).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.render.raygen import generate_rays
from dpt_tpu.render.trace import make_nearest, make_occluded
from dpt_tpu.accel.bvh import build_accel


def bench(fn, variants, n=3):
    fn(*variants[0])
    jax.block_until_ready(fn(*variants[0]))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    trav = sys.argv[3] if len(sys.argv) > 3 else "pallas"
    il = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    leaf = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera().camera()
    base = RenderConfig(width=side, height=side, traversal=trav,
                        bvh_builder="sah", bvh_leaf_size=leaf,
                        packet_tile=tile, interleave=il)
    accel = build_accel(scene, base)
    o, d, _ = generate_rays(cam, base, jnp.uint32(0))
    R = o.shape[0]
    rng = np.random.default_rng(0)
    # bounce-like: shuffled origins on surfaces + random cosine-ish dirs
    perm = rng.permutation(R)
    o_b = jnp.asarray(np.asarray(o)[perm] + np.asarray(d)[perm] * 2.0)
    d_b = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    d_b = d_b / jnp.linalg.norm(d_b, axis=-1, keepdims=True)
    eps = [jnp.asarray(rng.normal(0, 1e-4, (R, 3)), np.float32)
           for _ in range(4)]
    maxd = jnp.full((R,), 3.0, jnp.float32)
    half_dead = jnp.where(jnp.arange(R) % 2 == 0, maxd, -1.0)

    print(f"backend={jax.default_backend()} R={R} tile={tile} trav={trav} il={il} leaf={leaf}", flush=True)
    for sort in (False, True):
        cfg = base.replace(ray_sort=sort)
        near = jax.jit(lambda oo, dd, cfg=cfg: make_nearest(scene, cfg, accel)(oo, dd)["t"])
        occ = jax.jit(lambda oo, dd, mm, cfg=cfg: make_occluded(scene, cfg, accel)(oo, dd, mm))
        t_coh = bench(lambda e: near(o + e, d), [(e,) for e in eps])
        t_inc = bench(lambda e: near(o_b + e, d_b), [(e,) for e in eps])
        t_sh = bench(lambda e: occ(o_b + e, d_b, maxd), [(e,) for e in eps])
        t_sh50 = bench(lambda e: occ(o_b + e, d_b, half_dead), [(e,) for e in eps])
        print(f"  sort={int(sort)}  coh_near={t_coh:7.1f}  inc_near={t_inc:7.1f}"
              f"  inc_occ={t_sh:7.1f}  inc_occ_50%dead={t_sh50:7.1f}  ms/Mray",
              flush=True)

    # sort machinery alone
    from dpt_tpu.render.compaction import sort_permutation, scatter_back
    bmin = jnp.asarray(scene.vertices).min(0)
    bmax = jnp.asarray(scene.vertices).max(0)

    @jax.jit
    def sort_only(oo, dd):
        perm = sort_permutation(oo, dd, jnp.ones((R,), bool), bmin, bmax)
        og, dg = oo[perm], dd[perm]
        t = og[:, 0] + dg[:, 0]
        (ts,) = scatter_back(perm, t)
        return ts

    t_sort = bench(lambda e: sort_only(o_b + e, d_b), [(e,) for e in eps])
    print(f"  sort machinery alone: {t_sort:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
