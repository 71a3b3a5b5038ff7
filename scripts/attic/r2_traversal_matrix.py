"""Round-2 traversal matrix: kernel-only Mray/s per backend on the real chip.

Coherent (primary) and incoherent (shuffled bounce-like) nearest queries +
shadow (occluded) queries, for wide-pallas and threaded.  Inputs vary per
iteration (axon relay memoizes identical executions).
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


def bench(make_fn, n=3):
    """make_fn(i) -> jitted call with per-i distinct inputs."""
    out = make_fn(0)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = make_fn(i)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tris = int(sys.argv[2]) if len(sys.argv) > 2 else 66_000
    scene = procedural_scene(n_tris_target=tris)
    cam = OrbitCamera().camera()
    cfg = RenderConfig(width=side, height=side, bvh_leaf_size=8,
                       packet_tile=1024, traversal="pallas")
    o, d, _ = generate_rays(cam, cfg, jnp.uint32(0))
    R = o.shape[0]
    rng = np.random.default_rng(0)
    perm = rng.permutation(R)
    o_i, d_i = o[perm], d[perm]
    # jitter origins slightly per-iteration to defeat relay memoization
    jit_eps = [jnp.asarray(rng.normal(0, 1e-4, (R, 3)), jnp.float32)
               for _ in range(8)]
    maxd = jnp.full((R,), 3.0, jnp.float32)
    print(f"R={R} T={scene.n_triangles} backend={jax.default_backend()}",
          flush=True)

    from dpt_tpu.accel.bvh import build_bvh_median
    v0, v1, v2 = scene.tri_vertices()
    bvh8 = build_bvh_median(np.asarray(scene.vertices),
                            np.asarray(scene.indices), leaf_size=8)

    # --- wide pallas ---
    from dpt_tpu.kernels.pallas_wide import pack_wide, wide_nearest, wide_occluded
    wacc = pack_wide(bvh8, v0, v1, v2)

    def w_near(o_, d_):
        def f(i):
            return wide_nearest(o_ + jit_eps[i % 8], d_, wacc, cfg)
        return f

    def w_occ(o_, d_):
        def f(i):
            return wide_occluded(o_ + jit_eps[i % 8], d_, maxd, wacc, cfg)
        return f

    # --- threaded ---
    from dpt_tpu.accel.threaded import (build_threaded, threaded_nearest,
                                        threaded_occluded)
    tacc = build_threaded(bvh8, v0, v1, v2)

    jn = jax.jit(lambda o_, d_: threaded_nearest(o_, d_, tacc))
    jo = jax.jit(lambda o_, d_, m_: threaded_occluded(o_, d_, m_, tacc))

    def t_near(o_, d_):
        def f(i):
            return jn(o_ + jit_eps[i % 8], d_)
        return f

    def t_occ(o_, d_):
        def f(i):
            return jo(o_ + jit_eps[i % 8], d_, maxd)
        return f

    for tag, mk in [
        ("wide  nearest coherent  ", w_near(o, d)),
        ("wide  nearest incoherent", w_near(o_i, d_i)),
        ("wide  occluded coherent ", w_occ(o, d)),
        ("thrd  nearest coherent  ", t_near(o, d)),
        ("thrd  nearest incoherent", t_near(o_i, d_i)),
        ("thrd  occluded coherent ", t_occ(o, d)),
        ("thrd  occluded incoherent", t_occ(o_i, d_i)),
    ]:
        dt = bench(mk)
        print(f"{tag} {dt*1e3:9.2f} ms  {R/dt/1e6:8.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
