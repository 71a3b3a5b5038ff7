"""Round-5 probe: what does per-leaf DMA streaming cost at fixed tree?

Runs the flagship 1024^2 fwd step on the 66k-tri scene twice: leaf table
VMEM-resident (normal) vs FORCED HBM-streamed (budget=0) — same tree, same
rays, so the delta is purely the stream_tris DMA path.  Attributes the
260k/1M scale rows' slowdown between tree depth / VMEM-node fallback and
the per-leaf DMA, and decides whether a multi-slot DMA prefetch is worth
building.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample
import dpt_tpu.kernels.pallas_quad as pq


def bench(scene, cam, cfg, accel, n=3):
    render_sample(scene, cam, cfg, jnp.uint32(0), accel).block_until_ready()
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        img = render_sample(scene, cam, cfg, jnp.uint32(200 + i), accel)
    img.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    cfg = RenderConfig(
        width=1024, height=1024, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    )
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera(yaw=0.11).camera()
    accel = build_accel(scene, cfg)

    t_res = bench(scene, cam, cfg, accel)
    print(f"resident tris : {t_res*1e3:8.1f} ms/step", flush=True)

    pq._VMEM_TRIS_BUDGET_BYTES = 0  # force HBM streaming, same tree
    # distinct camera so the relay can't serve memoized executions
    cam2 = OrbitCamera(yaw=0.12).camera()
    t_str = bench(scene, cam2, cfg, accel)
    print(f"streamed tris : {t_str*1e3:8.1f} ms/step  "
          f"({(t_str/t_res - 1)*100:+.1f}% DMA cost at fixed tree)",
          flush=True)


if __name__ == "__main__":
    main()
