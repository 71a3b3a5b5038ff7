"""Virtual-mesh sharding overhead, refreshed for the r4 program (per-shard
carry compaction + chunked overflow now execute inside every shard).

8 virtual CPU devices on one host share the same cores, so this measures
the shard_map machinery (partitioning, implicit psum, assembly) — not chip
scaling; the sharded program must simply never be slower than
single-device at fixed total work.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python scripts/r4_vmesh_overhead.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene  # noqa: E402
from dpt_tpu.accel.bvh import build_accel  # noqa: E402
from dpt_tpu.dist.sharding import make_tile_mesh, render_sample_sharded_jit  # noqa: E402
from dpt_tpu.render.renderer import render_sample  # noqa: E402


def main():
    side = 128
    scene = procedural_scene(n_tris_target=4_000)
    camera = OrbitCamera().camera()
    cfg = RenderConfig(
        width=side, height=side, max_depth=3, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=1024,
        ray_sort=True, enable_sss=True, compact_frac=0.25,
    )
    accel = build_accel(scene, cfg)
    print(f"devices={len(jax.devices())} side={side} "
          f"compact per shard: C(1dev)="
          f"{-(-int(side*side*cfg.compact_frac)//128)*128}", flush=True)

    def bench(fn, n=3):
        fn(0).block_until_ready()
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            out = fn(i)
        out.block_until_ready()
        return (time.perf_counter() - t0) / n

    dt1 = bench(lambda i: render_sample(scene, camera, cfg,
                                        jnp.uint32(40 + i), accel))
    print(f"  single-device: {dt1*1e3:7.1f} ms", flush=True)
    for n_dev in (2, 4, 8):
        mesh = make_tile_mesh(n_dev)
        dt = bench(lambda i: render_sample_sharded_jit(
            scene, camera, cfg, jnp.uint32(40 + i), accel, mesh))
        r = side * side // n_dev
        cap = -(-int(r * cfg.compact_frac) // 128) * 128
        live = "live" if cap < r else "off (C>=R)"
        print(f"  {n_dev} devices:    {dt*1e3:7.1f} ms  "
              f"(per-shard R={r}, C={cap}, compaction {live})", flush=True)


if __name__ == "__main__":
    main()
