"""End-to-end render_sample benchmark with varying seeds (honest timing).

Usage: python scripts/bench_e2e.py [--width 512] [--tris 66000]
       [--traversal threaded] [--sort] [--iters 3]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--tris", type=int, default=66_000)
    ap.add_argument("--traversal", default="threaded")
    ap.add_argument("--builder", default="median")
    ap.add_argument("--leaf", type=int, default=4)
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-sss", action="store_true")
    args = ap.parse_args()

    from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_sample
    from dpt_tpu.utils.metrics import traversals_per_sample

    print("backend:", jax.default_backend(), flush=True)
    cfg = RenderConfig(
        width=args.width, height=args.width, max_depth=4, spp=1,
        traversal=args.traversal, bvh_builder=args.builder,
        bvh_leaf_size=args.leaf, ray_sort=args.sort,
        enable_sss=not args.no_sss,
    )
    t0 = time.perf_counter()
    scene = procedural_scene(n_tris_target=args.tris)
    t1 = time.perf_counter()
    accel = build_accel(scene, cfg)
    t2 = time.perf_counter()
    print(f"scene {t1-t0:.1f}s accel build {t2-t1:.1f}s", flush=True)

    t0 = time.perf_counter()
    img = render_sample(scene, camera := OrbitCamera().camera(), cfg,
                        jnp.uint32(0), accel)
    img.block_until_ready()
    print(f"first call (compile+run): {time.perf_counter()-t0:.1f}s",
          flush=True)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        img = render_sample(scene, camera, cfg, jnp.uint32(100 + i), accel)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
        print(f"  iter {i}: {times[-1]*1e3:.1f} ms", flush=True)

    dt = min(times)
    rays = cfg.n_pixels * cfg.spp * traversals_per_sample(
        cfg, scene.lights.count)
    print(f"BEST: {dt*1e3:.1f} ms/batch  {rays/dt/1e6:.2f} Mrays/s "
          f"({args.traversal} sort={args.sort} {args.width}x{args.width} "
          f"{scene.n_triangles}tris)")
    print("img mean:", float(img.mean()))


if __name__ == "__main__":
    main()
