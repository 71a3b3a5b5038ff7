"""Profile traversal strategies on the current backend.

Times one nearest-hit pass over a full frame of primary rays plus a pass of
incoherent (randomized) rays, for each traversal mode, plus brute force as
the dense-math reference point.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=256)
    ap.add_argument("--tris", type=int, default=8000)
    ap.add_argument("--brute", action="store_true")
    args = ap.parse_args()

    from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
    from dpt_tpu.accel.bvh import build_bvh_median
    from dpt_tpu.accel.lbvh import build_lbvh
    from dpt_tpu.accel.packet import packet_nearest
    from dpt_tpu.accel.traverse import bvh_nearest
    from dpt_tpu.render.intersect import brute_force_nearest
    from dpt_tpu.render.raygen import generate_rays

    cfg0 = RenderConfig(width=args.side, height=args.side)
    scene = procedural_scene(args.tris)
    cam = OrbitCamera().camera()
    v0, v1, v2 = scene.tri_vertices()
    o, d, _ = generate_rays(cam, cfg0, jnp.uint32(0))
    R = o.shape[0]
    print(f"R={R} rays, T={scene.n_triangles} tris, backend={jax.default_backend()}")

    # incoherent variant: shuffle ray order
    perm = np.random.default_rng(0).permutation(R)
    o_i = o[perm]
    d_i = d[perm]

    lbvh = jax.jit(build_lbvh)(scene.vertices, scene.indices)
    med8 = build_bvh_median(np.asarray(scene.vertices), np.asarray(scene.indices),
                            leaf_size=8, use_native=True)

    for label, bvh, leaf in [("lbvh(leaf1)", lbvh, 1), ("median(leaf8)", med8, 8)]:
        for tile in [128, 256, 512]:
            cfg = RenderConfig(packet_tile=tile, bvh_leaf_size=leaf)
            f = jax.jit(lambda o, d, bvh=bvh, cfg=cfg: packet_nearest(o, d, bvh, v0, v1, v2, cfg))
            t_c = bench(f, o, d)
            t_i = bench(f, o_i, d_i)
            print(f"packet {label} tile={tile}: coherent {t_c*1e3:8.1f} ms  incoherent {t_i*1e3:8.1f} ms")
        cfg = RenderConfig(bvh_leaf_size=leaf)
        f = jax.jit(lambda o, d, bvh=bvh, cfg=cfg: bvh_nearest(o, d, bvh, v0, v1, v2, cfg))
        t_c = bench(f, o, d)
        t_i = bench(f, o_i, d_i)
        print(f"perray {label}: coherent {t_c*1e3:8.1f} ms  incoherent {t_i*1e3:8.1f} ms")

    if args.brute:
        f = jax.jit(lambda o, d: brute_force_nearest(o, d, v0, v1, v2))
        print(f"brute dense: {bench(f, o, d)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
