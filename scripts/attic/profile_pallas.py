"""Profile the Mosaic packet kernel: coherent vs incoherent rays, leaf sizes.

Run on the real chip:
    python scripts/profile_pallas.py --tris 66000 --side 512
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--tris", type=int, default=66_000)
    ap.add_argument("--leaves", type=int, nargs="+", default=[4, 8])
    args = ap.parse_args()

    from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
    from dpt_tpu.accel.bvh import build_bvh_median
    from dpt_tpu.kernels.pallas_packet import (
        pack_accel,
        pallas_nearest,
        pallas_occluded,
    )
    from dpt_tpu.render.raygen import generate_rays

    cfg0 = RenderConfig(width=args.side, height=args.side)
    scene = procedural_scene(args.tris)
    cam = OrbitCamera().camera()
    v0, v1, v2 = scene.tri_vertices()
    o, d, _ = generate_rays(cam, cfg0, jnp.uint32(0))
    R = o.shape[0]
    print(f"R={R} rays, T={scene.n_triangles} tris, backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    perm = rng.permutation(R)
    o_i, d_i = o[perm], d[perm]
    # bounce-like rays: origins on surface-ish sphere, random dirs
    d_r = rng.standard_normal((R, 3)).astype(np.float32)
    d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)
    o_r = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    o_r, d_r = jnp.asarray(o_r), jnp.asarray(d_r)

    for leaf in args.leaves:
        med = build_bvh_median(
            np.asarray(scene.vertices), np.asarray(scene.indices), leaf_size=leaf
        )
        acc = pack_accel(med, v0, v1, v2)
        cfg = RenderConfig(bvh_leaf_size=leaf, packet_tile=1024)
        near = jax.jit(lambda o, d, acc=acc, cfg=cfg: pallas_nearest(o, d, acc, cfg))
        t_c = bench(near, o, d)
        t_i = bench(near, o_i, d_i)
        t_r = bench(near, o_r, d_r)
        mray = R / 1e6
        print(
            f"nearest leaf={leaf}: coherent {t_c*1e3:7.1f} ms ({mray/t_c:6.1f} Mray/s)"
            f"  shuffled {t_i*1e3:7.1f} ms ({mray/t_i:6.1f})"
            f"  random {t_r*1e3:7.1f} ms ({mray/t_r:6.1f})"
        )
        md = jnp.full((R,), 3.0, jnp.float32)
        occl = jax.jit(
            lambda o, d, md, acc=acc, cfg=cfg: pallas_occluded(o, d, md, acc, cfg)
        )
        t_c = bench(occl, o, d, md)
        t_r = bench(occl, o_r, d_r, md)
        print(
            f"occluded leaf={leaf}: coherent {t_c*1e3:7.1f} ms ({mray/t_c:6.1f} Mray/s)"
            f"  random {t_r*1e3:7.1f} ms ({mray/t_r:6.1f})"
        )


if __name__ == "__main__":
    main()
