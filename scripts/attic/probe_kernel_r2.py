"""Round-2 probe: kernel-only Mray/s of the current pallas_packet kernel
on the real chip, for coherent (primary-like) and incoherent (bounce-like)
ray sets.  Establishes the baseline the BVH8 wide kernel must beat."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.kernels.pallas_packet import pallas_nearest, pallas_occluded
from dpt_tpu.render.raygen import generate_rays

R = 1024 * 1024


def bench(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    scene = procedural_scene(n_tris_target=66_000)
    cfg = RenderConfig(width=1024, height=1024, traversal="pallas",
                       bvh_builder="median", bvh_leaf_size=8,
                       packet_tile=1024)
    accel = build_accel(scene, cfg)
    print("nodes rows:", accel.nodes.shape, "tris rows:", accel.tris.shape)

    camera = OrbitCamera().camera()
    o, d, state = generate_rays(camera, cfg, jnp.uint32(0))
    o = jax.block_until_ready(o)

    nearest = jax.jit(lambda o, d: pallas_nearest(o, d, accel, cfg))
    dt = bench(nearest, o, d)
    print(f"coherent primary nearest: {dt*1e3:.1f} ms  {R/dt/1e6:.2f} Mray/s")

    # Incoherent: shuffle origins inside the scene, random dirs.
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    oi = jax.random.uniform(k1, (R, 3), minval=-1.0, maxval=1.0)
    di = jax.random.normal(k2, (R, 3))
    di = di / jnp.linalg.norm(di, axis=-1, keepdims=True)
    dt = bench(nearest, oi, di)
    print(f"incoherent nearest:       {dt*1e3:.1f} ms  {R/dt/1e6:.2f} Mray/s")

    # Incoherent but Morton+octant sorted (what ray_sort provides).
    from dpt_tpu.render.compaction import sort_permutation
    perm = sort_permutation(oi, di, jnp.ones(R, bool),
                            jnp.array([-1.0, -1.0, -1.0]),
                            jnp.array([1.0, 1.0, 1.0]))
    os_, ds_ = oi[perm], di[perm]
    os_ = jax.block_until_ready(os_)
    dt = bench(nearest, os_, ds_)
    print(f"sorted incoherent:        {dt*1e3:.1f} ms  {R/dt/1e6:.2f} Mray/s")

    occluded = jax.jit(lambda o, d, m: pallas_occluded(o, d, m, accel, cfg))
    md = jnp.full((R,), 2.0, jnp.float32)
    dt = bench(occluded, os_, ds_, md)
    print(f"sorted occluded:          {dt*1e3:.1f} ms  {R/dt/1e6:.2f} Mray/s")


if __name__ == "__main__":
    main()
