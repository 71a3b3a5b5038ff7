"""Honest (varied-input) benchmark of the paged per-lane kernel."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig
from dpt_tpu.accel.bvh import BVH, build_bvh_sah
from dpt_tpu.kernels.pallas_lane import pack_lane, lane_nearest, lane_occluded
from dpt_tpu.render.raygen import generate_rays

R = 1 << 20


def bench(fn, make_args, iters=3, warm=1):
    for i in range(warm):
        out = fn(*make_args(i))
        jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        a = make_args(100 + i)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    builder = sys.argv[1] if len(sys.argv) > 1 else "sah"
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("backend:", jax.default_backend(), flush=True)
    z = np.load("/tmp/accel_cache.npz")
    if builder == "sah":
        bvh = build_bvh_sah(z["vertices"], z["indices"], leaf_size=leaf)
    else:
        bvh = BVH(jnp.asarray(z["node_min"]), jnp.asarray(z["node_max"]),
                  jnp.asarray(z["node_left"]), jnp.asarray(z["node_right"]),
                  jnp.asarray(z["tri_order"]))
    t0 = time.perf_counter()
    accel = pack_lane(bvh, z["v0"], z["v1"], z["v2"])
    print(f"pack {time.perf_counter()-t0:.1f}s: N={accel.n_records} "
          f"{accel.nbytes/1e6:.1f} MB", flush=True)

    cfg = RenderConfig(width=1024, height=1024)
    camera = OrbitCamera().camera()

    nearest = jax.jit(lambda o, d, a: lane_nearest(o, d, a))
    occl = jax.jit(lambda o, d, m, a: lane_occluded(o, d, m, a))

    def coherent(i):
        o, d, _ = generate_rays(camera, cfg, jnp.uint32(i))
        return o, d, accel

    dt = bench(nearest, coherent)
    print(f"coherent nearest:     {dt*1e3:9.1f} ms  {R/dt/1e6:7.2f} Mray/s",
          flush=True)

    def incoh(i):
        key = jax.random.PRNGKey(i)
        o = jax.random.uniform(key, (R, 3), minval=-1.0, maxval=1.0)
        d = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return o, d, accel

    def sorted_incoh(i):
        o, d, _ = incoh(i)
        from dpt_tpu.render.compaction import sort_permutation
        perm = sort_permutation(o, d, jnp.ones(R, bool),
                                jnp.array([-1., -1., -1.]),
                                jnp.array([1., 1., 1.]))
        return o[perm], d[perm], accel

    dt = bench(nearest, sorted_incoh)
    print(f"sorted incoh nearest: {dt*1e3:9.1f} ms  {R/dt/1e6:7.2f} Mray/s",
          flush=True)

    dt = bench(nearest, incoh)
    print(f"unsorted incoh:       {dt*1e3:9.1f} ms  {R/dt/1e6:7.2f} Mray/s",
          flush=True)

    def sorted_occl(i):
        o, d, _ = sorted_incoh(i)
        return o, d, jnp.full((R,), 2.0, jnp.float32), accel

    dt = bench(occl, sorted_occl)
    print(f"sorted occluded:      {dt*1e3:9.1f} ms  {R/dt/1e6:7.2f} Mray/s",
          flush=True)

    # correctness spot-check on TPU vs brute (small batch)
    from dpt_tpu.render.intersect import brute_force_nearest
    o, d, _ = sorted_incoh(7)
    S = 1024
    bh, bt, bi, _, _ = brute_force_nearest(
        o[:S], d[:S], jnp.asarray(z["v0"]), jnp.asarray(z["v1"]),
        jnp.asarray(z["v2"]))
    wh, wt, wi = nearest(o[:S], d[:S], accel)
    ok_h = bool(jnp.all(bh == wh))
    ok_t = bool(jnp.all(jnp.where(bh, jnp.abs(bt - wt) < 1e-3, True)))
    print("correctness on TPU: hit", ok_h, "t", ok_t, flush=True)


if __name__ == "__main__":
    main()
