"""Probe gather throughput on the real chip.

A) XLA-level: jnp.take of R random indices from an [N, W] f32 table —
   bounds a pure-XLA per-ray stackless traversal (gather node records each
   step for every ray).
B) Pallas Mosaic: take_along_axis dynamic_gather inside a kernel —
   bounds an in-kernel per-lane traversal.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def xla_gather_probe():
    R = 1 << 20
    key = jax.random.PRNGKey(0)
    for N in (1 << 14, 1 << 17, 1 << 20):
        for W in (8, 16):
            table = jax.random.normal(key, (N, W), jnp.float32)
            idx = jax.random.randint(key, (R,), 0, N, jnp.int32)

            @jax.jit
            def g(table, idx):
                return jnp.sum(table[idx], axis=-1)

            dt = timeit(g, table, idx)
            bw = R * W * 4 / dt / 1e9
            print(f"XLA gather [{N:>8}x{W:>2}] x {R} idx: {dt*1e3:7.2f} ms "
                  f"{bw:7.1f} GB/s  {R/dt/1e6:8.1f} Mgather/s")

    # Chained (serial dependence, like traversal): idx' = f(gathered)
    N, W = 1 << 17, 8
    table = jax.random.randint(key, (N, W), 0, N, jnp.int32)
    idx0 = jax.random.randint(key, (R,), 0, N, jnp.int32)

    @jax.jit
    def chase(table, idx):
        def body(i, idx):
            rec = table[idx]          # [R, W]
            return (rec[:, 0] + i) % N
        return jax.lax.fori_loop(0, 32, body, idx)

    dt = timeit(chase, table, idx0, iters=3)
    per_step = dt / 32
    print(f"XLA chained gather 32 steps [{N}x{W}]: {dt*1e3:.2f} ms "
          f"({per_step*1e3:.2f} ms/step, {R/per_step/1e6:.1f} Mgather/s/step)")


def pallas_gather_probe():
    # axis=1 crossbar gather inside a kernel: x [8,128], idx [8,128] in [0,128)
    def kern(x_ref, i_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        x = x_ref[:, :]
        idx = i_ref[:, :]
        def body(k, acc):
            j = (idx + k) % 128
            acc = acc + jnp.take_along_axis(x, j, axis=1)
            return acc
        acc = jax.lax.fori_loop(0, 1000, body, acc)
        o_ref[:, :] = acc

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128, jnp.int32)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    try:
        dt = timeit(run, x, idx)
        per = dt / 1000
        print(f"Pallas axis-1 dyn_gather [8,128]: {per*1e9:.1f} ns/gather "
              f"({8*128/per/1e9:.2f} Glane-lookups/s)")
    except Exception as e:
        print("Pallas axis-1 gather FAILED:", type(e).__name__, str(e)[:200])

    # axis=0 gather with taller operand (multi-vreg): x [64,128]
    def kern0(x_ref, i_ref, o_ref):
        x = x_ref[:, :]
        idx = i_ref[:, :]
        def body(k, acc):
            j = (idx + k) % 64
            acc = acc + jnp.take_along_axis(x, j, axis=0)
            return acc
        o_ref[:, :] = jax.lax.fori_loop(0, 100, body,
                                        jnp.zeros((64, 128), jnp.float32))

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    i0 = jax.random.randint(jax.random.PRNGKey(1), (64, 128), 0, 64, jnp.int32)

    @jax.jit
    def run0(x, idx):
        return pl.pallas_call(
            kern0,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x0, i0)

    try:
        dt = timeit(run0, x0, i0)
        per = dt / 100
        print(f"Pallas axis-0 dyn_gather [64,128]: {per*1e9:.1f} ns/gather")
    except Exception as e:
        print("Pallas axis-0 [64,128] gather FAILED:", type(e).__name__,
              str(e)[:200])


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    xla_gather_probe()
    pallas_gather_probe()
