"""Systematic gather sweep: N (pow2 vs not) x W x standalone/fori/while."""

import time

import jax
import jax.numpy as jnp

R = 1 << 20
key = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


for N in (16384, 20000, 24576, 32768, 39936):
    for W in (8, 16):
        table = jax.random.normal(key, (N, W), jnp.float32)
        idx = jax.random.randint(key, (R,), 0, N, jnp.int32)

        @jax.jit
        def single(table, idx):
            return jnp.sum(table[idx], axis=-1)

        dts = timeit(single, table, idx)

        @jax.jit
        def loop(table, idx):
            def body(i, c):
                idx, acc = c
                rec = table[idx]
                s = jnp.sum(rec, axis=-1)
                acc = acc + s
                idx = (idx + 1 + (s > 0)) % N
                return idx, acc
            return jax.lax.fori_loop(0, 50, body,
                                     (idx, jnp.zeros((R,), jnp.float32)))

        dtf = timeit(loop, table, idx, iters=2)

        @jax.jit
        def wloop(table, idx):
            def cond(c):
                i, idx, acc = c
                return i < 50
            def body(c):
                i, idx, acc = c
                rec = table[idx]
                s = jnp.sum(rec, axis=-1)
                acc = acc + s
                idx = (idx + 1 + (s > 0)) % N
                return i + 1, idx, acc
            return jax.lax.while_loop(
                cond, body, (0, idx, jnp.zeros((R,), jnp.float32)))

        dtw = timeit(wloop, table, idx, iters=2)

        print(f"N={N:6d} W={W:2d}: single {dts*1e6:9.1f} us | "
              f"fori {dtf/50*1e6:9.1f} us/step | while {dtw/50*1e6:9.1f} us/step")
