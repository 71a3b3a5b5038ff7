"""Why is gather-in-while_loop slow? Isolate per-iteration cost."""

import time

import jax
import jax.numpy as jnp

R = 1 << 20
N = 20_000


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
idx0 = jax.random.randint(key, (R,), 0, N, jnp.int32)

for W in (8, 12, 16):
    table = jax.random.normal(key, (N, W), jnp.float32)

    @jax.jit
    def loop(table, idx):
        def body(i, c):
            idx, acc = c
            rec = table[idx]
            acc = acc + rec[:, 0]
            idx = (idx * 1103515245 + 12345) % N
            return idx, acc
        return jax.lax.fori_loop(0, 100, body, (idx, jnp.zeros((R,))))

    dt = timeit(loop, table, idx0)
    per = dt / 100
    print(f"fori gather [N={N},W={W}]: {per*1e6:8.1f} us/step "
          f"{R/per/1e9:6.2f} Ggather/s")

# while_loop variant with vector cond
table = jax.random.normal(key, (N, 16), jnp.float32)

@jax.jit
def wloop(table, idx):
    def cond(c):
        i, idx, acc = c
        return i < 100
    def body(c):
        i, idx, acc = c
        rec = table[idx]
        acc = acc + rec[:, 0]
        idx = (idx * 1103515245 + 12345) % N
        return i + 1, idx, acc
    return jax.lax.while_loop(cond, body, (0, idx0, jnp.zeros((R,))))

dt = timeit(wloop, table, idx0)
print(f"while gather [N={N},W=16]: {dt/100*1e6:8.1f} us/step")

# gather + full AABB-ish math (the real step's flop load)
@jax.jit
def mathy(table, idx):
    ox = jnp.zeros((R,))
    def body(i, c):
        idx, acc = c
        rec = table[idx]
        t0 = (rec[:, 0] - ox) * rec[:, 1]
        t1 = (rec[:, 2] - ox) * rec[:, 3]
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        for a in range(4, 14, 2):
            u0 = (rec[:, a] - ox) * rec[:, a + 1]
            tn = jnp.maximum(tn, jnp.minimum(u0, tf))
            tf = jnp.minimum(tf, jnp.maximum(u0, tn))
        ok = tn <= tf
        acc = acc + jnp.where(ok, tn, 0.0)
        idx = jnp.where(ok, idx + 1, (idx * 7 + 1) % N)
        return idx, acc
    return jax.lax.fori_loop(0, 100, body, (idx0, jnp.zeros((R,))))

dt = timeit(mathy, table, idx0)
print(f"fori gather+math:          {dt/100*1e6:8.1f} us/step")

# Split tables: 4x [N] 1-D gathers instead of one [N,W] row gather
tabs = [jax.random.normal(jax.random.PRNGKey(i), (N,), jnp.float32)
        for i in range(4)]

@jax.jit
def flat(t0, t1, t2, t3, idx):
    def body(i, c):
        idx, acc = c
        acc = acc + t0[idx] + t1[idx] + t2[idx] + t3[idx]
        idx = (idx * 1103515245 + 12345) % N
        return idx, acc
    return jax.lax.fori_loop(0, 100, body, (idx, jnp.zeros((R,))))

dt = timeit(flat, *tabs, idx0)
print(f"fori 4x 1-D gathers:       {dt/100*1e6:8.1f} us/step")

# Standalone single-shot for reference
@jax.jit
def single(table, idx):
    return jnp.sum(table[idx], axis=-1)

dt = timeit(single, table, idx0, iters=20)
print(f"standalone [N,16] gather:  {dt*1e6:8.1f} us")
