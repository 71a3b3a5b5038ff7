"""Decisive gather probe: random vs local indices x table size, in fori loops.

All variants consume the full gathered row (no DCE escape), fixed 100 steps.
"""

import time

import jax
import jax.numpy as jnp

R = 1 << 20
key = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


W = 16
for N in (4096, 32768, 131072):
    table = jax.random.normal(key, (N, W), jnp.float32)
    ridx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, N, jnp.int32)
    # "local": all rays near the same region, small jitter
    lidx = (jnp.arange(R, dtype=jnp.int32) % 64) + (N // 2)

    @jax.jit
    def loop(table, idx):
        def body(i, c):
            idx, acc = c
            rec = table[idx]
            s = jnp.sum(rec, axis=-1)
            acc = acc + s
            # keep randomness structure of idx: xor-shift jitter, stays random
            idx = (idx ^ (idx >> 3) ^ i) % N
            return idx, acc
        return jax.lax.fori_loop(0, 100, body,
                                 (idx, jnp.zeros((R,), jnp.float32)))

    for name, idx in (("random", ridx), ("local ", lidx)):
        dt = timeit(loop, table, idx)
        per = dt / 100
        print(f"N={N:7d} ({N*W*4/1e6:6.1f} MB) {name}: {per*1e6:9.1f} us/step "
              f"= {R*W*4/per/1e9:7.1f} GB/s")
