"""Clean probe: K separate 1-D gathers per loop step, pure-SoA [R] math,
data-dependent index chase — the exact shape of a SoA threaded traversal."""

import time

import jax
import jax.numpy as jnp

R = 1 << 20
N = 131072
key = jax.random.PRNGKey(0)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


tables = [jax.random.normal(jax.random.PRNGKey(i), (N,), jnp.float32)
          for i in range(12)]
itab = jax.random.randint(jax.random.PRNGKey(99), (N,), 0, N, jnp.int32)
ridx = jax.random.randint(jax.random.PRNGKey(100), (R,), 0, N, jnp.int32)
ox = jax.random.normal(jax.random.PRNGKey(101), (R,), jnp.float32)

for K in (1, 4, 6, 12):
    tabs = tables[:K]

    @jax.jit
    def loop(itab, idx, ox, *tabs):
        def body(i, c):
            idx, acc = c
            vals = [t[idx] for t in tabs]
            # AABB-ish math over SoA scalars
            tn = (vals[0] - ox) * 1.7
            tf = tn
            for v in vals[1:]:
                a = (v - ox) * 0.9
                tn = jnp.maximum(tn, jnp.minimum(a, tf))
                tf = jnp.minimum(tf, jnp.maximum(a, tn))
            ok = tn <= tf
            acc = acc + jnp.where(ok, tn, 0.0)
            nxt = itab[idx]            # data-dependent chase via int table
            idx = jnp.where(ok, nxt, (idx + 1) % N)
            return idx, acc
        return jax.lax.fori_loop(0, 100, body,
                                 (idx, jnp.zeros((R,), jnp.float32)))

    dt = timeit(loop, itab, ridx, ox, *tabs)
    per = dt / 100
    print(f"K={K:2d} 1-D gathers/step: {per*1e6:9.1f} us/step "
          f"({per/max(K,1)*1e6:7.2f} us/gather/M)")

# data-dependent while version at K=12
tabs = tables

@jax.jit
def wloop(itab, idx, ox, *tabs):
    def cond(c):
        i, idx, acc = c
        return (i < 100) & jnp.any(idx >= 0)
    def body(c):
        i, idx, acc = c
        vals = [t[idx] for t in tabs]
        tn = (vals[0] - ox) * 1.7
        tf = tn
        for v in vals[1:]:
            a = (v - ox) * 0.9
            tn = jnp.maximum(tn, jnp.minimum(a, tf))
            tf = jnp.minimum(tf, jnp.maximum(a, tn))
        ok = tn <= tf
        acc = acc + jnp.where(ok, tn, 0.0)
        idx = jnp.where(ok, itab[idx], (idx + 1) % N)
        return i + 1, idx, acc
    return jax.lax.while_loop(cond, body, (0, idx, jnp.zeros((R,))))

dt = timeit(wloop, itab, ridx, ox, *tabs)
print(f"while(data-dep) K=12:     {dt/100*1e6:9.1f} us/step")
