"""Price the Mosaic per-lane lookup primitives precisely.

a) axis-0 dynamic_gather on [8,128] (sublane select per lane) — works?
b) k independent axis-1 gathers per loop iteration — do they pipeline?
c) fused 1024-entry per-lane lookup (axis-1 then axis-0) cost
d) dynamic row-block load from a big VMEM table (paging cost)
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 2000


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_kernel(kern, inputs, n_in, out_shape=(8, 128)):
    @jax.jit
    def go(*a):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    return go


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (8, 128), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128, jnp.int32)
sub = jax.random.randint(jax.random.PRNGKey(2), (8, 128), 0, 8, jnp.int32)

# a) axis-0 gather [8,128]
def kern_a(x_ref, s_ref, o_ref):
    xx = x_ref[:, :]
    ss = s_ref[:, :]
    def body(k, acc):
        j = (ss + k) % 8
        return acc + jnp.take_along_axis(xx, j, axis=0)
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128)))

try:
    dt = timeit(run_kernel(kern_a, None, 2), x, sub)
    print(f"a) axis-0 [8,128] gather: {dt/ITERS*1e9:7.1f} ns/gather")
except Exception as e:
    print("a) axis-0 [8,128] FAILED:", str(e)[:150])

# b) k independent axis-1 gathers per iteration
for K in (1, 4, 12):
    def kern_b(x_ref, i_ref, o_ref, K=K):
        xx = x_ref[:, :]
        ii = i_ref[:, :]
        def body(k, acc):
            j = (ii + k) % 128
            for q in range(K):
                acc = acc + jnp.take_along_axis(xx + float(q), j, axis=1)
            return acc
        o_ref[:, :] = jax.lax.fori_loop(0, ITERS // K, body,
                                        jnp.zeros((8, 128)))
    dt = timeit(run_kernel(kern_b, None, 2), x, idx)
    per_iter = dt / (ITERS // K)
    print(f"b) {K:2d} axis-1 gathers/iter: {per_iter*1e9:7.1f} ns/iter "
          f"({per_iter/K*1e9:6.1f} ns/gather)")

# c) 1024-entry per-lane lookup: axis-1 within rows, then axis-0 across rows
def kern_c(x_ref, l_ref, s_ref, o_ref):
    xx = x_ref[:, :]
    lane = l_ref[:, :]
    srow = s_ref[:, :]
    def body(k, acc):
        j = (lane + k) % 128
        g1 = jnp.take_along_axis(xx, j, axis=1)       # per-lane within-row
        g2 = jnp.take_along_axis(g1, (srow + k) % 8, axis=0)  # pick row
        return acc + g2
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128)))

try:
    dt = timeit(run_kernel(kern_c, None, 3), x, idx, sub)
    print(f"c) fused 1024-lookup: {dt/ITERS*1e9:7.1f} ns/lookup-step")
except Exception as e:
    print("c) FAILED:", str(e)[:150])

# d) dynamic row-block load: table [4096,128] in VMEM, load [8,128] block
tab = jax.random.normal(key, (4096, 128), jnp.float32)
rows = jax.random.randint(jax.random.PRNGKey(3), (ITERS,), 0, 511, jnp.int32)

def kern_d(t_ref, r_ref, o_ref):
    def body(k, acc):
        r = r_ref[k] * 8
        blk = t_ref[pl.ds(r, 8), :]
        return acc + blk
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128)))

@jax.jit
def go_d(tab, rows):
    return pl.pallas_call(
        kern_d,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, rows)

try:
    dt = timeit(go_d, tab, rows)
    print(f"d) dyn [8,128] row-block load: {dt/ITERS*1e9:7.1f} ns/load")
except Exception as e:
    print("d) FAILED:", str(e)[:150])

# e) full math step on [8,128] (AABB+MT fused cost reference)
def kern_e(x_ref, o_ref):
    xx = x_ref[:, :]
    def body(k, acc):
        v = xx + acc
        for _ in range(70):
            v = v * 1.0001 + 0.5
        return v
    o_ref[:, :] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((8, 128)))

dt = timeit(run_kernel(kern_e, None, 1), x)
print(f"e) 70 fused vector ops:   {dt/ITERS*1e9:7.1f} ns/iter")
