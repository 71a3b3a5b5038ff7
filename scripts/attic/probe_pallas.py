"""Probe Mosaic-TPU support for the primitives the packet-BVH kernel needs:
dynamic scalar loads from VMEM, SMEM scratch stacks, while loops with scalar
carries driving vector updates."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_scalar_load_from_vmem():
    """Read table[idx] where idx comes from SMEM, table in VMEM [N, 128]."""

    def kernel(idx_ref, table_ref, out_ref):
        i = idx_ref[0]
        row = table_ref[i, :]  # dynamic row load
        out_ref[0, :] = row * 2.0

    idx = jnp.array([3], jnp.int32)
    table = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)
    expect = table[3] * 2
    print("dyn row load:", bool(jnp.allclose(out[0], expect)))


def probe_scalar_extract():
    """Extract a single scalar table[i, j] (dynamic i, static j) and
    broadcast it into vector math."""

    def kernel(idx_ref, table_ref, out_ref):
        i = idx_ref[0]
        v = table_ref[i, 0]  # scalar load, dynamic row
        out_ref[0, :] = jnp.full((128,), v, jnp.float32)

    idx = jnp.array([5], jnp.int32)
    table = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)
    print("dyn scalar extract:", bool(jnp.allclose(out[0], table[5, 0])))


def probe_smem_stack_while():
    """DFS-style loop: SMEM stack, scalar sp carry, vector accumulation."""

    def kernel(out_ref, stack_ref):
        stack_ref[0] = 7
        stack_ref[1] = 3

        def cond(c):
            sp, acc = c
            return sp > 0

        def body(c):
            sp, acc = c
            top = stack_ref[sp - 1]
            acc = acc + jnp.full((1, 128), top, jnp.float32)
            # push one extra element once
            new_sp = jax.lax.cond(
                (top == 3),
                lambda: sp,  # pop 3, nothing pushed (sp-1+... )
                lambda: sp - 1,
            )

            @pl.when(top == 3)
            def _():
                stack_ref[sp - 1] = 1  # replace top

            return new_sp, acc

        sp, acc = jax.lax.while_loop(cond, body, (2, jnp.zeros((1, 128), jnp.float32)))
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((32,), jnp.int32)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )()
    # stack [7,3]: pop 3→acc 3, replace with 1; pop 1→acc 4; pop 7→acc 11
    print("smem stack while:", float(out[0, 0]), "(expect 11.0)")


def probe_int_vector_ops():
    def kernel(out_ref):
        i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        m = (i % 2) == 0
        out_ref[:] = jnp.where(m, i, -i)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )()
    print("int vector ops:", int(out[0, 2]), int(out[0, 3]), "(expect 2 -3)")


if __name__ == "__main__":
    for name, fn in list(globals().items()):
        if name.startswith("probe_"):
            try:
                fn()
            except Exception as e:
                print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}")
