"""Probe dynamic-lane access patterns for component-major [8, N] node arrays."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512
TABLE = jnp.arange(8 * N, dtype=jnp.float32).reshape(8, N)
IDX = 200


def probe_dyn_lane_slice():
    def kernel(idx_ref, t_ref, out_ref):
        i = idx_ref[0]
        col = t_ref[:, pl.ds(i, 1)]  # [8, 1] dynamic lane slice
        out_ref[:, :] = jnp.broadcast_to(col, (8, 128))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([IDX], jnp.int32), TABLE)
    print("dyn lane slice:", bool(jnp.allclose(out[:, 0], TABLE[:, IDX])))


def probe_dyn_roll():
    def kernel(idx_ref, t_ref, out_ref):
        i = idx_ref[0]
        blk = t_ref[:, pl.ds((i // 128) * 128, 128)]  # aligned block
        rolled = pltpu.roll(blk, shift=-(i % 128), axis=1)
        out_ref[:, :] = rolled

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([IDX], jnp.int32), TABLE)
    print("dyn roll:", bool(jnp.allclose(out[:, 0], TABLE[:, IDX])))


def probe_scalar_dyn_lane():
    def kernel(idx_ref, t_ref, out_ref):
        i = idx_ref[0]
        v = t_ref[3, i]  # scalar: static sublane, dynamic lane
        out_ref[0, :] = jnp.full((128,), v, jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([IDX], jnp.int32), TABLE)
    print("scalar dyn lane:", bool(jnp.allclose(out[0, 0], TABLE[3, IDX])))


def probe_dyn_sublane_row():
    """Row-major alternative: [N, 8]→ but packed as [N//16, 128] with 16
    nodes of 8 components per row; dynamic sublane row load + dyn roll."""
    packed = TABLE.T.reshape(N // 16, 16 * 8)  # row r holds nodes 16r..16r+15
    packed = jnp.pad(packed, ((0, 0), (0, 0)))  # already 128 lanes

    def kernel(idx_ref, t_ref, out_ref):
        i = idx_ref[0]
        row = t_ref[i // 16, :]  # [128] dynamic sublane row
        rolled = pltpu.roll(row.reshape(1, 128), shift=-(i % 16) * 8, axis=1)
        out_ref[0, :] = rolled[0]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([IDX], jnp.int32), packed)
    got = out[0, :8]
    print("dyn sublane row + roll:", bool(jnp.allclose(got, TABLE[:, IDX])))


if __name__ == "__main__":
    for name, fn in list(globals().items()):
        if name.startswith("probe_"):
            try:
                fn()
            except Exception as e:
                print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
