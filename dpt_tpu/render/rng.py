"""Counter-based RNG matching the reference's per-pixel hash stream.

The reference seeds each pixel with
``seed = (sample_batch * H + y) * W + x`` (raytrace_comp.comp:435) and steps a
PCG-variant LCG+output-hash generator (raytrace_comp.comp:209-216).  We keep
the identical bit-exact generator — it is branch-free uint32 arithmetic, which
vectorises perfectly on the TPU VPU — but thread the state *functionally*
(state in, state out), and use a **fixed draw schedule**: every lane consumes
the same number of draws per bounce regardless of path outcome, so all lanes
stay in lockstep and the oracle renderer can reproduce streams exactly.

Documented deviation from the reference: the shader re-seeds ``rngState`` at
the top of ``pathTrace`` (raytrace_comp.comp:307) after the DoF/AA jitter
draws, making jitter and path sampling reuse the same stream.  We thread one
stream straight through (jitter draws then path draws) — no reuse.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, not jnp: module import must not initialise the XLA
# backend (jax.distributed embedders import the library before initialize).
_MUL = np.uint32(747796405)
_INC = np.uint32(2891336453)
_XSH = np.uint32(277803737)
_U32_MAX_F = np.float32(4294967295.0)


def seed_pixels(sample_batch, px, py, width: int, height: int):
    """Per-pixel seed, reference raytrace_comp.comp:435."""
    sb = jnp.uint32(sample_batch)
    return (sb * jnp.uint32(height) + py.astype(jnp.uint32)) * jnp.uint32(
        width
    ) + px.astype(jnp.uint32)


def rng_next(state):
    """One generator step → (new_state, uniform float32 in [0, 1]).

    Bit-exact port of stepAndOutputRNGFloat (raytrace_comp.comp:209-216).
    """
    state = state * _MUL + _INC
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * _XSH
    word = (word >> jnp.uint32(22)) ^ word
    return state, word.astype(jnp.float32) / _U32_MAX_F


def rng_next_n(state, n: int):
    """Draw n uniforms; returns (state, tuple of n arrays)."""
    outs = []
    for _ in range(n):
        state, u = rng_next(state)
        outs.append(u)
    return state, tuple(outs)
