"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference's only resumable state is the accumulation image +
sample_batch counter (raytrace_comp.comp:467-469, VulkanRayTracer.cpp:722,854)
— and it is lost on exit.  Here (image, batch, camera state, scene params,
optimizer state) persist as npz; because the RNG is counter-based (seeded
from sample_batch, raytrace_comp.comp:435), resuming at batch k continues the
exact sample stream — bitwise-continuable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


class Checkpointer:
    def __init__(self, path: str):
        self.path = path

    def save(self, image, batch: int, extra: dict | None = None):
        arrs = {
            "image": np.asarray(image),
            "batch": np.asarray(batch, np.int64),
        }
        if extra:
            flat, _ = jax.tree_util.tree_flatten(extra)
            arrs["n_extra"] = np.asarray(len(flat))
            for i, a in enumerate(flat):
                arrs[f"extra_{i}"] = np.asarray(a)
        tmp = self.path + ".tmp.npz"
        np.savez(tmp, **arrs)
        os.replace(tmp, self.path)

    def load(self):
        """Returns (image jnp, batch int, extra_leaves list) or None."""
        if not os.path.exists(self.path):
            return None
        with np.load(self.path) as z:
            image = jnp.asarray(z["image"])
            batch = int(z["batch"])
            extras = []
            if "n_extra" in z:
                extras = [
                    jnp.asarray(z[f"extra_{i}"]) for i in range(int(z["n_extra"]))
                ]
        return image, batch, extras

    def exists(self) -> bool:
        return os.path.exists(self.path)
