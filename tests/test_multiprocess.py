"""Real multi-process execution of the tile-sharded render (VERDICT r3
next #4): two `jax.distributed` CPU processes on one host, global mesh over
2x4 virtual devices, `process_allgather` image assembly.

This is the only test that actually executes `init_distributed` and the
`jax.process_count() > 1` branch of `gather_image`; everything else in
tests/ runs single-process on the 8-device virtual mesh.
"""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single(tmp_path, box_scene,
                                           default_camera):
    from dpt_tpu import RenderConfig
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_sample

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    # Same cfg/scene as the worker; the single-process reference runs here.
    cfg = RenderConfig(
        width=16, height=16, max_depth=2, spp=1, traversal="bvh",
        bvh_builder="median", bvh_leaf_size=2, enable_sss=True,
        remat_bounces=False,
    )
    accel = build_accel(box_scene, cfg)
    ref = np.asarray(
        render_sample(box_scene, default_camera, cfg, jnp.uint32(0), accel)
    )
    for pid in range(2):
        got = np.load(tmp_path / f"img_{pid}.npy")
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"process {pid}")
