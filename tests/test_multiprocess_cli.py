"""CLI multi-host path executed for real: two `jax.distributed` CPU
processes run `dpt_tpu.cli render --coordinator ... --num-processes 2
--process-id N --sharded` over a global 2x4-device mesh; process 0 writes
the assembled image, which must match a single-process CLI render.

Complements tests/test_multiprocess.py (library path) — this is the exact
command-line wiring BASELINE row 5 documents (VERDICT r3: the
--coordinator/--num-processes flags were previously unexecuted code).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER_SNIPPET = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, {repo!r})
from dpt_tpu.cli import main
main([
    "render",
    "--coordinator", "localhost:{port}",
    "--num-processes", "2",
    "--process-id", "{pid}",
    "--sharded",
    "--width", "16", "--height", "16", "--bounces", "2", "--batches", "2",
    "--traversal", "bvh", "--bvh-builder", "median", "--leaf-size", "2",
    "--out", {out!r},
])
print("cli worker {pid} done", flush=True)
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_cli_two_process_render(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mp_cli.npy")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER_SNIPPET.format(repo=REPO, port=port, pid=pid, out=out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"cli worker failed:\n{o[-4000:]}"
    assert os.path.exists(out), "process 0 did not write the image"

    # Single-process reference through the same CLI.
    ref_path = str(tmp_path / "single.npy")
    from dpt_tpu.cli import main

    main([
        "render", "--width", "16", "--height", "16", "--bounces", "2",
        "--batches", "2", "--traversal", "bvh", "--bvh-builder", "median",
        "--leaf-size", "2", "--out", ref_path,
    ])
    got = np.load(out)
    ref = np.load(ref_path)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


OPT_WORKER_SNIPPET = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, {repo!r})
from dpt_tpu.cli import main
main([
    "optimize",
    "--coordinator", "localhost:{port}",
    "--num-processes", "2",
    "--process-id", "{pid}",
    "--sharded",
    "--target", {target!r},
    "--width", "16", "--height", "16", "--bounces", "2", "--spp", "1",
    "--no-sss", "--steps", "2", "--lr", "0.05", "--opt-params", "albedo",
    "--init-albedo", "0.4", "0.4", "0.4", "--fixed-seeds",
    "--out", {out!r},
])
print("opt worker {pid} done", flush=True)
"""


def test_cli_two_process_optimize(tmp_path):
    """The inverse-rendering driver over the real multi-host wiring: two
    jax.distributed CPU processes run `optimize --sharded` on a global
    2x4-device mesh (sharded TAPE backward per shard, implicit tile psum);
    process 0's recovered params must match a single-process run of the
    identical optimisation."""
    # Target via the single-process CLI (both runs share it).
    target = str(tmp_path / "target.npy")
    from dpt_tpu.cli import main

    main(["render", "--width", "16", "--height", "16", "--bounces", "2",
          "--spp", "1", "--no-sss", "--batches", "1", "--out", target])

    port = _free_port()
    out = str(tmp_path / "mp_opt.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             OPT_WORKER_SNIPPET.format(repo=REPO, port=port, pid=pid,
                                       target=target, out=out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"opt worker failed:\n{o[-4000:]}"
    assert os.path.exists(out), "process 0 did not write recovered params"

    ref_out = str(tmp_path / "single_opt.npz")
    main(["optimize", "--target", target,
          "--width", "16", "--height", "16", "--bounces", "2", "--spp", "1",
          "--no-sss", "--steps", "2", "--lr", "0.05", "--opt-params",
          "albedo", "--init-albedo", "0.4", "0.4", "0.4", "--fixed-seeds",
          "--out", ref_out])
    got = np.load(out)
    ref = np.load(ref_out)
    np.testing.assert_allclose(got["albedo"], ref["albedo"],
                               rtol=1e-5, atol=1e-7)
