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
