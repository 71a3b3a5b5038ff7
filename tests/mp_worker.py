"""Multi-process worker for tests/test_multiprocess.py.

Runs as one of N `jax.distributed` CPU processes (SURVEY §4.5: "multi-host
logic tested by running the same mesh code under jax.distributed on one
host").  Each process owns 4 virtual CPU devices; the tile mesh spans all
N*4 global devices, so the render is genuinely multi-process: every process
computes only its addressable pixel rows and assembles the full image with
`process_allgather` (dist.sharding.gather_image's multi-host branch).

Usage: python tests/mp_worker.py <pid> <nprocs> <port> <outdir>
"""

import os
import sys

pid, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Must run before importing dpt_tpu: module-level jnp constants (e.g.
# integrator._UP_Z) would otherwise initialise the XLA backend first, and
# jax.distributed.initialize requires a cold backend.  Multi-process CPU
# needs the gloo collectives implementation for its process group; the
# jax_num_cpu_devices config (not XLA_FLAGS, which some images snapshot at
# interpreter start via a jax-preloading sitecustomize) gives each process
# its 4 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", nprocs, pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dpt_tpu import OrbitCamera, RenderConfig, cornell_box_scene  # noqa: E402
from dpt_tpu.accel.bvh import build_accel  # noqa: E402
from dpt_tpu.dist.sharding import (  # noqa: E402
    gather_image,
    init_distributed,
    make_tile_mesh,
    render_sample_sharded_jit,
)

# init_distributed (the CLI's code path) must be no-op-safe when the process
# group already exists — exercise it exactly as cli.cmd_render would.
init_distributed(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, jax.devices()
assert len(jax.local_devices()) == 4

cfg = RenderConfig(
    width=16, height=16, max_depth=2, spp=1, traversal="bvh",
    bvh_builder="median", bvh_leaf_size=2, enable_sss=True,
    remat_bounces=False,
)
scene = cornell_box_scene()
camera = OrbitCamera().camera()
accel = build_accel(scene, cfg)
mesh = make_tile_mesh()
assert mesh.devices.size == 4 * nprocs

# Replicate the host-built scene pytrees over the global mesh: every process
# holds identical values, so a fully-replicated device_put is well defined.
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

rep = NamedSharding(mesh, P())
scene, camera, accel = jax.device_put((scene, camera, accel), rep)

img = render_sample_sharded_jit(scene, camera, cfg, jnp.uint32(0), accel,
                                mesh)
full = gather_image(img)
assert full.shape == (cfg.height, cfg.width, 3)
np.save(os.path.join(outdir, f"img_{pid}.npy"), full)
print(f"worker {pid}/{nprocs} ok", flush=True)
