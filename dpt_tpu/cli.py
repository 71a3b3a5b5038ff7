"""Command-line entry points.

Replaces the reference's Qt GUI main (main.cpp:10-62) for headless TPU use:
    python -m dpt_tpu.cli render --preset box256 --out out.png
    python -m dpt_tpu.cli render --scene path/to.obj --width 512 --batches 16
    python -m dpt_tpu.cli info
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser():
    p = argparse.ArgumentParser(prog="dpt_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render a scene progressively")
    r.add_argument("--preset", choices=["box256", "box512", "sylveon512",
                                        "sylveon1024", "sylveon2048"])
    r.add_argument("--scene", help=".obj path (default: procedural/box per preset)")
    r.add_argument("--width", type=int)
    r.add_argument("--height", type=int)
    r.add_argument("--bounces", type=int)
    r.add_argument("--spp", type=int)
    r.add_argument("--batches", type=int, default=8)
    r.add_argument("--traversal",
                   choices=["brute", "bvh", "packet", "pallas", "quad",
                            "threaded"],
                   help="nearest/any-hit backend (quad = flagship 4-wide "
                        "Mosaic kernel, threaded = stackless XLA walk)")
    r.add_argument("--bvh-builder", choices=["median", "sah", "lbvh"],
                   help="BVH construction strategy")
    r.add_argument("--leaf-size", type=_positive_int,
                   help="max triangles per BVH leaf")
    r.add_argument("--sort", action="store_true",
                   help="coherence-sort every query stream (per-query)")
    r.add_argument("--wavefront-sort", action="store_true",
                   help="coherence-sort the bounce carry once per bounce "
                        "(flagship; supersedes --sort)")
    r.add_argument("--packet-tile", type=_positive_int,
                   help="rays per packet tile (pallas/packet traversals)")
    r.add_argument("--no-sss", action="store_true")
    r.add_argument("--rr", action="store_true", help="Russian roulette")
    r.add_argument("--compact-frac", type=float, default=None,
                   help="carry-compaction capacity fraction (0 disables; "
                        "chunked overflow keeps any value exact)")
    r.add_argument("--out", default="render.png")
    r.add_argument("--checkpoint", help="npz checkpoint path (resume if exists)")
    r.add_argument("--checkpoint-every", type=int, default=0)
    r.add_argument("--sharded", action="store_true",
                   help="tile-shard over all local devices")
    # Multi-host process-group wiring (jax.distributed.initialize); the
    # same flags on every host, differing only in --process-id.
    r.add_argument("--coordinator", help="host:port of process 0 "
                                         "(multi-host only)")
    r.add_argument("--num-processes", type=_positive_int, default=None)
    r.add_argument("--process-id", type=int, default=None)
    r.add_argument("--yaw", type=float, default=0.0)
    r.add_argument("--pitch", type=float, default=0.0)
    r.add_argument("--radius", type=float, default=5.0)
    r.add_argument("--exposure", type=float, default=1.0)
    r.add_argument("--metrics", help="JSONL metrics file (default stdout)")

    sub.add_parser("info", help="print device/config info")
    return p


def _positive_int(s):
    v = int(s)
    if v <= 0:
        raise argparse.ArgumentTypeError(f"must be a positive integer: {s!r}")
    return v


def _make_cfg(args):
    from dpt_tpu import RenderConfig, preset

    cfg = preset(args.preset) if args.preset else RenderConfig(
        width=256, height=256, spp=1, max_depth=4, traversal="brute",
    )
    over = {}
    if args.width is not None:
        over["width"] = args.width
    if args.height is not None:
        over["height"] = args.height
    if args.bounces is not None:
        over["max_depth"] = args.bounces
    if args.spp is not None:
        over["spp"] = args.spp
    if args.traversal:
        over["traversal"] = args.traversal
    if args.bvh_builder:
        over["bvh_builder"] = args.bvh_builder
    if args.leaf_size is not None:
        over["bvh_leaf_size"] = args.leaf_size
    if args.sort:
        over["ray_sort"] = True
    if args.wavefront_sort:
        over["wavefront_sort"] = True
    if args.packet_tile is not None:
        over["packet_tile"] = args.packet_tile
    if args.no_sss:
        over["enable_sss"] = False
    if args.rr:
        over["russian_roulette"] = True
    if args.compact_frac is not None:
        over["compact_frac"] = args.compact_frac
    return cfg.replace(**over) if over else cfg


def cmd_render(args):
    if args.num_processes:
        # Multi-host: every host runs this same command with its own
        # --process-id; jax.devices() then spans all hosts (DCN).  Must run
        # before ANY operation that initialises the XLA backend — library
        # imports are safe (dpt_tpu keeps module-level constants in numpy
        # for exactly this reason), but init first regardless.
        from dpt_tpu.dist.sharding import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    import jax.numpy as jnp

    from dpt_tpu import OrbitCamera, cornell_box_scene, load_scene, procedural_scene
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_progressive
    from dpt_tpu.utils.checkpoint import Checkpointer
    from dpt_tpu.utils.io import save_image
    from dpt_tpu.utils.metrics import JsonlLogger

    cfg = _make_cfg(args)
    if args.scene:
        scene = load_scene(args.scene)
    elif args.preset and args.preset.startswith("sylveon"):
        scene = procedural_scene()
    else:
        scene = cornell_box_scene()
    camera = OrbitCamera(
        yaw=args.yaw, pitch=args.pitch, radius=args.radius
    ).camera()
    accel = build_accel(scene, cfg)
    logger = JsonlLogger(args.metrics)

    ckpt = Checkpointer(args.checkpoint) if args.checkpoint else None
    start_batch, start_image = 0, None
    if ckpt is not None and ckpt.exists():
        loaded = ckpt.load()
        if loaded:
            start_image, start_batch, _ = loaded
            print(f"resuming from batch {start_batch}", file=sys.stderr)

    def on_batch(b, img, metrics):
        logger.log(event="batch", batch=b, **metrics)

    render_fn = None
    if args.sharded:
        from functools import partial

        from dpt_tpu.dist.sharding import (
            make_tile_mesh,
            render_sample_sharded_jit,
        )

        mesh = make_tile_mesh()
        render_fn = partial(_sharded_render_fn, mesh=mesh,
                            impl=render_sample_sharded_jit)
    img, n_done = render_progressive(
        scene, camera, cfg, accel=accel, n_batches=args.batches,
        on_batch=on_batch, checkpointer=ckpt,
        checkpoint_every=args.checkpoint_every,
        start_batch=start_batch, start_image=start_image,
        render_fn=render_fn,
    )
    import jax

    from dpt_tpu.dist.sharding import gather_image

    full = gather_image(img)
    # Every process assembles the full image (the allgather is collective);
    # only process 0 touches the filesystem in multi-host runs.
    if jax.process_index() == 0:
        if ckpt:
            ckpt.save(full, n_done)
        save_image(args.out, full, exposure=args.exposure)
        print(f"wrote {args.out} ({n_done} batches)", file=sys.stderr)


def _sharded_render_fn(scene, camera, cfg, batch, accel, *, mesh, impl):
    """render_progressive-compatible wrapper around the tile-sharded render."""
    return impl(scene, camera, cfg, batch, accel, mesh)


def cmd_info(_args):
    import jax

    print(json.dumps({
        "jax_version": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "default_backend": jax.default_backend(),
    }, indent=2))


def main(argv=None):
    args = _build_parser().parse_args(argv)
    if args.cmd == "render":
        cmd_render(args)
    elif args.cmd == "info":
        cmd_info(args)


if __name__ == "__main__":
    main()
