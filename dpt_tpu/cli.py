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
                   choices=["brute", "bvh", "packet", "pallas",
                            "pallas_packet", "threaded", "lane"],
                   help="nearest/any-hit backend (pallas = flagship Mosaic "
                        "kernel, threaded = stackless XLA walk)")
    r.add_argument("--bvh-builder", choices=["median", "sah", "lbvh"],
                   help="BVH construction strategy")
    r.add_argument("--leaf-size", type=int, help="max triangles per BVH leaf")
    r.add_argument("--sort", action="store_true",
                   help="coherence-sort ray streams before traversal")
    r.add_argument("--packet-tile", type=int,
                   help="rays per packet tile (pallas/packet traversals)")
    r.add_argument("--no-sss", action="store_true")
    r.add_argument("--rr", action="store_true", help="Russian roulette")
    r.add_argument("--out", default="render.png")
    r.add_argument("--checkpoint", help="npz checkpoint path (resume if exists)")
    r.add_argument("--checkpoint-every", type=int, default=0)
    r.add_argument("--sharded", action="store_true",
                   help="tile-shard over all local devices")
    r.add_argument("--yaw", type=float, default=0.0)
    r.add_argument("--pitch", type=float, default=0.0)
    r.add_argument("--radius", type=float, default=5.0)
    r.add_argument("--exposure", type=float, default=1.0)
    r.add_argument("--metrics", help="JSONL metrics file (default stdout)")

    sub.add_parser("info", help="print device/config info")
    return p


def _make_cfg(args):
    from dpt_tpu import RenderConfig, preset

    cfg = preset(args.preset) if args.preset else RenderConfig(
        width=256, height=256, spp=1, max_depth=4, traversal="brute",
    )
    over = {}
    if args.width:
        over["width"] = args.width
    if args.height:
        over["height"] = args.height
    if args.bounces:
        over["max_depth"] = args.bounces
    if args.spp:
        over["spp"] = args.spp
    if args.traversal:
        over["traversal"] = args.traversal
    if args.bvh_builder:
        over["bvh_builder"] = args.bvh_builder
    if args.leaf_size:
        over["bvh_leaf_size"] = args.leaf_size
    if args.sort:
        over["ray_sort"] = True
    if args.packet_tile:
        over["packet_tile"] = args.packet_tile
    if args.no_sss:
        over["enable_sss"] = False
    if args.rr:
        over["russian_roulette"] = True
    return cfg.replace(**over) if over else cfg


def cmd_render(args):
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

    if args.sharded:
        from dpt_tpu.dist.sharding import make_tile_mesh, render_sample_sharded_jit
        from dpt_tpu.render.renderer import accumulate

        mesh = make_tile_mesh()
        img = start_image if start_image is not None else jnp.zeros(
            (cfg.height, cfg.width, 3), jnp.float32
        )
        import time
        for b in range(start_batch, args.batches):
            t0 = time.perf_counter()
            sample = render_sample_sharded_jit(
                scene, camera, cfg, jnp.uint32(b), accel, mesh
            )
            img = accumulate(img, sample, jnp.uint32(b), cfg)
            img.block_until_ready()
            on_batch(b, img, {"batch_ms": (time.perf_counter() - t0) * 1e3})
            if ckpt and args.checkpoint_every and (b + 1) % args.checkpoint_every == 0:
                ckpt.save(img, b + 1)
        n_done = args.batches
    else:
        img, n_done = render_progressive(
            scene, camera, cfg, accel=accel, n_batches=args.batches,
            on_batch=on_batch, checkpointer=ckpt,
            checkpoint_every=args.checkpoint_every,
            start_batch=start_batch, start_image=start_image,
        )
    if ckpt:
        ckpt.save(img, n_done)
    save_image(args.out, img, exposure=args.exposure)
    print(f"wrote {args.out} ({n_done} batches)", file=sys.stderr)


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
