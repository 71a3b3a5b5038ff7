"""Profile ONE flagship forward step at the headline shape and attribute
device time by op, so optimization targets are measured rather than guessed.

Captures a jax.profiler trace of render_sample (quad, per-query sort,
1024^2, 4 bounces, SSS) and prints the top device ops by total duration.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    out = "/tmp/r3_fwd_trace"
    os.system(f"rm -rf {out}")

    cfg = RenderConfig(width=side, height=side, max_depth=4, spp=1,
                       traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
                       packet_tile=tile, interleave=1, ray_sort=True,
                       enable_sss=True)
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera().camera()
    accel = build_accel(scene, cfg)

    render_sample(scene, cam, cfg, jnp.uint32(0), accel).block_until_ready()
    with jax.profiler.trace(out):
        img = render_sample(scene, cam, cfg, jnp.uint32(7), accel)
        img.block_until_ready()

    files = glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace written under {out}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU" / not the python threads
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "tpu" in n or "/device" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            total += dur
    print(f"pids: { {p: pid_name[p] for p in device_pids} }", flush=True)
    print(f"total device event time: {total:.1f} ms (overlapping tracks)",
          flush=True)
    groups = defaultdict(float)
    for name, ms in agg.items():
        g = name
        if "fusion" in name:
            g = "fusion:" + name.split(".")[0]
        groups[name] = ms
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{ms:9.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
