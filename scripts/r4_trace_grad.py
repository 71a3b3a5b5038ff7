"""Trace the flagship replay fwd+bwd step and decompose device time
(VERDICT r3 next #1: "target fwd+bwd <= 2x fwd ... or a committed trace
showing where the rest goes").

Captures one `replay_loss_and_grads` step at 512² (flagship config
otherwise) on the real chip, writes the trace to artifacts/trace_r4_grad,
and prints a device-time summary grouped by op family (Mosaic traversal
custom-calls, XLA fusions, sorts, copies) for BASELINE.md.
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.diff.grads import replay_loss_and_grads


def summarize(trace_dir):
    fs = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                   recursive=True)
    if not fs:
        print("no trace json found under", trace_dir)
        return
    with gzip.open(sorted(fs)[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    # device pid + "XLA Ops" tid
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    # XLA-Ops events NEST (a while/cond parent's duration includes its
    # children), so only leaf op families are summed; control-flow parents
    # are reported separately and are NOT additive with the leaves.
    buckets = defaultdict(float)
    control = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "")
        if re.match(r"(while|cond)[.\d]", name):
            control += dur
            continue
        if re.search(r"_traverse|custom-call|tpu_custom_call", name):
            buckets["mosaic_traversal"] += dur
        elif "sort" in name:
            buckets["sort"] += dur
        elif "copy" in name or "transpose" in name:
            buckets["copy/transpose"] += dur
        elif "fusion" in name:
            buckets["fusion"] += dur
        else:
            buckets["other"] += dur
    total = sum(buckets.values())
    print(f"device leaf-op time: {total:.1f} ms "
          f"(control-flow parents {control:.1f} ms, contain the leaves)")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:>18}: {v:8.1f} ms ({100*v/max(total,1e-9):4.1f}%)")


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "trace_r4_grad")
    os.makedirs(out, exist_ok=True)

    cfg = RenderConfig(
        width=side, height=side, max_depth=4, spp=1,
        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
        packet_tile=4096, interleave=1, ray_sort=True, enable_sss=True,
    )
    scene = procedural_scene(n_tris_target=66_000)
    camera = OrbitCamera().camera()
    accel = build_accel(scene, cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    loss, grads = replay_loss_and_grads(scene, camera, cfg, target,
                                        sample_batch=0, accel=accel)
    jax.block_until_ready((loss, grads))

    with jax.profiler.trace(out):
        with jax.profiler.StepTraceAnnotation("replay_fwd_bwd", step_num=0):
            loss, grads = replay_loss_and_grads(scene, camera, cfg, target,
                                                sample_batch=1, accel=accel)
            jax.block_until_ready((loss, grads))
    print(f"backend={jax.default_backend()} side={side} "
          f"loss={float(loss):.6f}; trace -> {out}", flush=True)
    summarize(out)


if __name__ == "__main__":
    main()
