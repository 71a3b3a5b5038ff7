"""Metrics: rays/sec accounting and structured JSONL logging.

Replaces the reference's qDebug ms/FPS prints (VulkanRayTracer.cpp:849-852)
with structured per-step metrics.  Ray accounting follows SURVEY §3.3's cost
model: per pixel-sample, 1 direct-view traversal + per bounce (1 primary +
L shadow + sss_bounces x (1 walk + L shadow)).
"""

from __future__ import annotations

import json
import sys
import time


def traversals_per_sample(cfg, n_lights: int) -> int:
    per_bounce = 1 + n_lights
    if cfg.enable_sss:
        per_bounce += cfg.sss_bounces * (1 + n_lights)
    total = cfg.max_depth * per_bounce
    if cfg.direct_light_view:
        total += 1
    return total


class JsonlLogger:
    """Append-only JSONL metrics sink (stdout by default)."""

    def __init__(self, path=None):
        self._f = open(path, "a") if path else sys.stdout
        self._owns = path is not None

    def log(self, **fields):
        fields.setdefault("ts", time.time())
        self._f.write(json.dumps(fields) + "\n")
        self._f.flush()

    def close(self):
        if self._owns:
            self._f.close()
