"""dpt_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Vulkan/Qt path tracer (`decastyle/discovering-path-tracer`): progressive
Monte-Carlo path tracing with next-event estimation against rectangular area
lights, subsurface-scattering random walks, thin-lens depth of field, BVH
acceleration — re-architected for TPUs (vectorised masked control flow,
counter-based RNG, `lax.scan` bounce loops, mesh-sharded pixel tiles) and made
end-to-end differentiable w.r.t. scene parameters.

Reference behaviours are cited as `file:line` into /root/reference throughout.
"""

from dpt_tpu.config import RenderConfig, PRESETS, preset
from dpt_tpu.scene.scene import Scene, Materials, Lights, make_area_lights
from dpt_tpu.scene.camera import OrbitCamera, Camera
from dpt_tpu.scene.obj import load_obj
from dpt_tpu.scene.builder import load_scene, cornell_box_scene, procedural_scene
from dpt_tpu.render.renderer import render, render_sample, render_progressive
from dpt_tpu.diff.grads import render_loss_and_grads, differentiable_render

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "PRESETS",
    "preset",
    "Scene",
    "Materials",
    "Lights",
    "make_area_lights",
    "OrbitCamera",
    "Camera",
    "load_obj",
    "load_scene",
    "cornell_box_scene",
    "procedural_scene",
    "render",
    "render_sample",
    "render_progressive",
    "render_loss_and_grads",
    "differentiable_render",
]
