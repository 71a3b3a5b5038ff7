"""Orbit camera (Camera.cpp semantics) + differentiable Camera pytree.

The reference camera orbits the origin: yaw/pitch quaternions from mouse
deltas (Camera.cpp:37-64), radius zoom (Camera.cpp:66-77), defaults fov 60°,
sensitivity 0.25, radius 5 (Camera.h:34-36).  `OrbitCamera` is the host-side
interactive state machine; `camera()` lowers it to a `Camera` pytree (the
analog of the compute uniform, VulkanRayTracer.cpp:761-764) whose fields are
jnp leaves — differentiable for camera-pose gradients.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """What the kernel consumes (camera UBO, raytrace_comp.comp:67-73)."""

    position: jax.Array  # [3]
    direction: jax.Array  # [3] normalised
    up: jax.Array  # [3]
    fov_deg: jax.Array  # scalar


def _quat_from_axis_angle(axis, angle_deg):
    half = math.radians(angle_deg) * 0.5
    s = math.sin(half)
    return np.array(
        [math.cos(half), axis[0] * s, axis[1] * s, axis[2] * s], np.float64
    )


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        np.float64,
    )


def _quat_rotate(q, v):
    w, x, y, z = q
    u = np.array([x, y, z], np.float64)
    v = np.asarray(v, np.float64)
    return 2.0 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v + 2.0 * w * np.cross(u, v)


@dataclasses.dataclass
class OrbitCamera:
    """Interactive orbit-around-origin camera (Camera.cpp)."""

    yaw: float = 0.0
    pitch: float = 0.0
    radius: float = 5.0  # Camera.h:36
    fov_deg: float = 60.0  # Camera.h:34
    sensitivity: float = 0.25  # Camera.h:35
    # Yaw-direction correction flips when the up vector crosses the pole
    # (Camera.cpp:39,56-63).
    _correction: int = -1

    def view_update(self, dx: float, dy: float) -> "OrbitCamera":
        """Mouse-drag orbit (Camera.cpp:37-64)."""
        yaw = self.yaw + dx * self._correction * self.sensitivity
        pitch = self.pitch - dy * self.sensitivity
        cam = dataclasses.replace(self, yaw=yaw, pitch=pitch)
        correction = 1 if cam._up_np()[1] < 0 else -1
        return dataclasses.replace(cam, _correction=correction)

    def zoom_update(self, factor: float) -> "OrbitCamera":
        """Wheel zoom scales the orbit radius (Camera.cpp:66-77;
        VulkanWindow.cpp:215-231 uses x0.9 / x1.1)."""
        return dataclasses.replace(self, radius=self.radius * factor)

    def _rotation(self):
        yaw_q = _quat_from_axis_angle((0.0, 1.0, 0.0), self.yaw)
        pitch_q = _quat_from_axis_angle((1.0, 0.0, 0.0), self.pitch)
        return _quat_mul(yaw_q, pitch_q)

    def _position_np(self):
        return _quat_rotate(self._rotation(), (0.0, 0.0, self.radius))

    def _up_np(self):
        return _quat_rotate(self._rotation(), (0.0, 1.0, 0.0))

    def camera(self) -> Camera:
        """Lower to the differentiable pytree consumed by the renderer.

        Direction points at the origin (Camera.cpp:90-95); up is the rotated
        +Y (Camera.cpp:97-101).
        """
        pos = self._position_np()
        direction = -pos / max(np.linalg.norm(pos), 1e-20)
        return Camera(
            position=jnp.asarray(pos, jnp.float32),
            direction=jnp.asarray(direction, jnp.float32),
            up=jnp.asarray(self._up_np(), jnp.float32),
            fov_deg=jnp.float32(self.fov_deg),
        )

    def state_tuple(self):
        """Hashable signature for camera-change detection
        (VulkanRayTracer.cpp:739-754 resets accumulation when it changes)."""
        return (self.yaw, self.pitch, self.radius, self.fov_deg)
