"""Cameras.

The reference's ``render::Camera`` is an empty stub; its live camera is
hard-coded inside the render loop (CPUPathTracer.cpp:62-73): a pinhole at the
origin looking down +z with NDC mapping u=x/w, v=1−y/h, dir =
normalize((2u−1)·aspect, 2v−1, 1), and *no* sub-pixel jitter.  Here that
becomes ``ReferenceCamera``; the framework's real camera is ``Camera`` —
position / look_at / fov / optional thin-lens depth of field — which the
reference only sketched (Camera.h:7-39).

Cameras are frozen pytree dataclasses: jit-stable, shardable, differentiable
(camera parameters are valid gradient targets).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import sampling


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["position", "forward", "right", "up", "tan_half_fov", "aperture", "focus_dist"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Camera:
    """Positionable pinhole / thin-lens camera."""

    position: jax.Array   # (3,)
    forward: jax.Array    # (3,) unit
    right: jax.Array      # (3,) unit
    up: jax.Array         # (3,) unit
    tan_half_fov: jax.Array  # scalar, tan(vertical_fov / 2)
    aperture: jax.Array      # scalar lens radius; 0 => pinhole
    focus_dist: jax.Array    # scalar focal-plane distance

    @staticmethod
    def look_at(position, target, up=(0.0, 1.0, 0.0), fov_degrees=45.0,
                aperture=0.0, focus_dist=None):
        position = jnp.asarray(position, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        world_up = jnp.asarray(up, jnp.float32)
        fwd = target - position
        dist = jnp.linalg.norm(fwd)
        fwd = fwd / jnp.maximum(dist, 1e-12)
        # Screen basis matching the reference's convention (+x right on
        # screen, +y up, +z forward — CPUPathTracer.cpp:69-73): right =
        # up × fwd, cam_up = fwd × right.
        right = jnp.cross(world_up, fwd)
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-12)
        cam_up = jnp.cross(fwd, right)
        if focus_dist is None:
            focus_dist = dist
        return Camera(
            position=position,
            forward=fwd,
            right=right,
            up=cam_up,
            tan_half_fov=jnp.float32(jnp.tan(jnp.deg2rad(fov_degrees) * 0.5)),
            aperture=jnp.float32(aperture),
            focus_dist=jnp.asarray(focus_dist, jnp.float32),
        )

    def generate_rays(self, px, py, width, height, u_jitter, v_jitter,
                      u_lens=None, v_lens=None):
        """Primary rays for pixel coords (px, py) with sub-pixel jitter.

        px, py: integer arrays of any matching shape; jitters in [0,1).
        Returns (origins, directions) with trailing dim 3.
        """
        aspect = jnp.float32(width) / jnp.float32(height)
        sx = (px.astype(jnp.float32) + u_jitter) / jnp.float32(width)
        sy = (py.astype(jnp.float32) + v_jitter) / jnp.float32(height)
        ndc_x = (2.0 * sx - 1.0) * aspect * self.tan_half_fov
        ndc_y = (1.0 - 2.0 * sy) * self.tan_half_fov
        d = (ndc_x[..., None] * self.right
             + ndc_y[..., None] * self.up
             + self.forward)
        d = sampling.normalize(d)
        o = jnp.broadcast_to(self.position, d.shape)
        if u_lens is not None:
            # Thin-lens: offset origin on the lens disk, refocus on the plane.
            r = self.aperture * jnp.sqrt(u_lens)
            phi = 2.0 * jnp.pi * v_lens
            offset = (r * jnp.cos(phi))[..., None] * self.right \
                   + (r * jnp.sin(phi))[..., None] * self.up
            focus_pt = o + d * (self.focus_dist / jnp.maximum(
                sampling.dot(d, jnp.broadcast_to(self.forward, d.shape)), 1e-6))
            o = o + offset
            d = sampling.normalize(focus_pt - o)
        return o, d


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ReferenceCamera:
    """The reference's hard-coded camera (CPUPathTracer.cpp:62-73).

    Pinhole at origin, +z forward, pixel-corner sampling (no jitter):
    u = x/w, v = 1 − y/h, dir = normalize((2u−1)·aspect, 2v−1, 1).
    """

    def generate_rays(self, px, py, width, height):
        aspect = jnp.float32(width) / jnp.float32(height)
        u = px.astype(jnp.float32) * (1.0 / jnp.float32(width))
        v = 1.0 - py.astype(jnp.float32) * (1.0 / jnp.float32(height))
        uv_x = (u * 2.0 - 1.0) * aspect
        uv_y = v * 2.0 - 1.0
        inv_len = jax.lax.rsqrt(uv_x * uv_x + uv_y * uv_y + 1.0)
        d = jnp.stack([uv_x * inv_len, uv_y * inv_len, inv_len], axis=-1)
        o = jnp.zeros_like(d)
        return o, d
