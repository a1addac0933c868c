"""Pallas megakernel backend — registers as backend "pallas".

The fast single-chip path.  Shares the progressive session/invalidation
logic of PathTracerBase; only the jitted sample function differs.  On
non-TPU platforms the kernel runs in Pallas interpret mode so the backend
is testable anywhere; on TPU it compiles via Mosaic.

Scope notes (v1): the megakernel covers the full-feature integrator for
Cornell-class scenes (uniforms-in-SMEM design, ≤ ~128 spheres) — larger
scenes and "reference" integrator mode transparently use the pure-JAX
path, keeping the facade contract uniform.
"""

from __future__ import annotations

import jax

from ..core.camera import Camera
from ..core.scene import SKY_ENVMAP
from ..kernels import megakernel
from ..utils.log import Log
from .api import JaxPathTracer, register_backend

# Above this capacity the SMEM uniform blob gets too large; delegate to the
# pure-JAX backend's BVH path.
MAX_PALLAS_PRIMS = 128


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


class PallasPathTracer(JaxPathTracer):
    backend_name = "pallas"

    def __init__(self):
        super().__init__()
        self._warned_fallback = None

    def _warn_fallback(self, reason: str) -> None:
        if self._warned_fallback != reason:
            self._warned_fallback = reason
            Log.warn(f"pallas backend: {reason}; delegating to the pure-JAX "
                     f"path (slower)")

    def _render_samples(self, start_sample: int, spp: int):
        s = self._settings
        if s.integrator == "reference":
            return super()._render_samples(start_sample, spp)
        if self._scene_data.sky_mode == SKY_ENVMAP:
            # Env-map lighting needs texture gathers — pure-JAX path for now.
            self._warn_fallback("environment-map lighting is not in-kernel "
                                "yet")
            return super()._render_samples(start_sample, spp)
        camera = self._camera or self._default_camera()
        if self._scene_data.capacity > MAX_PALLAS_PRIMS:
            # Large scenes: the BVH traversal megakernel.
            from ..kernels import megakernel_bvh
            return megakernel_bvh.render_tiles_bvh(
                self._scene_data, camera, s.width, s.height, start_sample,
                spp, max_bounces=s.max_bounces,
                rr_depth=s.russian_roulette_depth, use_nee=s.use_nee,
                use_mis=s.use_mis, seed=s.seed, interpret=not _on_tpu())
        return megakernel.render_tiles(
            self._scene_data, camera, s.width, s.height, start_sample, spp,
            max_bounces=s.max_bounces, rr_depth=s.russian_roulette_depth,
            use_nee=s.use_nee, use_mis=s.use_mis, seed=s.seed,
            interpret=not _on_tpu())


register_backend("pallas", PallasPathTracer)
