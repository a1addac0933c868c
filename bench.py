#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, forward+backward, Cornell box.

Metric definition (BASELINE.json: "rays/s/chip fwd+bwd at 1024spp Cornell
box"): the Cornell scene is rendered at 512x512 with NEE+MIS at depth 8 and
differentiated w.r.t. scene parameters (path-replay backward).  Ray count is
the number of *actual* ray segments traced forward (path segments + NEE
shadow rays, measured exactly by an instrumented pass — not paths x
max_depth), and the denominator is the full forward+backward wall time, so
the number is conservative: backward re-traces the transport chain but is
not double-counted.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "rays/s", "vs_baseline": N}
vs_baseline is value / 500e6 (the BASELINE.md target).

Also reports (to stderr) the pure-forward Pallas megakernel throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the fwd+bwd graph takes minutes to compile
# through the remote-compile tunnel; cache it across bench runs.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_cornell():
    import spt_tpu
    from spt_tpu import Scene

    scene = Scene()
    scene.set_sky(spt_tpu.SKY_NONE)
    white = scene.add_material("lambert", albedo=(0.73, 0.73, 0.73))
    red = scene.add_material("lambert", albedo=(0.65, 0.05, 0.05))
    green = scene.add_material("lambert", albedo=(0.12, 0.45, 0.15))
    light = scene.add_material("lambert", albedo=(0.78,) * 3,
                               emission=(15.0,) * 3)
    metal = scene.add_material("metal", albedo=(0.8, 0.85, 0.9), roughness=0.2)
    glass = scene.add_material("glass", albedo=(0.97,) * 3, ior=1.5)
    R = 1000.0
    for nm, pos, r, m in [
            ("floor", (0, -R, 3), R, white), ("ceil", (0, R + 2, 3), R, white),
            ("left", (-R - 2, 1, 3), R, red), ("right", (R + 2, 1, 3), R, green),
            ("back", (0, 1, R + 5), R, white), ("lamp", (0, 2.55, 3), 0.6, light),
            ("ball", (-0.7, 0.5, 3.4), 0.5, metal),
            ("gball", (0.7, 0.45, 2.8), 0.45, glass)]:
        scene.create_sphere(nm, pos, r, m)
    return scene


def main() -> int:
    from spt_tpu import Camera
    from spt_tpu.diff import gradients as G
    from spt_tpu.engine.integrator_jax import render_megasample
    from spt_tpu.engine.integrator_soa import render_megasample_soa, static_mtypes
    from spt_tpu.kernels import megakernel

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    scene_data = build_cornell().compile()
    camera = Camera.look_at((0, 1.0, -1.5), (0, 1.0, 3.0), fov_degrees=55)
    W = H = 512
    DEPTH, RR = 8, 3
    kw = dict(max_bounces=DEPTH, rr_depth=RR, use_nee=True, use_mis=True,
              seed=3)

    mtypes = static_mtypes(scene_data)

    # --- forward: Pallas megakernel --------------------------------------
    SPP_F = 64
    fwd = lambda s0: megakernel.render_tiles(
        scene_data, camera, W, H, s0, SPP_F, **kw)
    jax.block_until_ready(fwd(0))
    times = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(fwd((i + 1) * SPP_F))
        times.append(time.time() - t0)
    dt_f = min(times)

    # --- forward+backward: gradient of image sum wrt scene params --------
    # (SoA integrator: the production differentiable path.)  The exact
    # traced-ray count rides along as an aux output so the whole benchmark
    # compiles a single big SoA graph.
    params = G.get_params(scene_data, ("albedo", "roughness", "emission",
                                       "centers", "radii"))
    SPP_B = 8

    @jax.jit
    def fwd_bwd(p, ids):
        def loss(pp):
            img, n_rays = render_megasample_soa(
                G.apply_params(scene_data, pp), camera, W, H, ids,
                mtypes=mtypes, with_stats=True, **kw)
            return jnp.sum(img), n_rays
        return jax.value_and_grad(loss, has_aux=True)(p)

    ids0 = jnp.arange(SPP_B)
    (_, n_rays0), _ = jax.block_until_ready(fwd_bwd(params, ids0))
    segs_per_spp = float(n_rays0) / SPP_B
    log(f"measured segments per spp: {segs_per_spp/1e6:.2f}M "
        f"({segs_per_spp/(W*H):.2f} per path incl. shadow rays)")
    fwd_rays_s = SPP_F * segs_per_spp / dt_f
    log(f"forward (pallas): {dt_f:.3f}s/{SPP_F}spp -> {fwd_rays_s/1e6:.0f}M rays/s")
    times = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(fwd_bwd(params, ids0 + (i + 1) * SPP_B))
        times.append(time.time() - t0)
    dt_b = min(times)
    fb_rays_s = SPP_B * segs_per_spp / dt_b
    log(f"fwd+bwd (path replay): {dt_b:.3f}s/{SPP_B}spp -> "
        f"{fb_rays_s/1e6:.0f}M rays/s")

    result = {
        "metric": "rays/s/chip fwd+bwd, Cornell 512x512 depth-8 NEE+MIS",
        "value": round(fb_rays_s),
        "unit": "rays/s",
        "vs_baseline": round(fb_rays_s / 500e6, 4),
        "forward_only_rays_s": round(fwd_rays_s),
        "segments_per_spp": round(segs_per_spp),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
