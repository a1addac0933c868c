"""On-chip check + timing for the compacted sorted-wavefront renderer.

1. Parity: 128x128x2spp wavefront (Mosaic, compaction live) vs the pure-JAX
   SoA integrator on a 300-prim scene.
2. Timing: the config-5 forward (1920x1080, 4 spp) with the new defaults.
Usage: python tools/check_wavefront_tpu.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench_suite  # noqa: E402
from spt_tpu import Camera  # noqa: E402
from spt_tpu.engine.integrator_soa import render_megasample_soa  # noqa: E402
from spt_tpu.kernels import wavefront  # noqa: E402

bench_suite.enable_compile_cache()
cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
kw = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True, seed=5)
interp = jax.default_backend() != "tpu"

sd_small = bench_suite.scene_10k(300).compile(use_bvh=True)
img_w = np.asarray(wavefront.render_wavefront(
    sd_small, cam, 128, 128, 0, 2, interpret=interp, **kw))
img_s = np.asarray(render_megasample_soa(
    sd_small, cam, 128, 128, jnp.arange(2), **kw))
close = np.abs(img_w - img_s) < 1e-3 + 0.05 * np.abs(img_s)
frac_close = float(close.mean())
finite = bool(np.isfinite(img_w).all())
print(json.dumps({"check": "parity-300prim-128px",
                  "frac_close": round(frac_close, 4),
                  "mean_abs_diff": round(float(np.abs(img_w - img_s).mean()),
                                         6),
                  "finite": finite}), flush=True)
# CI-usable gate: a hardware-only compaction regression (stale out-block
# class, CLAUDE.md) must FAIL this tool, not just print numbers.
if frac_close < 0.99 or not finite:
    print(json.dumps({"check": "parity-300prim-128px", "ok": False}))
    sys.exit(1)

sd = bench_suite.scene_10k(10_000).compile()
t0 = time.time()
dt = bench_suite.timed(
    lambda s0: wavefront.render_wavefront(
        sd, cam, 1920, 1080, s0, 4, interpret=interp, **kw), 0, reps=2)
print(json.dumps({"check": "config5-fwd-compacted", "wall_s": round(dt, 3),
                  "compile_s": round(time.time() - t0 - dt, 1)}), flush=True)
