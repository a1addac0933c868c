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

# On-chip split-vs-fused (ADVICE r4 low #3): the XLA shadow-ray
# reconstruction must agree with the Mosaic shade kernel's in-kernel
# reconstruction ON HARDWARE — differing FMA/contraction choices between
# the two compilers could drop a boundary shadow candidate (light leak)
# that interpret-mode tests (both XLA) cannot catch.  Near-bitwise
# agreement isolates that from oracle knife-edge noise.
img_split = np.asarray(wavefront.render_wavefront(
    sd_small, cam, 128, 128, 0, 2, split=True, interpret=interp, **kw))
img_fused = np.asarray(wavefront.render_wavefront(
    sd_small, cam, 128, 128, 0, 2, split=False, interpret=interp, **kw))
sf_close = float((np.abs(img_split - img_fused)
                  < 1e-5 + 1e-4 * np.abs(img_fused)).mean())
print(json.dumps({"check": "split-vs-fused-onchip",
                  "frac_close": round(sf_close, 5)}), flush=True)
if sf_close < 0.999:
    print(json.dumps({"check": "split-vs-fused-onchip", "ok": False}))
    sys.exit(1)

# On-chip MXU sweeps vs the VPU sweeps (r5): same bar as cross-engine
# parity — the matmul accumulation order legally differs at knife edges.
img_mxu = np.asarray(wavefront.render_wavefront(
    sd_small, cam, 128, 128, 0, 2, mxu=True, interpret=interp, **kw))
mxu_close = float((np.abs(img_mxu - img_split)
                   < 1e-4 + 1e-3 * np.abs(img_split)).mean())
print(json.dumps({"check": "mxu-vs-vpu-onchip",
                  "frac_close": round(mxu_close, 5),
                  "finite": bool(np.isfinite(img_mxu).all())}), flush=True)
if mxu_close < 0.995 or not np.isfinite(img_mxu).all():
    print(json.dumps({"check": "mxu-vs-vpu-onchip", "ok": False}))
    sys.exit(1)

# shard_map'd wavefront ON THE REAL CHIP (VERDICT r4 missing #5): a
# data=1 mesh is a single device, so the shard_map x pallas_call x
# custom-vjp composition compiles under Mosaic here — exactly the
# composition that can break only on hardware.
if not interp:
    from spt_tpu.diff import gradients as G
    from spt_tpu.parallel import wavefront_sharded as WS
    from spt_tpu.parallel.mesh import make_render_mesh

    mesh1 = make_render_mesh(data=1, prim=1)
    img_sh = np.asarray(WS.render_wavefront_sharded(
        sd_small, cam, 128, 128, 0, 2, mesh1, interpret=False, **kw))
    sh_close = float((np.abs(img_sh - img_split)
                      < 1e-5 + 1e-4 * np.abs(img_split)).mean())
    wf_dp = WS.make_wavefront_dp_render_fn(
        sd_small, cam, 64, 64, spp=1, mesh=mesh1, max_bounces=3,
        rr_depth=3, interpret=False)
    params = G.get_params(sd_small, ("albedo",))
    g = jax.jit(jax.grad(lambda p, s: jnp.sum(wf_dp(p, s))))(params, 0)
    g_ok = bool(np.isfinite(np.asarray(g["albedo"])).all())
    print(json.dumps({"check": "shardmap-wavefront-onchip",
                      "frac_close_fwd": round(sh_close, 5),
                      "grad_finite": g_ok}), flush=True)
    if sh_close < 0.999 or not g_ok:
        print(json.dumps({"check": "shardmap-wavefront-onchip",
                          "ok": False}))
        sys.exit(1)

sd = bench_suite.scene_10k(10_000).compile()
t0 = time.time()
dt = bench_suite.timed(
    lambda s0: wavefront.render_wavefront(
        sd, cam, 1920, 1080, s0, 4, interpret=interp, **kw), 0, reps=2)
print(json.dumps({"check": "config5-fwd-compacted", "wall_s": round(dt, 3),
                  "compile_s": round(time.time() - t0 - dt, 1)}), flush=True)
