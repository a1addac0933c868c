"""Isolate the on-chip wavefront parity gap: sort/compaction vs kernel.

Renders the 300-prim scene at 128x128x2spp on the chip in four modes and
cross-compares: no-sort, sorted without compaction (pad + aliasing live but
the boundary pinned to all tiles), sorted with compaction, and dir_major
off.  Identical RNG streams mean all images should agree to
float-reassociation noise; anything larger localizes the bug.
"""
import json
import sys

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
sd = bench_suite.scene_10k(300).compile(use_bvh=True)


def stats(name, a, b):
    d = np.abs(a - b)
    close = d < 1e-3 + 0.05 * np.abs(b)
    print(json.dumps({"pair": name,
                      "frac_close": round(float(close.mean()), 4),
                      "mean_abs": round(float(d.mean()), 6),
                      "max_abs": round(float(d.max()), 4)}), flush=True)


def render(**kx):
    return np.asarray(wavefront.render_wavefront(
        sd, cam, 128, 128, 0, 2, interpret=interp, **kx, **kw))


soa = np.asarray(render_megasample_soa(sd, cam, 128, 128, jnp.arange(2),
                                       **kw))
wf0 = render(sort_every=0)
wf_nc = render(sort_every=1, compact=False)
wf_c = render(sort_every=1, compact=True)
wf_om = render(sort_every=1, compact=True, dir_major=False)
stats("nosort vs soa", wf0, soa)
stats("sorted-nocompact vs nosort", wf_nc, wf0)
stats("sorted-compact vs nosort", wf_c, wf0)
stats("sorted-origmajor-compact vs nosort", wf_om, wf0)
