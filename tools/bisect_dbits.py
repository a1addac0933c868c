"""Root-cause the dbits=2 hardware-only divergence (VERDICT r4 weak #5).

r4 recorded: with dbits=2 the reordered stream renders ~4% of pixels
wrong ON HARDWARE while interpret mode is bit-exact.  Sorting must be
invisible (RNG rides with the ray), so a hardware-only divergence means
either a stale-buffer hazard whose trigger depends on the permutation's
dead/skip pattern (CLAUDE.md's gotcha class) or an order-sensitive
Mosaic lowering.  This bisects: render 128x128x2spp with dbits=0 vs 2
under each pipeline-stage toggle and report which one carries the
divergence.  Writes DBITS_BISECT.json.
"""
import json
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

import bench_suite
from spt_tpu import Camera
from spt_tpu.kernels import wavefront as wf


def frac_close(a, b):
    return float((np.abs(a - b) < 1e-5 + 1e-4 * np.abs(b)).mean())


def main():
    bench_suite.enable_compile_cache()
    sd = bench_suite.scene_10k(2000).compile()
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    interp = jax.default_backend() != "tpu"
    base = dict(max_bounces=6, rr_depth=3, use_nee=True, use_mis=True,
                seed=5, block=128, qbits=5, sort_min_rays=0)
    toggles = [
        ("default", {}),
        ("fused", {"split": False}),
        ("no_compact", {"compact": False}),
        ("no_tcull", {"tcull": False}),
        ("no_nee", {"use_nee": False}),
        ("sort_argsort", {}),   # argsort+take instead of variadic lax.sort
    ]
    out = {}
    import functools
    real_sort = wf._sort_rays
    for name, kw in toggles:
        if name == "sort_argsort":
            wf._sort_rays = functools.partial(real_sort, variadic=False)
        cfg = dict(base, **kw)
        jax.clear_caches()
        a = np.asarray(wf.render_wavefront(
            sd, cam, 128, 128, 0, 2, dbits=0, interpret=interp, **cfg))
        b = np.asarray(wf.render_wavefront(
            sd, cam, 128, 128, 0, 2, dbits=2, interpret=interp, **cfg))
        wf._sort_rays = real_sort
        out[name] = round(frac_close(b, a), 5)
        print(json.dumps({name: out[name]}), flush=True)
    with open("DBITS_BISECT.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
