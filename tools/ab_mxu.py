"""A/B the r5 MXU wavefront vs the r4 VPU wavefront on the real chip at
config-5 scale.  Writes AB_MXU.json."""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

import bench_suite
from spt_tpu import Camera
from spt_tpu.kernels import wavefront as wf


def wall(fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    bench_suite.enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sd = bench_suite.scene_10k(n).compile()
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    W, H = 1920, 1080
    kw = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True,
              seed=0, block=128, qbits=5)
    res = {"n_prims": n, "spp": spp, "res": f"{W}x{H}"}
    for name, mxu in (("vpu", False), ("mxu", True)):
        t, img = wall(lambda: wf.render_wavefront(
            sd, cam, W, H, 0, spp, mxu=mxu, **kw))
        res[f"wall_s_{name}"] = round(t, 4)
        res[f"sum_{name}"] = float(np.asarray(img).sum())
        print(json.dumps({name: round(t, 4)}), flush=True)
    a = res["sum_vpu"]
    res["sum_rel_diff"] = abs(res["sum_mxu"] - a) / max(abs(a), 1e-9)
    res["speedup"] = round(res["wall_s_vpu"] / res["wall_s_mxu"], 3)
    with open("AB_MXU.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
