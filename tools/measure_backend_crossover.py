"""Measure the walk-megakernel vs wavefront crossover for facade routing.

VERDICT r4 weak #1: `create_path_tracer("pallas")` routed >128-prim
scenes to the walk megakernel, 5x slower at 10k prims.  The r5 facade
routes scenes above WAVEFRONT_MIN_PRIMS to the wavefront; this tool
records the measured walls that justify the threshold.

Writes CROSSOVER_ENGINE.json.  Usage:
  python tools/measure_backend_crossover.py [--sizes 256,512,1024,2048,4096]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax

import bench_suite
from spt_tpu import Camera
from spt_tpu.engine.pallas_backend import (TPU_LEAF_BLOCK,
                                           TPU_WAVEFRONT_BLOCK,
                                           TPU_WAVEFRONT_QBITS)
from spt_tpu.kernels import megakernel_bvh, wavefront


def wall(fn, n=3):
    jax.block_until_ready(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024,2048,4096")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()
    bench_suite.enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    W = H = args.res
    kw = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True,
              seed=0)
    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        sd = bench_suite.scene_10k(n).compile()
        t_walk = wall(lambda: megakernel_bvh.render_tiles_bvh(
            sd, cam, W, H, 0, args.spp,
            block=TPU_LEAF_BLOCK if on_tpu else 32, interpret=not on_tpu))
        t_wf = wall(lambda: wavefront.render_wavefront(
            sd, cam, W, H, 0, args.spp,
            block=TPU_WAVEFRONT_BLOCK if on_tpu else 32,
            qbits=TPU_WAVEFRONT_QBITS, mxu=on_tpu, interpret=not on_tpu))
        row = {"n_prims": n, "wall_s_walk": round(t_walk, 4),
               "wall_s_wavefront": round(t_wf, 4),
               "wavefront_speedup": round(t_walk / t_wf, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {"spp": args.spp, "res": f"{W}x{H}",
           "device": str(jax.devices()[0]), "rows": rows}
    with open("CROSSOVER_ENGINE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
