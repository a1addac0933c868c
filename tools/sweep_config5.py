"""Config-5 wavefront knob sweep on the real chip.

Measures the sorted-wavefront forward pass (1920x1080, 4 spp, depth 8) under
different coherence-sort keys to find where the packet-culling win actually
is.  Hypothesis: the default key (octant in the LOW bits) builds packets
that share an origin cell but span all 8 direction octants, so a packet's
reachable set is the whole scene and the BVH walk cannot cull; putting the
octant in the HIGH bits (dir_major) should restore culling for diffuse
bounce packets.  Usage: python tools/sweep_config5.py [--quick]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

import bench_suite  # noqa: E402
from spt_tpu import Camera  # noqa: E402
from spt_tpu.kernels import wavefront  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    bench_suite.enable_compile_cache()
    sd = bench_suite.scene_10k(2000 if args.quick else 10_000).compile()
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    W, H = (960, 540) if args.quick else (1920, 1080)
    SPP = 1 if args.quick else 4
    kw = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True, seed=5)
    interp = jax.default_backend() != "tpu"

    variants = [
        ("default s1 q4 origin-major", dict(sort_every=1, qbits=4,
                                            dir_major=False)),
        ("no-sort", dict(sort_every=0)),
        ("dir-major q4", dict(sort_every=1, qbits=4, dir_major=True)),
        ("dir-major q6", dict(sort_every=1, qbits=6, dir_major=True)),
    ]
    for name, knobs in variants:
        t0 = time.time()
        try:
            dt = bench_suite.timed(
                lambda s0: wavefront.render_wavefront(
                    sd, cam, W, H, s0, SPP, interpret=interp, **knobs, **kw),
                0, reps=args.reps)
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name, "wall_s": round(dt, 3),
                          "compile_s": round(time.time() - t0 - dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
