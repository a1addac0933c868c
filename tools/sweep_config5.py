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
        ("split b256", dict(sort_every=1, dir_major=True, dbits=0,
                            block=256, split=True)),
        ("split qbits5", dict(sort_every=1, dir_major=True, dbits=0,
                              qbits=5, block=256, split=True)),
        ("split b128 qbits5", dict(sort_every=1, dir_major=True, dbits=0,
                                   qbits=5, block=128, split=True)),
        # r2 key sweep (block=32): origin-major 11.07s / no-sort 22.5s /
        # dir-major 8.75s.  r3 found the walk SYNC-bound per node, so the
        # leaf block width became the dominant knob (32/64/128/256 =
        # 9.41/7.89/7.08/6.69 s at dir-major), and both cheaper-sorting
        # variants lose: dbits=2 12.5s (direction-tight packets scatter
        # origins), rowsort 15.2s (frozen 128-ray row membership kills
        # coherence), sort_every=2 7.5s.
        # r4 adds the XLA precull (no in-kernel tree walk) — with the walk
        # gone, SMALLER blocks may win again (finer per-lane culling, no
        # per-node sync to amortize).
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
