"""Engine-level config-5 forward variant sweep (r5). Writes SWEEP_R5.json."""
import json
import sys
import time

sys.path.insert(0, ".")

import jax

import bench_suite
from spt_tpu import Camera
from spt_tpu.kernels import wavefront as wf


def wall(fn, n=3):
    jax.block_until_ready(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    bench_suite.enable_compile_cache()
    sd = bench_suite.scene_10k(10_000).compile()
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    W, H, SPP = 1920, 1080, 4
    base = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True,
                seed=0, block=128, qbits=5)
    variants = [
        ("base_b128_q5", {}),
        ("chunk8M", {"chunk_rays": 8 << 20}),
        ("b64_q5", {"block": 64}),
        ("b64_q6", {"block": 64, "qbits": 6}),
        ("q6", {"qbits": 6}),
        ("sortevery2", {"sort_every": 2}),
        ("minrays_256k", {"sort_min_rays": 1 << 18}),
    ]
    out = {}
    for name, kw in variants:
        cfg = dict(base, **kw)
        t = wall(lambda: wf.render_wavefront(sd, cam, W, H, 0, SPP, **cfg))
        out[name] = round(t, 4)
        print(json.dumps({name: out[name]}), flush=True)
    with open("SWEEP_R5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
