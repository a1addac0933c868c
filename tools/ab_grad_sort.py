"""Time the config-5 differentiable wavefront (fwd+bwd) on chip — the
metric the r5 custom-vjp variadic sort targets.  Writes AB_GRAD_SORT.json."""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench_suite
from spt_tpu import Camera
from spt_tpu.diff import gradients as G
from spt_tpu.kernels import wavefront_grad


def main():
    bench_suite.enable_compile_cache()
    sd = bench_suite.scene_10k(10_000).compile()
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    W, H, SPP = 1920, 1080, 4
    kw = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True, seed=5)
    params = G.get_params(sd, ("albedo", "roughness", "centers", "radii"))
    render = wavefront_grad.make_wavefront_render_fn(
        sd, cam, W, H, spp=SPP, block=128, qbits=5, **kw)
    grad = jax.jit(lambda p, s0: jax.grad(
        lambda q: jnp.sum(render(q, s0)))(p))
    t0 = time.time()
    jax.block_until_ready(grad(params, jnp.int32(0)))
    compile_s = time.time() - t0
    walls = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(grad(params, jnp.int32(i)))
        walls.append(time.perf_counter() - t0)
    segs = bench_suite.count_segments(sd, cam, kw, w=128, h=128, spp=4)
    dt = min(walls)
    out = {"wall_s_fwd_bwd_wavefront": round(dt, 4),
           "compile_s": round(compile_s, 1),
           "fwd_bwd_rays_per_s": round(SPP * segs * W * H / dt),
           "r4_wall_s": 13.9886, "r4_rays_per_s": 2380651,
           "speedup_vs_r4": round(13.9886 / dt, 3)}
    with open("AB_GRAD_SORT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
