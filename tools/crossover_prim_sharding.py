"""Measure the gather-vs-ring prim-sharding crossover (VERDICT r2 next #6).

Renders the same workload with both strategies on the virtual 8-device CPU
mesh at growing scene sizes and records wall time + the gather strategy's
transient-copy footprint.  The gather wins while one transient scene copy
(+ BVH) fits comfortably; the ring's O(scene/N)-per-hop streaming wins on
memory once it does not — `render_prim_sharded`'s auto dispatcher encodes
the measured threshold (sharding.GATHER_TRANSIENT_BUDGET).

Usage: python tools/crossover_prim_sharding.py [--sizes 10000,100000]
Writes PRIM_SHARDING.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench_suite  # noqa: E402
from spt_tpu import Camera  # noqa: E402
from spt_tpu.parallel import sharding as S  # noqa: E402
from spt_tpu.parallel.mesh import make_render_mesh  # noqa: E402


def timed(fn, *a, reps=2):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*a))
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,50000")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PRIM_SHARDING.json"))
    args = ap.parse_args()

    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    mesh = make_render_mesh(data=1, prim=8)
    kw = dict(max_bounces=2, rr_depth=8, use_nee=False,
              use_mis=False, seed=3)
    W = H = 32
    ids = jnp.arange(1)
    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        sd = bench_suite.scene_10k(n).compile(use_bvh=False)
        tg, img_g = timed(lambda: S.render_prim_sharded_gather(
            sd, cam, W, H, ids, mesh, **kw))
        tr, img_r = timed(lambda: S.render_prim_sharded_ring(
            sd, cam, W, H, ids, mesh, **kw))
        # frac-close, not allclose: gather and ring traverse in different
        # orders, so knife-edge hits (t within float noise of an accept
        # threshold) may pick different valid paths on a few pixels — the
        # same measured class as wavefront-vs-SoA (tests/test_wavefront).
        close = (np.abs(np.asarray(img_g) - np.asarray(img_r))
                 < 1e-3 + 1e-2 * np.abs(np.asarray(img_r))).all(-1)
        frac_close = float(close.mean())
        agree = bool(frac_close >= 0.99)
        cap = -(-sd.capacity // 8) * 8
        row = {
            "n_prims": n,
            "wall_s_gather": round(tg, 3),
            "wall_s_ring": round(tr, 3),
            "gather_transient_bytes": S._prim_transient_bytes(cap),
            "auto_strategy": ("gather" if S._prim_transient_bytes(cap)
                              <= S.GATHER_TRANSIENT_BUDGET else "ring"),
            "gather_matches_ring": agree,
            "frac_close": round(frac_close, 5),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump({
            "note": "8-device virtual CPU mesh (data=1, prim=8), 32x32 1spp"
                    " depth-2 render, NEE off, scene compiled use_bvh=False"
                    " (the strategies build their own trees); divergent-"
                    "pixel classification in PRIM_DIVERGENCE.json"
                    " (tools/classify_prim_divergence.py); both strategies"
                    " traverse BVHs"
                    " (gathered full tree / per-chunk mini-trees).  The"
                    " dispatcher picks gather while the transient copy fits"
                    " GATHER_TRANSIENT_BUDGET, ring beyond - the ring's"
                    " advantage is MEMORY (O(scene/N) per hop, no full"
                    " transient), so the threshold is a footprint bound,"
                    " not a wall-clock crossover.",
            "budget_bytes": S.GATHER_TRANSIENT_BUDGET,
            "rows": rows}, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
