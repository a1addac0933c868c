"""Split the config-5 wavefront wall time into sort vs bounce-kernel cost.

Times (a) the coherence sort alone at the real stream size, (b) full renders
at sort_every = 1 / 2 / 4 to expose the sort-frequency trade-off with
compaction live.  Usage: python tools/profile_wavefront.py
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
from spt_tpu.kernels import wavefront as wf  # noqa: E402

bench_suite.enable_compile_cache()
cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
kw = dict(max_bounces=8, rr_depth=3, use_nee=True, use_mis=True, seed=5)
interp = jax.default_backend() != "tpu"

# (a) sort cost alone at the real chunk size (2 spp of 1920x1080 -> 4081
# tiles incl. pad).
n_rows = 4081 * wf.TILE_ROWS
key = jax.random.key(0)
st = jax.random.uniform(key, (wf.N_CH, n_rows, wf.TILE_LANES), jnp.float32)
ids = jnp.zeros((2, n_rows, wf.TILE_LANES), jnp.int32)
lo = (jnp.float32(-41.0),) * 3
ext = (jnp.float32(82.0),) * 3
sort = jax.jit(lambda s, i: wf._sort_rays(s, i, lo, ext, 4, True))
dt = bench_suite.timed(sort, st, ids, reps=3)
print(json.dumps({"probe": "sort-alone-4.2Mrays", "wall_s": round(dt, 4),
                  "per_8bounce_2chunk_s": round(dt * 16, 3)}), flush=True)

# (b) sort frequency.
sd = bench_suite.scene_10k(10_000).compile()
for se in (1, 2, 4):
    t0 = time.time()
    dtr = bench_suite.timed(
        lambda s0: wf.render_wavefront(
            sd, cam, 1920, 1080, s0, 4, sort_every=se, interpret=interp,
            **kw), 0, reps=1)
    print(json.dumps({"probe": f"render sort_every={se}",
                      "wall_s": round(dtr, 3),
                      "compile_s": round(time.time() - t0 - dtr, 1)}),
          flush=True)
