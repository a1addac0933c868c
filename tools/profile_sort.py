"""On-chip breakdown of the wavefront coherence-sort cost.

The r3 profile charged ~3.1 s of the 6.7 s config-5 forward wall to
"argsort + 19-channel gather" without splitting the two.  This tool times
each piece in isolation at the config-5 stream size (4M rays) so the fix
targets the real cost:

  argsort       — jnp.argsort of the i32 coherence key
  gather-chan   — legacy per-channel jnp.take (19 f32 + 2 i32)
  gather-fused  — one row gather of the (r, 21) transposed layout
                  (76 real bytes/ray, padded to a 512B lane tile on TPU)
  sort-variadic — lax.sort with all channels as operands (no gather)
  sort-full     — _sort_rays end to end (legacy vs fused)

Usage: python tools/profile_sort.py [--rays 4194304]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench_suite  # noqa: E402
from spt_tpu.kernels import wavefront as wf  # noqa: E402


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4 << 20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    bench_suite.enable_compile_cache()

    r = args.rays
    n_rows = r // wf.TILE_LANES
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.standard_normal((wf.N_CH, n_rows, 128)),
                     jnp.float32)
    # Realistic key population: ~60% alive with random cells/octants.
    alive = rng.random((n_rows, 128)) < 0.6
    st = st.at[wf.C_ALIVE].set(jnp.asarray(alive, jnp.float32))
    st = st.at[wf.C_INIMG].set(1.0)
    ids = jnp.asarray(rng.integers(0, 1 << 20, (2, n_rows, 128)), jnp.int32)
    lo = (jnp.float32(-30),) * 3
    ext = (jnp.float32(60),) * 3

    key_fn = jax.jit(lambda s: wf._coherence_key(
        s.reshape(wf.N_CH, r), lo, ext, wf.Q_BITS, True, 0))
    key = key_fn(st)
    res = {"rays": r, "backend": jax.default_backend()}

    res["key_ms"] = timed(key_fn, st, reps=args.reps) * 1e3
    argsort = jax.jit(jnp.argsort)
    perm = argsort(key)
    res["argsort_ms"] = timed(argsort, key, reps=args.reps) * 1e3

    @jax.jit
    def gather_chan(s, i, p):
        sf = jnp.take(s.reshape(wf.N_CH, r), p, axis=1)
        idf = jnp.take(i.reshape(2, r), p, axis=1)
        return sf, idf
    res["gather_chan_ms"] = timed(gather_chan, st, ids, perm,
                                  reps=args.reps) * 1e3

    @jax.jit
    def gather_fused(s, i, p):
        allc = jnp.concatenate(
            [s.reshape(wf.N_CH, r),
             jax.lax.bitcast_convert_type(i.reshape(2, r), jnp.float32)],
            axis=0)
        allc = jnp.take(allc.T, p, axis=0).T
        return allc[:wf.N_CH], allc[wf.N_CH:]
    res["gather_fused_ms"] = timed(gather_fused, st, ids, perm,
                                   reps=args.reps) * 1e3

    @jax.jit
    def sort_variadic(k, s, i):
        ops = [k] + [s.reshape(wf.N_CH, r)[c] for c in range(wf.N_CH)] \
            + [i.reshape(2, r)[c] for c in range(2)]
        return jax.lax.sort(ops, num_keys=1)
    res["sort_variadic_ms"] = timed(sort_variadic, key, st, ids,
                                    reps=args.reps) * 1e3

    for name, var in (("sort_full_take_ms", False),
                      ("sort_full_variadic_ms", True)):
        f = jax.jit(lambda s, i, v=var: wf._sort_rays(
            s, i, lo, ext, wf.Q_BITS, True, 0, variadic=v))
        res[name] = timed(f, st, ids, reps=args.reps) * 1e3

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
