"""Per-stage wall breakdown of the r4 wavefront at config-5 scale.

Drives the launch's own building blocks (_raygen_launch, _sort_rays,
_precull, the bounce pallas_call) one bounce at a time on the real chip,
timing each stage and recording the alive population and candidate-list
stats — the decomposition VERDICT r3 asked for next to every perf
decision.  Usage: python tools/profile_wavefront2.py [--quick]
"""
import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench_suite
from spt_tpu import Camera
from spt_tpu.kernels import physics, wavefront as wf


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=8)
    args = ap.parse_args()
    bench_suite.enable_compile_cache()

    sd = bench_suite.scene_10k(2000 if args.quick else 10_000).compile()
    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    W, H = (960, 540) if args.quick else (1920, 1080)
    SPP = 1 if args.quick else 2
    interp = jax.default_backend() != "tpu"

    blob, meta3, nodef, nodei, prims, static = wf._packed(sd, cam,
                                                          args.block)
    n_nodes = nodef.shape[0] // 8
    n_blocks = prims.shape[0]
    meta = jnp.asarray([0, 5, int(meta3[2])], np.int32)
    lsb = physics.lsel_bounds_from_prims(prims)
    lo, ext = wf._scene_sort_bounds(nodef)
    lob, hib = wf._leaf_block_bounds(prims)

    raygen = jax.jit(functools.partial(
        wf._raygen_launch, width=W, height=H, chunk_spp=SPP, dof=False,
        interpret=interp), static_argnames=())
    t_rg, (st, ids, n_tiles) = timed(lambda m, b: wf._raygen_launch(
        m, b, width=W, height=H, chunk_spp=SPP, dof=False,
        interpret=interp), meta, blob)
    n_rows = (n_tiles + 1) * wf.TILE_ROWS
    print(json.dumps({"stage": "raygen", "s": round(t_rg, 4),
                      "n_tiles": int(n_tiles), "n_blocks": n_blocks}),
          flush=True)

    sort_j = jax.jit(lambda s, i: wf._sort_rays(s, i, lo, ext, wf.Q_BITS,
                                                True, 0))
    precull_j = jax.jit(lambda s: wf._precull(s, lob, hib, n_tiles))
    # Per-ROW aggregation of the same precull (r5): how much tighter are
    # 128-lane-row candidate lists than the per-tile unions?
    precull_row_j = jax.jit(
        lambda s: wf._precull(s, lob, hib, n_tiles, per_row=True))

    def _redirect(i, m, *r):
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    def _redirect2(i, m, *r):
        return (jnp.where(i < m[3], i, n_tiles), 0, 0)

    @functools.partial(jax.jit, static_argnames=("k", "use_nee"))
    def bounce(meta4, blob, lsb, nodef, nodei, prims, cand, ctn, st, ids,
               *, k, use_nee=True):
        return pl.pallas_call(
            functools.partial(
                wf._bounce_kernel, k=k, n_nodes=n_nodes, block=args.block,
                n_mats=static["n_mats"], mtypes=static["mtypes"],
                n_light_slots=static["n_light_slots"], rr_depth=3,
                use_nee=use_nee, use_mis=True, sky_mode=sd.sky_mode,
                precull=True, tcull=True),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, n_blocks), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((wf.N_CH, wf.TILE_ROWS, wf.TILE_LANES),
                                 _redirect, memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, wf.TILE_ROWS, wf.TILE_LANES),
                                 _redirect, memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (wf.N_CH, wf.TILE_ROWS, wf.TILE_LANES), _redirect,
                    memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SMEM((max(n_blocks, 1),), jnp.int32)],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (wf.N_CH, n_rows, wf.TILE_LANES), jnp.float32),
            input_output_aliases={8: 0},
            interpret=interp,
        )(meta4, blob, lsb, nodef, nodei, prims, cand, ctn, st, ids)

    def _redirect8(i, m, *r):
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    @functools.partial(jax.jit, static_argnames=())
    def isect(meta4, prims_a, cand, ctn, st):
        return pl.pallas_call(
            functools.partial(wf._isect_kernel, block=args.block,
                              tcull=True),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, n_blocks), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((wf.N_CH, wf.TILE_ROWS, wf.TILE_LANES),
                                 _redirect, memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, wf.TILE_ROWS, wf.TILE_LANES),
                                       _redirect,
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, n_rows, wf.TILE_LANES),
                                           jnp.float32),
            interpret=interp,
        )(meta4, prims_a, cand, ctn, st)

    @functools.partial(jax.jit, static_argnames=("k",))
    def shadow_glue(st, ids, res, meta, *, k):
        so3, sd3, stmax, sneed = wf._shadow_rays_xla(
            st, ids, res, blob, lsb, meta[2], k=k, seed=meta[1],
            n_mats=static["n_mats"], mtypes=static["mtypes"],
            n_light_slots=static["n_light_slots"])
        return wf._precull_rays(so3, sd3, sneed, stmax, lob, hib, n_tiles)

    @functools.partial(jax.jit, static_argnames=("k",))
    def shadow_glue_row(st, ids, res, meta, *, k):
        so3, sd3, stmax, sneed = wf._shadow_rays_xla(
            st, ids, res, blob, lsb, meta[2], k=k, seed=meta[1],
            n_mats=static["n_mats"], mtypes=static["mtypes"],
            n_light_slots=static["n_light_slots"])
        return wf._precull_rays(so3, sd3, sneed, stmax, lob, hib, n_tiles,
                                per_row=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def shade(meta4, blob_a, lsb_a, prims_a, scand, sctn, st, ids, res, *,
              k):
        return pl.pallas_call(
            functools.partial(
                wf._shade_kernel, k=k, block=args.block,
                n_mats=static["n_mats"], mtypes=static["mtypes"],
                n_light_slots=static["n_light_slots"], rr_depth=3,
                use_nee=True, use_mis=True, sky_mode=sd.sky_mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, n_blocks), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((wf.N_CH, wf.TILE_ROWS, wf.TILE_LANES),
                                 _redirect, memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, wf.TILE_ROWS, wf.TILE_LANES),
                                 _redirect, memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, wf.TILE_ROWS, wf.TILE_LANES),
                                 _redirect, memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (wf.N_CH, wf.TILE_ROWS, wf.TILE_LANES), _redirect,
                    memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (wf.N_CH, n_rows, wf.TILE_LANES), jnp.float32),
            input_output_aliases={6: 0},
            interpret=interp,
        )(meta4, blob_a, lsb_a, prims_a, scand, sctn, st, ids, res)

    nalive = jnp.int32(n_tiles)
    totals = {"sort": 0.0, "precull": 0.0, "isect": 0.0, "shadow": 0.0,
              "shade": 0.0}
    for k in range(args.bounces):
        row = {"bounce": k}
        if k:
            t_s, (st, ids, nalive) = timed(sort_j, st, ids)
            row["sort_s"] = round(t_s, 4)
            totals["sort"] += t_s
        t_p, (cand, ctn) = timed(precull_j, st)
        totals["precull"] += t_p
        nc = np.asarray(cand[:, 0, 0])
        na = int(nalive)
        cand_r, _ = precull_row_j(st)
        ncr = np.asarray(cand_r[:, :, 0]).astype(np.float64)
        row.update(precull_s=round(t_p, 4), alive_tiles=na,
                   mean_cand=round(float(nc[:max(na, 1)].mean()), 1),
                   mean_cand_row=round(float(ncr[:max(na, 1)].mean()), 1))
        meta4 = jnp.concatenate([meta[:3], jnp.int32(nalive).reshape(1)])
        t_i, res = timed(isect, meta4, prims, cand, ctn, st)
        totals["isect"] += t_i
        t_g, (scand, sctn) = timed(functools.partial(shadow_glue, k=k),
                                   st, ids, res, meta)
        totals["shadow"] += t_g
        sc = np.asarray(scand[:, 0, 0])
        scand_r, _ = shadow_glue_row(st, ids, res, meta, k=k)
        scr = np.asarray(scand_r[:, :, 0]).astype(np.float64)
        row.update(isect_s=round(t_i, 4), shadow_s=round(t_g, 4),
                   mean_scand=round(float(sc[:max(na, 1)].mean()), 1),
                   mean_scand_row=round(float(scr[:max(na, 1)].mean()), 1))
        t_k, st = timed(functools.partial(shade, k=k), meta4, blob, lsb,
                        prims, scand, sctn, st, ids, res)
        row["shade_s"] = round(t_k, 4)
        totals["shade"] += t_k
        print(json.dumps(row), flush=True)
    print(json.dumps({"totals": {k: round(v, 3)
                                 for k, v in totals.items()}}), flush=True)


if __name__ == "__main__":
    main()
