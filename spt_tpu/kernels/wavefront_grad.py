"""Differentiable sorted-wavefront renderer — the large-scene backward pass.

The wavefront engine (kernels/wavefront.py) is the fastest forward at
10k+ primitives but had no backward at all (VERDICT r2 missing #2).  This
module makes the whole per-chunk wavefront pipeline differentiable by giving
each *bounce kernel* a ``jax.custom_vjp`` whose backward is itself a Pallas
kernel, and leaving every other stage (coherence sort, env-map lookup,
image scatter) in XLA where autodiff already works:

* **Forward bounce** (``_bounce_fwd_kernel``): the standard wavefront
  bounce — candidate-sweep intersection over the XLA precull's per-tile
  block lists (wavefront._precull), no in-kernel tree walk — additionally
  writing per-lane winner residuals to HBM: (hit center, radius, material
  id, leaf block, slot) + the NEE blocked mask (8 channels).  Exactly the
  record the fused megakernel keeps in VMEM (megakernel_bvh_grad), but per
  bounce in HBM because the sort between bounces forces a kernel split.

* **Backward bounce** (``_bounce_bwd_kernel``): no traversal at all — it
  replays ``physics.trace_bounce`` under ``jax.vjp`` with the saved winner
  geometry as differentiable inputs (the detached-selection estimator of
  core/bvh.intersect_bvh_soa) and emits (d state_in, per-lane geometry
  cotangents, scalar-uniform grads).  Per-primitive scatter then happens in
  XLA by the saved (block, slot) keys — sidestepping the fused kernel's
  O(n_blocks) in-kernel presence scan that capped it at a few thousand
  spheres (megakernel_bvh_grad.py:23-28).

* **Glue stays autodiff**: sorting is a permutation gather (linear, XLA
  differentiates it), the env-map bilinear lookup and the final pixel
  scatter-add are plain jnp — so ``jax.grad`` through
  ``make_wavefront_render_fn`` composes the whole chain, and
  pack_blob_jnp / pack_prims_jnp map blob/prim-table cotangents back to
  scene parameters for free (no hand-written map_raw_grads).

* **Compaction runs under grad too** (VERDICT r3 next #4; r3 had it
  disabled).  The forward bounce aliases its state in/out like the
  non-grad engine, so grid steps past the sorted alive-prefix boundary
  redirect to the pad tile and the dead suffix is preserved in place.
  The saved pre-bounce state residual stays intact because XLA copies an
  aliased operand that is still live — one sequential full-bandwidth copy
  per bounce, instead of running every dead tile through the kernel.  The
  winner-residual output is NOT aliased, so its suffix rows hold stale
  garbage on hardware; every consumer masks by the saved boundary:
  the backward kernel redirects those steps (cotangents pass through the
  ct->din alias untouched), and the per-primitive scatter drops rows past
  ``nalive * TILE``.

Reference analog: none (the reference has no differentiability; this is
the BASELINE config-5 "gradient all-reduce at 10k prims" prerequisite).
RNG streams and estimator match integrator_soa exactly; parity is pinned in
tests/test_wavefront_grad.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scene import SceneData
from . import physics
from .megakernel import _SKY_OFF
from .megakernel_bvh import (BLOCK, _MAT_OFF, _MAT_STRIDE, TH, TILE_LANES,
                             TILE_ROWS, TW, _cand_sweep_anyhit,
                             _make_intersectors, _packed, pack_blob_jnp,
                             pack_prims_jnp, refit_nodef_jnp)
from .megakernel_bvh_grad import (_read_lights, _read_mats,
                                  _rebuilt_intersect)
from .megakernel_grad import _uniforms
from .wavefront import (C_ALIVE, C_INIMG, C_MISS, C_PDF, C_SPEC, D_BITS,
                        N_CH, Q_BITS, TILE, _add_env_radiance,
                        _leaf_block_bounds, _precull, _raygen_launch,
                        _scatter_image, _scene_sort_bounds, _sort_rays)

N_RES = 8       # hcx hcy hcz hr hmid hblk hslot blocked
N_STATE = 13    # differentiable state channels (o, d, th, rad, pdf)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _bounce_fwd_kernel(meta_ref, blob_ref, lsb_ref, nodef_ref, nodei_ref,
                       prim_ref, cand_ref, ctn_ref, st_ref, ids_ref,
                       out_ref, res_ref, blk_scr, *, k, n_nodes, block,
                       n_mats, mtypes, n_light_slots, rr_depth, use_nee,
                       use_mis, sky_mode, precull, tcull):
    """Wavefront bounce + winner-residual record, compaction-aware.

    Grid steps past the alive-prefix boundary (``meta_ref[3]``) are
    redirected to the pad tile: state rides through the in/out alias
    untouched, and only benign flag zeros are flushed (the out VMEM block
    is STALE on hardware for a step that skips its stores — the same
    hazard the non-grad kernel documents).  The pad res row is zeroed with
    hmid = -1 so nothing it holds ever looks like a winner."""
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    in_region = pl.program_id(0) < meta_ref[3]
    alive = st_ref[C_ALIVE] > 0.5
    any_alive = jnp.any(alive)
    zeros = jnp.zeros_like(st_ref[C_ALIVE])

    @pl.when(jnp.logical_not(in_region))
    def _():
        out_ref[C_ALIVE] = zeros
        out_ref[C_INIMG] = zeros
        out_ref[C_MISS] = zeros
        for c in range(N_RES):
            res_ref[c] = zeros
        res_ref[4] = zeros - 1.0   # hmid = -1 (no winner)

    @pl.when(in_region & jnp.logical_not(any_alive))
    def _():   # dead tile inside the prefix: state through; no winner
        for c in range(N_CH):
            out_ref[c] = st_ref[c]
        out_ref[C_MISS] = zeros
        for c in range(N_RES):
            res_ref[c] = zeros
        res_ref[4] = zeros - 1.0

    @pl.when(in_region & any_alive)
    def _():
        pid = ids_ref[0].astype(jnp.uint32)
        sample = ids_ref[1].astype(jnp.uint32)
        state = tuple(st_ref[c] for c in range(C_PDF + 1))
        aux = (alive, st_ref[C_SPEC] > 0.5)

        sky = tuple(blob_ref[_SKY_OFF + a]
                    for a in range(physics.N_SKY_ATTRS))
        light_off = _MAT_OFF + _MAT_STRIDE * n_mats
        lights = tuple(
            tuple(blob_ref[light_off + 7 * l + a] for a in range(7))
            for l in range(n_light_slots))
        theta = ((), sky, lights)
        capture = {}
        n_blocks = prim_ref.shape[0]
        intersect_fn, occluded_fn = _make_intersectors(
            blob_ref, nodef_ref, nodei_ref, prim_ref, blk_scr, n_nodes,
            block, n_mats, mtypes, capture=capture, frustum=k == 0,
            cand=((cand_ref, ctn_ref, n_blocks) if precull else None),
            tcull=tcull)

        u = _uniforms(pid, sample, seed, k,
                      tuple(lsb_ref[a] for a in range(6)))
        want_miss = sky_mode == physics.SKY_ENVMAP
        cfg = physics.BounceCfg(
            mtypes=(), k=k, rr_depth=rr_depth, use_nee=use_nee,
            use_mis=use_mis, sky_mode=sky_mode,
            n_light_slots=n_light_slots, want_miss=want_miss)
        state, aux = physics.trace_bounce(
            theta, state, aux, u, nl, cfg,
            intersect_fn=intersect_fn, occluded_fn=occluded_fn)

        for c, v in enumerate(state):
            out_ref[c] = v
        out_ref[C_ALIVE] = aux[0].astype(jnp.float32)
        out_ref[C_SPEC] = aux[1].astype(jnp.float32)
        out_ref[C_INIMG] = st_ref[C_INIMG]
        out_ref[C_MISS] = (aux[2].astype(jnp.float32) if want_miss
                           else zeros)
        for c, key in enumerate(("hcx", "hcy", "hcz", "hr", "hmid",
                                 "hblk", "hslot")):
            res_ref[c] = capture[key]
        res_ref[7] = (capture["blocked"].astype(jnp.float32)
                      if "blocked" in capture else zeros)


def _bounce_bwd_kernel(meta_ref, blob_ref, lsb_ref, st_ref, ids_ref,
                       res_ref, ct_ref, din_ref, dgeo_ref, dscal_ref, *, k,
                       n_mats, mtypes, n_light_slots, rr_depth, use_nee,
                       use_mis, sky_mode):
    """Replay one bounce under jax.vjp from the saved residuals.

    Inputs: pre-bounce state tile, ids, winner residuals, cotangent of the
    post-bounce state.  Outputs: cotangent of the pre-bounce state,
    per-lane geometry cotangents (d center xyz, d radius), and the
    scalar-uniform grads (sky + material table + light slots) accumulated
    across the grid in SMEM.

    Steps past the forward's alive-prefix boundary are skipped: the
    forward was the identity there (aliased pass-through), so the ct->din
    alias passes their cotangents through; their dgeo pad-row flush is
    masked out of the per-prim scatter by the caller.  The dscal
    accumulator is still zeroed when even step 0 is skipped (all-dead
    chunk) so no stale garbage reaches the blob gradient.
    """
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    in_region = pl.program_id(0) < meta_ref[3]
    first = pl.program_id(0) == 0
    n_scal = dscal_ref.shape[0]

    @pl.when(first & jnp.logical_not(in_region))
    def _():
        for i in range(n_scal):
            dscal_ref[i] = jnp.float32(0.0)

    @pl.when(in_region)
    def _():
        pid = ids_ref[0].astype(jnp.uint32)
        sample = ids_ref[1].astype(jnp.uint32)
        zeros = jnp.zeros_like(st_ref[C_ALIVE])

        sky = tuple(blob_ref[_SKY_OFF + a]
                    for a in range(physics.N_SKY_ATTRS))
        mats = _read_mats(blob_ref, n_mats)
        lights = _read_lights(blob_ref, n_mats, n_light_slots)

        state = tuple(st_ref[c] for c in range(N_STATE))
        aux = (st_ref[C_ALIVE] > 0.5, st_ref[C_SPEC] > 0.5)
        hcx, hcy, hcz, hr = (res_ref[0], res_ref[1], res_ref[2], res_ref[3])
        hmid = res_ref[4]
        blocked = res_ref[7] > 0.5

        u = _uniforms(pid, sample, seed, k,
                      tuple(lsb_ref[a] for a in range(6)))
        want_miss = sky_mode == physics.SKY_ENVMAP
        cfg = physics.BounceCfg(
            mtypes=(), k=k, rr_depth=rr_depth, use_nee=use_nee,
            use_mis=use_mis, sky_mode=sky_mode, n_light_slots=n_light_slots,
            want_miss=want_miss)

        def f(theta2, st):
            sky_t, mats_t, lights_t, cxt, cyt, czt, rt = theta2
            ifn = _rebuilt_intersect(mats_t, mtypes, cxt, cyt, czt, rt, hmid)
            ofn = lambda *a: blocked
            new_state, new_aux = physics.trace_bounce(
                ((), sky_t, lights_t), st, aux, u, nl, cfg,
                intersect_fn=ifn, occluded_fn=ofn)
            return new_state, new_aux

        theta2 = (sky, mats, lights, hcx, hcy, hcz, hr)
        _, vjp_fn, _ = jax.vjp(f, theta2, state, has_aux=True)
        state_ct = tuple(ct_ref[c] for c in range(N_STATE))
        th2_ct, st_ct = vjp_fn(state_ct)

        for c in range(N_STATE):
            din_ref[c] = st_ct[c]
        for c in (C_ALIVE, C_SPEC, C_MISS):
            din_ref[c] = zeros
        din_ref[C_INIMG] = ct_ref[C_INIMG]   # passes through the fwd kernel

        for a, d in enumerate(th2_ct[3:7]):
            dgeo_ref[a] = d

        flat = (list(th2_ct[0])
                + [x for m in th2_ct[1] for x in m]
                + [x for l in th2_ct[2] for x in l])

        @pl.when(first)
        def _():
            for i, v in enumerate(flat):
                dscal_ref[i] = v

        @pl.when(jnp.logical_not(first))
        def _():
            for i, v in enumerate(flat):
                dscal_ref[i] += v


def _shade_fwd_kernel(meta_ref, blob_ref, lsb_ref, prim_ref, scand_ref,
                      sctn_ref, st_ref, ids_ref, res_ref, out_ref,
                      blk_out_ref, *, k, block, n_mats, mtypes,
                      n_light_slots, rr_depth, use_nee, use_mis, sky_mode):
    """Split-bounce differentiable forward: shading only, walk-free.

    Same as wavefront._shade_kernel (rebuilt intersector from the winner
    residuals + shadow-candidate any-hit sweep) but additionally records
    the NEE ``blocked`` mask — the one residual the backward replay needs
    that the intersect kernel doesn't produce."""
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    in_region = pl.program_id(0) < meta_ref[3]
    alive = st_ref[C_ALIVE] > 0.5
    any_alive = jnp.any(alive)
    zeros = jnp.zeros_like(st_ref[C_ALIVE])

    @pl.when(jnp.logical_not(in_region))
    def _():
        out_ref[C_ALIVE] = zeros
        out_ref[C_INIMG] = zeros
        out_ref[C_MISS] = zeros
        blk_out_ref[0] = zeros

    @pl.when(in_region & jnp.logical_not(any_alive))
    def _():
        for c in range(N_CH):
            out_ref[c] = st_ref[c]
        out_ref[C_MISS] = zeros
        blk_out_ref[0] = zeros

    @pl.when(in_region & any_alive)
    def _():
        pid = ids_ref[0].astype(jnp.uint32)
        sample = ids_ref[1].astype(jnp.uint32)
        state = tuple(st_ref[c] for c in range(C_PDF + 1))
        aux = (alive, st_ref[C_SPEC] > 0.5)

        sky = tuple(blob_ref[_SKY_OFF + a]
                    for a in range(physics.N_SKY_ATTRS))
        lights = _read_lights(blob_ref, n_mats, n_light_slots)
        theta = ((), sky, lights)

        mats = _read_mats(blob_ref, n_mats)
        intersect_fn = _rebuilt_intersect(
            mats, mtypes, res_ref[0], res_ref[1], res_ref[2], res_ref[3],
            res_ref[4])

        capture = {}

        def occluded_fn(pox, poy, poz, ldx, ldy, ldz, tmax, need):
            blocked = _cand_sweep_anyhit(prim_ref, scand_ref, sctn_ref,
                                         pox, poy, poz, ldx, ldy, ldz,
                                         need, tmax, block,
                                         prim_ref.shape[0])
            capture["blocked"] = blocked
            return blocked

        u = _uniforms(pid, sample, seed, k,
                      tuple(lsb_ref[a] for a in range(6)))
        want_miss = sky_mode == physics.SKY_ENVMAP
        cfg = physics.BounceCfg(
            mtypes=(), k=k, rr_depth=rr_depth, use_nee=use_nee,
            use_mis=use_mis, sky_mode=sky_mode,
            n_light_slots=n_light_slots, want_miss=want_miss)
        state, aux = physics.trace_bounce(
            theta, state, aux, u, nl, cfg,
            intersect_fn=intersect_fn, occluded_fn=occluded_fn)

        for c, v in enumerate(state):
            out_ref[c] = v
        out_ref[C_ALIVE] = aux[0].astype(jnp.float32)
        out_ref[C_SPEC] = aux[1].astype(jnp.float32)
        out_ref[C_INIMG] = st_ref[C_INIMG]
        out_ref[C_MISS] = (aux[2].astype(jnp.float32) if want_miss
                           else zeros)
        blk_out_ref[0] = (capture["blocked"].astype(jnp.float32)
                          if "blocked" in capture else zeros)



def _bwd_pallas_call(meta, blob, lsb, st, ids, res, ct, *, n_tiles, n_scal,
                     stat, interpret):
    """The backward bounce pallas_call — shared by the fused and split ops
    (the backward never traverses, so it is identical for both)."""
    n_rows = (n_tiles + 1) * TILE_ROWS

    def _redirect(i, m, *r):
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    return pl.pallas_call(
        functools.partial(_bounce_bwd_kernel, **stat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, TILE_ROWS, TILE_LANES), _redirect,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_RES, TILE_ROWS, TILE_LANES), _redirect,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, TILE_ROWS, TILE_LANES), _redirect,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N_CH, n_rows, TILE_LANES), jnp.float32),
            jax.ShapeDtypeStruct((4, n_rows, TILE_LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_scal,), jnp.float32),
        ],
        # Cotangents of the untouched suffix pass straight through.
        input_output_aliases={6: 0},
        interpret=interpret,
    )(meta, blob, lsb, st, ids, res, ct)


def _grads_from_bwd(meta, blob, res, dgeo, dscal, *, n_mats, n_light_slots,
                    n_blocks, block):
    """Map the backward kernel's raw outputs to (d_blob, d_prims).

    Scalar-uniform grads go to the blob layout (sky, material rows, light
    rows are contiguous and in the dscal vector's order; the camera prefix
    carries no gradient).  Per-lane geometry cotangents scatter into the
    leaf prim table keyed by the saved (block, slot) — pure XLA, no
    O(n_blocks) presence scan.  Rows past the compaction boundary (and the
    pad tile) hold stale hardware garbage: their scatter targets are
    redirected to a discard slot instead of masking by value, so NaN/Inf
    garbage cannot contaminate real entries."""
    light_off = _MAT_OFF + _MAT_STRIDE * n_mats
    d_blob = jnp.zeros_like(blob)
    d_blob = d_blob.at[_SKY_OFF:_SKY_OFF + physics.N_SKY_ATTRS].add(
        dscal[:physics.N_SKY_ATTRS])
    d_blob = d_blob.at[_MAT_OFF:_MAT_OFF + 8 * n_mats].add(
        dscal[physics.N_SKY_ATTRS:physics.N_SKY_ATTRS + 8 * n_mats])
    if n_light_slots:
        d_blob = d_blob.at[light_off:light_off + 7 * n_light_slots].add(
            dscal[physics.N_SKY_ATTRS + 8 * n_mats:])

    rr = dgeo.shape[1] * dgeo.shape[2]
    nalive_rays = meta[3] * TILE
    in_pref = jnp.arange(rr, dtype=jnp.int32) < nalive_rays
    hmid = res[4].reshape(rr)
    ok = in_pref & (hmid >= 0.0)
    blk = jnp.where(ok, jnp.clip(res[5].reshape(rr).astype(jnp.int32),
                                 0, max(n_blocks - 1, 0)), n_blocks)
    slot = jnp.clip(res[6].reshape(rr).astype(jnp.int32), 0, block - 1)
    # One scatter-add with a flat (blk, attr, slot) index: the r4 version
    # issued 4 separate 4.2M-row scatters per bounce (one per geometry
    # attr) — a top grad-pipeline cost once the sorts went variadic.
    # Flattening attr into the index quarters the scatter passes.  All
    # intermediates stay 1-D: an (rr, 4) stack would pad its trailing
    # dim to 128 lanes (32x, ~1 GB per bounce — the CLAUDE.md (N,3)
    # hazard; it OOM'd the 1080p fwd+bwd).
    d_prims = jnp.zeros(((n_blocks + 1) * 5 * block,), jnp.float32)
    base = (blk * 5) * block + slot
    upd = jnp.concatenate([jnp.where(ok, dgeo[a].reshape(rr), 0.0)
                           for a in range(4)])             # (4*rr,)
    idx = jnp.concatenate([base + a * block for a in range(4)])
    d_prims = d_prims.at[idx].add(upd)
    return d_blob, d_prims.reshape(n_blocks + 1, 5, block)[:n_blocks]


@functools.lru_cache(maxsize=128)
def _shade_op(k, n_tiles, n_blocks, block, n_mats, mtypes, n_light_slots,
              rr_depth, use_nee, use_mis, sky_mode, block_prim_ids_key,
              interpret):
    """Split-bounce differentiable shade op (custom_vjp).

    op(meta4, blob, lsb, prims, scand, st, ids, res) -> new state.  The
    intersect kernel and shadow precull run OUTSIDE (on stop_gradient
    inputs — they only select); gradients flow through the shade kernel's
    rebuilt winner, and the backward is the ordinary replay kernel fed the
    residual record with the recorded blocked mask in channel 7."""
    n_rows = (n_tiles + 1) * TILE_ROWS
    n_scal = physics.N_SKY_ATTRS + 8 * n_mats + 7 * n_light_slots
    stat = dict(k=k, n_mats=n_mats, mtypes=mtypes,
                n_light_slots=n_light_slots, rr_depth=rr_depth,
                use_nee=use_nee, use_mis=use_mis, sky_mode=sky_mode)

    def _redirect(i, m, *r):
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    def _redirect2(i, m, *r):
        return (jnp.where(i < m[3], i, n_tiles), 0, 0)

    if use_nee and n_light_slots:
        sc_specs = [
            pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_blocks), _redirect2,
                         memory_space=pltpu.SMEM),
        ]
    else:
        sc_specs = [
            pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ]

    def fwd_call(meta, blob, lsb, prims, scand, sctn, st, ids, res):
        return pl.pallas_call(
            functools.partial(_shade_fwd_kernel, block=block, **stat),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                    *sc_specs,
                    pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N_RES, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((N_CH, n_rows, TILE_LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((1, n_rows, TILE_LANES), jnp.float32),
            ],
            input_output_aliases={6: 0},
            interpret=interpret,
        )(meta, blob, lsb, prims, scand, sctn, st, ids, res)

    @jax.custom_vjp
    def op(meta, blob, lsb, prims, scand, sctn, st, ids, res):
        out, _ = fwd_call(meta, blob, lsb, prims, scand, sctn, st, ids,
                          res)
        return out

    def op_fwd(meta, blob, lsb, prims, scand, sctn, st, ids, res):
        out, blocked = fwd_call(meta, blob, lsb, prims, scand, sctn, st,
                                ids, res)
        res8 = jnp.concatenate([res[:7], blocked], axis=0)
        return out, (meta, blob, lsb, st, ids, res8)

    def op_bwd(r, ct):
        meta, blob, lsb, st, ids, res8 = r
        din, dgeo, dscal = _bwd_pallas_call(
            meta, blob, lsb, st, ids, res8, ct, n_tiles=n_tiles,
            n_scal=n_scal, stat=stat, interpret=interpret)
        d_blob, d_prims = _grads_from_bwd(
            meta, blob, res8, dgeo, dscal, n_mats=n_mats,
            n_light_slots=n_light_slots, n_blocks=n_blocks, block=block)
        return (None, d_blob, None, d_prims, None, None, din, None, None)

    op.defvjp(op_fwd, op_bwd)
    return op


# ---------------------------------------------------------------------------
# custom_vjp bounce op
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _bounce_op(k, n_tiles, n_nodes, n_blocks, block, n_mats, mtypes,
               n_light_slots, rr_depth, use_nee, use_mis, sky_mode,
               block_prim_ids_key, precull, tcull, interpret):
    """Cached differentiable bounce op for one static configuration.

    ``block_prim_ids_key`` is only part of the cache key (the actual map is
    re-read from _BLOCK_IDS below) so two scenes with different leaf
    layouts don't share an op.
    """
    n_rows = (n_tiles + 1) * TILE_ROWS
    n_scal = physics.N_SKY_ATTRS + 8 * n_mats + 7 * n_light_slots
    stat = dict(k=k, n_mats=n_mats, mtypes=mtypes,
                n_light_slots=n_light_slots, rr_depth=rr_depth,
                use_nee=use_nee, use_mis=use_mis, sky_mode=sky_mode)

    def _redirect(i, m, *r):
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    def _redirect2(i, m, *r):
        return (jnp.where(i < m[3], i, n_tiles), 0, 0)

    if precull:
        cand_specs = [
            pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_blocks), _redirect2,
                         memory_space=pltpu.SMEM),
        ]
    else:
        cand_specs = [
            pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ]

    def fwd_call(meta, blob, lsb, nodef, nodei, prims, cand, ctn, st,
                 ids):
        return pl.pallas_call(
            functools.partial(_bounce_fwd_kernel, n_nodes=n_nodes,
                              block=block, precull=precull, tcull=tcull,
                              **stat),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # nodef
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # nodei
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                    *cand_specs,
                    pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((N_RES, TILE_ROWS, TILE_LANES), _redirect,
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[pltpu.SMEM((max(n_blocks, 1),), jnp.int32)],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((N_CH, n_rows, TILE_LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((N_RES, n_rows, TILE_LANES),
                                     jnp.float32),
            ],
            # State rides aliased (the dead suffix is preserved in place);
            # XLA copies the operand where the saved residual keeps it live.
            input_output_aliases={8: 0},
            interpret=interpret,
        )(meta, blob, lsb, nodef, nodei, prims, cand, ctn, st,
          ids)

    @jax.custom_vjp
    def op(meta, blob, lsb, nodef, nodei, prims, cand, ctn, st, ids):
        out, _ = fwd_call(meta, blob, lsb, nodef, nodei, prims, cand, ctn,
                          st, ids)
        return out

    def op_fwd(meta, blob, lsb, nodef, nodei, prims, cand, ctn, st, ids):
        out, res = fwd_call(meta, blob, lsb, nodef, nodei, prims, cand, ctn,
                            st, ids)
        return out, (meta, blob, lsb, nodef, nodei, prims, st, ids, res)

    def op_bwd(r, ct):
        meta, blob, lsb, nodef, nodei, prims, st, ids, res = r
        din, dgeo, dscal = _bwd_pallas_call(
            meta, blob, lsb, st, ids, res, ct, n_tiles=n_tiles,
            n_scal=n_scal, stat=stat, interpret=interpret)
        d_blob, d_prims = _grads_from_bwd(
            meta, blob, res, dgeo, dscal, n_mats=n_mats,
            n_light_slots=n_light_slots, n_blocks=n_blocks, block=block)
        return (None, d_blob, None, jnp.zeros_like(nodef),
                None, d_prims, None, None, din, None)

    op.defvjp(op_fwd, op_bwd)
    return op


# ---------------------------------------------------------------------------
# Differentiable launch + public render-fn factory
# ---------------------------------------------------------------------------

def _run_wavefront_diff(blob, meta, nodef, nodei, prims, env, *, width,
                        height, chunk_spp, block, n_mats, mtypes,
                        n_light_slots, max_bounces, rr_depth, use_nee,
                        use_mis, sky_mode, dof, sort_every, qbits, dir_major,
                        dbits, compact, precull, tcull, split,
                        sort_min_rays, interpret, bpi_key):
    """One differentiable wavefront chunk -> (H, W, 3) radiance sum."""
    from .wavefront import (_isect_kernel, _precull_rays, _shadow_rays_xla,
                            TILE_LANES)
    n_nodes = nodef.shape[0] // 8
    n_blocks = prims.shape[0]
    n_rows_all = None
    lsb = jax.lax.stop_gradient(physics.lsel_bounds_from_prims(prims))
    st, ids, n_tiles = _raygen_launch(
        meta, jax.lax.stop_gradient(blob), width=width, height=height,
        chunk_spp=chunk_spp, dof=dof, interpret=interpret)
    n_rows_all = (n_tiles + 1) * TILE_ROWS
    lo, ext = _scene_sort_bounds(jax.lax.stop_gradient(nodef))
    if precull or split:
        lob, hib = _leaf_block_bounds(jax.lax.stop_gradient(prims))

    def _redirect(i, m, *r):
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    def _redirect2(i, m, *r):
        return (jnp.where(i < m[3], i, n_tiles), 0, 0)

    nalive = jnp.int32(n_tiles)
    first_sort = True
    for k in range(max_bounces):
        if sort_every and k and (k - 1) % sort_every == 0:
            # diff=True routes through the custom-vjp variadic sort
            # (wavefront._sort_channels_vjp): one lax.sort carrying an
            # iota forward, a second variadic sort un-permuting the
            # cotangents backward — replacing argsort+take, whose ~2 GB/s
            # permutation gather (and its scatter transpose) dominated
            # the r4 grad pipeline (VERDICT r4 next #2).  r5 also ports
            # the non-diff launcher's tiered prefix sorts and the
            # below-min skip: after the first full sort the stream is
            # [live | dead | pad], so once the compaction boundary fits
            # a static prefix only that prefix sorts (both directions —
            # the cotangent un-sort covers the same slice), and sorts
            # stop entirely once alive < sort_min_rays (the kept
            # boundary stays conservative: rays die monotonically).
            def do_sort(ops):
                return _sort_rays(ops[0], ops[1], lo, ext, qbits,
                                  dir_major, dbits, variadic=True,
                                  diff=True)

            def no_sort(ops):
                return ops[0], ops[1], nalive

            def prefix_sort(t_pre):
                rows = t_pre * TILE_ROWS

                def f(ops):
                    sp, ip, na = _sort_rays(
                        ops[0][:, :rows], ops[1][:, :rows], lo, ext,
                        qbits, dir_major, dbits, variadic=True, diff=True)
                    return (jax.lax.dynamic_update_slice(
                                ops[0], sp, (0, 0, 0)),
                            jax.lax.dynamic_update_slice(
                                ops[1], ip, (0, 0, 0)), na)

                return f

            if compact and not first_sort:
                t_half = max(1, (n_tiles + 1) // 2)
                t_quarter = max(1, (n_tiles + 1) // 4)

                def tiered(ops):
                    return jax.lax.cond(
                        nalive <= t_quarter, prefix_sort(t_quarter),
                        lambda o: jax.lax.cond(
                            nalive <= t_half, prefix_sort(t_half),
                            do_sort, o),
                        ops)

                sort_fn = tiered
            else:
                sort_fn = do_sort
            st, ids, na = jax.lax.cond(
                nalive * TILE > sort_min_rays, sort_fn, no_sort, (st, ids))
            first_sort = False
            if compact:
                nalive = na
        meta4 = jnp.concatenate([meta[:3], nalive.reshape(1)])
        if split:
            # Split bounce under grad: intersect + shadow precull run on
            # DETACHED values (pure hit/occluder selection — the same
            # detached-selection estimator as the backward replay);
            # gradients flow through the shade op's rebuilt winner.
            st_d = jax.lax.stop_gradient(st)
            prims_d = jax.lax.stop_gradient(prims)
            cand, ctn = _precull(st_d, lob, hib, n_tiles)
            res = pl.pallas_call(
                functools.partial(_isect_kernel, block=block, tcull=tcull),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                        pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((1, 1, n_blocks), _redirect2,
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES),
                                     _redirect, memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((N_RES, TILE_ROWS, TILE_LANES),
                                           _redirect,
                                           memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (N_RES, n_rows_all, TILE_LANES), jnp.float32),
                interpret=interpret,
            )(meta4, prims_d, cand, ctn, st_d)
            if use_nee and n_light_slots:
                so3, sd3, stmax, sneed = _shadow_rays_xla(
                    st_d, ids, res, jax.lax.stop_gradient(blob), lsb,
                    meta[2], k=k, seed=meta[1], n_mats=n_mats,
                    mtypes=mtypes, n_light_slots=n_light_slots)
                scand, sctn = _precull_rays(so3, sd3, sneed, stmax, lob,
                                            hib, n_tiles)
            else:
                scand = jnp.zeros((1, 1, 1), jnp.int32)
                sctn = jnp.zeros((1, 1, 1), jnp.float32)
            op = _shade_op(k, n_tiles, n_blocks, block, n_mats, mtypes,
                           n_light_slots, rr_depth, use_nee, use_mis,
                           sky_mode, bpi_key, interpret)
            st = op(meta4, blob, lsb, prims, scand, sctn, st, ids, res)
        else:
            if precull:
                cand, ctn = _precull(jax.lax.stop_gradient(st), lob, hib,
                                     n_tiles)
            else:
                cand = jnp.zeros((1, 1, 1), jnp.int32)
                ctn = jnp.zeros((1, 1, 1), jnp.float32)
            op = _bounce_op(k, n_tiles, n_nodes, n_blocks, block, n_mats,
                            mtypes, n_light_slots, rr_depth, use_nee,
                            use_mis, sky_mode, bpi_key, precull, tcull,
                            interpret)
            st = op(meta4, blob, lsb, nodef, nodei, prims, cand, ctn,
                    st, ids)
        if sky_mode == physics.SKY_ENVMAP:
            st = _add_env_radiance(st, env)
    return _scatter_image(st, ids, width, height)


def make_wavefront_render_fn(scene: SceneData, camera, width: int,
                             height: int, *, spp: int, max_bounces: int = 8,
                             rr_depth: int = 3, use_nee: bool = True,
                             use_mis: bool = True, seed: int = 0,
                             sort_every: int = 1, qbits: int = Q_BITS,
                             dir_major: bool = True, dbits: int = D_BITS,
                             block: int = BLOCK, compact: bool = True,
                             precull: bool = True, tcull: bool = True,
                             split: bool = True,
                             sort_min_rays: int = 1 << 17,
                             chunk_rays: int = 2 << 20,
                             interpret: bool = False):
    """render(params, start_sample) -> (H, W, 3) mean radiance,
    differentiable end-to-end via jax.grad.

    ``params`` may contain any subset of diff/pallas_diff.PARAM_KEYS.
    Geometry params trigger a traceable AABB refit of the walk tables
    (megakernel_bvh.refit_nodef_jnp).  Gradients reach scene parameters
    through the traced packers' own VJPs.
    """
    from ..diff import gradients as G

    blob0, meta3, nodef0, nodei, _prims0, static = _packed(
        scene, camera, block)
    dof = bool(np.asarray(blob0)[13] > 0.0)
    env = scene.env_map
    if env is None or scene.sky_mode != physics.SKY_ENVMAP:
        env = jnp.zeros((1, 1, 3), jnp.float32)
    tiles_per_img = pl.cdiv(width, TW) * pl.cdiv(height, TH)
    rays_per_img = tiles_per_img * TILE
    chunk_spp = max(1, min(spp, chunk_rays // rays_per_img))
    bpi_key = static["block_prim_ids"].tobytes()
    kw = dict(width=width, height=height, block=static["block"],
              n_mats=static["n_mats"], mtypes=static["mtypes"],
              n_light_slots=static["n_light_slots"],
              max_bounces=max_bounces, rr_depth=rr_depth,
              use_nee=bool(use_nee), use_mis=bool(use_mis),
              sky_mode=scene.sky_mode, dof=dof,
              sort_every=int(sort_every), qbits=int(qbits),
              dir_major=bool(dir_major), dbits=int(dbits),
              compact=bool(compact), precull=bool(precull),
              tcull=bool(tcull), split=bool(split),
              sort_min_rays=int(sort_min_rays), interpret=interpret,
              bpi_key=bpi_key)
    inv_spp = 1.0 / spp
    meta0 = jnp.asarray([0, seed, int(meta3[2])], jnp.int32)

    def render(params, start_sample):
        sc = G.apply_params(scene, params)
        if "centers" in params or "radii" in params:
            nodef = refit_nodef_jnp(sc, static)
        else:
            nodef = nodef0
        blob = pack_blob_jnp(sc, camera, static)
        prims = pack_prims_jnp(sc, static)
        img = None
        s = 0
        while s < spp:
            n = min(chunk_spp, spp - s)
            meta = meta0.at[0].set(
                jnp.asarray(start_sample, jnp.int32) + s)
            part = _run_wavefront_diff(
                blob, meta, jnp.asarray(nodef), jnp.asarray(nodei), prims,
                env, chunk_spp=n, **kw)
            img = part if img is None else img + part
            s += n
        return img * inv_spp

    return render
