"""Sorted-wavefront renderer — the large-scene engine (split-bounce r4).

The full-depth BVH megakernel (megakernel_bvh.py) packet-walks the tree with
ONE scalar pointer per 1024-ray tile, so its culling is exactly as good as
the packet is coherent: primary packets cull well, but after one diffuse
bounce a 32x32-pixel packet's rays point everywhere.  This module is the
designed fix (SURVEY.md §2.4 PP row): split the render at bounce
boundaries, re-sort the ray stream between bounces so every packet is
coherent again, and do ALL structure culling in plain XLA between kernels
so no Pallas kernel ever walks a tree:

  raygen -> [ variadic sort (alive-first, octant, origin-morton)
              -> XLA precull: per-lane slab tests vs every leaf block
                 -> per-tile nearest-first candidate lists (SMEM)
              -> intersect kernel: sync-free candidate sweep, winner
                 residuals to HBM
              -> XLA: reconstruct each lane's NEE shadow ray from the
                 residuals (physics.nee_shadow_setup — bit-identical to
                 the kernel's own reconstruction) and precull it with the
                 light-distance bound
              -> shade kernel: rebuilt-winner intersector (no traversal)
                 + any-hit sweep of the shadow candidate list with a
                 nearest-first distance cut
            ] x depth
         -> scatter-add by pixel id

r4 findings that shaped this (all measured on config 5, 10k prims, 1080p,
tools/profile_wavefront2.py + sweep_config5.py):

* The r3 in-kernel walk was a serial per-node scalar dependence chain
  (~1 us/node); replacing nearest-hit traversal with the XLA precull +
  candidate sweep removed it, at which point the NEE occlusion walk was
  60-87% of every bounce kernel — hence the shadow precull and the
  cell-keyed light selection (physics.LSEL_CELLS) that makes a tile's
  shadow rays one narrow cone.
* The sort: argsort is cheap (15 ms @ 4M rays); the per-channel
  permutation GATHER was the cost (157 ms, 4-byte random loads).  One
  variadic lax.sort carrying all 19 channels runs 80 ms (the transposed
  row-gather loses too: its (r, 21) layout pads to 128 lanes).  Late
  sorts are skipped once the alive population falls under
  ``sort_min_rays`` (the sort costs full-stream regardless of
  aliveness; the kernels already track the alive prefix).
* Blocks: with the walk gone, finer leaf blocks win again —
  block=128 + qbits=5 measures 3.17 s vs r3's 6.69 s (walk, block=256).
* ``dbits`` (direction-magnitude sort bits) still lose (4.02 s) and
  ``sort_every=2`` still loses (4.51 s): origin coherence is
  load-bearing for the precull exactly as it was for the walk.

Invariants: every sample site keys its RNG on the (pixel, sample) ids
carried with the ray plus, for the light pick, the shading-point cell —
all pure functions, so any permutation of the stream produces identical
radiance per ray (tests/test_wavefront.py pins sorted == unsorted ==
megakernel, split == fused).  Compaction is the sort itself: RR
casualties sort past an alive-prefix boundary whose grid steps redirect
to a pad tile (DMAs elided; state preserved through the in/out alias).

The reference's analog of this whole file is the serial per-pixel loop at
/root/reference/libs/render/src/engines/pathtracer/backends/cpu/
CPUPathTracer.cpp:57-82 — the wavefront re-organization is the TPU-native
answer to what Embree's internal packet/stream API (rtcIntersect1 at :227)
does for CPU SIMD.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng
from ..core.scene import SceneData
from . import physics
from .megakernel import _SKY_OFF
from ..core.materials import DIELECTRIC
from .megakernel_bvh import (BIG, BLOCK, TMIN, _MAT_OFF, _MAT_STRIDE, TILE,
                             TILE_LANES, TILE_ROWS, TW, TH,
                             _cand_sweep_anyhit, _cand_sweep_anyhit_rows,
                             _cand_sweep_nearest, _cand_sweep_nearest_rows,
                             _make_intersectors, _packed, build_cmat)
from .megakernel_bvh_grad import _read_mats, _rebuilt_intersect
from .megakernel_grad import _raygen, _uniforms

# State-tensor channel layout (all f32).
C_OX, C_OY, C_OZ, C_DX, C_DY, C_DZ = range(6)
C_TR, C_TG, C_TB = 6, 7, 8
C_LR, C_LG, C_LB = 9, 10, 11
C_PDF = 12
C_ALIVE, C_SPEC, C_INIMG = 13, 14, 15
C_MISS = 16     # missed-this-bounce flag: the env-map hook consumes + clears
N_CH = 17

Q_BITS = 4   # morton bits per origin axis in the sort key (measured on the
             # 10k-prim 1080p config: dir-major 4/6 bits = 8.75/8.73s vs
             # origin-major 4/5/6 = 11.07/11.37/11.46 and no-sort 22.5s —
             # culling saturates at 4 bits; the knob stays for other scenes)
D_BITS = 0   # fine direction bits per axis (dir-major only).  The idea:
             # octant alone bounds the SIGN of each direction component
             # but not the magnitude, so extra magnitude bits narrow a
             # packet's cone and let the frustum filter cull.  Measured
             # reality (config 5): dbits=2 is SLOWER (12.5 vs 10.6 s —
             # direction-tight packets scatter origins, and origin
             # coherence is worth more).  The r3-era hardware-only
             # divergence (~4% of pixels wrong with dbits=2 while
             # interpret was bit-exact) was ROOT-CAUSED in r5 by
             # bisection (tools/bisect_dbits.py, DBITS_BISECT.json):
             # it does NOT reproduce on the r4+ split-bounce engine —
             # dbits=0 vs dbits=2 is bit-identical on the chip both at
             # the original 300-prim repro conditions and at 2k prims
             # (split and fused variants).  The divergence was a
             # property of the retired r3 fused-walk bounce kernel,
             # whose skip-store control paths flushed stale out-blocks
             # when the permutation changed which grid steps stored
             # (CLAUDE.md's stale-out-block class); the r4 rewrite
             # zero-fills flag channels on every control path.  Default
             # 0 purely on the speed measurement.


def _live_bits(qbits: int, dbits: int) -> int:
    bits = 3 * qbits + 3 + 3 * dbits
    if bits + 2 > 31:
        raise ValueError(
            f"sort key needs {bits}+2 bits; qbits+dbits must be <= 8 "
            f"(got qbits={qbits}, dbits={dbits})")
    return bits


def _dead_key(qbits: int, dbits: int):
    """Sentinel sorting after every live key.

    Derived from the key width so compaction (n_alive = #keys < dead)
    stays correct for any exposed qbits/dbits: a fixed sentinel would
    collide with live keys once they reach its bit position, silently
    freezing the rays that land past the compaction boundary (ADVICE r2,
    medium).
    """
    return jnp.int32(1 << _live_bits(qbits, dbits))


def _pad_key(qbits: int, dbits: int):
    """Out-of-image lanes: sort after DEAD too, so the stream's last tile is
    always discardable (the compaction pad target, see _sort_rays)."""
    return jnp.int32(1 << (_live_bits(qbits, dbits) + 1))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _raygen_kernel(meta_ref, blob_ref, st_ref, ids_ref, *, width, height,
                   tiles_x, tiles_per_img, n_real_tiles, dof):
    """Initial ray state for one (8, 128) tile, swizzled 32x32 pixel blocks.

    The last grid step (``tile == n_real_tiles``) writes the compaction pad
    tile: all flags zero, so its lanes sort with ``PAD_KEY`` and scatter
    into the discard slot.
    """
    tile = pl.program_id(0)
    start_sample = meta_ref[0]
    seed = meta_ref[1].astype(jnp.uint32)
    s_idx = tile // tiles_per_img
    timg = tile % tiles_per_img
    sample_scalar = (start_sample + s_idx).astype(jnp.uint32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
    lin = rows * TILE_LANES + lanes
    tx = timg % tiles_x
    ty = timg // tiles_x
    px = tx * TW + lin % TW
    py = ty * TH + lin // TW
    in_image = (px < width) & (py < height) & (tile < n_real_tiles)
    pxc = jnp.minimum(px, width - 1)
    pyc = jnp.minimum(py, height - 1)
    pid = (pyc * width + pxc).astype(jnp.uint32)
    sample = jnp.broadcast_to(sample_scalar, pid.shape)

    ox, oy, oz, dx, dy, dz = _raygen(blob_ref, pid, pxc, pyc, sample, seed,
                                     width, height, dof=dof)
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    img_f = in_image.astype(jnp.float32)
    for c, v in enumerate((ox, oy, oz, dx, dy, dz, one, one, one,
                           zero, zero, zero, zero, img_f, one, img_f, zero)):
        st_ref[c] = v
    ids_ref[0] = pid.astype(jnp.int32)
    ids_ref[1] = sample.astype(jnp.int32)


def _bounce_kernel(meta_ref, blob_ref, lsb_ref, nodef_ref, nodei_ref,
                   prim_ref, cand_ref, ctn_ref, st_ref, ids_ref, out_ref,
                   blk_scr, *, k, n_nodes, block, n_mats, mtypes,
                   n_light_slots, rr_depth, use_nee, use_mis, sky_mode,
                   precull, tcull):
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    # Grid steps past the alive-prefix boundary read AND write the pad tile
    # (their real blocks are untouched thanks to input/output aliasing) —
    # skip the physics so they cost an elided DMA and no compute.
    in_region = pl.program_id(0) < meta_ref[3]
    alive = st_ref[C_ALIVE] > 0.5
    any_alive = jnp.any(alive)

    @pl.when(jnp.logical_not(in_region))
    def _():
        # The out VMEM buffer is stale here (typically a copy of the last
        # real tile's output, with in-image flags and real pixel ids); it
        # flushes to the pad tile when the grid ends.  Zero the flags so
        # those lanes can neither scatter into the image nor re-enter the
        # next sort's alive prefix as duplicate rays.  (Interpret mode
        # zero-fills outputs, which hides this — hardware does not.)
        zeros = jnp.zeros_like(st_ref[C_ALIVE])
        out_ref[C_ALIVE] = zeros
        out_ref[C_INIMG] = zeros
        out_ref[C_MISS] = zeros

    @pl.when(in_region & jnp.logical_not(any_alive))
    def _():   # dead tile inside the prefix: copy state through untouched
        for c in range(N_CH):
            out_ref[c] = st_ref[c]
        out_ref[C_MISS] = jnp.zeros_like(st_ref[C_MISS])

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
        n_blocks = prim_ref.shape[0]
        intersect_fn, occluded_fn = _make_intersectors(
            blob_ref, nodef_ref, nodei_ref, prim_ref, blk_scr, n_nodes,
            block, n_mats, mtypes, frustum=k == 0,
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
                           else jnp.zeros_like(st_ref[C_MISS]))


# ---------------------------------------------------------------------------
# XLA precull: per-tile candidate-block lists (replaces the in-kernel walk)
# ---------------------------------------------------------------------------

PRECULL_TILE_CHUNK = 64   # tiles per lax.map step; bounds the fused
                          # (chunk, 1024, n_blocks) intermediate to ~tens
                          # of MB even if XLA materializes it


def _leaf_block_bounds(prims):
    """Per-leaf-block AABBs from the packed prim table: (n_blocks, 3) x2.

    Padding slots carry the mid == -1 sentinel (and r == 0); they are
    masked so an underfull block's box is tight.  Works on traced tables
    (pack_prims_jnp) so the grad path's refit scenes precull correctly.
    """
    valid = prims[:, 4, :] >= 0.0                       # (n_blocks, block)
    big = jnp.float32(3e38)
    c = prims[:, 0:3, :]                                # (n_blocks, 3, blk)
    r = prims[:, 3:4, :]
    lo = jnp.min(jnp.where(valid[:, None, :], c - r, big), axis=2)
    hi = jnp.max(jnp.where(valid[:, None, :], c + r, -big), axis=2)
    return lo, hi


def _precull_rays(o3, d3, act, tmax, lob, hib, n_tiles, per_row=False):
    """Per-ray slab precull of arbitrary rays -> per-tile candidate lists.

    Generalized core of ``_precull``: ``o3``/``d3`` are 3-tuples of
    (rows, 128) components, ``act`` a (rows, 128) 0/1 mask, ``tmax`` an
    optional (rows, 128) per-ray upper bound (the SHADOW precull's light
    distance — it makes shadow lists far tighter than the nearest-hit
    lists, whose bound is unknown before intersection).  Returns
    (cand, ctn) in the kernel SMEM layout (see ``_precull``).

    ``per_row`` (r5) aggregates per 128-lane ROW instead of per 1024-lane
    tile: a sorted row spans 1/8th of the tile's morton range, so its
    candidate union and nearest-first distance bounds are much tighter —
    the r4 profile's per-tile shadow unions averaged 45-52 of 64 blocks
    (ARCHITECTURE.md); rows cut both the list lengths and how far the
    in-kernel distance cut lets the sweep run.  Layout becomes
    (n_tiles+1, 8, nb+1) / (n_tiles+1, 8, nb) — the (8, cols) trailing
    dims still satisfy Mosaic's last-two-dims rule.
    """
    nb = lob.shape[0]
    chunk = PRECULL_TILE_CHUNK
    n_chunks = -(-(n_tiles + 1) // chunk)
    pad_tiles = n_chunks * chunk - (n_tiles + 1)
    big = jnp.float32(BIG)

    def grab(v):
        v = v.reshape(-1, TILE)
        if pad_tiles:
            v = jnp.pad(v, ((0, pad_tiles), (0, 0)))
        return v.reshape(n_chunks, chunk, TILE)

    o3 = tuple(grab(v) for v in o3)
    d3 = tuple(grab(v) for v in d3)
    act = grab(act)
    tmax = grab(tmax) if tmax is not None else None
    glen = TILE_LANES if per_row else TILE           # aggregation group
    n_grp = TILE // glen                             # groups per tile

    def one_chunk(args):
        def live(args):
            o3, d3, act, tm = args
            tn = jnp.full((chunk, TILE, nb), -big)
            tf = jnp.full((chunk, TILE, nb), big)
            for a in range(3):
                o = o3[a][:, :, None]
                iv = jnp.where(jnp.abs(d3[a]) > 1e-20,
                               1.0 / jnp.where(jnp.abs(d3[a]) > 1e-20,
                                               d3[a], 1.0),
                               jnp.float32(3e38))[:, :, None]
                t0 = (lob[None, None, :, a] - o) * iv
                t1 = (hib[None, None, :, a] - o) * iv
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            hit = (tn <= tf) & (tf > TMIN) & (act[:, :, None] > 0.5)
            if tm is not None:
                hit = hit & (tn < tm[:, :, None])
            tnc = jnp.where(hit, jnp.maximum(tn, 0.0), big)
            grp_tn = jnp.min(tnc.reshape(chunk, n_grp, glen, nb), axis=2)
            order = jnp.argsort(grp_tn, axis=-1)
            s_tn = jnp.take_along_axis(grp_tn, order, axis=-1)
            n_cand = jnp.sum((grp_tn < big).astype(jnp.int32), axis=-1)
            ids = jnp.where(s_tn < big, order.astype(jnp.int32), -1)
            return (jnp.concatenate([n_cand[..., None], ids], axis=-1),
                    s_tn)

        def dead(args):
            return (jnp.concatenate(
                [jnp.zeros((chunk, n_grp, 1), jnp.int32),
                 jnp.full((chunk, n_grp, nb), -1, jnp.int32)], axis=-1),
                jnp.full((chunk, n_grp, nb), big))

        # Post-compaction, whole chunks of tiles are dead (the sorted
        # suffix); the slab-test block is the precull's entire cost, so
        # skip it where nothing is alive — precull cost tracks the alive
        # population like the kernel's redirect does.
        return jax.lax.cond(jnp.any(args[2] > 0.5), live, dead, args)

    cand, ctn = jax.lax.map(one_chunk, (o3, d3, act, tmax))
    cand = cand.reshape(n_chunks * chunk, n_grp, nb + 1)[:n_tiles + 1]
    ctn = ctn.reshape(n_chunks * chunk, n_grp, nb)[:n_tiles + 1]
    # Pad tile: empty list (its grid steps are skipped anyway).
    cand = cand.at[n_tiles].set(
        jnp.concatenate([jnp.zeros((n_grp, 1), jnp.int32),
                         jnp.full((n_grp, nb), -1, jnp.int32)], axis=-1))
    # 3-D (rows, groups, cols): the Mosaic lowering requires each of the
    # last two BLOCK dims to divide (8, 128) or equal the full dim — a
    # middle 1-or-8 + full trailing dim satisfies it for any nb.
    return cand, ctn


def _precull(st, lob, hib, n_tiles, per_row=False):
    """Exact per-lane AABB precull of the stream's NEXT-bounce rays.

    For every (8, 128) ray tile, slab-test each of its 1024 rays against
    every leaf-block AABB in plain XLA (pure VPU throughput, ~30 flops per
    (ray, block) pair, no scalar-unit syncs anywhere) and aggregate per
    tile: a block is a candidate iff ANY live lane's slab interval is
    non-empty — exactly the per-lane test the in-kernel walk would have
    done at the leaf, so culling is never worse than the walk's (which
    also paid a vector->scalar sync per internal node to find out).

    Returns
      cand (n_tiles + 1, 1, max_cand + 1) i32 — [t, 0, 0] = count,
          [t, 0, 1:] = block ids sorted nearest-first by ``ctn``; row
          n_tiles (the compaction pad tile) is empty.
      ctn  (n_tiles + 1, 1, max_cand) f32 — lower bound on any hit t in
          the matching candidate (min over hitting lanes of AABB entry t,
          clamped >= 0), BIG past the count.  Nondecreasing per row — the
          kernel's early-exit contract (_cand_sweep_nearest).
    """
    return _precull_rays((st[C_OX], st[C_OY], st[C_OZ]),
                         (st[C_DX], st[C_DY], st[C_DZ]),
                         st[C_ALIVE], None, lob, hib, n_tiles,
                         per_row=per_row)


def _shadow_rays_xla(st, ids, res, blob, lsb, nl, *, k, seed, n_mats,
                     mtypes, n_light_slots):
    """Reconstruct every lane's NEE shadow ray in XLA from the intersect
    kernel's winner residuals — the split-bounce midpoint.

    Re-derives the hit point exactly as the shade kernel will (the same
    sphere quadratic on the same f32 winner, the same shading-normal
    flip), then runs the SAME ``physics.nee_shadow_setup`` the kernel
    runs — identical RNG streams (pid/sample ride in ``ids``), identical
    float ops — so the shadow precull covers exactly the rays the kernel
    tests.  Stale suffix rows are harmless: ``need`` is gated on the
    (always-valid, aliased) alive flag, and every garbage-fed value dies
    in a ``where`` against it.

    Returns (o3, d3, tmax, need01) for ``_precull_rays``.
    """
    alive = st[C_ALIVE] > 0.5
    ox, oy, oz = st[C_OX], st[C_OY], st[C_OZ]
    dx, dy, dz = st[C_DX], st[C_DY], st[C_DZ]
    hcx, hcy, hcz, hr, hmid = res[0], res[1], res[2], res[3], res[4]
    hit = alive & (hmid >= 0.0)

    # Winner-sphere t, exactly the sweep's formula on the same inputs.
    ocx, ocy, ocz = hcx - ox, hcy - oy, hcz - oz
    b = dx * ocx + dy * ocy + dz * ocz
    cterm = ocx * ocx + ocy * ocy + ocz * ocz - hr * hr
    disc = b * b - cterm
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(jnp.where(pos, disc, 1.0), 1e-12))
    t = jnp.where(b - sq > TMIN, b - sq, b + sq)

    t_safe = jnp.where(hit, t, 1.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz
    ngx, ngy, ngz = physics._normalize(hx - hcx, hy - hcy, hz - hcz)
    wox, woy, woz = -dx, -dy, -dz
    front = wox * ngx + woy * ngy + woz * ngz > 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nsx, nsy, nsz = ngx * sgn, ngy * sgn, ngz * sgn

    mt = jnp.asarray(mtypes + (0,), jnp.int32)[
        jnp.clip(hmid.astype(jnp.int32), 0, max(n_mats, 1))]
    spec_new = hit & (mt == DIELECTRIC)
    need = hit & ~spec_new

    pid = ids[0].astype(jnp.uint32)
    sample = ids[1].astype(jnp.uint32)
    u = _uniforms(pid, sample, jnp.asarray(seed, jnp.uint32), k,
                  (lsb[0], lsb[1], lsb[2], lsb[3], lsb[4], lsb[5]))
    light_off = _MAT_OFF + _MAT_STRIDE * n_mats
    lights = tuple(
        tuple(blob[light_off + 7 * l + a] for a in range(7))
        for l in range(n_light_slots))
    nlf = jnp.maximum(nl.astype(jnp.float32), 1.0)
    (pox, poy, poz, ldx, ldy, ldz, t_l, _pdf_l, _inside,
     _ler, _leg, _leb) = physics.nee_shadow_setup(
        ox, oy, oz, hx, hy, hz, nsx, nsy, nsz, u, lights, nl, nlf, k)
    return ((pox, poy, poz), (ldx, ldy, ldz), t_l - 1e-3,
            need.astype(jnp.float32))


def _winner_t(st, res):
    """Re-derive the winner hit distance from the intersect-kernel
    residuals in XLA — exactly the sweep's quadratic on the same f32
    winner (the _shadow_rays_xla reconstruction).  BIG where the lane is
    dead or missed; the prim-sharded merge argmins this across shards."""
    ox, oy, oz = st[C_OX], st[C_OY], st[C_OZ]
    dx, dy, dz = st[C_DX], st[C_DY], st[C_DZ]
    hcx, hcy, hcz, hr, hmid = res[0], res[1], res[2], res[3], res[4]
    hit = (st[C_ALIVE] > 0.5) & (hmid >= 0.0)
    ocx, ocy, ocz = hcx - ox, hcy - oy, hcz - oz
    b = dx * ocx + dy * ocy + dz * ocz
    cterm = ocx * ocx + ocy * ocy + ocz * ocz - hr * hr
    disc = b * b - cterm
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(jnp.where(pos, disc, 1.0), 1e-12))
    t = jnp.where(b - sq > TMIN, b - sq, b + sq)
    return jnp.where(hit, t, jnp.float32(BIG))


def _isect_kernel(meta_ref, prim_ref, cand_ref, ctn_ref, st_ref, res_ref, *,
                  block, tcull):
    """Split-bounce phase 1: nearest-hit candidate sweep -> winner record.

    Writes the same 8-channel residual row the grad kernels use (hcx hcy
    hcz hr hmid hblk hslot, ch7 spare).  Skipped/dead tiles flush hmid=-1
    rows so downstream consumers never see a stale winner (the alive flag
    in the aliased state tensor is the authoritative gate anyway).
    """
    in_region = pl.program_id(0) < meta_ref[3]
    alive = st_ref[C_ALIVE] > 0.5
    zeros = jnp.zeros_like(st_ref[C_ALIVE])
    run = in_region & jnp.any(alive)

    @pl.when(jnp.logical_not(run))
    def _():
        for c in range(8):
            res_ref[c] = zeros
        res_ref[4] = zeros - 1.0

    @pl.when(run)
    def _():
        n_blocks = prim_ref.shape[0]
        out = _cand_sweep_nearest(
            prim_ref, cand_ref, ctn_ref, st_ref[C_OX], st_ref[C_OY],
            st_ref[C_OZ], st_ref[C_DX], st_ref[C_DY], st_ref[C_DZ],
            alive, block, n_blocks, with_ids=True, tcull=tcull)
        t = out[0]
        for c, v in enumerate(out[1:]):   # hcx hcy hcz hr hmid hblk hslot
            res_ref[c] = v
        res_ref[4] = jnp.where(t < jnp.float32(BIG), res_ref[4], -1.0)
        res_ref[7] = zeros


def _isect_kernel_mxu(meta_ref, prim_ref, cmat_ref, bctr_ref, cand_ref,
                      ctn_ref, st_ref, res_ref, *, block, tcull):
    """r5 MXU variant of ``_isect_kernel``: per-row candidate lists swept
    with the matmul quadratic form (megakernel_bvh.build_cmat docstring).
    Residual contract is identical; winner values come from the one-hot
    extraction matmul against the same global prim table."""
    in_region = pl.program_id(0) < meta_ref[3]
    alive = st_ref[C_ALIVE] > 0.5
    zeros = jnp.zeros_like(st_ref[C_ALIVE])
    run = in_region & jnp.any(alive)

    @pl.when(jnp.logical_not(run))
    def _():
        for c in range(8):
            res_ref[c] = zeros
        res_ref[4] = zeros - 1.0

    @pl.when(run)
    def _():
        n_blocks = prim_ref.shape[0]
        out = _cand_sweep_nearest_rows(
            prim_ref, cmat_ref, bctr_ref, cand_ref, ctn_ref, st_ref[C_OX],
            st_ref[C_OY], st_ref[C_OZ], st_ref[C_DX], st_ref[C_DY],
            st_ref[C_DZ], alive, block, n_blocks, with_ids=True,
            tcull=tcull)
        t = out[0]
        for c, v in enumerate(out[1:]):   # hcx hcy hcz hr hmid hblk hslot
            res_ref[c] = v
        res_ref[4] = jnp.where(t < jnp.float32(BIG), res_ref[4], -1.0)
        res_ref[7] = zeros


def _anyhit_kernel(meta_ref, prim_ref, scand_ref, sctn_ref, sray_ref,
                   blk_ref, *, block):
    """Occlusion-only kernel: sweep the shadow candidate lists for rays
    given as an 8-channel tensor [pox poy poz ldx ldy ldz tmax need].

    The prim-sharded wavefront (parallel/wavefront_prim.py) needs each
    prim shard's LOCAL blocked verdict as a standalone tensor so a pmax
    over the prim axis can merge them before shading — the fused
    shade-kernel sweep cannot emit a per-shard partial."""
    in_region = pl.program_id(0) < meta_ref[3]
    need = sray_ref[7] > 0.5
    run = in_region & jnp.any(need)

    @pl.when(jnp.logical_not(run))
    def _():
        blk_ref[0] = jnp.zeros_like(sray_ref[0])

    @pl.when(run)
    def _():
        blocked = _cand_sweep_anyhit(
            prim_ref, scand_ref, sctn_ref, sray_ref[0], sray_ref[1],
            sray_ref[2], sray_ref[3], sray_ref[4], sray_ref[5], need,
            sray_ref[6], block, prim_ref.shape[0])
        blk_ref[0] = blocked.astype(jnp.float32)


def _shade_kernel(meta_ref, blob_ref, lsb_ref, prim_ref, scand_ref,
                  sctn_ref, st_ref, ids_ref, res_ref, out_ref, *, k, block,
                  n_mats, mtypes, n_light_slots, rr_depth, use_nee, use_mis,
                  sky_mode, cmat_ref=None, bctr_ref=None, mxu=False,
                  blocked_in_res=False):
    """Split-bounce phase 2: shading with a rebuilt intersector.

    No traversal anywhere: the nearest hit is re-derived from the winner
    residuals (megakernel_bvh_grad._rebuilt_intersect — the exact pattern
    the backward replay uses), and NEE occlusion sweeps the XLA shadow
    precull's per-tile list (_cand_sweep_anyhit).
    """
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    in_region = pl.program_id(0) < meta_ref[3]
    alive = st_ref[C_ALIVE] > 0.5
    any_alive = jnp.any(alive)

    @pl.when(jnp.logical_not(in_region))
    def _():
        zeros = jnp.zeros_like(st_ref[C_ALIVE])
        out_ref[C_ALIVE] = zeros
        out_ref[C_INIMG] = zeros
        out_ref[C_MISS] = zeros

    @pl.when(in_region & jnp.logical_not(any_alive))
    def _():
        for c in range(N_CH):
            out_ref[c] = st_ref[c]
        out_ref[C_MISS] = jnp.zeros_like(st_ref[C_MISS])

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

        mats = _read_mats(blob_ref, n_mats)
        intersect_fn = _rebuilt_intersect(
            mats, mtypes, res_ref[0], res_ref[1], res_ref[2], res_ref[3],
            res_ref[4])

        def occluded_fn(pox, poy, poz, ldx, ldy, ldz, tmax, need):
            if blocked_in_res:
                # Prim-sharded mode: the cross-shard pmax-merged blocked
                # mask rides res channel 7 (parallel/wavefront_prim.py);
                # no in-kernel sweep at all.
                return res_ref[7] > 0.5
            if mxu:
                return _cand_sweep_anyhit_rows(
                    prim_ref, cmat_ref, bctr_ref, scand_ref, sctn_ref,
                    pox, poy, poz, ldx, ldy, ldz, need, tmax, block,
                    prim_ref.shape[0])
            return _cand_sweep_anyhit(prim_ref, scand_ref, sctn_ref, pox,
                                      poy, poz, ldx, ldy, ldz, need, tmax,
                                      block, prim_ref.shape[0])

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
                           else jnp.zeros_like(st_ref[C_MISS]))


def _shade_kernel_mxu(meta_ref, blob_ref, lsb_ref, prim_ref, cmat_ref,
                      bctr_ref, scand_ref, sctn_ref, st_ref, ids_ref,
                      res_ref, out_ref, **stat):
    """Positional-arg adapter: the mxu shade kernel takes the Cmat/bctr
    operands between prims and the (per-row) shadow candidate lists."""
    return _shade_kernel(meta_ref, blob_ref, lsb_ref, prim_ref, scand_ref,
                         sctn_ref, st_ref, ids_ref, res_ref, out_ref,
                         cmat_ref=cmat_ref, bctr_ref=bctr_ref, mxu=True,
                         **stat)


# ---------------------------------------------------------------------------
# XLA glue: coherence sort + image scatter
# ---------------------------------------------------------------------------

def _part1by2(x, nbits):
    """Spread the low ``nbits`` of ``x``: bit b -> bit 3*b (morton helper)."""
    out = x & 1
    for b in range(1, nbits):
        out = out | ((x & (1 << b)) << (2 * b))
    return out


def _coherence_key(stf, lo, ext, qbits=Q_BITS, dir_major=False,
                   dbits=D_BITS):
    """(alive-first, direction, origin-morton) sort key, i32.

    ``dir_major`` puts the direction in the HIGH bits: octant(3) then
    ``dbits`` magnitude bits per axis (morton-interleaved), then the
    origin morton code.  A 1024-ray packet then shares a ~quarter-octant
    direction cone over a contiguous morton range — both the frustum walk's
    scalar interval test and per-lane culling get tight inputs.  Non-dir-
    major keeps the legacy (morton, octant3) layout (``dbits`` ignored).
    """
    n = float(1 << qbits)
    q = []
    for c, l, e in zip((C_OX, C_OY, C_OZ), lo, ext):
        q.append(jnp.clip((stf[c] - l) * (n / e), 0.0, n - 1.0)
                 .astype(jnp.int32))
    morton = ((_part1by2(q[0], qbits) << 2) | (_part1by2(q[1], qbits) << 1)
              | _part1by2(q[2], qbits))
    octant = ((stf[C_DX] < 0).astype(jnp.int32) * 4
              + (stf[C_DY] < 0).astype(jnp.int32) * 2
              + (stf[C_DZ] < 0).astype(jnp.int32))
    if dir_major:
        if dbits:
            nd = float(1 << dbits)
            qd = [jnp.clip(jnp.abs(stf[c]) * nd, 0.0, nd - 1.0)
                  .astype(jnp.int32) for c in (C_DX, C_DY, C_DZ)]
            dirfine = ((_part1by2(qd[0], dbits) << 2)
                       | (_part1by2(qd[1], dbits) << 1)
                       | _part1by2(qd[2], dbits))
        else:
            dirfine = jnp.zeros_like(octant)
        key = ((octant << (3 * dbits + 3 * qbits))
               | (dirfine << (3 * qbits)) | morton)
    else:
        dbits = 0
        key = (morton << 3) | octant
    return jnp.where(stf[C_ALIVE] > 0.5, key,
                     jnp.where(stf[C_INIMG] > 0.5, _dead_key(qbits, dbits),
                               _pad_key(qbits, dbits)))


def _add_env_radiance(st, env):
    """Consume C_MISS: radiance += throughput * env(direction) per miss lane.

    Runs in XLA between bounce kernels — the bilinear texture gathers stay
    out of Mosaic, and miss lanes still carry their pre-bounce direction and
    throughput (trace_bounce only overwrites state on surviving lanes).
    Matches integrator_soa's SKY_ENVMAP radiance exactly (same
    sample_env_map math on the same RNG-stream directions).
    """
    from ..engine.integrator_jax import sample_env_map_soa
    miss = st[C_MISS] > 0.5
    er, eg, eb = sample_env_map_soa(env, st[C_DX], st[C_DY], st[C_DZ])
    zero = jnp.zeros_like(er)
    st = st.at[C_LR].add(jnp.where(miss, st[C_TR] * er, zero))
    st = st.at[C_LG].add(jnp.where(miss, st[C_TG] * eg, zero))
    st = st.at[C_LB].add(jnp.where(miss, st[C_TB] * eb, zero))
    return st.at[C_MISS].set(zero)


def _float0_like(x):
    """Zero cotangent for an integer-dtype primal (custom_vjp contract)."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def _sort_channels_vjp(key, stf, idf):
    """Variadic-sort the stream channels by ``key`` — differentiable.

    ``lax.sort`` has no transpose rule, which forced the grad path onto
    argsort + ``jnp.take`` (whose 4-byte permutation gather runs at
    ~2 GB/s — tools/profile_sort.py; VERDICT r4 next #2).  This wraps the
    fast variadic sort in a ``jax.custom_vjp``: the forward carries an
    iota operand through the SAME ``lax.sort`` call (so the saved
    permutation is exactly the one applied to the data, even with
    ``is_stable=False`` ties), and the backward un-permutes the incoming
    cotangents with a SECOND variadic sort keyed on that permutation —
    sorting by a permutation's values applies its inverse.  The key is a
    piecewise-constant (integer) function of the state, so its true
    derivative is zero a.e. — identical semantics to the argsort+take
    version, at the variadic sort's measured 2.1x speed, in BOTH
    directions (the take transpose was a scatter at the same ~2 GB/s).
    """
    n = stf.shape[0]
    out = jax.lax.sort(
        [key] + [stf[c] for c in range(n)] + [idf[0], idf[1]],
        num_keys=1, is_stable=False)
    return jnp.stack(out[1:1 + n]), jnp.stack(out[1 + n:])


def _sort_channels_fwd(key, stf, idf):
    n = stf.shape[0]
    iota = jax.lax.iota(jnp.int32, key.shape[0])
    out = jax.lax.sort(
        [key] + [stf[c] for c in range(n)] + [idf[0], idf[1], iota],
        num_keys=1, is_stable=False)
    stf_s = jnp.stack(out[1:1 + n])
    idf_s = jnp.stack(out[1 + n:3 + n])
    return (stf_s, idf_s), (out[3 + n], key.shape, idf.shape)


def _sort_channels_bwd(res, ct):
    perm, key_shape, idf_shape = res
    ct_stf, _ct_idf = ct
    n = ct_stf.shape[0]
    out = jax.lax.sort([perm] + [ct_stf[c] for c in range(n)],
                       num_keys=1, is_stable=False)
    return (np.zeros(key_shape, dtype=jax.dtypes.float0),
            jnp.stack(out[1:]),
            np.zeros(idf_shape, dtype=jax.dtypes.float0))


_sort_channels_vjp.defvjp(_sort_channels_fwd, _sort_channels_bwd)


def _sort_rays(st, ids, lo, ext, qbits=Q_BITS, dir_major=False,
               dbits=D_BITS, rowsort=False, variadic=True, diff=False):
    """Coherence-sort the stream; returns (st, ids, n_alive_tiles).

    ``n_alive_tiles`` is the compacted alive-prefix length in (8, 128)
    tiles — the scalar the bounce kernel's index maps use to skip the dead
    suffix entirely.

    ``variadic`` moves the channels INSIDE one ``lax.sort`` call (key +
    19 data operands) instead of argsort + per-channel gather.  Measured
    on-chip at the config-5 stream size (tools/profile_sort.py, 4M rays):
    the argsort itself is cheap (15 ms); the per-channel permutation
    gather is the cost (157 ms — 4-byte random loads at ~2 GB/s
    effective), and a transposed row-gather loses too (171 ms — the
    (r, 21) layout pads its minor dim to 128 lanes, a 6x bloat).  The
    variadic sort's compare-exchange network moves every operand along
    sequential passes instead: 80 ms, 2.1x faster end-to-end.  Equal keys
    land in arbitrary order, which the estimator cannot see (RNG rides
    with the ray).  The grad path keeps argsort+take — ``jnp.take`` has
    the transpose rule the backward needs; ``lax.sort`` does not.

    ``rowsort`` permutes 128-ray ROWS instead of individual rays: the
    row key is the min member key (alive lanes first), so compaction
    stays conservative-correct (a row with any alive lane sorts into the
    prefix).  Rays never leave their raygen row, so per-lane culling
    keeps working while the gather moves contiguous 512-byte rows;
    measured r3: the lost packet coherence costs more than the cheaper
    sort saves, so it stays off.
    """
    n_rows, lanes = st.shape[1:]
    r = n_rows * lanes
    stf = st.reshape(N_CH, r)
    key = _coherence_key(stf, lo, ext, qbits, dir_major, dbits)
    dead = _dead_key(qbits, dbits if dir_major else 0)
    if rowsort:
        row_key = jnp.min(key.reshape(n_rows, lanes), axis=1)
        perm = jnp.argsort(row_key)
        st = jnp.take(st, perm, axis=1)
        ids = jnp.take(ids, perm, axis=1)
        n_alive_rows = jnp.sum((row_key < dead).astype(jnp.int32))
        n_alive_tiles = (n_alive_rows + TILE_ROWS - 1) // TILE_ROWS
        return st, ids, n_alive_tiles
    idf = ids.reshape(2, r)
    n_alive = jnp.sum((key < dead).astype(jnp.int32))
    n_alive_tiles = (n_alive + TILE - 1) // TILE
    if variadic and diff:
        stf, idf = _sort_channels_vjp(jax.lax.stop_gradient(key), stf, idf)
    elif variadic:
        out = jax.lax.sort(
            [key] + [stf[c] for c in range(N_CH)] + [idf[0], idf[1]],
            num_keys=1, is_stable=False)
        stf = jnp.stack(out[1:1 + N_CH])
        idf = jnp.stack(out[1 + N_CH:])
    else:
        perm = jnp.argsort(key)
        stf = jnp.take(stf, perm, axis=1)
        idf = jnp.take(idf, perm, axis=1)
    return stf.reshape(st.shape), idf.reshape(ids.shape), n_alive_tiles


# ---------------------------------------------------------------------------
# Launch
# ---------------------------------------------------------------------------

def _raygen_launch(meta, blob, *, width, height, chunk_spp, dof, interpret):
    """Run the raygen kernel; returns (st, ids, n_tiles).

    The stream has one extra all-pad tile at the end: the redirect target
    for grid steps past the alive-prefix boundary (clobber-safe because
    pad-key lanes — at least this tile's 1024 — always sort last).
    """
    tiles_x = pl.cdiv(width, TW)
    tiles_y = pl.cdiv(height, TH)
    tiles_per_img = tiles_x * tiles_y
    n_tiles = tiles_per_img * chunk_spp
    n_rows = (n_tiles + 1) * TILE_ROWS
    st, ids = pl.pallas_call(
        functools.partial(_raygen_kernel, width=width, height=height,
                          tiles_x=tiles_x, tiles_per_img=tiles_per_img,
                          n_real_tiles=n_tiles, dof=dof),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles + 1,),
            in_specs=[],
            out_specs=[
                pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES),
                             lambda i, *r: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, TILE_ROWS, TILE_LANES),
                             lambda i, *r: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((N_CH, n_rows, TILE_LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, n_rows, TILE_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, blob)
    return st, ids, n_tiles


def _scene_sort_bounds(nodef):
    """Origin-quantization bounds for the coherence key (root AABB)."""
    lo = tuple(nodef[0, a] for a in range(3))
    ext = tuple(jnp.maximum(nodef[0, 3 + a] - nodef[0, a], 1e-5)
                for a in range(3))
    return lo, ext


def _scatter_image(st, ids, width, height):
    """Scatter radiance by pixel id; padding lanes dump into slot H*W."""
    r = st.shape[1] * st.shape[2]
    stf = st.reshape(N_CH, r)
    pid = ids.reshape(2, r)[0]
    idx = jnp.where(stf[C_INIMG] > 0.5, pid, width * height)
    rad = jnp.stack([stf[C_LR], stf[C_LG], stf[C_LB]], axis=-1)
    img = jnp.zeros((width * height + 1, 3), jnp.float32).at[idx].add(rad)
    return img[:width * height].reshape(height, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "chunk_spp", "block", "n_mats",
                     "mtypes", "n_light_slots", "max_bounces", "rr_depth",
                     "use_nee", "use_mis", "sky_mode", "dof", "sort_every",
                     "qbits", "dir_major", "dbits", "rowsort", "compact",
                     "precull", "tcull", "split", "mxu", "sort_min_rays",
                     "interpret"))
def _launch_wavefront(blob, meta, lsb, nodef, nodei, prims, env, *, width,
                      height, chunk_spp, block, n_mats, mtypes,
                      n_light_slots,
                      max_bounces, rr_depth, use_nee, use_mis, sky_mode,
                      dof=False, sort_every=1, qbits=Q_BITS, dir_major=False,
                      dbits=D_BITS, rowsort=False, compact=True,
                      precull=True, tcull=True, split=True, mxu=False,
                      sort_min_rays=0,
                      interpret=False):
    n_nodes = nodef.shape[0] // 8   # 8 stacked octant tables
    n_blocks = prims.shape[0]
    st, ids, n_tiles = _raygen_launch(
        meta, blob, width=width, height=height, chunk_spp=chunk_spp,
        dof=dof, interpret=interpret)
    n_rows = (n_tiles + 1) * TILE_ROWS
    lo, ext = _scene_sort_bounds(nodef)
    if precull or split:
        lob, hib = _leaf_block_bounds(prims)
    if mxu and split:
        cmat, bctr = build_cmat(prims)
    n_grp = TILE_ROWS if (mxu and split) else 1

    def _redirect(i, m, *r):
        # Alive-prefix compaction: steps past the boundary all target the
        # pad tile; consecutive equal indices make Mosaic elide the DMAs.
        return (0, jnp.where(i < m[3], i, n_tiles), 0)

    def _redirect2(i, m, *r):
        return (jnp.where(i < m[3], i, n_tiles), 0, 0)

    nalive = jnp.int32(n_tiles)
    first_sort = True
    for k in range(max_bounces):
        if sort_every and k and (k - 1) % sort_every == 0:
            # Re-sorting pays off only while enough rays are alive: the
            # variadic sort costs ~full-stream regardless of aliveness,
            # while the kernel's cost already tracks the alive prefix.
            # Below ``sort_min_rays`` keep the previous order/boundary
            # (still conservative-correct: rays die monotonically, so the
            # old prefix remains a superset of the alive set).
            def do_sort(ops):
                return _sort_rays(ops[0], ops[1], lo, ext, qbits,
                                  dir_major, dbits, rowsort)

            def no_sort(ops):
                return ops[0], ops[1], nalive

            def prefix_sort(t_pre):
                # r5 tiered prefix sort: after the first full sort the
                # stream is [live | dead | pad]; once the alive boundary
                # fits in a static prefix, sort ONLY that prefix (the
                # suffix is all-dead and already in place — its radiance
                # still scatters at the end).  lax.sort's compare-
                # exchange network is O(n log^2 n); the r4 engine paid
                # full-stream cost per sort while the alive population
                # collapsed (profile: 4080 -> 2305 -> 1165 -> 696 tiles).
                rows = t_pre * TILE_ROWS

                def f(ops):
                    sp, ip, na = _sort_rays(
                        ops[0][:, :rows], ops[1][:, :rows], lo, ext,
                        qbits, dir_major, dbits, rowsort)
                    return (ops[0].at[:, :rows].set(sp),
                            ops[1].at[:, :rows].set(ip), na)

                return f

            if compact and not rowsort and not first_sort:
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
            # --- split bounce: intersect kernel -> XLA shadow construct
            # + shadow precull -> walk-free shade kernel ----------------
            cand, ctn = _precull(st, lob, hib, n_tiles, per_row=mxu)
            cand_specs = [
                pl.BlockSpec((1, n_grp, n_blocks + 1), _redirect2,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n_grp, n_blocks), _redirect2,
                             memory_space=pltpu.SMEM),
            ]
            if mxu:
                isect_k = functools.partial(_isect_kernel_mxu, block=block,
                                            tcull=tcull)
                extra = (cmat, bctr)
                extra_specs = [
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # cmat
                    pl.BlockSpec(memory_space=pltpu.SMEM),   # bctr
                ]
            else:
                isect_k = functools.partial(_isect_kernel, block=block,
                                            tcull=tcull)
                extra = ()
                extra_specs = []
            res = pl.pallas_call(
                isect_k,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                        *extra_specs,
                        *cand_specs,
                        pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES),
                                     _redirect, memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((8, TILE_ROWS, TILE_LANES),
                                           _redirect,
                                           memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((8, n_rows, TILE_LANES),
                                               jnp.float32),
                interpret=interpret,
            )(meta4, prims, *extra, cand, ctn, st)
            if use_nee and n_light_slots:
                so3, sd3, stmax, sneed = _shadow_rays_xla(
                    st, ids, res, blob, lsb, meta[2], k=k, seed=meta[1],
                    n_mats=n_mats, mtypes=mtypes,
                    n_light_slots=n_light_slots)
                scand, sctn = _precull_rays(so3, sd3, sneed, stmax, lob,
                                            hib, n_tiles, per_row=mxu)
                sc_specs = [
                    pl.BlockSpec((1, n_grp, n_blocks + 1), _redirect2,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, n_grp, n_blocks), _redirect2,
                                 memory_space=pltpu.SMEM),
                ]
            else:
                scand = jnp.zeros((1, n_grp, 1), jnp.int32)
                sctn = jnp.zeros((1, n_grp, 1), jnp.float32)
                sc_specs = [
                    pl.BlockSpec((1, n_grp, 1), lambda i, m, *r: (0, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, n_grp, 1), lambda i, m, *r: (0, 0, 0),
                                 memory_space=pltpu.SMEM),
                ]
            shade_k = _shade_kernel_mxu if mxu else _shade_kernel
            st = pl.pallas_call(
                functools.partial(
                    shade_k, k=k, block=block, n_mats=n_mats,
                    mtypes=mtypes, n_light_slots=n_light_slots,
                    rr_depth=rr_depth, use_nee=use_nee, use_mis=use_mis,
                    sky_mode=sky_mode),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                        *extra_specs,
                        *sc_specs,
                        pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES),
                                     _redirect, memory_space=pltpu.VMEM),
                        pl.BlockSpec((2, TILE_ROWS, TILE_LANES),
                                     _redirect, memory_space=pltpu.VMEM),
                        pl.BlockSpec((8, TILE_ROWS, TILE_LANES),
                                     _redirect, memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES),
                                           _redirect,
                                           memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((N_CH, n_rows, TILE_LANES),
                                               jnp.float32),
                input_output_aliases={6 + len(extra): 0},
                interpret=interpret,
            )(meta4, blob, lsb, prims, *extra, scand, sctn, st, ids, res)
            if sky_mode == physics.SKY_ENVMAP:
                st = _add_env_radiance(st, env)
            continue
        if precull:
            cand, ctn = _precull(st, lob, hib, n_tiles)
            cand_specs = [
                pl.BlockSpec((1, 1, n_blocks + 1), _redirect2,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, n_blocks), _redirect2,
                             memory_space=pltpu.SMEM),
            ]
            cand_args = (cand, ctn)
        else:
            # 1-element placeholders keep the kernel arity fixed.
            cand_specs = [
                pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                             memory_space=pltpu.SMEM),
            ]
            cand_args = (jnp.zeros((1, 1, 1), jnp.int32),
                         jnp.zeros((1, 1, 1), jnp.float32))
        st = pl.pallas_call(
            functools.partial(
                _bounce_kernel, k=k, n_nodes=n_nodes, block=block,
                n_mats=n_mats, mtypes=mtypes, n_light_slots=n_light_slots,
                rr_depth=rr_depth, use_nee=use_nee, use_mis=use_mis,
                sky_mode=sky_mode, precull=precull, tcull=tcull),
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
                out_specs=pl.BlockSpec((N_CH, TILE_ROWS, TILE_LANES),
                                       _redirect,
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SMEM((max(n_blocks, 1),), jnp.int32)],
            ),
            out_shape=jax.ShapeDtypeStruct((N_CH, n_rows, TILE_LANES),
                                           jnp.float32),
            # st rides through aliased: the dead suffix past the boundary
            # is preserved in place without ever being copied.
            input_output_aliases={8: 0},
            interpret=interpret,
        )(meta4, blob, lsb, nodef, nodei, prims, *cand_args, st, ids)
        if sky_mode == physics.SKY_ENVMAP:
            st = _add_env_radiance(st, env)

    return _scatter_image(st, ids, width, height)


def render_wavefront(scene: SceneData, camera, width: int, height: int,
                     start_sample: int, spp: int, *, max_bounces=8,
                     rr_depth=3, use_nee=True, use_mis=True, seed=0,
                     dof=None, block: int = BLOCK, sort_every: int = 1,
                     qbits: int = Q_BITS, dir_major: bool = True,
                     dbits: int = D_BITS, rowsort: bool = False,
                     compact: bool = True, precull: bool = True,
                     tcull: bool = True, split: bool = True,
                     mxu: bool = False,
                     sort_min_rays: int = 1 << 17,
                     chunk_rays: int = 4 << 20, interpret=False):
    """Render ``spp`` samples sorted-wavefront style; (H,W,3) radiance sum.

    Semantics and RNG streams are identical to ``megakernel_bvh.
    render_tiles_bvh`` / ``integrator_soa`` (the sort is a permutation the
    estimator cannot see).  ``sort_every=0`` disables binning (for A/B
    measurement); ``chunk_rays`` bounds the in-flight ray stream.
    """
    blob, meta3, nodef, nodei, prims, static = _packed(scene, camera, block)
    lsb = physics.lsel_bounds_from_prims(prims)
    if dof is None:
        dof = bool(blob[13] > 0.0)
    env = scene.env_map
    if env is None or scene.sky_mode != physics.SKY_ENVMAP:
        env = jnp.zeros((1, 1, 3), jnp.float32)  # unused placeholder
    tiles_per_img = pl.cdiv(width, TW) * pl.cdiv(height, TH)
    rays_per_img = tiles_per_img * TILE
    chunk_spp = max(1, min(spp, chunk_rays // rays_per_img))
    img = None
    s = 0
    while s < spp:
        n = min(chunk_spp, spp - s)
        meta = jnp.asarray([start_sample + s, seed, int(meta3[2])], np.int32)
        part = _launch_wavefront(
            blob, meta, lsb, nodef, nodei, prims, env, width=width,
            height=height,
            chunk_spp=n, block=static["block"], n_mats=static["n_mats"],
            mtypes=static["mtypes"], n_light_slots=static["n_light_slots"],
            max_bounces=max_bounces, rr_depth=rr_depth,
            use_nee=bool(use_nee), use_mis=bool(use_mis),
            sky_mode=scene.sky_mode, dof=bool(dof),
            sort_every=int(sort_every), qbits=int(qbits),
            dir_major=bool(dir_major), dbits=int(dbits),
            rowsort=bool(rowsort), compact=bool(compact),
            precull=bool(precull), tcull=bool(tcull), split=bool(split),
            mxu=bool(mxu),
            sort_min_rays=int(sort_min_rays), interpret=interpret)
        img = part if img is None else img + part
        s += n
    return img
