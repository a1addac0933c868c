"""Primitive sharding UNDER the Pallas wavefront engine — VERDICT r4 #4.

Through r4, primitive sharding existed only at oracle speed: both
strategies in parallel/sharding.py plug intersect hooks into the slow AoS
integrator, so BASELINE config 5's "rays AND scene primitives sharded"
clause had no fast carrier.  This module shards the wavefront's packed
leaf-block tables over the mesh's ``prim`` axis and runs the REAL split
bounce kernels per shard:

per bounce, on every (data, prim) shard
  1. sort/compact the (prim-replicated, data-sharded) ray stream — keys
     depend only on ray state, so every prim shard applies the identical
     permutation;
  2. XLA precull + intersect kernel against the LOCAL leaf blocks only
     -> local winner residuals;
  3. re-derive each local winner's t in XLA (wavefront._winner_t) and
     min-reduce across ``prim``: pmin on t, tie-break to the lowest shard
     id, winner fields combined with a masked psum (exact: one shard
     contributes, the rest add zero) — local block ids are rebased to
     global before the merge;
  4. NEE shadow rays reconstructed from the MERGED winner (the standard
     _shadow_rays_xla), preculled and any-hit swept against the local
     blocks (wavefront._anyhit_kernel), verdicts pmax-merged over
     ``prim``;
  5. the walk-free shade kernel runs with the merged winner and the
     merged blocked mask (``blocked_in_res``) — identical inputs on every
     prim shard, so the post-bounce stream stays replicated over ``prim``
     by construction.

The final image psums over ``data`` only (it is already replicated over
``prim``).  Equal total compute per shard would require equal-quality
leaf partitioning; the point here is MEMORY scaling: each shard holds
1/n_prim of the prim/Cmat tables, so scene capacity scales with the prim
axis while the ray state (the larger tensor) scales with ``data`` — the
HBM budget math is in ARCHITECTURE.md.

Reference analog: none (single process); SURVEY.md §2.4 TP row and
BASELINE config 5 specify the requirement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..core.scene import SceneData
from ..kernels import physics, wavefront as wf
from ..kernels.megakernel_bvh import BLOCK

N_RES = 8


def _pad_blocks(prims, n_shards):
    """Pad the packed leaf table to a multiple of ``n_shards`` blocks with
    invalid blocks (mid = -1 => every consumer treats them as empty)."""
    nb = prims.shape[0]
    nb_pad = -(-nb // n_shards) * n_shards
    if nb_pad == nb:
        return prims
    pad = np.zeros((nb_pad - nb,) + prims.shape[1:], np.float32)
    pad[:, 4, :] = -1.0
    return jnp.concatenate([prims, jnp.asarray(pad)], axis=0)


def render_wavefront_prim_sharded(scene: SceneData, camera, width: int,
                                  height: int, start_sample: int, spp: int,
                                  mesh: Mesh, *, max_bounces: int = 8,
                                  rr_depth: int = 3, use_nee: bool = True,
                                  use_mis: bool = True, seed: int = 0,
                                  block: int = BLOCK,
                                  chunk_rays: int = 4 << 20,
                                  interpret: bool = False):
    """Wavefront forward with samples over ``data`` and leaf blocks over
    ``prim``; (H, W, 3) radiance sum over spp.

    Matches single-device ``render_wavefront`` up to knife-edge t-ties
    (cross-shard merge breaks ties by shard id, the in-kernel sweep by
    candidate order) and the data-psum's float summation order.
    """
    n_data = mesh.shape["data"]
    n_prim = mesh.shape["prim"]
    if spp % n_data != 0:
        raise ValueError(f"spp {spp} not divisible by data axis {n_data}")
    spp_dev = spp // n_data
    blob, meta3, nodef, nodei, prims, static = wf._packed(
        scene, camera, block)
    prims = _pad_blocks(prims, n_prim)
    nb_local = prims.shape[0] // n_prim
    lsb = physics.lsel_bounds_from_prims(prims)
    dof = bool(blob[13] > 0.0)
    env = scene.env_map
    if env is None or scene.sky_mode != physics.SKY_ENVMAP:
        env = jnp.zeros((1, 1, 3), jnp.float32)
    nodef_np = np.asarray(nodef)
    lo = tuple(float(nodef_np[0, a]) for a in range(3))
    ext = tuple(max(float(nodef_np[0, 3 + a] - nodef_np[0, a]), 1e-5)
                for a in range(3))
    tiles_per_img = (-(-width // wf.TW)) * (-(-height // wf.TH))
    rays_per_img = tiles_per_img * wf.TILE
    chunk_spp = max(1, min(spp_dev, chunk_rays // rays_per_img))
    nl = int(meta3[2])
    stat = dict(n_mats=static["n_mats"], mtypes=static["mtypes"],
                n_light_slots=static["n_light_slots"], rr_depth=rr_depth,
                use_nee=bool(use_nee), use_mis=bool(use_mis),
                sky_mode=scene.sky_mode)
    use_shadows = bool(use_nee) and static["n_light_slots"] > 0

    def one_chunk(blob_r, lsb_r, prims_r, env_r, base, n_spp):
        pidx = jax.lax.axis_index("prim")
        meta = jnp.stack([base, jnp.int32(seed), jnp.int32(nl)])
        st, ids, n_tiles = wf._raygen_launch(
            meta, blob_r, width=width, height=height, chunk_spp=n_spp,
            dof=dof, interpret=interpret)
        n_rows = (n_tiles + 1) * wf.TILE_ROWS
        lob, hib = wf._leaf_block_bounds(prims_r)

        def _redirect(i, m, *r):
            return (0, jnp.where(i < m[3], i, n_tiles), 0)

        def _redirect2(i, m, *r):
            return (jnp.where(i < m[3], i, n_tiles), 0, 0)

        cand_specs = [
            pl.BlockSpec((1, 1, nb_local + 1), _redirect2,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb_local), _redirect2,
                         memory_space=pltpu.SMEM),
        ]
        tile_spec = lambda ch: pl.BlockSpec(
            (ch, wf.TILE_ROWS, wf.TILE_LANES), _redirect,
            memory_space=pltpu.VMEM)
        dummy_specs = [
            pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, m, *r: (0, 0, 0),
                         memory_space=pltpu.SMEM),
        ]

        nalive = jnp.int32(n_tiles)
        for k in range(max_bounces):
            if k:
                st, ids, nalive = wf._sort_rays(st, ids, lo, ext,
                                                dir_major=True)
            meta4 = jnp.concatenate([meta[:3], nalive.reshape(1)])
            cand, ctn = wf._precull(st, lob, hib, n_tiles)
            res = pl.pallas_call(
                partial(wf._isect_kernel, block=block, tcull=True),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                        *cand_specs,
                        tile_spec(wf.N_CH),
                    ],
                    out_specs=tile_spec(N_RES),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (N_RES, n_rows, wf.TILE_LANES), jnp.float32),
                interpret=interpret,
            )(meta4, prims_r, cand, ctn, st)

            # --- cross-shard winner merge (the TP min-reduction) -------
            t = wf._winner_t(st, res)
            tmin = jax.lax.pmin(t, "prim")
            hit_eq = (res[4] >= 0.0) & (t == tmin) & (t < wf.BIG)
            sid = jax.lax.pmin(
                jnp.where(hit_eq, pidx, jnp.int32(1 << 30)), "prim")
            pick = (hit_eq & (pidx == sid)).astype(jnp.float32)
            blk_global = res[5] + jnp.float32(nb_local) * pidx
            parts = [res[0], res[1], res[2], res[3], res[4], blk_global,
                     res[6]]
            merged = [jax.lax.psum(p * pick, "prim") for p in parts]
            any_hit = tmin < wf.BIG
            merged[4] = jnp.where(any_hit, merged[4], -1.0)
            res_m = jnp.stack(merged + [jnp.zeros_like(merged[0])])

            # --- NEE occlusion: local any-hit, pmax merge --------------
            if use_shadows:
                so3, sd3, stmax, sneed = wf._shadow_rays_xla(
                    st, ids, res_m, blob_r, lsb_r, meta[2], k=k,
                    seed=meta[1], n_mats=static["n_mats"],
                    mtypes=static["mtypes"],
                    n_light_slots=static["n_light_slots"])
                scand, sctn = wf._precull_rays(so3, sd3, sneed, stmax,
                                               lob, hib, n_tiles)
                sray = jnp.stack(list(so3) + list(sd3) + [stmax, sneed])
                blocked = pl.pallas_call(
                    partial(wf._anyhit_kernel, block=block),
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(n_tiles,),
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.VMEM),
                            *cand_specs,
                            tile_spec(8),
                        ],
                        out_specs=tile_spec(1),
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (1, n_rows, wf.TILE_LANES), jnp.float32),
                    interpret=interpret,
                )(meta4, prims_r, scand, sctn, sray)
                blocked = jax.lax.pmax(blocked, "prim")
                res_m = res_m.at[7].set(blocked[0])

            st = pl.pallas_call(
                partial(wf._shade_kernel, k=k, block=block,
                        blocked_in_res=True, **stat),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),   # prims
                        *dummy_specs,
                        tile_spec(wf.N_CH),
                        tile_spec(2),
                        tile_spec(N_RES),
                    ],
                    out_specs=tile_spec(wf.N_CH),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (wf.N_CH, n_rows, wf.TILE_LANES), jnp.float32),
                input_output_aliases={6: 0},
                interpret=interpret,
            )(meta4, blob_r, lsb_r, prims_r,
              jnp.zeros((1, 1, 1), jnp.int32),
              jnp.zeros((1, 1, 1), jnp.float32), st, ids, res_m)
            if scene.sky_mode == physics.SKY_ENVMAP:
                st = wf._add_env_radiance(st, env_r)
        return wf._scatter_image(st, ids, width, height)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("prim"), P(), P()), out_specs=P(),
             check_vma=False)
    def run(blob_r, lsb_r, prims_r, env_r, s0):
        didx = jax.lax.axis_index("data")
        base = s0 + didx * spp_dev
        img = None
        s = 0
        while s < spp_dev:
            n = min(chunk_spp, spp_dev - s)
            part = one_chunk(blob_r, lsb_r, prims_r, env_r, base + s, n)
            img = part if img is None else img + part
            s += n
        return jax.lax.psum(img, "data")

    return jax.jit(run)(blob, lsb, prims, env,
                        jnp.asarray(start_sample, jnp.int32))
