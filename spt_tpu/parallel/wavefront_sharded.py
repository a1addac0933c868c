"""The Pallas wavefront engine under shard_map — config 5's "sharded" clause.

Until r4 the fast engines and the distribution layer were disjoint: every
sharded program plugged intersect hooks into the slow AoS oracle
(integrator_jax.render_megasample), and the only engines that could carry
the 10k-prim/1080p/1024-spp workload were strictly single-device (VERDICT
r3 missing #1).  This module runs the sorted-wavefront Pallas kernels
(kernels/wavefront.py, wavefront_grad.py) inside ``shard_map``:

* **Sample sharding (forward)** — ``render_wavefront_sharded``: spp split
  over the ``data`` axis; every device runs the full wavefront pipeline
  (raygen -> sort/compact -> precull -> bounce kernel) on its own sample
  range and one ``psum`` combines the partial radiance sums.  The counter
  RNG keys on the (pixel, sample) ids carried with each ray (core/rng.py),
  so the per-device streams are exactly the streams a single device would
  have consumed for those samples — sharded == unsharded up to the psum's
  float summation order.

* **Sample-sharded gradients** — ``make_wavefront_dp_render_fn``: the
  differentiable wavefront (custom-vjp bounce kernels) under the same
  sharding.  Scene parameters are replicated; shard_map's transpose
  inserts the gradient all-reduce (psum over ``data``) of every scene-
  parameter cotangent automatically — BASELINE config 5's "sharded ...
  with gradient all-reduce", carried by the Pallas engine instead of the
  oracle.

The reference has no analog (single process, no distribution); SURVEY.md
§2.4 DP row specifies the design.  Multi-host runs reuse these programs
unchanged on a ('data','prim') mesh whose data axis spans hosts
(parallel/mesh.py, tools/run_multiprocess.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.scene import SceneData
from ..kernels import physics, wavefront
from ..kernels.megakernel_bvh import BLOCK


def _env_or_placeholder(scene: SceneData):
    env = scene.env_map
    if env is None or scene.sky_mode != physics.SKY_ENVMAP:
        env = jnp.zeros((1, 1, 3), jnp.float32)
    return env


def render_wavefront_sharded(scene: SceneData, camera, width: int,
                             height: int, start_sample: int, spp: int,
                             mesh: Mesh, *, max_bounces: int = 8,
                             rr_depth: int = 3, use_nee: bool = True,
                             use_mis: bool = True, seed: int = 0,
                             block: int = BLOCK,
                             chunk_rays: int = 4 << 20,
                             interpret: bool = False, **kw):
    """Sample-sharded wavefront forward; (H, W, 3) radiance sum over spp.

    ``spp`` must divide the mesh's ``data`` axis; device i renders samples
    [start + i*spp/N, start + (i+1)*spp/N) with global ids, so the result
    matches the single-device ``render_wavefront`` up to psum float order.
    """
    n_data = mesh.shape["data"]
    if spp % n_data != 0:
        raise ValueError(f"spp {spp} not divisible by data axis {n_data}")
    spp_dev = spp // n_data
    blob, meta3, nodef, nodei, prims, static = wavefront._packed(
        scene, camera, block)
    lsb = physics.lsel_bounds_from_prims(prims)
    dof = bool(blob[13] > 0.0)
    env = _env_or_placeholder(scene)
    tiles_per_img = (-(-width // wavefront.TW)) * (-(-height // wavefront.TH))
    rays_per_img = tiles_per_img * wavefront.TILE
    chunk_spp = max(1, min(spp_dev, chunk_rays // rays_per_img))
    launch_kw = dict(
        width=width, height=height, block=static["block"],
        n_mats=static["n_mats"], mtypes=static["mtypes"],
        n_light_slots=static["n_light_slots"], max_bounces=max_bounces,
        rr_depth=rr_depth, use_nee=bool(use_nee), use_mis=bool(use_mis),
        sky_mode=scene.sky_mode, dof=dof, interpret=interpret, **kw)
    nl = int(meta3[2])

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P()), out_specs=P(),
             check_vma=False)
    def run(blob_r, lsb_r, nodef_r, nodei_r, prims_r, env_r):
        idx = jax.lax.axis_index("data")
        base = jnp.int32(start_sample) + idx * spp_dev
        img = None
        s = 0
        while s < spp_dev:
            n = min(chunk_spp, spp_dev - s)
            meta = jnp.stack([base + s, jnp.int32(seed), jnp.int32(nl)])
            part = wavefront._launch_wavefront(
                blob_r, meta, lsb_r, nodef_r, nodei_r, prims_r, env_r,
                chunk_spp=n, **launch_kw)
            img = part if img is None else img + part
            s += n
        return jax.lax.psum(img, "data")

    return jax.jit(run)(blob, lsb, nodef, nodei, prims, env)


def make_wavefront_dp_render_fn(scene: SceneData, camera, width: int,
                                height: int, *, spp: int, mesh: Mesh,
                                interpret: bool = False, **kw):
    """Sample-sharded differentiable wavefront render fn.

    Returns ``render(params, start_sample) -> (H, W, 3) mean radiance``,
    differentiable via ``jax.grad``; the per-device backward runs the
    custom-vjp bounce kernels and shard_map's transpose psums every scene-
    parameter cotangent over ``data`` (the gradient all-reduce).  Wrap in
    a loss and ``jax.jit(jax.grad(...))`` as usual.
    """
    from ..kernels import wavefront_grad as wg

    n_data = mesh.shape["data"]
    if spp % n_data != 0:
        raise ValueError(f"spp {spp} not divisible by data axis {n_data}")
    spp_dev = spp // n_data

    # Per-device renderer over its own sample window; mean of the psum'd
    # per-device sums == the single-device spp mean (same sample ids).
    dev_render = wg.make_wavefront_render_fn(
        scene, camera, width, height, spp=spp_dev, interpret=interpret,
        **kw)

    def render(params, start_sample):
        @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                 check_vma=False)
        def run(params_r, s0_r):
            idx = jax.lax.axis_index("data")
            img = dev_render(params_r, s0_r + idx * spp_dev)
            return jax.lax.psum(img, "data") * (1.0 / n_data)

        return run(params, jnp.asarray(start_sample, jnp.int32))

    return render
