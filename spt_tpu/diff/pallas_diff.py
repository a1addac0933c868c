"""Differentiable rendering through the fused Pallas kernels.

``make_pallas_render_fn`` returns a function ``render(params) -> image``
whose forward pass is the Pallas forward megakernel and whose backward pass
is the fused path-replay gradient kernel (kernels/megakernel_grad) — wired
with ``jax.custom_vjp`` so it composes with ``jax.grad`` / optax exactly
like the SoA integrator, at kernel speed.

Scope matches the megakernel: Cornell-class scenes (uniforms-in-SMEM),
gradients for albedo / emission / roughness / centers / radii (+ sky).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scene import SceneData
from ..kernels import megakernel, megakernel_grad, physics
from . import gradients as G

PARAM_KEYS = ("albedo", "emission", "roughness", "centers", "radii")


def make_pallas_render_fn(scene: SceneData, camera, width: int, height: int,
                          *, spp: int, max_bounces: int = 6,
                          rr_depth: int = 3, use_nee: bool = True,
                          use_mis: bool = True, seed: int = 0,
                          interpret: bool = False):
    """render(params, start_sample) -> (H, W, 3) mean radiance, custom VJP.

    ``params`` may contain any subset of PARAM_KEYS; other scene values are
    closed over.  ``start_sample`` rotates the RNG streams across optimizer
    steps (a traced scalar is fine).
    """
    mtypes, light_prims = megakernel.pack_scene_static(scene)
    n_prims = scene.capacity
    kw = dict(width=width, height=height, spp=spp, n_prims=n_prims,
              n_light_slots=len(light_prims), mtypes=tuple(mtypes),
              max_bounces=max_bounces, rr_depth=rr_depth,
              use_nee=bool(use_nee), use_mis=bool(use_mis),
              sky_mode=scene.sky_mode, interpret=interpret)
    inv_spp = 1.0 / spp

    def _meta(start_sample):
        base = np.zeros(megakernel._META_FIXED + n_prims
                        + max(len(light_prims), 1), np.int32)
        base[1] = seed
        base[2] = len(light_prims)
        base[megakernel._META_FIXED:megakernel._META_FIXED + n_prims] = \
            np.asarray(mtypes, np.int32)
        for i, p in enumerate(light_prims):
            base[megakernel._META_FIXED + n_prims + i] = p
        meta = jnp.asarray(base)
        return meta.at[0].set(jnp.asarray(start_sample, jnp.int32))

    def _blob(params):
        sc = G.apply_params(scene, params)
        return megakernel.pack_blob_jnp(sc, camera)

    @jax.custom_vjp
    def render(params, start_sample):
        blob = _blob(params)
        return megakernel._launch(blob, _meta(start_sample), **kw) * inv_spp

    def render_fwd(params, start_sample):
        return render(params, start_sample), (params, start_sample)

    def render_bwd(res, ct):
        params, start_sample = res
        sc = G.apply_params(scene, params)
        n_pix = width * height
        n_tiles = -(-n_pix // megakernel.TILE)
        ctm = jnp.moveaxis((ct * inv_spp).reshape(n_pix, 3), -1, 0)
        ctm = jnp.pad(ctm, ((0, 0), (0, n_tiles * megakernel.TILE - n_pix)))
        ct_flat = ctm.reshape(3, n_tiles * megakernel.TILE_ROWS,
                              megakernel.TILE_LANES)
        _, gvec = megakernel_grad._launch_grad(
            megakernel.pack_blob_jnp(sc, camera), _meta(start_sample),
            ct_flat, **kw)
        A = physics.N_SPHERE_ATTRS
        sph = gvec[:n_prims * A].reshape(n_prims, A) \
            * scene.prim_valid.astype(jnp.float32)[:, None]
        n_mats = scene.materials.num_materials
        one_hot = jax.nn.one_hot(scene.mat_id, n_mats, dtype=jnp.float32) \
            * scene.prim_valid.astype(jnp.float32)[:, None]
        full = {
            "centers": sph[:, 0:3],
            "radii": sph[:, 3],
            "albedo": one_hot.T @ sph[:, 4:7],
            "emission": one_hot.T @ sph[:, 7:10],
            "roughness": one_hot.T @ sph[:, 10],
        }
        g_params = {k: full[k] for k in params}
        return g_params, None

    render.defvjp(render_fwd, render_bwd)
    return render
