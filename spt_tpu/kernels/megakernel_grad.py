"""Fused forward+backward Pallas megakernel — fast differentiable rendering.

One ``pallas_call`` per frame chunk computes the radiance image AND the
gradients of ``sum(ct ⊙ image)`` w.r.t. every scene parameter (sphere
centers/radii, per-sphere material attributes, sky colors).  Design:

* **Forward sweep** stores each bounce's input state (13 f32 component
  arrays + 2 masks) in VMEM scratch — ~450 KB for depth 8, far under the
  16 MB budget — instead of letting AD spill (N,3)-padded residuals to HBM
  (which is what made the pure-XLA backward 14x slower than forward).

* **Backward sweep** replays each bounce in reverse under ``jax.vjp`` of
  the *shared* physics function (spt_tpu/kernels/physics.trace_bounce), so
  the adjoint math is generated from the exact forward code — RNG uniforms
  are recomputed (counter RNG), never stored.

* **Gradient accumulation in SMEM**: parameter cotangents are scalars; they
  accumulate across the whole (tiles × samples) grid into one small SMEM
  output vector (grid iterations revisit the same block).  Light-slot
  cotangents are folded into their owning sphere's row with dynamic SMEM
  indexing.

The result is verified against ``jax.grad`` of the SoA integrator
(tests/test_pallas_grad.py) — same estimator, same streams.
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
from . import physics
from .megakernel import (TILE, TILE_LANES, TILE_ROWS, _CAM_SLOT, _DIM_LOBE,
                         _DIM_LSEL, _DIM_LU1, _DIM_LU2, _DIM_RR, _DIM_U1,
                         _DIM_U2, _META_FIXED, _NDIMS, _SKY_OFF, _SPH_OFF,
                         _SPH_STRIDE, pack_scene)

N_STATE = 13


def _read_theta(meta_ref, blob_ref, n_prims, n_light_slots):
    """Read all scene scalars from SMEM refs (outside any vjp region)."""
    spheres = tuple(
        tuple(blob_ref[_SPH_OFF + _SPH_STRIDE * j + a]
              for a in range(physics.N_SPHERE_ATTRS))
        for j in range(n_prims))
    sky = tuple(blob_ref[_SKY_OFF + a] for a in range(physics.N_SKY_ATTRS))
    lights = []
    light_prims = []
    for l in range(n_light_slots):
        lp = meta_ref[_META_FIXED + n_prims + l]
        off = _SPH_OFF + _SPH_STRIDE * lp
        lights.append(tuple(blob_ref[off + a]
                            for a in (0, 1, 2, 3, 7, 8, 9)))
        light_prims.append(lp)
    return (spheres, sky, tuple(lights)), light_prims


def _raygen(blob_ref, pid, px, py, sample, seed, width, height, dof=False):
    jx = rng.counter_uniform(pid, sample, jnp.uint32(_CAM_SLOT + 0), seed)
    jy = rng.counter_uniform(pid, sample, jnp.uint32(_CAM_SLOT + 1), seed)
    aspect = jnp.float32(width / height)
    tanf = blob_ref[12]
    sx = (px.astype(jnp.float32) + jx) * jnp.float32(1.0 / width)
    sy = (py.astype(jnp.float32) + jy) * jnp.float32(1.0 / height)
    ndc_x = (2.0 * sx - 1.0) * aspect * tanf
    ndc_y = (1.0 - 2.0 * sy) * tanf
    dx = ndc_x * blob_ref[3] + ndc_y * blob_ref[6] + blob_ref[9]
    dy = ndc_x * blob_ref[4] + ndc_y * blob_ref[7] + blob_ref[10]
    dz = ndc_x * blob_ref[5] + ndc_y * blob_ref[8] + blob_ref[11]
    dx, dy, dz = physics._normalize(dx, dy, dz)
    ox = jnp.full_like(dx, blob_ref[0])
    oy = jnp.full_like(dx, blob_ref[1])
    oz = jnp.full_like(dx, blob_ref[2])
    if dof:  # thin-lens, same math/RNG dims as megakernel._kernel
        lu = rng.counter_uniform(pid, sample, jnp.uint32(_CAM_SLOT + 2), seed)
        lv = rng.counter_uniform(pid, sample, jnp.uint32(_CAM_SLOT + 3), seed)
        r = blob_ref[13] * jnp.sqrt(lu)
        phi = jnp.float32(2.0 * math.pi) * lv
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        offx = r * (cphi * blob_ref[3] + sphi * blob_ref[6])
        offy = r * (cphi * blob_ref[4] + sphi * blob_ref[7])
        offz = r * (cphi * blob_ref[5] + sphi * blob_ref[8])
        denom = jnp.maximum(
            dx * blob_ref[9] + dy * blob_ref[10] + dz * blob_ref[11], 1e-6)
        tf = blob_ref[14] / denom
        fx, fy, fz = ox + dx * tf, oy + dy * tf, oz + dz * tf
        ox, oy, oz = ox + offx, oy + offy, oz + offz
        dx, dy, dz = physics._normalize(fx - ox, fy - oy, fz - oz)
    return ox, oy, oz, dx, dy, dz


def _uniforms(pid, sample, seed, k, lsb=None):
    """Per-bounce uniforms.  With ``lsb`` (6 scalars: cell-grid lo3 +
    ext3, read from the kernel's SMEM prefetch BEFORE any vjp region) the
    light pick switches to the hit-cell-keyed stream (physics.LSEL_CELLS)
    and trace_bounce draws it from the hit point; without it the legacy
    per-pixel lsel stream is emitted."""
    def u(dim):
        return rng.counter_uniform(pid, sample,
                                   jnp.uint32(k * _NDIMS + dim), seed)
    d = dict(rr=u(_DIM_RR), u1=u(_DIM_U1), u2=u(_DIM_U2),
             lobe=u(_DIM_LOBE), lu1=u(_DIM_LU1), lu2=u(_DIM_LU2))
    if lsb is None:
        d["lsel"] = u(_DIM_LSEL)
    else:
        d["lsel_lo"] = tuple(lsb[:3])
        d["lsel_ext"] = tuple(lsb[3:])
        d["sample"] = sample
        d["seed"] = seed
    return d


def _kernel_grad(meta_ref, blob_ref, lsb_ref, ct_ref, rad_ref, grad_ref,
                 st_scr, aux_scr, *, n_prims, n_light_slots, mtypes, width,
                 height, max_bounces, rr_depth, use_nee, use_mis, sky_mode,
                 dof):
    tile = pl.program_id(0)
    s_idx = pl.program_id(1)
    start_sample = meta_ref[0]
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    sample_scalar = (start_sample + s_idx).astype(jnp.uint32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
    lin = tile * TILE + rows * TILE_LANES + lanes
    in_image = lin < width * height
    pix = jnp.minimum(lin, width * height - 1)
    px = pix % width
    py = pix // width
    pid = pix.astype(jnp.uint32)
    sample = jnp.broadcast_to(sample_scalar, pid.shape)

    theta, light_prims = _read_theta(meta_ref, blob_ref, n_prims,
                                     n_light_slots)
    lsb = tuple(lsb_ref[a] for a in range(6))

    ox, oy, oz, dx, dy, dz = _raygen(blob_ref, pid, px, py, sample, seed,
                                     width, height, dof=dof)
    ones = jnp.ones_like(dx)
    zero = jnp.zeros_like(dx)
    state = (ox, oy, oz, dx, dy, dz, ones, ones, ones, zero, zero, zero, zero)
    aux = (in_image, jnp.ones_like(in_image))

    def cfg_at(k):
        return physics.BounceCfg(
            mtypes=mtypes, k=k, rr_depth=rr_depth, use_nee=use_nee,
            use_mis=use_mis, sky_mode=sky_mode, n_light_slots=n_light_slots)

    # ---- forward sweep: store bounce-entry state + masks in VMEM ---------
    for k in range(max_bounces):
        for i in range(N_STATE):
            st_scr[k, i] = state[i]
        aux_scr[k, 0] = aux[0].astype(jnp.float32)
        aux_scr[k, 1] = aux[1].astype(jnp.float32)
        u = _uniforms(pid, sample, seed, k, lsb)
        state, aux = physics.trace_bounce(theta, state, aux, u, nl, cfg_at(k))

    rad_r = jnp.where(in_image, state[9], 0.0)
    rad_g = jnp.where(in_image, state[10], 0.0)
    rad_b = jnp.where(in_image, state[11], 0.0)

    @pl.when(s_idx == 0)
    def _():
        rad_ref[0] = rad_r
        rad_ref[1] = rad_g
        rad_ref[2] = rad_b

    @pl.when(s_idx != 0)
    def _():
        rad_ref[0] += rad_r
        rad_ref[1] += rad_g
        rad_ref[2] += rad_b

    # ---- backward sweep: vjp of each bounce, replayed from residuals -----
    mask_f = in_image.astype(jnp.float32)
    state_ct = [zero] * N_STATE
    state_ct[9] = ct_ref[0] * mask_f
    state_ct[10] = ct_ref[1] * mask_f
    state_ct[11] = ct_ref[2] * mask_f
    state_ct = tuple(state_ct)
    theta_ct = jax.tree.map(lambda x: jnp.float32(0.0), theta)

    for k in reversed(range(max_bounces)):
        st_k = tuple(st_scr[k, i] for i in range(N_STATE))
        aux_k = (aux_scr[k, 0] > 0.5, aux_scr[k, 1] > 0.5)
        u_k = _uniforms(pid, sample, seed, k, lsb)
        cfg_k = cfg_at(k)

        def f(th, st, aux_k=aux_k, u_k=u_k, cfg_k=cfg_k):
            new_state, new_aux = physics.trace_bounce(th, st, aux_k, u_k,
                                                      nl, cfg_k)
            return new_state, new_aux

        _, vjp_fn, _ = jax.vjp(f, theta, st_k, has_aux=True)
        th_ct_k, state_ct = vjp_fn(state_ct)
        theta_ct = jax.tree.map(jnp.add, theta_ct, th_ct_k)

    # ---- gradient write-out: accumulate across the whole grid ------------
    spheres_ct, sky_ct, lights_ct = theta_ct
    first = (tile == 0) & (s_idx == 0)

    @pl.when(first)
    def _():
        for j in range(n_prims):
            for a in range(physics.N_SPHERE_ATTRS):
                grad_ref[j * physics.N_SPHERE_ATTRS + a] = spheres_ct[j][a]
        for a in range(physics.N_SKY_ATTRS):
            grad_ref[n_prims * physics.N_SPHERE_ATTRS + a] = sky_ct[a]

    @pl.when(jnp.logical_not(first))
    def _():
        for j in range(n_prims):
            for a in range(physics.N_SPHERE_ATTRS):
                grad_ref[j * physics.N_SPHERE_ATTRS + a] += spheres_ct[j][a]
        for a in range(physics.N_SKY_ATTRS):
            grad_ref[n_prims * physics.N_SPHERE_ATTRS + a] += sky_ct[a]

    # Light-slot cotangents belong to their owning sphere's parameters.
    for l in range(n_light_slots):
        lp = light_prims[l]
        for a_idx, sph_a in enumerate(physics.LIGHT_TO_SPHERE_ATTR):
            @pl.when(l < nl)
            def _(l=l, a_idx=a_idx, sph_a=sph_a, lp=lp):
                grad_ref[lp * physics.N_SPHERE_ATTRS + sph_a] += \
                    lights_ct[l][a_idx]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "n_prims", "n_light_slots",
                     "mtypes", "max_bounces", "rr_depth", "use_nee",
                     "use_mis", "sky_mode", "dof", "interpret"))
def _launch_grad(blob, meta, lsb, ct, *, width, height, spp, n_prims,
                 n_light_slots, mtypes, max_bounces, rr_depth, use_nee,
                 use_mis, sky_mode, dof=False, interpret=False):
    n_pix = width * height
    n_tiles = pl.cdiv(n_pix, TILE)
    kernel = functools.partial(
        _kernel_grad, n_prims=n_prims, n_light_slots=n_light_slots,
        mtypes=mtypes, width=width, height=height, max_bounces=max_bounces,
        rr_depth=rr_depth, use_nee=use_nee, use_mis=use_mis,
        sky_mode=sky_mode, dof=dof)
    n_grad = n_prims * physics.N_SPHERE_ATTRS + physics.N_SKY_ATTRS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, spp),
        in_specs=[pl.BlockSpec((3, TILE_ROWS, TILE_LANES),
                               lambda i, s, *refs: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((3, TILE_ROWS, TILE_LANES),
                         lambda i, s, *refs: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((max_bounces, N_STATE, TILE_ROWS, TILE_LANES),
                       jnp.float32),
            pltpu.VMEM((max_bounces, 2, TILE_ROWS, TILE_LANES), jnp.float32),
        ],
    )
    rad, grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((3, n_tiles * TILE_ROWS, TILE_LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_grad,), jnp.float32),
        ),
        interpret=interpret,
    )(meta, blob, lsb, ct)
    flat = rad.reshape(3, n_tiles * TILE)[:, :n_pix]
    img = jnp.moveaxis(flat, 0, -1).reshape(height, width, 3)
    return img, grads


def render_and_grad(scene, camera, width, height, start_sample, spp, *,
                    ct_image=None, max_bounces=8, rr_depth=3, use_nee=True,
                    use_mis=True, seed=0, dof=None, interpret=False):
    """Fused fwd+bwd: returns (radiance_sum_image, grads).

    grads: dict with 'centers' (P,3), 'radii' (P,), 'albedo'/'emission'
    (M,3), 'roughness'/'ior' (M,), 'sky_params' (2,3) — gradients of
    ``sum(ct_image ⊙ radiance_sum)`` (ct defaults to ones).
    """
    blob, mtypes, light_prims = pack_scene(scene, camera)
    if dof is None:  # auto: thin-lens iff the camera has a real aperture
        dof = bool(blob[13] > 0.0)
    n_prims = scene.capacity
    meta = np.zeros(_META_FIXED + n_prims + max(len(light_prims), 1),
                    np.int32)
    meta[0] = start_sample
    meta[1] = seed
    meta[2] = len(light_prims)
    meta[_META_FIXED:_META_FIXED + n_prims] = np.asarray(mtypes, np.int32)
    for i, p in enumerate(light_prims):
        meta[_META_FIXED + n_prims + i] = p

    n_pix = width * height
    n_tiles = pl.cdiv(n_pix, TILE)
    if ct_image is None:
        ct_flat = jnp.ones((3, n_tiles * TILE_ROWS, TILE_LANES), jnp.float32)
    else:
        ct = jnp.moveaxis(jnp.asarray(ct_image, jnp.float32).reshape(n_pix, 3),
                          -1, 0)
        pad = n_tiles * TILE - n_pix
        ct = jnp.pad(ct, ((0, 0), (0, pad)))
        ct_flat = ct.reshape(3, n_tiles * TILE_ROWS, TILE_LANES)

    lsb = physics.lsel_bounds(scene.centers, scene.radii,
                              scene.prim_valid)
    img, gvec = _launch_grad(
        jnp.asarray(blob), jnp.asarray(meta), lsb, ct_flat,
        width=width, height=height, spp=spp, n_prims=n_prims,
        n_light_slots=len(light_prims), mtypes=tuple(mtypes),
        max_bounces=max_bounces, rr_depth=rr_depth, use_nee=bool(use_nee),
        use_mis=bool(use_mis), sky_mode=scene.sky_mode, dof=bool(dof),
        interpret=interpret)

    # Unflatten: per-sphere rows -> scene arrays; material attrs aggregate
    # over the spheres sharing each material row.
    A = physics.N_SPHERE_ATTRS
    sph = gvec[:n_prims * A].reshape(n_prims, A)
    sky_g = gvec[n_prims * A:n_prims * A + physics.N_SKY_ATTRS].reshape(2, 3)
    valid = scene.prim_valid.astype(jnp.float32)[:, None]
    sph = sph * valid
    n_mats = scene.materials.num_materials
    mat_one_hot = jax.nn.one_hot(scene.mat_id, n_mats, dtype=jnp.float32) \
        * valid  # (P, M)
    grads = {
        "centers": sph[:, 0:3],
        "radii": sph[:, 3],
        "albedo": mat_one_hot.T @ sph[:, 4:7],
        "emission": mat_one_hot.T @ sph[:, 7:10],
        "roughness": mat_one_hot.T @ sph[:, 10],
        "ior": mat_one_hot.T @ sph[:, 11],
        "sky_params": sky_g,
    }
    return img, grads
