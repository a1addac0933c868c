"""Pallas TPU wavefront megakernel — the fast forward path.

The reference's per-pixel recursive CPU loop (CPUPathTracer.cpp:57-82,
197-284) becomes one fused TPU kernel: ray generation → sphere intersection
→ shading/NEE → bounce iteration all happen on (8, 128)-shaped SoA vector
registers that never leave VMEM/VREGs; the only HBM traffic is the final
radiance tile store.  Design decisions, in TPU terms:

* **Uniforms in SMEM, not gathers.**  Scene spheres, materials, camera and
  sky parameters arrive as two scalar-prefetch arrays (f32 ``blob`` +
  i32 ``meta``).  The per-sphere loop is a *static* unroll reading scalar
  uniforms and vector-selecting the winning hit's attributes into per-lane
  registers — zero dynamic gathers, the pattern the VPU likes.  This caps
  the kernel at small scenes (≲128 spheres — Cornell-class); larger scenes
  take the BVH path in the pure-JAX backend.

* **Grid = (ray tiles, samples).**  The sample axis is innermost, so each
  tile's radiance block stays resident in VMEM while samples accumulate
  (the classic revisiting-output reduction); one HBM store per tile.

* **Counter-based RNG in-kernel.**  The same uint32 hash chain as
  ``spt_tpu.core.rng`` runs on the VPU, so the kernel consumes *identical*
  random streams to the pure-JAX integrator — parity tests compare them
  directly, and path-replay backward can re-derive any draw.

* **Branchless materials.** Lambert / GGX metal / smooth dielectric are all
  evaluated and vector-selected by material id — no divergence.

Radiance semantics match ``integrator_jax.render_megasample`` (NEE with
sphere-cone sampling, MIS power heuristic, RR after rr_depth) by
construction; see tests/test_pallas.py.
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
from ..core.materials import DIELECTRIC, LAMBERT, METAL
from ..core.scene import SKY_CONSTANT, SKY_GRADIENT, SceneData

TILE_ROWS = 8
TILE_LANES = 128
TILE = TILE_ROWS * TILE_LANES  # rays per grid step

_NDIMS = 8
_DIM_RR, _DIM_U1, _DIM_U2, _DIM_LSEL, _DIM_LU1, _DIM_LU2, _DIM_LOBE = range(7)
_CAM_SLOT = 0xFFFF * _NDIMS

TMIN = 1e-3
EPS = 1e-4
BIG = 1e30

# blob layout ---------------------------------------------------------------
_CAM_OFF = 0          # pos3, right3, up3, fwd3, tan_half_fov -> 13
_SKY_OFF = 13         # horizon3, zenith3 -> 6
_SPH_OFF = 19         # per sphere: cx,cy,cz,r, ar,ag,ab, er,eg,eb, rough,ior
_SPH_STRIDE = 12
# meta layout: [start_sample, seed, n_lights, mtype*P, light_prim*L]
_META_FIXED = 3


def pack_scene(scene: SceneData, camera) -> tuple[np.ndarray, list[int], int]:
    """Host-side packing of scene+camera uniforms -> (blob, mtypes, n_lights)."""
    cap = scene.capacity
    blob = np.zeros(_SPH_OFF + _SPH_STRIDE * cap, np.float32)
    blob[0:3] = np.asarray(camera.position)
    blob[3:6] = np.asarray(camera.right)
    blob[6:9] = np.asarray(camera.up)
    blob[9:12] = np.asarray(camera.forward)
    blob[12] = float(camera.tan_half_fov)
    blob[_SKY_OFF:_SKY_OFF + 3] = np.asarray(scene.sky_params[0])
    blob[_SKY_OFF + 3:_SKY_OFF + 6] = np.asarray(scene.sky_params[1])
    centers = np.asarray(scene.centers)
    radii = np.asarray(scene.radii)
    valid = np.asarray(scene.prim_valid)
    mat_id = np.asarray(scene.mat_id)
    albedo = np.asarray(scene.materials.albedo)
    emission = np.asarray(scene.materials.emission)
    rough = np.asarray(scene.materials.roughness)
    ior = np.asarray(scene.materials.ior)
    mtype = np.asarray(scene.materials.mtype)
    mtypes = []
    for i in range(cap):
        off = _SPH_OFF + _SPH_STRIDE * i
        if valid[i]:
            m = int(mat_id[i])
            blob[off:off + 4] = [centers[i, 0], centers[i, 1], centers[i, 2],
                                 radii[i]]
            blob[off + 4:off + 7] = albedo[m]
            blob[off + 7:off + 10] = emission[m]
            blob[off + 10] = rough[m]
            blob[off + 11] = ior[m]
            mtypes.append(int(mtype[m]))
        else:
            blob[off + 11] = 1.5
            mtypes.append(0)
    light_prims = [int(p) for p, ok in
                   zip(np.asarray(scene.light_idx), np.asarray(scene.light_valid))
                   if ok]
    return blob, mtypes, light_prims


# -- component-tuple vec3 helpers (all (8,128) f32) -------------------------

def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _onb(nx, ny, nz):
    """Reference ONB: up = +z unless |n.z| >= 0.999 else +x."""
    use_z = jnp.abs(nz) < 0.999
    ux = jnp.where(use_z, 0.0, 1.0)
    uy = jnp.zeros_like(nx)
    uz = jnp.where(use_z, 1.0, 0.0)
    tx, ty, tz = _cross(ux, uy, uz, nx, ny, nz)
    tx, ty, tz = _normalize(tx, ty, tz)
    bx, by, bz = _cross(nx, ny, nz, tx, ty, tz)
    return tx, ty, tz, bx, by, bz


def _schlick1(cos_i, f0):
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    m2 = m * m
    return f0 + (1.0 - f0) * m2 * m2 * m


def _fresnel_dielectric(cos_i, eta_ti):
    """Exact dielectric Fresnel; eta_ti = n_t/n_i (per-lane)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 / (eta_ti * eta_ti)) * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    rs = (cos_i - eta_ti * cos_t) / jnp.maximum(cos_i + eta_ti * cos_t, 1e-8)
    rp = (eta_ti * cos_i - cos_t) / jnp.maximum(eta_ti * cos_i + cos_t, 1e-8)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin2_t >= 1.0, 1.0, f)


def _kernel(meta_ref, blob_ref, out_ref, *, n_prims, n_light_slots, mtypes,
            width, height, max_bounces, rr_depth, use_nee, use_mis, sky_mode):
    tile = pl.program_id(0)
    s_idx = pl.program_id(1)
    start_sample = meta_ref[0]
    seed = meta_ref[1].astype(jnp.uint32)
    nl = meta_ref[2]
    sample = (start_sample + s_idx).astype(jnp.uint32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
    lin = tile * TILE + rows * TILE_LANES + lanes
    in_image = lin < width * height
    pix = jnp.minimum(lin, width * height - 1)
    px = pix % width    # int32: Mosaic has no u32->f32 cast, so keep i32
    py = pix // width
    pid = pix.astype(jnp.uint32)

    def u(bounce_dim):
        return rng.counter_uniform(pid, sample, jnp.uint32(bounce_dim), seed)

    def u_dyn(bounce, dim):
        bd = (bounce * _NDIMS + dim)
        return rng.counter_uniform(pid, sample, jnp.uint32(bd), seed)

    # -- camera ray generation (jittered pinhole) --------------------------
    jx = u(_CAM_SLOT + 0)
    jy = u(_CAM_SLOT + 1)
    aspect = jnp.float32(width / height)
    tanf = blob_ref[12]
    sx = (px.astype(jnp.float32) + jx) * jnp.float32(1.0 / width)
    sy = (py.astype(jnp.float32) + jy) * jnp.float32(1.0 / height)
    ndc_x = (2.0 * sx - 1.0) * aspect * tanf
    ndc_y = (1.0 - 2.0 * sy) * tanf
    dx = ndc_x * blob_ref[3] + ndc_y * blob_ref[6] + blob_ref[9]
    dy = ndc_x * blob_ref[4] + ndc_y * blob_ref[7] + blob_ref[10]
    dz = ndc_x * blob_ref[5] + ndc_y * blob_ref[8] + blob_ref[11]
    dx, dy, dz = _normalize(dx, dy, dz)
    ox = jnp.full_like(dx, blob_ref[0])
    oy = jnp.full_like(dx, blob_ref[1])
    oz = jnp.full_like(dx, blob_ref[2])

    zero = jnp.zeros_like(dx)
    rad_r, rad_g, rad_b = zero, zero, zero
    th_r = jnp.ones_like(dx)
    th_g, th_b = th_r, th_r
    active = in_image
    prev_pdf = zero
    prev_spec = jnp.ones_like(active)

    def sphere_scalars(j):
        off = _SPH_OFF + _SPH_STRIDE * j
        return [blob_ref[off + k] for k in range(_SPH_STRIDE)]

    def intersect_all(px_, py_, pz_, dx_, dy_, dz_, tmax):
        """Static unroll over spheres; returns nearest (t, attrs...)."""
        t_best = jnp.full_like(px_, BIG)
        h = {k: zero for k in ("cx", "cy", "cz", "r", "ar", "ag", "ab",
                               "er", "eg", "eb", "rough", "ior")}
        h["ior"] = jnp.full_like(px_, 1.5)
        hm_lam = jnp.zeros_like(active)
        hm_met = jnp.zeros_like(active)
        hm_die = jnp.zeros_like(active)
        for j in range(n_prims):
            cx, cy, cz, r, ar, ag, ab, er, eg, eb, ro, io = sphere_scalars(j)
            ocx = cx - px_
            ocy = cy - py_
            ocz = cz - pz_
            b = _dot(dx_, dy_, dz_, ocx, ocy, ocz)
            c = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = b - sq
            t1 = b + sq
            tj = jnp.where(t0 > TMIN, t0, t1)
            ok = (disc > 0.0) & (tj > TMIN) & (tj < t_best) & (tj < tmax)
            t_best = jnp.where(ok, tj, t_best)
            vals = dict(cx=cx, cy=cy, cz=cz, r=r, ar=ar, ag=ag, ab=ab,
                        er=er, eg=eg, eb=eb, rough=ro, ior=io)
            for k in h:
                h[k] = jnp.where(ok, vals[k], h[k])
            # Static material type per sphere -> pure boolean algebra (Mosaic
            # has no select on i1 vectors).
            mt = mtypes[j]
            hm_lam = (hm_lam & ~ok) | (ok if mt == LAMBERT else jnp.zeros_like(ok))
            hm_met = (hm_met & ~ok) | (ok if mt == METAL else jnp.zeros_like(ok))
            hm_die = (hm_die & ~ok) | (ok if mt == DIELECTRIC else jnp.zeros_like(ok))
        return t_best, h, hm_lam, hm_met, hm_die

    def occluded_before(px_, py_, pz_, dx_, dy_, dz_, tmax):
        blocked = jnp.zeros_like(active)
        for j in range(n_prims):
            cx, cy, cz, r = sphere_scalars(j)[:4]
            ocx = cx - px_
            ocy = cy - py_
            ocz = cz - pz_
            b = _dot(dx_, dy_, dz_, ocx, ocy, ocz)
            c = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0 = b - sq
            t1 = b + sq
            tj = jnp.where(t0 > TMIN, t0, t1)
            blocked = blocked | ((disc > 0.0) & (tj > TMIN) & (tj < tmax))
        return blocked

    def sky(dx_, dy_, dz_):
        if sky_mode == SKY_GRADIENT:
            t = 0.5 * (dy_ + 1.0)
            return (blob_ref[_SKY_OFF + 0] * (1.0 - t) + blob_ref[_SKY_OFF + 3] * t,
                    blob_ref[_SKY_OFF + 1] * (1.0 - t) + blob_ref[_SKY_OFF + 4] * t,
                    blob_ref[_SKY_OFF + 2] * (1.0 - t) + blob_ref[_SKY_OFF + 5] * t)
        if sky_mode == SKY_CONSTANT:
            one = jnp.ones_like(dx_)
            return (blob_ref[_SKY_OFF + 0] * one, blob_ref[_SKY_OFF + 1] * one,
                    blob_ref[_SKY_OFF + 2] * one)
        z = jnp.zeros_like(dx_)
        return z, z, z

    for k in range(max_bounces):
        t, h, m_lam, m_met, m_die = intersect_all(ox, oy, oz, dx, dy, dz,
                                                  jnp.full_like(ox, BIG))
        hit = active & (t < BIG)
        miss = active & ~(t < BIG)

        sk_r, sk_g, sk_b = sky(dx, dy, dz)
        rad_r = jnp.where(miss, rad_r + th_r * sk_r, rad_r)
        rad_g = jnp.where(miss, rad_g + th_g * sk_g, rad_g)
        rad_b = jnp.where(miss, rad_b + th_b * sk_b, rad_b)

        t_safe = jnp.where(hit, t, 1.0)
        hx = ox + t_safe * dx
        hy = oy + t_safe * dy
        hz = oz + t_safe * dz
        ngx, ngy, ngz = _normalize(hx - h["cx"], hy - h["cy"], hz - h["cz"])
        wox, woy, woz = -dx, -dy, -dz

        # Emission at the hit, MIS-weighted against NEE.
        emitting = hit & ((h["er"] + h["eg"] + h["eb"]) > 0.0) \
            & (_dot(wox, woy, woz, ngx, ngy, ngz) > 0.0)
        if use_nee and use_mis:
            # pdf of having cone-sampled this emitter from the prev vertex.
            tocx = h["cx"] - ox
            tocy = h["cy"] - oy
            tocz = h["cz"] - oz
            d2 = jnp.maximum(_dot(tocx, tocy, tocz, tocx, tocy, tocz), 1e-12)
            sin2 = jnp.clip(h["r"] * h["r"] / d2, 0.0, 1.0)
            cosm = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2))
            pdf_lh = 1.0 / jnp.maximum(2.0 * math.pi * (1.0 - cosm), 1e-9)
            pdf_lh = pdf_lh / jnp.maximum(nl.astype(jnp.float32), 1.0)
            pp2 = prev_pdf * prev_pdf
            w_b = pp2 / jnp.maximum(pp2 + pdf_lh * pdf_lh, 1e-20)
            w_emit = jnp.where(prev_spec, 1.0, w_b)
        elif use_nee:
            w_emit = jnp.where(prev_spec, 1.0, 0.0)
        else:
            w_emit = jnp.ones_like(prev_pdf)
        if use_nee:
            # With no lights in the scene NEE never fires: count emission.
            w_emit = jnp.where(nl > 0, w_emit, 1.0)
        rad_r = jnp.where(emitting, rad_r + th_r * h["er"] * w_emit, rad_r)
        rad_g = jnp.where(emitting, rad_g + th_g * h["eg"] * w_emit, rad_g)
        rad_b = jnp.where(emitting, rad_b + th_b * h["eb"] * w_emit, rad_b)

        # Shading frame: flip normal to the wo side.
        front = _dot(wox, woy, woz, ngx, ngy, ngz) > 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nsx, nsy, nsz = ngx * sgn, ngy * sgn, ngz * sgn

        u_lobe = u_dyn(k, _DIM_LOBE)
        u1 = u_dyn(k, _DIM_U1)
        u2 = u_dyn(k, _DIM_U2)

        tx, ty, tz, bx, by, bz = _onb(nsx, nsy, nsz)

        # Lambert: cosine hemisphere.
        ct = jnp.sqrt(u1)
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
        phi = (2.0 * math.pi) * u2
        lx = st * jnp.cos(phi)
        ly = st * jnp.sin(phi)
        dl_x = lx * tx + ly * bx + ct * nsx
        dl_y = lx * ty + ly * by + ct * nsy
        dl_z = lx * tz + ly * bz + ct * nsz
        pdf_lam = jnp.maximum(
            _dot(nsx, nsy, nsz, dl_x, dl_y, dl_z), 0.0) * jnp.float32(1.0 / math.pi)

        # Metal: GGX NDF half-vector sample.
        alpha = jnp.maximum(h["rough"] * h["rough"], 1e-4)
        a2g = alpha * alpha
        cos2h = (1.0 - u1) / (1.0 + (a2g - 1.0) * u1)
        cth = jnp.sqrt(jnp.maximum(cos2h, 0.0))
        sth = jnp.sqrt(jnp.maximum(1.0 - cos2h, 0.0))
        hxv = sth * jnp.cos(phi)
        hyv = sth * jnp.sin(phi)
        hwx = hxv * tx + hyv * bx + cth * nsx
        hwy = hxv * ty + hyv * by + cth * nsy
        hwz = hxv * tz + hyv * bz + cth * nsz
        odoth = jnp.maximum(_dot(wox, woy, woz, hwx, hwy, hwz), 1e-6)
        dm_x = 2.0 * odoth * hwx - wox
        dm_y = 2.0 * odoth * hwy - woy
        dm_z = 2.0 * odoth * hwz - woz
        ndotl_m = _dot(nsx, nsy, nsz, dm_x, dm_y, dm_z)
        ndotv = jnp.maximum(_dot(nsx, nsy, nsz, wox, woy, woz), 1e-6)
        ndoth = jnp.maximum(_dot(nsx, nsy, nsz, hwx, hwy, hwz), 1e-6)
        kg = alpha * 0.5
        g1v = ndotv / (ndotv * (1.0 - kg) + kg)
        ndotl_mc = jnp.maximum(ndotl_m, 1e-6)
        g1l = ndotl_mc / (ndotl_mc * (1.0 - kg) + kg)
        gterm = g1v * g1l
        met_ok = ndotl_m > 1e-6
        f_met_r = _schlick1(odoth, h["ar"])
        f_met_g = _schlick1(odoth, h["ag"])
        f_met_b = _schlick1(odoth, h["ab"])
        w_met_scale = jnp.where(met_ok, gterm * odoth / (ndotv * ndoth), 0.0)
        dggx = a2g / jnp.maximum(
            math.pi * ((ndoth * ndoth * (a2g - 1.0) + 1.0) ** 2), 1e-12)
        pdf_met = dggx * ndoth / (4.0 * odoth)

        # Dielectric (smooth).
        ior = jnp.maximum(h["ior"], 1.001)
        eta = jnp.where(front, 1.0 / ior, ior)       # n_i/n_t
        cos_i = jnp.maximum(_dot(wox, woy, woz, nsx, nsy, nsz), 1e-6)
        f_die = _fresnel_dielectric(cos_i, 1.0 / eta)
        # reflect(-wo, ns)
        dr_x = 2.0 * cos_i * nsx - wox
        dr_y = 2.0 * cos_i * nsy - woy
        dr_z = 2.0 * cos_i * nsz - woz
        sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        dt_x = eta * (-wox) + (eta * cos_i - cos_t) * nsx
        dt_y = eta * (-woy) + (eta * cos_i - cos_t) * nsy
        dt_z = eta * (-woz) + (eta * cos_i - cos_t) * nsz
        dt_x, dt_y, dt_z = _normalize(dt_x, dt_y, dt_z)
        refl = (u_lobe < f_die) | tir
        dd_x = jnp.where(refl, dr_x, dt_x)
        dd_y = jnp.where(refl, dr_y, dt_y)
        dd_z = jnp.where(refl, dr_z, dt_z)

        # Select by material.
        nd_x = jnp.where(m_lam, dl_x, jnp.where(m_met, dm_x, dd_x))
        nd_y = jnp.where(m_lam, dl_y, jnp.where(m_met, dm_y, dd_y))
        nd_z = jnp.where(m_lam, dl_z, jnp.where(m_met, dm_z, dd_z))
        w_r = jnp.where(m_lam, h["ar"], jnp.where(
            m_met, f_met_r * w_met_scale, jnp.where(refl, 1.0, h["ar"])))
        w_g = jnp.where(m_lam, h["ag"], jnp.where(
            m_met, f_met_g * w_met_scale, jnp.where(refl, 1.0, h["ag"])))
        w_b2 = jnp.where(m_lam, h["ab"], jnp.where(
            m_met, f_met_b * w_met_scale, jnp.where(refl, 1.0, h["ab"])))
        pdf_new = jnp.where(m_lam, pdf_lam, jnp.where(m_met, pdf_met, 0.0))
        spec_new = m_die
        dead = m_met & ~met_ok
        off_sign = jnp.where(m_die & ~refl, -1.0, 1.0)

        # -- next-event estimation ------------------------------------------
        if use_nee and n_light_slots > 0:
            ul = u_dyn(k, _DIM_LSEL)
            lu1 = u_dyn(k, _DIM_LU1)
            lu2 = u_dyn(k, _DIM_LU2)
            nlf = jnp.maximum(nl.astype(jnp.float32), 1.0)
            li = jnp.minimum((ul * nlf).astype(jnp.int32), nl - 1)
            lcx, lcy, lcz, lrr = zero, zero, zero, zero
            ler, leg, leb = zero, zero, zero
            for l in range(n_light_slots):
                lp = meta_ref[_META_FIXED + n_prims + l]
                off = _SPH_OFF + _SPH_STRIDE * lp
                sel = (li == l) & (l < nl)
                lcx = jnp.where(sel, blob_ref[off + 0], lcx)
                lcy = jnp.where(sel, blob_ref[off + 1], lcy)
                lcz = jnp.where(sel, blob_ref[off + 2], lcz)
                lrr = jnp.where(sel, blob_ref[off + 3], lrr)
                ler = jnp.where(sel, blob_ref[off + 7], ler)
                leg = jnp.where(sel, blob_ref[off + 8], leg)
                leb = jnp.where(sel, blob_ref[off + 9], leb)
            pox = hx + EPS * nsx
            poy = hy + EPS * nsy
            poz = hz + EPS * nsz
            tocx = lcx - pox
            tocy = lcy - poy
            tocz = lcz - poz
            d2 = jnp.maximum(_dot(tocx, tocy, tocz, tocx, tocy, tocz), 1e-12)
            dist = jnp.sqrt(d2)
            inside_l = dist <= lrr
            sin2m = jnp.clip(lrr * lrr / d2, 0.0, 1.0)
            cosm = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2m))
            ctl = 1.0 - lu1 * (1.0 - cosm)
            stl = jnp.sqrt(jnp.maximum(0.0, 1.0 - ctl * ctl))
            phil = (2.0 * math.pi) * lu2
            wlx, wly, wlz = tocx / dist, tocy / dist, tocz / dist
            ltx, lty, ltz, lbx, lby, lbz = _onb(wlx, wly, wlz)
            ldx = stl * jnp.cos(phil) * ltx + stl * jnp.sin(phil) * lbx + ctl * wlx
            ldy = stl * jnp.cos(phil) * lty + stl * jnp.sin(phil) * lby + ctl * wly
            ldz = stl * jnp.cos(phil) * ltz + stl * jnp.sin(phil) * lbz + ctl * wlz
            pdf_l = 1.0 / jnp.maximum(2.0 * math.pi * (1.0 - cosm), 1e-9)
            pdf_l = pdf_l / nlf
            # distance to light along sampled dir
            locx = lcx - pox
            locy = lcy - poy
            locz = lcz - poz
            bl = _dot(ldx, ldy, ldz, locx, locy, locz)
            cl = _dot(locx, locy, locz, locx, locy, locz) - lrr * lrr
            discl = jnp.maximum(bl * bl - cl, 0.0)
            t_l = bl - jnp.sqrt(discl)
            blocked = occluded_before(pox, poy, poz, ldx, ldy, ldz,
                                      t_l - jnp.float32(1e-3))
            lit = ~blocked & ~inside_l & (t_l > TMIN)
            # BSDF eval f·cos at ldir.
            ndotl = jnp.maximum(_dot(nsx, nsy, nsz, ldx, ldy, ldz), 0.0)
            f_lam_s = jnp.float32(1.0 / math.pi)
            pdf_b_lam = ndotl * jnp.float32(1.0 / math.pi)
            # GGX eval
            hhx, hhy, hhz = _normalize(wox + ldx, woy + ldy, woz + ldz)
            ndoth_e = jnp.maximum(_dot(nsx, nsy, nsz, hhx, hhy, hhz), 1e-6)
            odoth_e = jnp.maximum(_dot(wox, woy, woz, hhx, hhy, hhz), 1e-6)
            dggx_e = a2g / jnp.maximum(
                math.pi * ((ndoth_e * ndoth_e * (a2g - 1.0) + 1.0) ** 2), 1e-12)
            ndotl_c = jnp.maximum(ndotl, 1e-6)
            g1l_e = ndotl_c / (ndotl_c * (1.0 - kg) + kg)
            g_e = g1v * g1l_e
            fmr = _schlick1(odoth_e, h["ar"])
            fmg = _schlick1(odoth_e, h["ag"])
            fmb = _schlick1(odoth_e, h["ab"])
            spec_e = dggx_e * g_e / (4.0 * ndotv * ndotl_c)
            fcos_r = jnp.where(m_lam, h["ar"] * f_lam_s, jnp.where(
                m_met, fmr * spec_e, 0.0)) * ndotl
            fcos_g = jnp.where(m_lam, h["ag"] * f_lam_s, jnp.where(
                m_met, fmg * spec_e, 0.0)) * ndotl
            fcos_b = jnp.where(m_lam, h["ab"] * f_lam_s, jnp.where(
                m_met, fmb * spec_e, 0.0)) * ndotl
            pdf_b_at_l = jnp.where(m_lam, pdf_b_lam, jnp.where(
                m_met, dggx_e * ndoth_e / (4.0 * odoth_e), 0.0))
            if use_mis:
                pl2 = pdf_l * pdf_l
                w_nee = pl2 / jnp.maximum(pl2 + pdf_b_at_l * pdf_b_at_l, 1e-20)
            else:
                w_nee = jnp.ones_like(pdf_l)
            scale = w_nee / jnp.maximum(pdf_l, 1e-12)
            nee_ok = hit & lit & ~spec_new & (pdf_l > 0.0) & (nl > 0)
            rad_r = jnp.where(nee_ok, rad_r + th_r * fcos_r * ler * scale, rad_r)
            rad_g = jnp.where(nee_ok, rad_g + th_g * fcos_g * leg * scale, rad_g)
            rad_b = jnp.where(nee_ok, rad_b + th_b * fcos_b * leb * scale, rad_b)

        # -- throughput update + Russian roulette ---------------------------
        th_r_n = th_r * w_r
        th_g_n = th_g * w_g
        th_b_n = th_b * w_b2
        active_n = hit & ~dead
        u_rr = u_dyn(k, _DIM_RR)
        if k >= rr_depth:
            p_cont = jnp.clip(jnp.maximum(th_r_n, jnp.maximum(th_g_n, th_b_n)),
                              0.05, 0.95)
            kill = u_rr > p_cont
            active_n = active_n & ~kill
            inv_p = 1.0 / p_cont
            th_r_n = th_r_n * inv_p
            th_g_n = th_g_n * inv_p
            th_b_n = th_b_n * inv_p

        ox = jnp.where(active_n, hx + EPS * off_sign * nsx, ox)
        oy = jnp.where(active_n, hy + EPS * off_sign * nsy, oy)
        oz = jnp.where(active_n, hz + EPS * off_sign * nsz, oz)
        dx = jnp.where(active_n, nd_x, dx)
        dy = jnp.where(active_n, nd_y, dy)
        dz = jnp.where(active_n, nd_z, dz)
        th_r = jnp.where(active_n, th_r_n, th_r)
        th_g = jnp.where(active_n, th_g_n, th_g)
        th_b = jnp.where(active_n, th_b_n, th_b)
        prev_pdf = jnp.where(active_n, pdf_new, prev_pdf)
        prev_spec = (active_n & spec_new) | (~active_n & prev_spec)
        active = active_n

    rad_r = jnp.where(in_image, rad_r, 0.0)
    rad_g = jnp.where(in_image, rad_g, 0.0)
    rad_b = jnp.where(in_image, rad_b, 0.0)

    @pl.when(s_idx == 0)
    def _():
        out_ref[0] = rad_r
        out_ref[1] = rad_g
        out_ref[2] = rad_b

    @pl.when(s_idx != 0)
    def _():
        out_ref[0] += rad_r
        out_ref[1] += rad_g
        out_ref[2] += rad_b


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "n_prims", "n_light_slots",
                     "mtypes", "max_bounces", "rr_depth", "use_nee",
                     "use_mis", "sky_mode", "interpret"))
def _launch(blob, meta, *, width, height, spp, n_prims, n_light_slots,
            mtypes, max_bounces, rr_depth, use_nee, use_mis, sky_mode,
            interpret=False):
    n_pix = width * height
    n_tiles = pl.cdiv(n_pix, TILE)
    kernel = functools.partial(
        _kernel, n_prims=n_prims, n_light_slots=n_light_slots,
        mtypes=mtypes, width=width, height=height, max_bounces=max_bounces,
        rr_depth=rr_depth, use_nee=use_nee, use_mis=use_mis,
        sky_mode=sky_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, spp),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (3, TILE_ROWS, TILE_LANES),
            lambda i, s, *refs: (0, i, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, n_tiles * TILE_ROWS, TILE_LANES),
                                       jnp.float32),
        interpret=interpret,
    )(meta, blob)
    flat = out.reshape(3, n_tiles * TILE)[:, :n_pix]
    return jnp.moveaxis(flat, 0, -1).reshape(height, width, 3)


def render_tiles(scene: SceneData, camera, width: int, height: int,
                 start_sample: int, spp: int, *, max_bounces=8, rr_depth=3,
                 use_nee=True, use_mis=True, seed=0, interpret=False):
    """Render ``spp`` samples with the megakernel; returns (H,W,3) radiance sum.

    Matches ``integrator_jax.render_megasample(..., sample_ids=
    arange(start_sample, start_sample+spp))`` semantically (same RNG streams,
    same estimators); differs only in float op ordering.
    """
    blob, mtypes, light_prims = pack_scene(scene, camera)
    n_prims = scene.capacity
    meta = np.zeros(_META_FIXED + n_prims + max(len(light_prims), 1), np.int32)
    meta[0] = start_sample
    meta[1] = seed
    meta[2] = len(light_prims)
    mt = np.asarray(mtypes, np.int32)
    meta[_META_FIXED:_META_FIXED + n_prims] = mt
    for i, p in enumerate(light_prims):
        meta[_META_FIXED + n_prims + i] = p
    return _launch(
        jnp.asarray(blob), jnp.asarray(meta),
        width=width, height=height, spp=spp, n_prims=n_prims,
        n_light_slots=len(light_prims), mtypes=tuple(mtypes),
        max_bounces=max_bounces, rr_depth=rr_depth,
        use_nee=bool(use_nee), use_mis=bool(use_mis),
        sky_mode=scene.sky_mode, interpret=interpret)
