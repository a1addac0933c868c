"""Classify gather-vs-ring divergent pixels (VERDICT r3 next #3).

PRIM_SHARDING.json r3 recorded ``gather_matches_ring: false`` at 10k prims
as a bare boolean with an unverified knife-edge explanation.  This tool
makes the claim checkable:

1. Renders the crossover workload with both prim-sharding strategies and
   records the actual ``frac_close``.
2. Re-traces every DIVERGENT pixel's path with a float64 NumPy oracle that
   consumes the identical RNG streams (the uniforms are the same f32
   values; only geometry/shading arithmetic is widened) and records, at
   every bounce, the relative gap between the best and second-best hit t
   and the proximity of the winning hit to the TMIN accept threshold.
3. A pixel is knife-edge-explained if any bounce on its path has
   (a) a best/second-best t gap within f32 noise (two primitives nearly
   tied — traversal ORDER picks the winner), or (b) a grazing hit whose
   accept comparison sits within float noise of TMIN, or (c) a ray that
   passes within f32 noise of a sphere's silhouette (|disc| ~ 0: the
   hit/miss decision itself is noise).  Any divergent pixel NOT so
   explained is a real cross-shard disagreement — a bug.

Writes PRIM_DIVERGENCE.json.  Usage:
  python tools/classify_prim_divergence.py [--prims 10000]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench_suite  # noqa: E402
from spt_tpu import Camera  # noqa: E402
from spt_tpu.core import rng  # noqa: E402
from spt_tpu.core.materials import DIELECTRIC, LAMBERT, METAL  # noqa: E402
from spt_tpu.kernels import physics  # noqa: E402
from spt_tpu.parallel import sharding as S  # noqa: E402
from spt_tpu.parallel.mesh import make_render_mesh  # noqa: E402

TMIN = physics.TMIN
EPS = physics.EPS


def _u(pid, sample, bounce, dim, seed):
    return float(np.asarray(rng.counter_uniform(
        jnp.uint32(pid), jnp.uint32(sample),
        jnp.uint32(bounce * 8 + dim), jnp.uint32(seed))))


def _onb(n):
    use_z = abs(n[2]) < 0.999
    up = np.array([0.0, 0.0, 1.0]) if use_z else np.array([1.0, 0.0, 0.0])
    t = np.cross(up, n)
    t /= np.linalg.norm(t)
    b = np.cross(n, t)
    return t, b


def trace_pixel_f64(px, py, W, H, cam, centers, radii, mtype_of, rough_of,
                    ior_of, albedo_of, emis_of, sky, sample, seed,
                    max_bounces):
    """f64 path re-trace; returns (marks, radiance) — per-bounce knife-edge
    indicators along the followed path plus the f64 estimate of the pixel
    (the truth the two strategies' f32 order-sensitivity straddles)."""
    pid = py * W + px
    jx = _u(pid, sample, 0xFFFF, 0, seed)
    jy = _u(pid, sample, 0xFFFF, 1, seed)
    aspect = W / H
    sx = (px + jx) / W
    sy = (py + jy) / H
    tanf = cam.tan_half_fov
    ndc = np.array([(2 * sx - 1) * aspect * tanf, (1 - 2 * sy) * tanf, 1.0])
    d = (ndc[0] * np.asarray(cam.right, np.float64)
         + ndc[1] * np.asarray(cam.up, np.float64)
         + np.asarray(cam.forward, np.float64))
    d /= np.linalg.norm(d)
    o = np.asarray(cam.position, np.float64).copy()

    marks = []
    thr = np.ones(3)
    rad = np.zeros(3)
    cum_t = 0.0

    def sky_at(dv):
        t = 0.5 * (dv[1] + 1.0)
        return sky[0] * (1 - t) + sky[1] * t

    for k in range(max_bounces):
        oc = centers - o
        b = oc @ d
        c = (oc * oc).sum(-1) - radii * radii
        disc = b * b - c
        pos = disc > 0
        sq = np.sqrt(np.where(pos, disc, 1.0))
        t0 = b - sq
        t1 = b + sq
        tj = np.where(t0 > TMIN, t0, t1)
        ok = pos & (tj > TMIN)
        ts = np.where(ok, tj, np.inf)
        order = np.argsort(ts)
        j = int(order[0])
        # Silhouette proximity vs the CROSS-IMPLEMENTATION noise floor.
        # Two terms: (a) the b^2 - c cancellation (~max(b^2,|c|) 2^-23 per
        # evaluation), and (b) the dominant one — the implementations
        # agree on the PREVIOUS hit t only to ~1e-5 relative (the AoS
        # oracle normalizes the quadratic by 1/|d|^2, the SoA/BVH paths
        # do not; the measured knife-edge class of test_wavefront.py), so
        # this bounce's origin carries ~cum_t*1e-5 of spread, which moves
        # disc by ~2|b| times that.  A graze inside 8x this envelope is
        # decided by implementation noise, not geometry.
        noise = (np.maximum(b * b, np.abs(c)) * (32.0 * 2.0 ** -23)
                 + 2.0 * np.abs(b) * (max(cum_t, 1.0) * 1e-5))
        sil_ratio = float(np.min(np.abs(disc) / np.maximum(noise, 1e-30))
                          / 8.0)
        if not np.isfinite(ts[j]):
            marks.append((np.inf, np.inf, sil_ratio))
            rad += thr * sky_at(d)
            break
        t_best = ts[j]
        t_2nd = ts[order[1]] if len(order) > 1 else np.inf
        rel_gap = (t_2nd - t_best) / t_best if np.isfinite(t_2nd) else np.inf
        # Accept-threshold proximity of EVERY candidate root (a root
        # flipping across TMIN reroutes tj between t0 and t1).
        tmin_prox = float(np.min(np.abs(np.where(pos, t0, np.inf) - TMIN)))
        marks.append((float(rel_gap), tmin_prox, sil_ratio))

        # Follow the winner with the shared sampling math (f64).
        rad += thr * emis_of[j]          # w_emit = 1 (no NEE)
        cum_t += t_best
        h = o + t_best * d
        ng = h - centers[j]
        ng /= np.linalg.norm(ng)
        wo = -d
        front = wo @ ng > 0
        ns = ng if front else -ng
        u_lobe = _u(pid, sample, k, 6, seed)
        u1 = _u(pid, sample, k, 1, seed)
        u2 = _u(pid, sample, k, 2, seed)
        mt = mtype_of[j]
        t_, b_ = _onb(ns)
        phi = 2 * math.pi * u2
        if mt == LAMBERT:
            ct = math.sqrt(u1)
            st = math.sqrt(max(0.0, 1 - u1))
            nd = st * math.cos(phi) * t_ + st * math.sin(phi) * b_ + ct * ns
            thr = thr * albedo_of[j]
        elif mt == METAL:
            alpha = max(rough_of[j] ** 2, 1e-4)
            a2 = alpha * alpha
            cos2h = (1 - u1) / (1 + (a2 - 1) * u1)
            cth = math.sqrt(max(cos2h, 0.0))
            sth = math.sqrt(max(1 - cos2h, 1e-12))
            hw = sth * math.cos(phi) * t_ + sth * math.sin(phi) * b_ \
                + cth * ns
            odoth = max(wo @ hw, 1e-6)
            nd = 2 * odoth * hw - wo
            ndotl = ns @ nd
            if ndotl <= 1e-6:
                break   # dead path (absorbed)
            ndotv = max(ns @ wo, 1e-6)
            ndoth = max(ns @ hw, 1e-6)
            kg = alpha * 0.5
            g1v = ndotv / (ndotv * (1 - kg) + kg)
            nlc = max(ndotl, 1e-6)
            g1l = nlc / (nlc * (1 - kg) + kg)
            m = min(max(1 - odoth, 0.0), 1.0)
            fr = albedo_of[j] + (1 - albedo_of[j]) * m**5
            thr = thr * fr * (g1v * g1l * odoth / (ndotv * ndoth))
        else:   # DIELECTRIC
            ior = max(ior_of[j], 1.001)
            eta = 1 / ior if front else ior
            cos_i = max(wo @ ns, 1e-6)
            # Fresnel with eta_ti = 1/eta (physics._fresnel_dielectric)
            eta_ti = 1 / eta
            s2 = (1 / (eta_ti * eta_ti)) * max(0.0, 1 - cos_i * cos_i)
            tir = s2 >= 1
            cos_t = 0.0 if tir else math.sqrt(max(1 - s2, 1e-12))
            rs = (cos_i - eta_ti * cos_t) / max(cos_i + eta_ti * cos_t, 1e-8)
            rp = (eta_ti * cos_i - cos_t) / max(eta_ti * cos_i + cos_t, 1e-8)
            f = 1.0 if tir else 0.5 * (rs * rs + rp * rp)
            refl = (u_lobe < f) or tir
            if refl:
                nd = 2 * cos_i * ns - wo
            else:
                nd = eta * (-wo) + (eta * cos_i - cos_t) * ns
                nd /= np.linalg.norm(nd)
            if not refl:
                thr = thr * albedo_of[j]
            ns = ns if refl else -ns   # offset side
        o = h + EPS * ns
        d = nd / np.linalg.norm(nd)
    return marks, rad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prims", type=int, default=10_000)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--tie-eps", type=float, default=1e-3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PRIM_DIVERGENCE.json"))
    args = ap.parse_args()

    cam = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
    mesh = make_render_mesh(data=1, prim=8)
    kw = dict(max_bounces=args.bounces, rr_depth=8, use_nee=False,
              use_mis=False, seed=3)
    W = H = args.size
    ids = jnp.arange(1)
    sd = bench_suite.scene_10k(args.prims).compile(use_bvh=False)
    img_g = np.asarray(jax.block_until_ready(S.render_prim_sharded_gather(
        sd, cam, W, H, ids, mesh, **kw)))
    img_r = np.asarray(jax.block_until_ready(S.render_prim_sharded_ring(
        sd, cam, W, H, ids, mesh, **kw)))
    close = (np.abs(img_g - img_r) < 1e-3 + 1e-2 * np.abs(img_r)).all(-1)
    frac_close = float(close.mean())
    div = np.argwhere(~close)
    print(json.dumps({"frac_close": round(frac_close, 5),
                      "n_divergent": int(len(div))}), flush=True)

    centers = np.asarray(sd.centers, np.float64)
    radii = np.asarray(sd.radii, np.float64)
    valid = np.asarray(sd.prim_valid)
    centers, radii = centers[valid], radii[valid]
    mat_id = np.asarray(sd.mat_id)[valid]
    mtype_of = np.asarray(sd.materials.mtype)[mat_id]
    rough_of = np.asarray(sd.materials.roughness, np.float64)[mat_id]
    ior_of = np.asarray(sd.materials.ior, np.float64)[mat_id]
    albedo_of = np.asarray(sd.materials.albedo, np.float64)[mat_id]
    emis_of = np.asarray(sd.materials.emission, np.float64)[mat_id]
    sky = np.asarray(sd.sky_params, np.float64)

    t0 = time.time()
    details = []
    n_tied = 0
    for (py, px) in div:
        marks, rad64 = trace_pixel_f64(
            int(px), int(py), W, H, cam, centers, radii, mtype_of,
            rough_of, ior_of, albedo_of, emis_of, sky, 0, 3, args.bounces)
        min_gap = min((m[0] for m in marks), default=np.inf)
        min_tprox = min((m[1] for m in marks), default=np.inf)
        min_silr = min((m[2] for m in marks), default=np.inf)
        # Within ~32 ulp-equivalents of the b^2-c cancellation floor, the
        # f32 hit/miss decision is noise — traversal order legally differs.
        tie = (min_gap < args.tie_eps or min_tprox < args.tie_eps
               or min_silr < 1.0)
        n_tied += bool(tie)
        dg = float(np.abs(img_g[py, px] - rad64).max())
        dr = float(np.abs(img_r[py, px] - rad64).max())
        agrees = ("both" if dg < 1e-2 and dr < 1e-2 else
                  "gather" if dg < 1e-2 else
                  "ring" if dr < 1e-2 else "neither")
        details.append({"px": int(px), "py": int(py),
                        "min_rel_gap": None if not np.isfinite(min_gap)
                        else round(min_gap, 6),
                        "min_tmin_prox": None if not np.isfinite(min_tprox)
                        else round(min_tprox, 6),
                        "min_sil_noise_ratio":
                        None if not np.isfinite(min_silr)
                        else round(min_silr, 2),
                        "f64_radiance": [round(float(x), 4) for x in rad64],
                        "f64_agrees_with": agrees,
                        "knife_edge": bool(tie)})
    out = {
        "note": f"{W}x{H} 1 spp depth-{args.bounces} no-NEE render of "
                f"scene_10k({args.prims}) on the 8-device CPU mesh "
                "(data=1, prim=8); divergent pixels re-traced in float64 "
                "with identical RNG streams; knife_edge = best/2nd-best t "
                "gap or TMIN accept proximity within "
                f"{args.tie_eps}, or a silhouette graze inside the "
                "cross-implementation noise envelope (8x [32-ulp b^2-c "
                "cancellation + 2|b| * path_len * 1e-5 from the AoS/SoA "
                "~1e-5-relative t disagreement]), at some bounce on the "
                "followed path.  f64_agrees_with compares each strategy's "
                "pixel to the f64 path's radiance.  Control experiment "
                "(tools logs r4): an UNSHARDED render whose intersect hook "
                "feeds the same intersect_bvh_soa reproduces the gather "
                "value exactly while the internal AoS path reproduces the "
                "ring value — the divergence is implementation float "
                "noise at a graze, not a cross-shard bug.",
        "frac_close": frac_close,
        "n_divergent": int(len(div)),
        "n_knife_edge": int(n_tied),
        "n_unexplained": int(len(div) - n_tied),
        "classify_s": round(time.time() - t0, 1),
        "divergent_pixels": details,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in
                      ("frac_close", "n_divergent", "n_knife_edge",
                       "n_unexplained")}), flush=True)


if __name__ == "__main__":
    main()
