"""Batched ray-sphere intersection — the hot op, shaped for the MXU.

The reference delegates intersection to Embree's BVH + per-ray
``rtcIntersect1`` (CPUPathTracer.cpp:227) over one-vertex SPHERE_POINT
geometries; the analytic quadratic it relies on is documented at
/root/reference/sphere.md:126-188 (a=|D|², b=2L·D, c=|L|²−r²).

TPU-native design: rays are SoA batches, and *all primitives are tested at
once* as two (T,3)×(3,P) matmuls — the (ray × sphere) inner products land on
the MXU, the quadratic solve and min-reduction on the VPU.  For scene sizes
up to a few thousand spheres this brute-force form beats any divergent
traversal on this hardware; beyond that the BVH front-end (spt_tpu/core/bvh.py)
culls to candidate leaves and reuses the same batched test per leaf.

Convention: directions need not be unit length (``a = |d|²`` is kept), hit
distance must satisfy t > tmin (the reference's tnear = 1e-3), missing rays
get hit_id = -1 and t = inf.
"""

from __future__ import annotations

import jax.numpy as jnp

TMIN = 1e-3  # the reference's tnear (CPUPathTracer.cpp:221)


def intersect_spheres(o, d, centers, radii, valid, tmin=TMIN, tmax=jnp.inf):
    """Nearest-hit of ray batch vs sphere set.

    Args:
      o, d: (..., T, 3) ray origins / directions.
      centers: (P, 3); radii: (P,); valid: (P,) bool padding mask.
    Returns:
      t: (..., T) hit distance (inf on miss)
      hit_id: (..., T) int32 primitive index (-1 on miss)
    """
    f32 = o.dtype
    # (T,P) inner products via matmul -> MXU.
    d_dot_c = jnp.matmul(d, centers.T, preferred_element_type=f32)
    o_dot_c = jnp.matmul(o, centers.T, preferred_element_type=f32)
    a = jnp.sum(d * d, axis=-1, keepdims=True)            # (T,1)
    o2 = jnp.sum(o * o, axis=-1, keepdims=True)           # (T,1)
    c2r2 = (jnp.sum(centers * centers, axis=-1) - radii * radii)  # (P,)
    b = d_dot_c - jnp.sum(d * o, axis=-1, keepdims=True)  # (T,P): d·(c-o)
    c = o2 - 2.0 * o_dot_c + c2r2                         # (T,P): |o-c|²-r²
    disc = b * b - a * c
    pos = disc > 0.0
    # Double-where keeps the sqrt gradient finite on the disc<=0 branch.
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    inv_a = jnp.reciprocal(a)
    t0 = (b - sq) * inv_a
    t1 = (b + sq) * inv_a
    t = jnp.where(t0 > tmin, t0, t1)
    # Near-misses by the expanded form can be real grazing hits: keep them as
    # candidates (slightly negative disc) and let the refinement pass decide.
    near = disc > -1e-3 * jnp.abs(b * b + a * c)
    cand = near & (t > tmin) & (t < tmax) & valid
    t_grid = jnp.where(cand, t, jnp.inf)

    # Refinement: the expanded quadratic above (matmul-shaped, O(T·P)) loses
    # bits to cancellation near grazing incidence.  Re-solve the winning
    # candidate's quadratic per ray in the compact oc = c - o form (O(T),
    # stable); if the refined test rejects it (false grazing hit), fall back
    # to the next-nearest candidate.  Two rounds resolve everything but
    # pathological multi-way graze ties.
    inv_a0 = inv_a[..., 0]
    prim_iota = jnp.arange(t_grid.shape[-1], dtype=jnp.int32)
    t_best = jnp.full(t_grid.shape[:-1], jnp.inf, t_grid.dtype)
    hit_id = jnp.full(t_grid.shape[:-1], -1, jnp.int32)
    for _ in range(2):
        cand_t = jnp.min(t_grid, axis=-1)
        cand_id = jnp.argmin(t_grid, axis=-1).astype(jnp.int32)
        searching = jnp.isfinite(cand_t) & (hit_id < 0)
        c_sel = centers[jnp.maximum(cand_id, 0)]
        r_sel = radii[jnp.maximum(cand_id, 0)]
        oc = c_sel - o
        b_r = jnp.sum(d * oc, axis=-1)
        c_r = jnp.sum(oc * oc, axis=-1) - r_sel * r_sel
        disc_r = b_r * b_r - a[..., 0] * c_r
        pos_r = disc_r > 0.0
        sq_r = jnp.where(pos_r, jnp.sqrt(jnp.where(pos_r, disc_r, 1.0)), 0.0)
        t0_r = (b_r - sq_r) * inv_a0
        t1_r = (b_r + sq_r) * inv_a0
        t_r = jnp.where(t0_r > tmin, t0_r, t1_r)
        accept = searching & pos_r & (t_r > tmin) & (t_r < tmax)
        t_best = jnp.where(accept, t_r, t_best)
        hit_id = jnp.where(accept, cand_id, hit_id)
        # Drop rejected candidates so the next round sees the runner-up.
        rejected = searching & ~accept
        t_grid = jnp.where(rejected[..., None] & (prim_iota == cand_id[..., None]),
                           jnp.inf, t_grid)
    return t_best, hit_id


def occluded(o, d, centers, radii, valid, tmax, tmin=TMIN):
    """Any-hit (shadow ray) test: True where something blocks (tmin, tmax).

    Same quadratic as intersect_spheres but without the argmin — a pure
    any-reduce, cheaper and fusion-friendly for NEE shadow rays.
    """
    f32 = o.dtype
    d_dot_c = jnp.matmul(d, centers.T, preferred_element_type=f32)
    o_dot_c = jnp.matmul(o, centers.T, preferred_element_type=f32)
    a = jnp.sum(d * d, axis=-1, keepdims=True)
    o2 = jnp.sum(o * o, axis=-1, keepdims=True)
    c2r2 = jnp.sum(centers * centers, axis=-1) - radii * radii
    b = d_dot_c - jnp.sum(d * o, axis=-1, keepdims=True)
    c = o2 - 2.0 * o_dot_c + c2r2
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = jnp.reciprocal(a)
    t0 = (b - sq) * inv_a
    t1 = (b + sq) * inv_a
    t = jnp.where(t0 > tmin, t0, t1)
    blocked = (disc > 0.0) & (t > tmin) & (t < tmax[..., None]) & valid
    return jnp.any(blocked, axis=-1)


def sphere_normal(p, center):
    """Outward geometric normal of a sphere at surface point ``p``.

    The reference normalizes Embree's geometric normal
    (CPUPathTracer.cpp:244-250); for spheres that is (p - center)/|p - center|.
    """
    n = p - center
    return n * jnp.reciprocal(
        jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-20)))
