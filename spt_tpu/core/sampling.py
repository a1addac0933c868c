"""Sampling math: orthonormal bases, cosine-hemisphere, GGX, light sampling.

Pure jnp, SoA-friendly (all functions broadcast over leading batch axes),
usable in both the pure-JAX integrator and Pallas kernels.

The cosine-hemisphere routine reproduces the reference's formulation exactly
(see /root/reference/.../CPUPathTracer.cpp:303-326 — cosθ=√u1, sinθ=√(1−u1),
φ=2πu2, ONB built from a z-up-else-x-up pick) so reference-parity renders use
identical directions given identical uniforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi


def dot(a, b):
    """Batched vec3 dot product over the trailing axis, keepdims."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps=1e-20):
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps)))


def cross(a, b):
    return jnp.cross(a, b)


def reflect(d, n):
    """Mirror reflection of direction ``d`` about normal ``n``."""
    return d - 2.0 * dot(d, n) * n


def refract(d, n, eta):
    """Refract ``d`` through normal ``n`` with relative IOR ``eta`` (n_i/n_t).

    Returns (refracted_dir, total_internal_reflection_mask).  ``d`` points
    into the surface; ``n`` points against ``d``.
    """
    cos_i = -dot(d, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    # Double-where: sqrt'(0) = inf at the TIR boundary would NaN the
    # backward pass even though TIR lanes select the reflection branch.
    safe = jnp.where(tir, 1.0, 1.0 - sin2_t)
    cos_t = jnp.where(tir, 0.0, jnp.sqrt(jnp.maximum(safe, 1e-12)))
    refr = eta * d + (eta * cos_i - cos_t) * n
    return refr, tir[..., 0]


def build_onb_reference(n):
    """ONB about normal ``n`` with the reference's up-vector pick.

    up = +z unless |n.z| >= 0.999, else +x; tangent = normalize(up × n);
    bitangent = n × tangent.  (CPUPathTracer.cpp:320-322.)
    """
    nz = n[..., 2:3]
    up_z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)
    up_x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape)
    up = jnp.where(jnp.abs(nz) < 0.999, up_z, up_x)
    tangent = normalize(jnp.cross(up, n))
    bitangent = jnp.cross(n, tangent)
    return tangent, bitangent


def cosine_hemisphere(n, u1, u2):
    """Cosine-weighted direction about normal ``n`` (reference formulation).

    u1, u2 have shape n.shape[:-1]; returns unit directions, pdf = cosθ/π.
    """
    u1 = u1[..., None]
    u2 = u2[..., None]
    cos_t = jnp.sqrt(u1)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    phi = TWO_PI * u2
    x = sin_t * jnp.cos(phi)
    y = sin_t * jnp.sin(phi)
    tangent, bitangent = build_onb_reference(n)
    return x * tangent + y * bitangent + cos_t * n


def cosine_hemisphere_pdf(n, d):
    """pdf of cosine-hemisphere sampling: max(n·d, 0)/π."""
    return jnp.maximum(dot(n, d)[..., 0], 0.0) * INV_PI


# ---------------------------------------------------------------------------
# GGX (Trowbridge-Reitz) microfacet distribution — isotropic.
# ---------------------------------------------------------------------------


def ggx_sample_half(n, roughness, u1, u2):
    """Sample a microfacet half-vector from the GGX NDF about ``n``.

    Classic NDF sampling: tanθ² = α² u /(1-u).  roughness is perceptual
    (α = roughness²) following the Disney convention.
    """
    alpha = jnp.maximum(roughness * roughness, 1e-4)[..., None]
    u1 = u1[..., None]
    u2 = u2[..., None]
    phi = TWO_PI * u2
    cos2 = (1.0 - u1) / (1.0 + (alpha * alpha - 1.0) * u1)
    cos_t = jnp.sqrt(jnp.maximum(cos2, 0.0))
    # 1e-12 floor: sqrt'(0) at u1==0 would poison roughness gradients.
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos2, 1e-12))
    hx = sin_t * jnp.cos(phi)
    hy = sin_t * jnp.sin(phi)
    tangent, bitangent = build_onb_reference(n)
    return hx * tangent + hy * bitangent + cos_t * n


def ggx_ndf(n, h, roughness):
    """GGX normal distribution function D(h)."""
    alpha = jnp.maximum(roughness * roughness, 1e-4)
    a2 = alpha * alpha
    ndoth = jnp.maximum(dot(n, h)[..., 0], 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-12)


def ggx_g1(n, v, roughness):
    """Smith masking term G1 (Schlick-GGX form)."""
    alpha = jnp.maximum(roughness * roughness, 1e-4)
    k = alpha * 0.5
    ndotv = jnp.maximum(dot(n, v)[..., 0], 1e-6)
    return ndotv / (ndotv * (1.0 - k) + k)


def ggx_smith_g(n, wo, wi, roughness):
    return ggx_g1(n, wo, roughness) * ggx_g1(n, wi, roughness)


def half_vector(wo, wi, eps=1e-12):
    """Gradient-safe normalize(wo + wi).

    Returns (h, ok); when wi ≈ -wo the half vector is undefined — ok is
    False and h is a placeholder whose gradient is fully masked (double-
    where), so eval results must be gated on ok.  Naive normalize here
    produces ~1/eps-scale gradients that overflow f32 under fused
    compilation (the scan-vs-unroll NaN of tests/test_gradients.py).
    """
    s = wo + wi
    len2 = jnp.sum(s * s, axis=-1, keepdims=True)
    ok = len2[..., 0] > eps
    safe = jnp.where(ok[..., None], len2, 1.0)
    h = jnp.where(ok[..., None], s, jnp.zeros_like(s)) * jax.lax.rsqrt(safe)
    return h, ok


def ggx_pdf_from_half(n, wo, h, roughness):
    """pdf of NDF-sampled GGX reflection given the half vector:
    D(h)·(n·h)/(4·(wo·h))."""
    d = ggx_ndf(n, h, roughness)
    ndoth = jnp.maximum(dot(n, h)[..., 0], 0.0)
    odoth = jnp.maximum(dot(wo, h)[..., 0], 1e-6)
    return d * ndoth / (4.0 * odoth)


def ggx_pdf(n, wo, wi, roughness):
    """pdf of NDF-sampled GGX reflection in solid angle: D(h)·(n·h)/(4·(wo·h))."""
    h, ok = half_vector(wo, wi)
    return jnp.where(ok, ggx_pdf_from_half(n, wo, h, roughness), 0.0)


def schlick_fresnel(cos_i, f0):
    """Schlick approximation; f0 broadcastable to cos_i[..., None]*3."""
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return f0 + (1.0 - f0) * (m * m) * (m * m) * m


def fresnel_dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel reflectance (scalar eta=n_t/n_i)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 / (eta * eta)) * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    # Double-where for the sqrt at grazing/TIR (see refract).
    safe = jnp.where(tir, 1.0, 1.0 - sin2_t)
    cos_t = jnp.where(tir, 0.0, jnp.sqrt(jnp.maximum(safe, 1e-12)))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-8)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-8)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f)


# ---------------------------------------------------------------------------
# Light (sphere) sampling for next-event estimation.
# ---------------------------------------------------------------------------


def sample_sphere_cone(p, center, radius, u1, u2):
    """Sample a direction toward sphere (center, radius) from point ``p``
    uniformly within the subtended cone.

    Returns (dir, pdf_solid_angle, inside_mask).  When ``p`` is inside the
    sphere the cone is the full sphere; callers should mask those lanes.
    """
    to_c = center - p
    d2 = jnp.sum(to_c * to_c, axis=-1, keepdims=True)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    inside = (dist[..., 0] <= radius)
    sin2_max = jnp.clip((radius * radius)[..., None] / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    # Double-where: on/inside the sphere sin2_max==1 and sqrt'(0)=inf would
    # NaN the backward pass of these (masked) lanes.
    deg = sin2_max >= 1.0
    cos_max = jnp.where(deg, 0.0,
                        jnp.sqrt(jnp.where(deg, 1.0, 1.0 - sin2_max)))
    u1 = u1[..., None]
    u2 = u2[..., None]
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    phi = TWO_PI * u2
    w = to_c / jnp.maximum(dist, 1e-12)
    tangent, bitangent = build_onb_reference(w)
    direction = (sin_t * jnp.cos(phi)) * tangent + (sin_t * jnp.sin(phi)) * bitangent + cos_t * w
    pdf = 1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max[..., 0]), 1e-9)
    return direction, pdf, inside


def sphere_cone_pdf(p, center, radius):
    """Solid-angle pdf of cone sampling (uniform within the cone, so
    direction-independent) for directions that hit the sphere."""
    to_c = center - p
    d2 = jnp.sum(to_c * to_c, axis=-1)
    sin2_max = jnp.clip(radius * radius / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    deg = sin2_max >= 1.0
    cos_max = jnp.where(deg, 0.0,
                        jnp.sqrt(jnp.where(deg, 1.0, 1.0 - sin2_max)))
    return 1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-9)


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (β=2) weight for strategy a."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
