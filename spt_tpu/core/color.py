"""Color utilities: packing, tone mapping, gamma.

``rgba_to_uint32`` mirrors the reference's RGBA8888 packing
(/root/reference/libs/render/include/render/Color.h:7-10 — R in the high
byte).  The tone-map operators implement what the reference only stubbed
(Math.h:8-41 lists ACES/Reinhard/sRGB as planned utilities) plus the live
output conversion (CPUPathTracer.cpp:87-117: mean over frames, clamp to
[0,1], no gamma, u8 quantize via trunc of v*255).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgba_to_uint32(r, g, b, a):
    """Pack u8 channels into a u32, R in the high byte (RGBA8888)."""
    r = jnp.asarray(r, jnp.uint32)
    g = jnp.asarray(g, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    a = jnp.asarray(a, jnp.uint32)
    return (r << jnp.uint32(24)) | (g << jnp.uint32(16)) | (b << jnp.uint32(8)) | a


def quantize_u8(x):
    """float [0,1] -> u8 by truncation of x*255 (the reference's cast)."""
    return jnp.clip(x, 0.0, 1.0) * 255.0


def tonemap_reinhard(c):
    return c / (1.0 + c)


def tonemap_aces(c):
    """Narkowicz ACES filmic fit."""
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


def apply_tonemap(c, mode: str):
    if mode == "reinhard":
        return tonemap_reinhard(c)
    if mode == "aces":
        return tonemap_aces(c)
    if mode == "none":
        return c
    raise ValueError(f"unknown tonemap mode {mode!r}")


def apply_gamma(c, gamma: float):
    if gamma == 1.0:
        return c
    return jnp.power(jnp.clip(c, 0.0, 1.0), 1.0 / gamma)


def luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def finalize_image(accum_rgb, n_samples, exposure=1.0, tonemap="none", gamma=1.0,
                   auto_exposure=False, target_exposure=0.18):
    """accumulated radiance (H,W,3) + sample count -> display float RGB [0,1].

    Reproduces the reference conversion (mean, clamp, no gamma) when called
    with defaults; exposure/tonemap/gamma/auto-exposure are the framework's
    post-processing extensions.
    """
    mean = accum_rgb / jnp.maximum(jnp.asarray(n_samples, jnp.float32), 1.0)
    if auto_exposure:
        avg_lum = jnp.exp(jnp.mean(jnp.log(luminance(mean) + 1e-6)))
        mean = mean * (target_exposure / jnp.maximum(avg_lum, 1e-6))
    else:
        mean = mean * exposure
    mean = apply_tonemap(mean, tonemap)
    mean = apply_gamma(mean, gamma)
    return jnp.clip(mean, 0.0, 1.0)


def pack_rgba8(rgb, alpha=None):
    """(H,W,3) float [0,1] -> (H,W) uint32 RGBA8888 (reference output type)."""
    r = quantize_u8(rgb[..., 0]).astype(jnp.uint32)
    g = quantize_u8(rgb[..., 1]).astype(jnp.uint32)
    b = quantize_u8(rgb[..., 2]).astype(jnp.uint32)
    if alpha is None:
        a = jnp.full_like(r, 255)
    else:
        a = quantize_u8(alpha).astype(jnp.uint32)
    return rgba_to_uint32(r, g, b, a)


def to_u8_array(rgb):
    """(H,W,3) float [0,1] -> (H,W,3) uint8 for image writers."""
    return quantize_u8(rgb).astype(jnp.uint8)
