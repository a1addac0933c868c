"""Independent scalar NumPy oracle of the reference renderer's semantics.

A deliberately naive per-pixel loop transcribing the behavioral spec in
SURVEY.md §2.3 (not the vectorized framework code) — the golden-image source
for parity tests.  Everything is float32/uint32 to match C++ semantics.
"""

from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32

_MAXU = F(4294967295.0)


def ref_seed(x, y, width, frame):
    with np.errstate(over="ignore"):
        return U(U(x) + U(y) * U(width) + U(frame) * U(982451653))


def ref_next(state):
    with np.errstate(over="ignore"):
        state = U(state * U(747796405) + U(2891336453))
        shift = U((state >> U(28)) + U(4))
        r = U(U(state >> shift) ^ state) * U(277803737)
        r = U(r >> U(22)) ^ r
    return state, F(F(r) / _MAXU)


def intersect_all(o, d, centers, radii, tmin=F(1e-3)):
    """Nearest sphere hit; returns (t, idx) with idx=-1 on miss."""
    best_t, best_i = np.inf, -1
    for i in range(len(radii)):
        oc = o - centers[i]
        a = F(np.dot(d, d))
        b = F(np.dot(d, oc)) * F(-1.0)  # b = d.(c-o)
        c = F(np.dot(oc, oc) - radii[i] * radii[i])
        disc = F(b * b - a * c)
        if disc <= 0:
            continue
        sq = F(np.sqrt(disc))
        t0 = F((b - sq) / a)
        t1 = F((b + sq) / a)
        t = t0 if t0 > tmin else t1
        if t > tmin and t < best_t:
            best_t, best_i = t, i
    return best_t, best_i


def sample_sky(d):
    t = F(0.5) * F(d[1] + F(1.0))
    sky = np.array([0.5, 0.7, 1.0], F)
    horizon = np.array([1.0, 1.0, 1.0], F)
    return horizon * (F(1.0) - t) + sky * t


def cosine_bounce(normal, u1, u2):
    cos_t = F(np.sqrt(u1))
    sin_t = F(np.sqrt(F(1.0) - u1))
    phi = F(2.0 * np.pi) * u2
    x = sin_t * F(np.cos(phi))
    y = sin_t * F(np.sin(phi))
    z = cos_t
    up = np.array([0.0, 0.0, 1.0], F) if abs(normal[2]) < 0.999 \
        else np.array([1.0, 0.0, 0.0], F)
    tangent = np.cross(up, normal)
    tangent = tangent / F(np.linalg.norm(tangent))
    bitangent = np.cross(normal, tangent)
    return (x * tangent + y * bitangent + z * normal).astype(F)


def trace_ray(o, d, state, centers, radii):
    """§2.3.4: iterative loop, 4 bounces, albedo 0.7, RR after 2."""
    radiance = np.zeros(3, F)
    throughput = np.ones(3, F)
    bounce = 0
    while bounce < 4:
        t, idx = intersect_all(o, d, centers, radii)
        if idx < 0:
            radiance += throughput * sample_sky(d)
            break
        p = (o + t * d).astype(F)
        n = p - centers[idx]
        n = (n / F(np.linalg.norm(n))).astype(F)
        throughput = (throughput * F(0.7)).astype(F)
        bounce += 1
        if bounce > 2:
            p_cont = F(throughput.max())
            state, u = ref_next(state)
            if u > p_cont:
                break
            throughput = (throughput / p_cont).astype(F)
        state, u1 = ref_next(state)
        state, u2 = ref_next(state)
        d = cosine_bounce(n, u1, u2)
        o = (p + F(1e-4) * n).astype(F)
    return radiance


def render_frame(width, height, frame, centers, radii):
    """One 1-spp progressive frame with the hard-coded +z pinhole camera."""
    img = np.zeros((height, width, 3), F)
    aspect = F(width) / F(height)
    inv_w, inv_h = F(1.0 / width), F(1.0 / height)
    for y in range(height):
        for x in range(width):
            state = ref_seed(x, y, width, frame + 1)
            u = F(x) * inv_w
            v = F(1.0) - F(y) * inv_h
            uv_x = F((u * 2 - 1) * aspect)
            uv_y = F(v * 2 - 1)
            inv_len = F(1.0 / np.sqrt(uv_x * uv_x + uv_y * uv_y + F(1.0)))
            d = np.array([uv_x * inv_len, uv_y * inv_len, inv_len], F)
            o = np.zeros(3, F)
            img[y, x] = trace_ray(o, d, state, centers, radii)
    return img
