"""BVH megakernel parity vs the pure-JAX integrators (interpret mode).

The large-scene kernel (kernels/megakernel_bvh.py) consumes the same
counter-RNG streams as the pure-JAX paths and shares physics.trace_bounce,
so images must agree up to float-reordering tolerance everywhere, and the
brute-force / packet-BVH intersectors must pick identical winners.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import spt_tpu
from spt_tpu import Camera, RenderSettings, Scene, create_path_tracer
from spt_tpu.engine.integrator_jax import render_megasample
from spt_tpu.kernels import megakernel_bvh


def _big_scene(n=200, seed=9, with_lights=True):
    """n random spheres + ground + (optionally) two emissive spheres."""
    rng = np.random.default_rng(seed)
    scene = Scene()
    scene.set_sky(spt_tpu.SKY_GRADIENT)
    mats = [scene.add_material("lambert", albedo=tuple(rng.uniform(0.2, 0.9, 3)))
            for _ in range(5)]
    mats.append(scene.add_material("metal", albedo=(0.85, 0.85, 0.9),
                                   roughness=0.3))
    mats.append(scene.add_material("glass", albedo=(0.97,) * 3, ior=1.5))
    emit = scene.add_material("lambert", albedo=(0.8,) * 3,
                              emission=(22.0, 18.0, 14.0))
    scene.create_sphere("ground", (0, -101.0, 12), 100.0, mats[0])
    pos = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    pos[:, 1] = rng.uniform(-0.8, 5.0, n)
    pos[:, 2] += 14.0
    rad = rng.uniform(0.25, 0.8, n).astype(np.float32)
    for i in range(n):
        scene.create_sphere(f"s{i}", tuple(pos[i]), float(rad[i]),
                            mats[i % len(mats)])
    if with_lights:
        scene.create_sphere("lampA", (-4, 7, 12), 1.2, emit)
        scene.create_sphere("lampB", (5, 6, 18), 1.0, emit)
    return scene


def _camera():
    return Camera.look_at((0, 2.0, -4.0), (0, 1.0, 14.0), fov_degrees=60)


@pytest.mark.parametrize("use_nee,use_mis", [(True, True), (False, False)])
def test_bvh_kernel_matches_jax_integrator(use_nee, use_mis):
    sd = _big_scene(200).compile()
    assert sd.capacity > 128  # genuinely past the small-kernel cap
    cam = _camera()
    W = H = 32
    kw = dict(max_bounces=4, rr_depth=2, use_nee=use_nee, use_mis=use_mis,
              seed=3)
    spp = 2
    img_jax = np.asarray(render_megasample(
        sd, cam, W, H, jnp.arange(spp), **kw))
    img_bvh = np.asarray(megakernel_bvh.render_tiles_bvh(
        sd, cam, W, H, 0, spp, interpret=True, **kw))
    assert np.isfinite(img_bvh).all()
    close = np.isclose(img_bvh, img_jax, rtol=2e-3, atol=2e-4).all(axis=-1)
    assert close.mean() > 0.97, f"{(~close).sum()} px diverge"
    rel_mean = abs(img_bvh.mean() - img_jax.mean()) / img_jax.mean()
    assert rel_mean < 0.01


def test_bvh_kernel_nonaligned_resolution():
    """Width/height not multiples of the 32x32 swizzle tile still render."""
    sd = _big_scene(150, seed=4).compile()
    cam = _camera()
    W, H = 40, 24
    kw = dict(max_bounces=3, rr_depth=2, seed=1)
    img_jax = np.asarray(render_megasample(sd, cam, W, H, jnp.arange(2), **kw))
    img_bvh = np.asarray(megakernel_bvh.render_tiles_bvh(
        sd, cam, W, H, 0, 2, interpret=True, **kw))
    assert img_bvh.shape == (H, W, 3)
    close = np.isclose(img_bvh, img_jax, rtol=2e-3, atol=2e-4).all(axis=-1)
    assert close.mean() > 0.97, f"{(~close).sum()} px diverge"


def test_bvh_kernel_sample_chunking_invariance():
    sd = _big_scene(140, seed=5).compile()
    cam = _camera()
    W = H = 16
    kw = dict(max_bounces=3, rr_depth=2, seed=5)
    full = np.asarray(megakernel_bvh.render_tiles_bvh(
        sd, cam, W, H, 0, 4, interpret=True, **kw))
    parts = (np.asarray(megakernel_bvh.render_tiles_bvh(
        sd, cam, W, H, 0, 2, interpret=True, **kw))
        + np.asarray(megakernel_bvh.render_tiles_bvh(
            sd, cam, W, H, 2, 2, interpret=True, **kw)))
    np.testing.assert_allclose(parts, full, rtol=1e-6, atol=1e-7)


def test_pallas_backend_routes_large_scene_to_bvh_kernel(monkeypatch):
    """>128-prim scenes hit the BVH kernel, not the pure-JAX fallback."""
    calls = {}
    orig = megakernel_bvh.render_tiles_bvh

    def spy(*a, **k):
        calls["bvh"] = True
        return orig(*a, **k)

    monkeypatch.setattr(megakernel_bvh, "render_tiles_bvh", spy)
    tracer = create_path_tracer("pallas")
    tracer.set_scene(_big_scene(150, seed=7))
    tracer.set_camera(_camera())
    s = RenderSettings()
    s.set_resolution(24, 24)
    s.samples_per_pixel = 2
    s.max_bounces = 3
    s.progressive = False
    tracer.set_settings(s)
    tracer.render()
    img = np.asarray(tracer.get_render_result().image_f32)
    assert calls.get("bvh"), "backend did not use the BVH kernel"
    assert np.isfinite(img).all() and img.max() > 0.05


def test_bvh_kernel_dof():
    """Thin-lens raygen matches the integrator on a big scene."""
    sd = _big_scene(150, seed=8).compile()
    cam = Camera.look_at((0, 2.0, -4.0), (0, 1.0, 14.0), fov_degrees=60,
                         aperture=0.2, focus_dist=16.0)
    W = H = 24
    kw = dict(max_bounces=3, rr_depth=2, seed=2)
    img_jax = np.asarray(render_megasample(
        sd, cam, W, H, jnp.arange(2), dof=True, **kw))
    img_bvh = np.asarray(megakernel_bvh.render_tiles_bvh(
        sd, cam, W, H, 0, 2, interpret=True, **kw))
    close = np.isclose(img_bvh, img_jax, rtol=2e-3, atol=2e-4).all(axis=-1)
    assert close.mean() > 0.97, f"{(~close).sum()} px diverge"
