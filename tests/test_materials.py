"""Material physics: furnace tests, energy conservation, estimator agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spt_tpu
from spt_tpu import Camera, Scene
from spt_tpu.core.scene import SKY_CONSTANT
from spt_tpu.engine.integrator_jax import render_megasample

CAM = Camera.look_at((0, 0, -3), (0, 0, 5), fov_degrees=40)


def _furnace_scene(kind, **mat_kwargs):
    """One sphere in a constant-radiance environment."""
    scene = Scene()
    scene.set_sky(SKY_CONSTANT, horizon=(1.0, 1.0, 1.0))
    m = scene.add_material(kind, **mat_kwargs)
    scene.create_sphere("s", (0, 0, 5), 1.0, m)
    return scene.compile()


def _render_mean(sd, spp=64, depth=16, **kw):
    f = jax.jit(lambda ids: render_megasample(
        sd, CAM, 32, 32, ids, max_bounces=depth, rr_depth=4, **kw))
    img = np.zeros((32, 32, 3), np.float32)
    for c in range(spp // 16):
        img += np.asarray(f(jnp.arange(c * 16, (c + 1) * 16)))
    return img / spp


def test_white_furnace_lambert():
    """albedo-1 Lambertian in a unit furnace must disappear (radiance 1)."""
    sd = _furnace_scene("lambert", albedo=(1.0, 1.0, 1.0))
    img = _render_mean(sd, spp=64)
    # Center pixels hit the sphere; with enough bounces + RR they converge
    # to the environment radiance.
    center = img[12:20, 12:20]
    np.testing.assert_allclose(center.mean(), 1.0, rtol=0.03)


def test_gray_furnace_lambert_below_one():
    """albedo-0.5 sphere must be darker than the furnace, not brighter."""
    sd = _furnace_scene("lambert", albedo=(0.5, 0.5, 0.5))
    img = _render_mean(sd, spp=64)
    center = img[12:20, 12:20]
    assert 0.3 < center.mean() < 1.0


def test_metal_furnace_bounded():
    """GGX metal with f0<=1 must not amplify energy."""
    sd = _furnace_scene("metal", albedo=(1.0, 1.0, 1.0), roughness=0.4)
    img = _render_mean(sd, spp=64)
    assert img.max() < 1.25  # MC noise margin over 1.0
    center = img[12:20, 12:20]
    assert center.mean() < 1.05


def test_glass_furnace_bounded():
    sd = _furnace_scene("glass", albedo=(1.0, 1.0, 1.0), ior=1.5)
    img = _render_mean(sd, spp=64)
    center = img[12:20, 12:20]
    assert 0.8 < center.mean() < 1.1


def test_albedo_scales_brightness_monotonically():
    means = []
    for a in (0.2, 0.5, 0.8):
        sd = _furnace_scene("lambert", albedo=(a, a, a))
        img = _render_mean(sd, spp=32, depth=6)
        means.append(img[12:20, 12:20].mean())
    assert means[0] < means[1] < means[2]


def test_rough_metal_blurrier_than_smooth():
    """Reflection of a high-contrast env: rough metal has lower variance."""
    scene_s = Scene()
    scene_s.set_sky(spt_tpu.SKY_GRADIENT, horizon=(2, 0, 0), zenith=(0, 0, 2))
    m = scene_s.add_material("metal", albedo=(1.0,) * 3, roughness=0.05)
    scene_s.create_sphere("s", (0, 0, 5), 1.0, m)
    scene_r = Scene()
    scene_r.set_sky(spt_tpu.SKY_GRADIENT, horizon=(2, 0, 0), zenith=(0, 0, 2))
    m2 = scene_r.add_material("metal", albedo=(1.0,) * 3, roughness=0.7)
    scene_r.create_sphere("s", (0, 0, 5), 1.0, m2)
    img_s = _render_mean(scene_s.compile(), spp=64, depth=3)
    img_r = _render_mean(scene_r.compile(), spp=64, depth=3)
    center = (slice(10, 22), slice(10, 22))
    assert img_r[center].std() < img_s[center].std()


def test_nee_reduces_variance():
    """Same scene, NEE on vs off: means agree, NEE per-sample variance lower."""
    scene = Scene()
    scene.set_sky(spt_tpu.SKY_NONE)
    white = scene.add_material("lambert", albedo=(0.7,) * 3)
    lamp = scene.add_material("lambert", albedo=(0.8,) * 3,
                              emission=(40.0,) * 3)
    scene.create_sphere("floor", (0, -1000, 5), 1000.0, white)
    scene.create_sphere("lamp", (0, 4.0, 5.0), 0.35, lamp)
    sd = scene.compile()
    cam = Camera.look_at((0, 1.5, -2), (0, 0.5, 5), fov_degrees=50)

    def per_sample_imgs(use_nee, n=24):
        f = jax.jit(lambda i: render_megasample(
            sd, cam, 24, 24, i[None], max_bounces=3, rr_depth=8,
            use_nee=use_nee, use_mis=True, seed=2))
        return np.stack([np.asarray(f(jnp.int32(i))) for i in range(n)])

    on = per_sample_imgs(True)
    off = per_sample_imgs(False)
    # Means agree (unbiasedness) within MC error of the noisier estimator.
    lit = off.mean(0).mean(-1) > 0.01
    rel = abs(on.mean() - off.mean()) / off.mean()
    assert rel < 0.15, rel
    # Variance on directly lit floor pixels is much lower with NEE.
    var_on = on.var(0)[lit].mean()
    var_off = off.var(0)[lit].mean()
    assert var_on < var_off * 0.5, (var_on, var_off)
