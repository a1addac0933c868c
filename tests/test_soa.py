"""SoA fast-path integrator ≡ AoS oracle (same RNG, same estimators)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spt_tpu
from spt_tpu import Camera, Scene
from spt_tpu.engine.integrator_jax import render_megasample
from spt_tpu.engine.integrator_soa import (SOA_MAX_PRIMS,
                                           render_megasample_soa,
                                           static_mtypes)


def _scene():
    scene = Scene()
    scene.set_sky(spt_tpu.SKY_NONE)
    white = scene.add_material("lambert", albedo=(0.73, 0.7, 0.68))
    lamp = scene.add_material("lambert", albedo=(0.8,) * 3, emission=(12.0,) * 3)
    metal = scene.add_material("metal", albedo=(0.85, 0.85, 0.9), roughness=0.25)
    glass = scene.add_material("glass", albedo=(0.96,) * 3, ior=1.5)
    scene.create_sphere("floor", (0, -1000, 4), 1000.0, white)
    scene.create_sphere("lamp", (0, 2.8, 4), 0.7, lamp)
    scene.create_sphere("m", (-0.7, 0.6, 4.0), 0.6, metal)
    scene.create_sphere("g", (0.7, 0.5, 3.6), 0.5, glass)
    return scene


CAM = Camera.look_at((0, 1.0, -1.2), (0, 0.8, 4.0), fov_degrees=55)


@pytest.mark.parametrize("use_nee,use_mis", [(True, True), (False, False)])
def test_soa_matches_aos(use_nee, use_mis):
    sd = _scene().compile()
    kw = dict(max_bounces=4, rr_depth=2, use_nee=use_nee, use_mis=use_mis,
              seed=9)
    a = np.asarray(render_megasample(sd, CAM, 32, 32, jnp.arange(4), **kw))
    b = np.asarray(render_megasample_soa(sd, CAM, 32, 32, jnp.arange(4), **kw))
    close = np.isclose(a, b, rtol=2e-3, atol=2e-4).all(axis=-1)
    assert close.mean() > 0.97, f"{(~close).sum()} px diverge"
    assert abs(a.mean() - b.mean()) / a.mean() < 0.01


def test_soa_sky_gradient_scene():
    scene = Scene()  # default gradient sky, one sphere
    m = scene.add_material("lambert", albedo=(0.7,) * 3)
    scene.create_sphere("s", (0, -1, 5), 1.0, m)
    sd = scene.compile()
    kw = dict(max_bounces=3, rr_depth=2, seed=1)
    a = np.asarray(render_megasample(sd, CAM, 24, 24, jnp.arange(2), **kw))
    b = np.asarray(render_megasample_soa(sd, CAM, 24, 24, jnp.arange(2), **kw))
    close = np.isclose(a, b, rtol=2e-3, atol=2e-4).all(axis=-1)
    assert close.mean() > 0.97


def test_soa_under_jit_with_static_mtypes():
    sd = _scene().compile()
    mt = static_mtypes(sd)
    f = jax.jit(lambda sc, ids: render_megasample_soa(
        sc, CAM, 16, 16, ids, mtypes=mt, max_bounces=3, rr_depth=2, seed=0))
    img = np.asarray(f(sd, jnp.arange(2)))
    assert np.isfinite(img).all() and img.max() > 0.0


def test_soa_rejects_oversized_scene():
    scene = Scene()
    m = scene.add_material("lambert")
    for i in range(SOA_MAX_PRIMS + 1):
        scene.create_sphere(f"s{i}", (0, 0, 5 + i), 0.1, m)
    sd = scene.compile(use_bvh=False)
    with pytest.raises(ValueError, match="need a BVH"):
        render_megasample_soa(sd, CAM, 8, 8, jnp.arange(1))


def test_soa_stats_counts_rays():
    sd = _scene().compile()
    img, n = render_megasample_soa(sd, CAM, 16, 16, jnp.arange(2),
                                   max_bounces=3, rr_depth=8, seed=0,
                                   with_stats=True)
    n = float(n)
    # Between 1 and (bounces + shadow rays) per path.
    assert 16 * 16 * 2 <= n <= 16 * 16 * 2 * 6
