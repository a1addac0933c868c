"""Fused fwd+bwd BVH megakernel vs jax.grad of the SoA integrator.

Interpret-mode runs use a deliberately tiny scene/leaf size (vjp through
the walk is slow to interpret); the TPU-gated test runs the real Mosaic
kernel on a >128-prim scene — the configuration the kernel exists for.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spt_tpu
from spt_tpu import Camera, Scene
from spt_tpu.diff import gradients as G
from spt_tpu.engine.integrator_soa import render_megasample_soa, static_mtypes
from spt_tpu.kernels import megakernel_bvh_grad

W = H = 16


def _scene(n=40, seed=6):
    rng = np.random.default_rng(seed)
    scene = Scene()
    scene.set_sky(spt_tpu.SKY_GRADIENT)
    white = scene.add_material("lambert", albedo=(0.7, 0.65, 0.6))
    lamp = scene.add_material("lambert", albedo=(0.8,) * 3,
                              emission=(11.0,) * 3)
    metal = scene.add_material("metal", albedo=(0.85, 0.85, 0.9),
                               roughness=0.3)
    mats = [white, metal]
    scene.create_sphere("floor", (0, -1000, 6), 1000.0, white)
    for i in range(n):
        p = rng.uniform(-4, 4, 3)
        p[1] = rng.uniform(0.0, 3.0)
        p[2] += 7.0
        scene.create_sphere(f"s{i}", tuple(p), float(rng.uniform(0.3, 0.7)),
                            mats[i % 2])
    scene.create_sphere("lamp", (0, 6, 6), 1.2, lamp)
    return scene


CAM = Camera.look_at((0, 1.5, -2.0), (0, 1.0, 7.0), fov_degrees=60)


def _soa_loss(sd, kw, spp, w, h):
    mt = static_mtypes(sd) if sd.capacity <= 128 else None

    def loss(p):
        sc = G.apply_params(sd, p)
        return jnp.sum(render_megasample_soa(sc, CAM, w, h,
                                             jnp.arange(spp), mtypes=mt,
                                             **kw))
    return loss


def _check(sd, kw, spp, block, interpret, w=W, h=H):
    params = G.get_params(sd, ("albedo", "emission", "roughness",
                               "centers", "radii"))
    val_ref, g_ref = jax.value_and_grad(_soa_loss(sd, kw, spp, w, h))(params)
    img, g_pal = megakernel_bvh_grad.render_and_grad_bvh(
        sd, CAM, w, h, 0, spp, block=block, interpret=interpret, **kw)
    np.testing.assert_allclose(float(jnp.sum(img)), float(val_ref),
                               rtol=1e-3)
    for key in ("albedo", "emission", "roughness"):
        np.testing.assert_allclose(np.asarray(g_pal[key]),
                                   np.asarray(g_ref[key]),
                                   rtol=3e-2, atol=3e-3, err_msg=key)
    valid = np.asarray(sd.prim_valid)
    for key in ("centers", "radii"):
        a = np.asarray(g_pal[key])[valid]
        b = np.asarray(g_ref[key])[valid]
        # Geometry grads span orders of magnitude; bound the error by the
        # field's overall scale.
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-2,
                                   err_msg=key)


def test_bvh_grad_kernel_matches_soa_interpret():
    # Minimal configuration: interpret-mode evaluation of the vjp'd walk
    # costs minutes per block of work, so keep every axis tiny.
    sd = _scene(12).compile()
    kw = dict(max_bounces=2, rr_depth=5, use_nee=True, use_mis=True,
              seed=4)
    _check(sd, kw, spp=1, block=8, interpret=True, w=8, h=8)


def test_bvh_custom_vjp_matches_soa_interpret():
    """diff/pallas_diff BVH route: forward responds to traced param
    re-packing and jax.grad through the custom VJP matches the SoA
    integrator's grads."""
    from spt_tpu.diff import pallas_diff
    sd = _scene(12).compile()
    kw = dict(max_bounces=2, rr_depth=5, use_nee=True, use_mis=True, seed=4)
    spp, w, h = 1, 8, 8
    render = pallas_diff._make_bvh_render_fn(
        sd, CAM, w, h, spp=spp, block=8, interpret=True, **kw)
    params = G.get_params(sd, ("albedo", "roughness", "centers", "radii"))
    val_p, g_p = jax.value_and_grad(lambda p: jnp.sum(render(p, 0)))(params)
    loss = _soa_loss(sd, kw, spp, w, h)
    val_s, g_s = jax.value_and_grad(lambda p: loss(p) / spp)(params)
    np.testing.assert_allclose(float(val_p), float(val_s), rtol=1e-3)
    for key in ("albedo", "roughness"):
        np.testing.assert_allclose(np.asarray(g_p[key]),
                                   np.asarray(g_s[key]),
                                   rtol=3e-2, atol=3e-3, err_msg=key)
    valid = np.asarray(sd.prim_valid)
    for key in ("centers", "radii"):
        a = np.asarray(g_p[key])[valid]
        b = np.asarray(g_s[key])[valid]
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-2,
                                   err_msg=key)

    # Perturbed parameters must flow through the traced packers: forward
    # with shifted albedo must match the SoA render of the shifted scene.
    p2 = dict(params)
    p2["albedo"] = jnp.clip(params["albedo"] + 0.15, 0.0, 1.0)
    img_p2 = np.asarray(render(p2, 0))
    sc2 = G.apply_params(sd, p2)
    img_s2 = np.asarray(render_megasample_soa(
        sc2, CAM, w, h, jnp.arange(spp), mtypes=static_mtypes(sd), **kw))
    assert not np.allclose(img_p2, np.asarray(render(params, 0)))
    np.testing.assert_allclose(img_p2, img_s2 / spp, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused BVH grad kernel requires Mosaic (TPU)")
def test_bvh_custom_vjp_routing_on_tpu():
    """make_pallas_render_fn must route >128-prim scenes to the BVH kernel
    pair and produce SoA-matching grads at Mosaic speed."""
    from spt_tpu.diff import pallas_diff
    sd = _scene(300).compile(use_bvh=True)
    assert sd.capacity > pallas_diff.SMEM_PRIM_CAP
    kw = dict(max_bounces=3, rr_depth=5, use_nee=True, use_mis=True, seed=4)
    spp = 2
    render = pallas_diff.make_pallas_render_fn(sd, CAM, W, H, spp=spp, **kw)
    params = G.get_params(sd, ("albedo", "roughness"))
    val_p, g_p = jax.value_and_grad(lambda p: jnp.sum(render(p, 0)))(params)
    loss = _soa_loss(sd, kw, spp, W, H)
    val_s, g_s = jax.value_and_grad(lambda p: loss(p) / spp)(params)
    np.testing.assert_allclose(float(val_p), float(val_s), rtol=1e-3)
    for key in params:
        np.testing.assert_allclose(np.asarray(g_p[key]),
                                   np.asarray(g_s[key]),
                                   rtol=3e-2, atol=3e-3, err_msg=key)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused BVH grad kernel requires Mosaic (TPU)")
def test_bvh_grad_kernel_matches_soa_on_tpu():
    sd = _scene(300).compile(use_bvh=True)  # SoA oracle needs the BVH path
    assert sd.capacity > 128
    kw = dict(max_bounces=3, rr_depth=5, use_nee=True, use_mis=True, seed=4)
    _check(sd, kw, spp=2, block=32, interpret=False)
