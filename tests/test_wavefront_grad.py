"""Wavefront backward pass (kernels/wavefront_grad.py) vs the SoA oracle.

The differentiable wavefront pipeline must be estimator-identical to
jax.grad of the SoA integrator: same RNG streams, same detached-selection
hit estimator, same NEE/MIS terms.  Interpret mode on CPU; large-scene
on-chip numbers are recorded by tools/check_wavefront_grad_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu import Camera
from spt_tpu.diff import gradients as G
from spt_tpu.engine.integrator_soa import render_megasample_soa
from spt_tpu.kernels import wavefront_grad as wg

CAM = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
# SOA_KW is the estimator config shared with the oracle; KW adds
# sort_min_rays=0 for the wavefront fns — at this tiny size the r5 engine
# default (1 << 17) would skip every sort, silently un-exercising the
# custom-vjp sort path.
SOA_KW = dict(max_bounces=3, rr_depth=5, use_nee=True, use_mis=True, seed=4)
KW = dict(SOA_KW, sort_min_rays=0)
W, H, SPP = 24, 16, 2


@pytest.fixture(scope="module")
def scene160():
    from bench_suite import scene_10k
    return scene_10k(160).compile(use_bvh=True)


@pytest.fixture(scope="module")
def wf_render(scene160):
    return wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=SPP, interpret=True, **KW)


def _soa_loss(sd, mask=1.0):
    def loss(p):
        sc = G.apply_params(sd, p)
        img = render_megasample_soa(sc, CAM, W, H, jnp.arange(SPP),
                                    **SOA_KW)
        return jnp.sum(img * mask) / SPP
    return loss


def test_wavefront_forward_matches_soa(scene160, wf_render):
    params = G.get_params(scene160, ("albedo",))
    img_w = np.asarray(wf_render(params, 0))
    img_s = np.asarray(render_megasample_soa(
        scene160, CAM, W, H, jnp.arange(SPP), **SOA_KW)) / SPP
    assert np.isfinite(img_w).all()
    close = np.abs(img_w - img_s) < 1e-4 + 1e-3 * np.abs(img_s)
    assert close.mean() > 0.99


def test_wavefront_grads_match_soa(scene160, wf_render):
    """Gradients agree on every pixel whose FORWARD paths agree.

    The two estimators can pick different (but both valid) paths at
    knife-edge hits — a grazing intersection with t within float noise of
    TMIN flips the strict accept comparison (the walk computes t without
    the 1/|d|^2 normalization the SoA oracle applies; both are correct
    Monte-Carlo estimators).  Measured on this scene: exactly 1/384 pixels
    diverges; its gradient legitimately differs too.  So the grad parity
    is asserted through a loss masked to the agreeing pixels (>=99%
    required), which isolates backward correctness from forward
    path-selection noise."""
    params = G.get_params(scene160, ("albedo", "emission", "roughness",
                                     "centers", "radii"))
    img_w = np.asarray(wf_render(params, 0))
    img_s = np.asarray(render_megasample_soa(
        scene160, CAM, W, H, jnp.arange(SPP), **SOA_KW)) / SPP
    agree = (np.abs(img_w - img_s) < 1e-4 + 1e-3 * np.abs(img_s)).all(-1)
    assert agree.mean() >= 0.99, f"only {agree.mean():.3f} forward-agree"
    mask = jnp.asarray(agree[:, :, None].astype(np.float32))

    val_w, g_w = jax.value_and_grad(
        lambda p: jnp.sum(wf_render(p, 0) * mask))(params)
    val_s, g_s = jax.value_and_grad(_soa_loss(scene160, mask))(params)
    np.testing.assert_allclose(float(val_w), float(val_s), rtol=1e-3)
    for key in ("albedo", "emission", "roughness"):
        np.testing.assert_allclose(np.asarray(g_w[key]),
                                   np.asarray(g_s[key]),
                                   rtol=3e-2, atol=3e-3, err_msg=key)
    valid = np.asarray(scene160.prim_valid)
    for key in ("centers", "radii"):
        a = np.asarray(g_w[key])[valid]
        b = np.asarray(g_s[key])[valid]
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-2,
                                   err_msg=key)


def test_wavefront_grad_compaction_invisible(scene160):
    """Alive-prefix compaction under grad (r4) must change nothing.

    rr_depth=1 kills most rays by bounce 2, so the sorted stream has a
    real dead suffix and the compacted run actually skips tiles; the
    forward image and every cotangent must still match the uncompacted
    run exactly (the suffix's forward is the aliased identity, its
    cotangents pass through, and its stale winner rows are masked out of
    the per-prim scatter)."""
    kw = dict(KW, rr_depth=1)
    params = G.get_params(scene160, ("albedo", "centers", "radii"))
    rc = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=SPP, compact=True, interpret=True, **kw)
    rn = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=SPP, compact=False, interpret=True, **kw)
    vc, gc = jax.value_and_grad(lambda p: jnp.sum(rc(p, 0)))(params)
    vn, gn = jax.value_and_grad(lambda p: jnp.sum(rn(p, 0)))(params)
    np.testing.assert_allclose(float(vc), float(vn), rtol=1e-6)
    for key in params:
        np.testing.assert_allclose(np.asarray(gc[key]),
                                   np.asarray(gn[key]),
                                   rtol=1e-5, atol=1e-7, err_msg=key)


def test_wavefront_grad_precull_invisible(scene160):
    """Candidate-sweep intersection == tree walk, through the backward.

    split=False: the split pipeline never consults ``precull``, so only
    the fused _bounce_op exercises the walk fallback (ADVICE r4 low)."""
    params = G.get_params(scene160, ("albedo",))
    rp = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=1, precull=True, split=False,
        interpret=True, **KW)
    rw = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=1, precull=False, split=False,
        interpret=True, **KW)
    gp = jax.grad(lambda p: jnp.sum(rp(p, 0)))(params)
    gw = jax.grad(lambda p: jnp.sum(rw(p, 0)))(params)
    np.testing.assert_allclose(np.asarray(gp["albedo"]),
                               np.asarray(gw["albedo"]),
                               rtol=1e-5, atol=1e-7)


def test_wavefront_grad_split_invisible(scene160):
    """Split shade op (walk-free, blocked recorded by the shade kernel)
    must reproduce the fused bounce op's forward AND gradients exactly."""
    params = G.get_params(scene160, ("albedo", "centers", "radii"))
    rs = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=SPP, split=True, interpret=True, **KW)
    rf = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=SPP, split=False, interpret=True, **KW)
    vs, gs = jax.value_and_grad(lambda p: jnp.sum(rs(p, 0)))(params)
    vf, gf = jax.value_and_grad(lambda p: jnp.sum(rf(p, 0)))(params)
    np.testing.assert_allclose(float(vs), float(vf), rtol=1e-6)
    for key in params:
        np.testing.assert_allclose(np.asarray(gs[key]),
                                   np.asarray(gf[key]),
                                   rtol=1e-5, atol=1e-7, err_msg=key)


def test_wavefront_grad_sort_invisible(scene160):
    """Sorting is a permutation: gradients with/without sorting agree."""
    params = G.get_params(scene160, ("albedo", "centers"))
    r1 = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=1, sort_every=1, interpret=True, **KW)
    r0 = wg.make_wavefront_render_fn(
        scene160, CAM, W, H, spp=1, sort_every=0, interpret=True, **KW)
    g1 = jax.grad(lambda p: jnp.sum(r1(p, 0)))(params)
    g0 = jax.grad(lambda p: jnp.sum(r0(p, 0)))(params)
    for key in params:
        np.testing.assert_allclose(np.asarray(g1[key]),
                                   np.asarray(g0[key]),
                                   rtol=1e-4, atol=1e-6, err_msg=key)


def test_sort_channels_vjp_matches_take():
    """The custom-vjp variadic sort (r5) == argsort+take, values and grads.

    Unique keys so both implementations apply the identical permutation
    (with ties is_stable=False may legally order differently; the engine
    cannot see it — RNG rides with the ray).  A directional FD check pins
    the vjp's consistency with its own forward."""
    from spt_tpu.kernels.wavefront import N_CH, _sort_channels_vjp
    r = 512
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.permutation(r), jnp.int32)
    stf0 = jnp.asarray(rng.standard_normal((N_CH, r)), jnp.float32)
    idf = jnp.asarray(rng.integers(0, 1000, (2, r)), jnp.int32)
    w = jnp.arange(r, dtype=jnp.float32)

    def via_vjp(stf):
        s, _ = _sort_channels_vjp(key, stf, idf)
        return jnp.sum(jnp.sin(s) * w)

    def via_take(stf):
        s = jnp.take(stf, jnp.argsort(key), axis=1)
        return jnp.sum(jnp.sin(s) * w)

    v1, g1 = jax.value_and_grad(via_vjp)(stf0)
    v2, g2 = jax.value_and_grad(via_take)(stf0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-7)
    s1, i1 = _sort_channels_vjp(key, stf0, idf)
    assert np.array_equal(np.asarray(i1),
                          np.asarray(jnp.take(idf, jnp.argsort(key),
                                              axis=1)))
