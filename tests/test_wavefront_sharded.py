"""The Pallas wavefront engine under shard_map (parallel/wavefront_sharded).

BASELINE config 5's "sharded ... with gradient all-reduce" clause, carried
by the fast engine: sample-sharded forward must equal the single-device
wavefront (same global (pixel, sample) RNG ids; psum only reorders float
addition), and the sample-sharded differentiable wavefront's psum'd
gradients must match the single-device gradients.  Runs on the virtual
8-device CPU mesh (conftest) with kernels in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu import Camera
from spt_tpu.parallel import wavefront_sharded as ws
from spt_tpu.parallel.mesh import make_render_mesh
from spt_tpu.kernels import wavefront

CAM = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
KW = dict(max_bounces=3, rr_depth=2, use_nee=True, use_mis=True, seed=5)
W = H = 64


@pytest.fixture(scope="module")
def scene300():
    from bench_suite import scene_10k
    return scene_10k(300).compile(use_bvh=True)


def test_sample_sharded_forward_matches_single(scene300):
    mesh = make_render_mesh(data=4, prim=1)
    img_sh = np.asarray(ws.render_wavefront_sharded(
        scene300, CAM, W, H, 0, 4, mesh, interpret=True, **KW))
    img_1 = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 4, interpret=True, **KW))
    assert np.isfinite(img_sh).all()
    np.testing.assert_allclose(img_sh, img_1, rtol=1e-5, atol=1e-6)


def test_sample_sharded_forward_8dev(scene300):
    """Full 8-device data axis; also covers spp_dev=1 chunking."""
    mesh = make_render_mesh(data=8, prim=1)
    img_sh = np.asarray(ws.render_wavefront_sharded(
        scene300, CAM, W, H, 0, 8, mesh, interpret=True, **KW))
    img_1 = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 8, interpret=True, **KW))
    np.testing.assert_allclose(img_sh, img_1, rtol=1e-5, atol=1e-6)


def test_sharded_grad_matches_single(scene300):
    """DP gradient all-reduce: psum'd sharded grads == single-device grads.

    Albedo + sky cotangents cover both the per-lane scatter path and the
    SMEM scalar-accumulator path of the backward bounce kernels."""
    from spt_tpu.kernels.wavefront_grad import make_wavefront_render_fn

    mesh = make_render_mesh(data=2, prim=1)
    spp = 2
    params = {"albedo": scene300.materials.albedo,
              "sky": jnp.asarray(scene300.sky_params)}

    target = np.zeros((H, W, 3), np.float32)

    def make_loss(render):
        def loss(p, s0):
            img = render(p, s0)
            return jnp.mean((img - target) ** 2)
        return loss

    r_sh = ws.make_wavefront_dp_render_fn(
        scene300, CAM, W, H, spp=spp, mesh=mesh, interpret=True, **KW)
    r_1 = make_wavefront_render_fn(
        scene300, CAM, W, H, spp=spp, interpret=True, **KW)

    g_sh = jax.jit(jax.grad(make_loss(r_sh)))(params, 0)
    g_1 = jax.jit(jax.grad(make_loss(r_1)))(params, 0)

    for k in params:
        a, b = np.asarray(g_sh[k]), np.asarray(g_1[k])
        assert np.isfinite(a).all(), k
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7,
                                   err_msg=f"grad mismatch in {k}")


def test_spp_must_divide(scene300):
    mesh = make_render_mesh(data=4, prim=1)
    with pytest.raises(ValueError):
        ws.render_wavefront_sharded(scene300, CAM, W, H, 0, 3, mesh,
                                    interpret=True, **KW)
