"""Sorted-wavefront renderer (kernels/wavefront.py) parity + invariances.

The wavefront engine must be estimator-identical to the SoA integrator and
the BVH megakernel: every sample site keys its RNG on the (pixel, sample)
ids carried with the ray, so re-ordering the stream (the whole point of the
engine) cannot change any pixel.  Interpret mode on CPU; the real-chip run
is recorded in TESTS_TPU.md / BENCH_SUITE.json.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spt_tpu import Camera
from spt_tpu.engine.integrator_soa import render_megasample_soa
from spt_tpu.kernels import wavefront


@pytest.fixture(scope="module")
def scene300():
    from bench_suite import scene_10k
    return scene_10k(300).compile(use_bvh=True)


CAM = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
KW = dict(max_bounces=4, rr_depth=2, use_nee=True, use_mis=True, seed=5)
W = H = 64


def test_wavefront_matches_soa(scene300):
    img_w = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 2, interpret=True, **KW))
    img_s = np.asarray(render_megasample_soa(
        scene300, CAM, W, H, jnp.arange(2), **KW))
    assert np.isfinite(img_w).all()
    close = np.abs(img_w - img_s) < 1e-3 + 0.05 * np.abs(img_s)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of pixels close"


def test_sort_is_invisible(scene300):
    """Sorting is a stream permutation the estimator cannot see."""
    a = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, sort_every=1, interpret=True, **KW))
    b = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, sort_every=0, interpret=True, **KW))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, sort_every=2, interpret=True, **KW))
    np.testing.assert_array_equal(a, c)


def test_chunking_is_invisible(scene300):
    """Chunked sample batches sum to the same image (same start_sample
    streams), regardless of the chunk size."""
    rays_per_img = 4 * wavefront.TILE   # 64x64 -> 4 tiles
    one = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 2, chunk_rays=rays_per_img,
        interpret=True, **KW))
    both = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 2, chunk_rays=2 * rays_per_img,
        interpret=True, **KW))
    np.testing.assert_allclose(one, both, rtol=1e-5, atol=1e-6)


def test_nonaligned_resolution(scene300):
    """Width/height off the 32x32 tile grid: padding lanes must not leak."""
    img = np.asarray(wavefront.render_wavefront(
        scene300, CAM, 40, 24, 0, 1, interpret=True, **KW))
    ref = np.asarray(render_megasample_soa(
        scene300, CAM, 40, 24, jnp.arange(1), **KW))
    assert img.shape == (24, 40, 3)
    assert np.isfinite(img).all()
    close = np.abs(img - ref) < 1e-3 + 0.05 * np.abs(ref)
    assert close.mean() > 0.99
