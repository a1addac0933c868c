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
    """Parity vs the SoA oracle.  Identical RNG streams make the two
    estimators near-bit-equal except at knife-edge hits: a grazing
    intersection with t within float noise of TMIN flips the strict
    accept comparison (the walk's t skips the 1/|d|^2 normalization the
    oracle applies), sending the two paths down different—both valid—
    histories.  Measured: <=1% of pixels diverge; the rest agree to
    ~1e-6, so the gate is tight (1e-4 + 0.1% rel) on >=99% of pixels."""
    img_w = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 2, interpret=True, **KW))
    img_s = np.asarray(render_megasample_soa(
        scene300, CAM, W, H, jnp.arange(2), **KW))
    assert np.isfinite(img_w).all()
    close = np.abs(img_w - img_s) < 1e-4 + 1e-3 * np.abs(img_s)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of pixels close"


def test_sort_is_invisible(scene300):
    """Sorting is a stream permutation the estimator cannot see.

    sort_min_rays=0 so the sorts actually RUN at this 64x64 size — the
    engine default (1 << 17) skips every sort below 128 tiles, which made
    this test compare two identical no-sort runs (r5 fix, same class of
    vacuity as ADVICE r4's precull findings)."""
    kw = dict(KW, sort_min_rays=0)
    a = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, sort_every=1, interpret=True, **kw))
    b = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, sort_every=0, interpret=True, **kw))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, sort_every=2, interpret=True, **kw))
    np.testing.assert_array_equal(a, c)
    # Row-granular permutation (512B-contiguous gathers) is a permutation
    # too — compaction boundary stays conservative (min member key).
    d = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, rowsort=True, interpret=True, **kw))
    np.testing.assert_array_equal(a, d)


def test_tiered_prefix_sort_invisible(scene300):
    """r5 tiered prefix sorts (sort only the static prefix once the alive
    boundary fits in it) must be invisible: the suffix is all-dead and
    already in place.  rr_depth=1 collapses the population fast enough
    that the 1/2 and 1/4 tiers actually engage at this size (8 bounces,
    sorts never skipped), pinned against the never-tiered run via
    compact=False (which forces full-stream sorts with the same keys)."""
    kw = dict(KW, rr_depth=1, max_bounces=8, sort_min_rays=0)
    a = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, compact=True, interpret=True, **kw))
    b = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, compact=False, interpret=True, **kw))
    np.testing.assert_array_equal(a, b)


def test_precull_matches_walk(scene300):
    """The XLA precull + in-kernel candidate sweep must agree with the
    in-kernel tree walk: the precull's per-lane slab tests are exactly the
    tests the walk would run at each leaf, so the only legal differences
    are t-ties resolved in a different sweep order (none in this scene).

    split=False throughout: the split pipeline ignores ``precull`` (its
    intersect kernel always sweeps candidate lists), so only the fused
    bounce kernel actually selects sweep-vs-walk (ADVICE r4 medium)."""
    a = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, precull=True, split=False,
        interpret=True, **KW))
    b = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, precull=False, split=False,
        interpret=True, **KW))
    np.testing.assert_array_equal(a, b)
    # The nearest-first early-exit (tcull) is a pure optimization.
    c = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, precull=True, tcull=False, split=False,
        interpret=True, **KW))
    np.testing.assert_array_equal(a, c)


def test_split_matches_fused(scene300):
    """Split bounce (intersect kernel -> XLA shadow precull -> walk-free
    shade kernel) must reproduce the fused bounce kernel exactly: the
    shade kernel re-derives the winner from the residuals with the same
    quadratic, and the XLA glue preculls the very shadow rays the kernel
    reconstructs (shared physics.nee_shadow_setup)."""
    a = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, split=True, interpret=True, **KW))
    b = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 1, split=False, interpret=True, **KW))
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)


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


def _env_gradient(he=16, we=32):
    """Smooth anisotropic test env map (distinct radiance per direction)."""
    v = np.linspace(0.0, 1.0, he, dtype=np.float32)[:, None]
    u = np.linspace(0.0, 1.0, we, dtype=np.float32)[None, :]
    r = 0.2 + 0.8 * v * np.ones_like(u)
    g = 0.3 + 0.5 * np.sin(2 * np.pi * u) ** 2 * np.ones_like(v)
    b = 0.6 + 0.4 * u * np.ones_like(v)
    return np.stack([r, g, b], axis=-1)


@pytest.fixture(scope="module")
def scene_env():
    from bench_suite import scene_10k
    sc = scene_10k(150)
    sc.set_environment_map(_env_gradient())
    return sc.compile(use_bvh=True)


def test_wavefront_env_map_matches_soa(scene_env):
    """SKY_ENVMAP fast path: miss lanes get their env lookup between bounce
    kernels; radiance must match the SoA integrator's in-loop lookup."""
    img_w = np.asarray(wavefront.render_wavefront(
        scene_env, CAM, W, H, 0, 2, interpret=True, **KW))
    img_s = np.asarray(render_megasample_soa(
        scene_env, CAM, W, H, jnp.arange(2), **KW))
    assert np.isfinite(img_w).all()
    assert img_w.sum() > 0.0   # env light actually contributes
    close = np.abs(img_w - img_s) < 1e-3 + 0.05 * np.abs(img_s)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of pixels close"


def test_wavefront_env_sort_invisible(scene_env):
    """The miss-flag channel must survive (be cleared before) the sort.
    sort_min_rays=0 so the sorts actually run at this size (r5 fix)."""
    a = np.asarray(wavefront.render_wavefront(
        scene_env, CAM, W, H, 0, 1, sort_every=1, sort_min_rays=0,
        interpret=True, **KW))
    b = np.asarray(wavefront.render_wavefront(
        scene_env, CAM, W, H, 0, 1, sort_every=0, sort_min_rays=0,
        interpret=True, **KW))
    np.testing.assert_array_equal(a, b)


def test_pallas_backend_routes_env_to_wavefront(scene_env):
    """backend="pallas" + SKY_ENVMAP must use the wavefront engine (no
    silent pure-JAX fallback) and agree with the jax backend."""
    import spt_tpu

    def build(backend):
        eng = spt_tpu.create_path_tracer(backend)
        sc = spt_tpu.Scene()
        rs = np.random.RandomState(3)
        for i in range(8):
            m = sc.add_material("lambert",
                                albedo=tuple(rs.uniform(0.2, 0.9, 3)))
            c = rs.uniform(-3, 3, 3) + np.asarray([0, 0, 8.0])
            sc.create_sphere(f"s{i}", tuple(c), 0.8, m)
        sc.set_environment_map(_env_gradient())
        eng.set_scene(sc)
        st = spt_tpu.RenderSettings(width=32, height=32,
                                    samples_per_pixel=2, max_bounces=3)
        eng.set_settings(st)
        eng.render(spp=2)
        return eng.get_render_result().image_f32
    img_p = np.asarray(build("pallas"))
    img_j = np.asarray(build("jax"))
    assert np.isfinite(img_p).all()
    close = np.abs(img_p - img_j) < 1e-3 + 0.05 * np.abs(img_j)
    assert close.mean() > 0.98


def test_mxu_sweeps_match_vpu(scene300):
    """r5 MXU-form sweeps (per-row candidate lists, matmul quadratic
    terms, sqrt-free any-hit) vs the r4 per-tile VPU sweeps.

    The matmul's accumulation order differs from the scalar FMA chain, so
    bit-exactness is not the contract — agreement is pinned at knife-edge
    tolerance (>=99.9% of pixels within 1e-3 relative), the same bar the
    cross-engine oracle suites use.  Winner ordering semantics (first
    candidate block, lowest slot on ties) are identical by construction.
    """
    a = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 2, mxu=False, interpret=True, **KW))
    b = np.asarray(wavefront.render_wavefront(
        scene300, CAM, W, H, 0, 2, mxu=True, interpret=True, **KW))
    assert np.isfinite(b).all()
    close = np.abs(a - b) < 1e-4 + 1e-3 * np.abs(a)
    assert close.mean() > 0.999, f"only {close.mean():.5f} close"


def test_mxu_env_map(scene_env):
    """MXU path with SKY_ENVMAP: miss-lane env radiance must survive the
    split-kernel swap (the miss flag rides the same channel protocol)."""
    a = np.asarray(wavefront.render_wavefront(
        scene_env, CAM, W, H, 0, 1, mxu=False, interpret=True, **KW))
    b = np.asarray(wavefront.render_wavefront(
        scene_env, CAM, W, H, 0, 1, mxu=True, interpret=True, **KW))
    assert np.isfinite(b).all() and b.sum() > 0.0
    close = np.abs(a - b) < 1e-4 + 1e-3 * np.abs(a)
    assert close.mean() > 0.999, f"only {close.mean():.5f} close"
