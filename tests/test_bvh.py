"""BVH: structural validity of both builders + traversal ≡ brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from spt_tpu.core import bvh as bvh_mod
from spt_tpu.core import intersect
from spt_tpu.core.bvh import build_bvh, intersect_bvh


def _random_scene(rng, n, spread=20.0):
    centers = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    radii = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    return centers, radii


def _check_structure(b, n_prims):
    """Invariants of the preorder skip-link layout."""
    nm = np.asarray(b.node_min)
    nx = np.asarray(b.node_max)
    skip = np.asarray(b.node_skip)
    first = np.asarray(b.node_first)
    count = np.asarray(b.node_count)
    prim = np.asarray(b.prim_idx)
    N = b.n_nodes

    assert (nm <= nx).all()
    assert sorted(prim.tolist()) == list(range(n_prims))
    leaf_total = count.sum()
    assert leaf_total == n_prims
    for i in range(N):
        assert i < skip[i] <= N
        if count[i] > 0:  # leaf
            assert skip[i] == i + 1 or count[i] > 0  # leaf subtree is itself
            assert 0 <= first[i] and first[i] + count[i] <= n_prims
            assert count[i] <= b.max_leaf
        else:  # inner: children are [i+1, skip) split into two subtrees
            assert skip[i] > i + 1
    # Leaves' skip must be i+1 (subtree of a leaf is just the leaf).
    leaves = count > 0
    np.testing.assert_array_equal(skip[leaves], np.nonzero(leaves)[0] + 1)
    # Child AABBs are contained in parents along the preorder.
    for i in range(N):
        if count[i] == 0:
            for ch in (i + 1,):
                assert (nm[i] <= nm[ch] + 1e-5).all()
                assert (nx[i] >= nx[ch] - 1e-5).all()


@pytest.mark.parametrize("force_numpy", [True, False])
def test_builder_structure(rng_np, force_numpy):
    if not force_numpy and bvh_mod._load_native() is None:
        pytest.skip("native builder not built")
    centers, radii = _random_scene(rng_np, 100)
    b = build_bvh(centers, radii, force_numpy=force_numpy)
    _check_structure(b, 100)


@pytest.mark.parametrize("force_numpy", [True, False])
@pytest.mark.parametrize("n_prims", [1, 3, 17, 300])
def test_traversal_matches_bruteforce(rng_np, force_numpy, n_prims):
    if not force_numpy and bvh_mod._load_native() is None:
        pytest.skip("native builder not built")
    centers, radii = _random_scene(rng_np, n_prims, spread=8.0)
    b = build_bvh(centers, radii, force_numpy=force_numpy)

    n_rays = 512
    o = rng_np.uniform(-10, 10, (n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    c_j, r_j = jnp.asarray(centers), jnp.asarray(radii)

    t_b, id_b = intersect.intersect_spheres(
        o_j, d_j, c_j, r_j, jnp.ones(n_prims, bool))
    t_v, id_v = intersect_bvh(o_j, d_j, c_j, r_j, b)

    id_b, id_v = np.asarray(id_b), np.asarray(id_v)
    t_b, t_v = np.asarray(t_b), np.asarray(t_v)
    # Id agreement everywhere except possible grazing boundary flips.
    agree = id_b == id_v
    assert agree.mean() > 0.995, f"{(~agree).sum()} id mismatches"
    both = (id_b >= 0) & (id_v >= 0) & agree
    np.testing.assert_allclose(t_v[both], t_b[both], rtol=1e-4, atol=1e-5)


def test_padding_prims_excluded(rng_np):
    centers, radii = _random_scene(rng_np, 8, spread=3.0)
    valid = np.array([True] * 4 + [False] * 4)
    b = build_bvh(centers, radii, valid=valid)
    prim = np.asarray(b.prim_idx)
    assert set(prim.tolist()) == {0, 1, 2, 3}


def test_empty_scene():
    b = build_bvh(np.zeros((0, 3)), np.zeros((0,)))
    t, hid = intersect_bvh(jnp.zeros((4, 3)),
                           jnp.asarray([[0.0, 0.0, 1.0]] * 4),
                           jnp.zeros((1, 3)), jnp.ones((1,)), b)
    assert (np.asarray(hid) == -1).all()


def test_tmax_limits_hits(rng_np):
    centers = np.array([[0, 0, 5.0], [0, 0, 20.0]], np.float32)
    radii = np.array([1.0, 1.0], np.float32)
    b = build_bvh(centers, radii)
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, hid = intersect_bvh(o, d, jnp.asarray(centers), jnp.asarray(radii), b,
                           tmax=jnp.asarray(2.0))
    assert int(hid[0]) == -1
    t, hid = intersect_bvh(o, d, jnp.asarray(centers), jnp.asarray(radii), b,
                           tmax=jnp.asarray(10.0))
    assert int(hid[0]) == 0 and abs(float(t[0]) - 4.0) < 1e-5


def test_native_and_numpy_traversals_agree(rng_np):
    if bvh_mod._load_native() is None:
        pytest.skip("native builder not built")
    centers, radii = _random_scene(rng_np, 200, spread=10.0)
    b_nat = build_bvh(centers, radii, force_numpy=False)
    b_np = build_bvh(centers, radii, force_numpy=True)
    n_rays = 256
    o = jnp.asarray(rng_np.uniform(-12, 12, (n_rays, 3)), jnp.float32)
    d = rng_np.normal(size=(n_rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    c_j, r_j = jnp.asarray(centers), jnp.asarray(radii)
    t1, i1 = intersect_bvh(o, d, c_j, r_j, b_nat)
    t2, i2 = intersect_bvh(o, d, c_j, r_j, b_np)
    agree = np.asarray(i1) == np.asarray(i2)
    assert agree.mean() > 0.995
    both = agree & (np.asarray(i1) >= 0)
    np.testing.assert_allclose(np.asarray(t1)[both], np.asarray(t2)[both],
                               rtol=1e-5)


def test_large_scene_renders_via_bvh_equals_bruteforce(rng_np):
    """End-to-end: >threshold scene auto-builds a BVH; image must match the
    brute-force render bit-for-bit (same RNG streams, same hits)."""
    import jax
    from spt_tpu import Scene, Camera
    from spt_tpu.engine.integrator_jax import render_megasample

    scene = Scene()
    m = scene.add_material("lambert", albedo=(0.6, 0.6, 0.6))
    for i in range(600):
        p = rng_np.uniform(-10, 10, 3)
        p[2] += 15.0
        scene.create_sphere(f"s{i}", tuple(p), float(rng_np.uniform(0.2, 0.6)), m)
    sd_bvh = scene.compile()
    sd_brute = scene.compile(use_bvh=False)
    assert sd_bvh.bvh is not None and sd_brute.bvh is None

    cam = Camera.look_at((0, 0, -5), (0, 0, 15), fov_degrees=60)
    W = H = 32

    # Depth 1 (primary hit + sky only) is deterministic modulo ulps: the two
    # intersection paths must agree almost everywhere, tightly.
    kw1 = dict(max_bounces=1, rr_depth=8, seed=7)
    a1 = np.asarray(jax.jit(
        lambda sd, s: render_megasample(sd, cam, W, H, s, **kw1))(sd_bvh, jnp.arange(1)))
    b1 = np.asarray(jax.jit(
        lambda sd, s: render_megasample(sd, cam, W, H, s, **kw1))(sd_brute, jnp.arange(1)))
    close = np.isclose(a1, b1, rtol=1e-4, atol=1e-5).all(axis=-1)
    assert close.mean() > 0.998, f"depth-1 mismatch on {(~close).sum()} px"

    # Depth 3: ulp-level hit differences diverge chaotically per path, so
    # compare statistically — the estimators must agree in expectation.
    kw3 = dict(max_bounces=3, rr_depth=2, seed=7)
    a3 = np.asarray(jax.jit(
        lambda sd, s: render_megasample(sd, cam, W, H, s, **kw3))(sd_bvh, jnp.arange(8))) / 8
    b3 = np.asarray(jax.jit(
        lambda sd, s: render_megasample(sd, cam, W, H, s, **kw3))(sd_brute, jnp.arange(8))) / 8
    assert abs(a3.mean() - b3.mean()) / b3.mean() < 0.01
    # And the overwhelming majority of pixels are still identical paths.
    close3 = np.isclose(a3, b3, rtol=1e-3, atol=1e-4).all(axis=-1)
    assert close3.mean() > 0.97
