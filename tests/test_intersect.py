"""Ray-sphere intersection: analytic cases + agreement with the scalar oracle."""

import numpy as np
import jax.numpy as jnp

from spt_tpu.core import intersect
import oracle


def _single(o, d, centers, radii):
    t, hid = intersect.intersect_spheres(
        jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32),
        jnp.asarray(centers, jnp.float32), jnp.asarray(radii, jnp.float32),
        jnp.ones(len(radii), bool))
    return float(t[0]), int(hid[0])


def test_head_on_hit():
    # Ray down +z at a unit sphere centered (0,0,5): hits at t=4.
    t, hid = _single([0, 0, 0], [0, 0, 1], [[0, 0, 5]], [1.0])
    assert hid == 0
    np.testing.assert_allclose(t, 4.0, rtol=1e-6)


def test_miss():
    t, hid = _single([0, 0, 0], [0, 1, 0], [[0, 0, 5]], [1.0])
    assert hid == -1
    assert np.isinf(t)


def test_from_inside_hits_far_wall():
    t, hid = _single([0, 0, 5], [0, 0, 1], [[0, 0, 5]], [1.0])
    assert hid == 0
    np.testing.assert_allclose(t, 1.0, rtol=1e-6)


def test_tmin_skips_surface_acne():
    # Origin exactly on the surface: t=0 root must be rejected by tmin.
    t, hid = _single([0, 0, 4], [0, 0, 1], [[0, 0, 5]], [1.0])
    assert hid == 0
    np.testing.assert_allclose(t, 2.0, rtol=1e-6)


def test_nearest_of_many():
    centers = [[0, 0, 5], [0, 0, 10], [0, 0, 3]]
    t, hid = _single([0, 0, 0], [0, 0, 1], centers, [1.0, 1.0, 0.5])
    assert hid == 2
    np.testing.assert_allclose(t, 2.5, rtol=1e-6)


def test_padding_lanes_ignored():
    centers = jnp.asarray([[0, 0, 2], [0, 0, 0]], jnp.float32)
    radii = jnp.asarray([0.5, 10.0], jnp.float32)
    valid = jnp.asarray([True, False])
    t, hid = intersect.intersect_spheres(
        jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]), centers, radii, valid)
    assert int(hid[0]) == 0


def test_matches_oracle_on_random_scene(rng_np):
    n_s, n_r = 33, 257  # deliberately non-power-of-two
    centers = rng_np.uniform(-5, 5, (n_s, 3)).astype(np.float32)
    radii = rng_np.uniform(0.2, 1.5, (n_s,)).astype(np.float32)
    o = rng_np.uniform(-6, 6, (n_r, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_j, id_j = intersect.intersect_spheres(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(centers),
        jnp.asarray(radii), jnp.ones(n_s, bool))
    t_j, id_j = np.asarray(t_j), np.asarray(id_j)

    for i in range(n_r):
        t_o, id_o = oracle.intersect_all(o[i], d[i], centers, radii)
        assert id_j[i] == id_o, f"ray {i}"
        if id_o >= 0:
            np.testing.assert_allclose(t_j[i], t_o, rtol=2e-4)


def test_occluded_matches_nearest_hit(rng_np):
    n_s, n_r = 16, 128
    centers = jnp.asarray(rng_np.uniform(-4, 4, (n_s, 3)), jnp.float32)
    radii = jnp.asarray(rng_np.uniform(0.2, 1.0, (n_s,)), jnp.float32)
    valid = jnp.ones(n_s, bool)
    o = jnp.asarray(rng_np.uniform(-5, 5, (n_r, 3)), jnp.float32)
    d = rng_np.normal(size=(n_r, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    tmax = jnp.full((n_r,), 6.0)

    t, hid = intersect.intersect_spheres(o, d, centers, radii, valid)
    occ = intersect.occluded(o, d, centers, radii, valid, tmax)
    np.testing.assert_array_equal(np.asarray(occ),
                                  np.asarray((hid >= 0) & (t < tmax)))


def test_sphere_normal_unit_and_outward():
    p = jnp.asarray([[0.0, 0.0, 4.0]])
    c = jnp.asarray([[0.0, 0.0, 5.0]])
    n = np.asarray(intersect.sphere_normal(p, c))
    np.testing.assert_allclose(n, [[0, 0, -1]], atol=1e-6)
