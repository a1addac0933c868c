"""Golden parity: the JAX reference-mode integrator vs the scalar oracle.

Same RNG streams (bit-exact uint32 chains) drive both, so images must agree
to float32 arithmetic-reordering tolerance — this is the config-1 correctness
gate from BASELINE.md (reference semantics on shared scenes).
"""

import numpy as np
import jax
import jax.numpy as jnp

from spt_tpu.core.scene import Scene, demo_scene_38_spheres
from spt_tpu.engine.integrator_jax import render_reference_sample
import oracle


def _scene_arrays(scene):
    sd = scene.compile()
    n = sd.num_prims
    return sd, np.asarray(sd.centers)[:n], np.asarray(sd.radii)[:n]


def test_single_sphere_frame_matches_oracle():
    scene = Scene()
    scene.create_sphere("s", (0.0, -1.0, 5.0), 1.0)
    scene.create_sphere("ground", (0.0, -102.0, 5.0), 100.0)
    sd, centers, radii = _scene_arrays(scene)

    w, h = 64, 48
    img_oracle = oracle.render_frame(w, h, frame=0, centers=centers, radii=radii)
    img_jax = np.asarray(render_reference_sample(sd, w, h, 0))

    # Identical RNG, identical sampling decisions; only float reassociation
    # differs.  Mismatched RR decisions would show up as large outliers.
    np.testing.assert_allclose(img_jax, img_oracle, atol=2e-3)
    frac_close = np.mean(np.all(np.abs(img_jax - img_oracle) < 1e-4, axis=-1))
    assert frac_close > 0.995, f"only {frac_close:.3%} of pixels tightly match"


def test_demo_scene_38_spheres_multi_frame():
    scene = demo_scene_38_spheres()
    sd, centers, radii = _scene_arrays(scene)
    assert sd.num_prims == 38

    w, h = 48, 32
    for frame in (0, 3):
        img_oracle = oracle.render_frame(w, h, frame, centers, radii)
        img_jax = np.asarray(render_reference_sample(sd, w, h, frame))
        np.testing.assert_allclose(img_jax, img_oracle, atol=2e-3)


def test_progressive_accumulation_mean_converges():
    """Accumulating frames reproduces the reference's progressive mean."""
    scene = Scene()
    scene.create_sphere("s", (0.0, 0.0, 5.0), 1.0)
    sd, centers, radii = _scene_arrays(scene)
    w, h = 32, 32
    fn = jax.jit(lambda sc, f: render_reference_sample(sc, w, h, f))
    acc = jnp.zeros((h, w, 3))
    for f in range(4):
        acc = acc + fn(sd, f)
    mean = np.asarray(acc / 4.0)
    # Sky pixels (no geometry) are deterministic: equal to sky color exactly.
    corner = mean[0, 0]
    d_oracle = oracle.render_frame(w, h, 0, centers, radii)[0, 0]
    np.testing.assert_allclose(corner, d_oracle, atol=1e-5)
    assert mean.min() >= 0.0 and np.isfinite(mean).all()
