"""IO: scene JSON round trip, image writers, env maps, checkpointing."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

import spt_tpu
from spt_tpu import RenderSettings, Scene, create_path_tracer
from spt_tpu.core.scene import SKY_ENVMAP, SKY_NONE
from spt_tpu.engine.integrator_jax import render_megasample, sample_env_map
from spt_tpu.io import checkpoint as ckpt
from spt_tpu.io.image import write_image, write_png, _write_png_pure
from spt_tpu.io.scene_json import load_scene, save_scene


def test_load_cornell_scene():
    scene, camera, settings = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.json"))
    sd = scene.compile()
    assert sd.num_prims == 8
    assert sd.num_lights == 1
    assert camera is not None
    assert settings.width == 512 and settings.samples_per_pixel == 256
    assert settings.tonemap == "aces" and settings.gamma == 2.2
    assert sd.sky_mode == SKY_NONE


def test_scene_json_roundtrip(tmp_path):
    scene, camera, settings = load_scene(
        os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.json"))
    out = tmp_path / "rt.json"
    save_scene(str(out), scene, camera, settings)
    scene2, cam2, settings2 = load_scene(str(out))
    sd1, sd2 = scene.compile(), scene2.compile()
    np.testing.assert_allclose(np.asarray(sd1.centers), np.asarray(sd2.centers))
    np.testing.assert_allclose(np.asarray(sd1.radii), np.asarray(sd2.radii))
    np.testing.assert_allclose(np.asarray(sd1.materials.albedo),
                               np.asarray(sd2.materials.albedo))
    assert settings2.samples_per_pixel == settings.samples_per_pixel
    np.testing.assert_allclose(np.asarray(cam2.position),
                               np.asarray(camera.position), atol=1e-6)


def test_scene_json_roundtrip_dof_envmap(tmp_path):
    """DoF camera + env-map sky survive a save/load cycle (VERDICT r1 #7)."""
    from spt_tpu import Camera
    env = np.random.default_rng(3).uniform(0, 4, (8, 16, 3)).astype(np.float32)
    scene = Scene()
    m = scene.add_material("lambert", albedo=(0.6, 0.5, 0.4))
    scene.create_sphere("s", (0, 0, 5), 1.0, m)
    scene.set_environment_map(env)
    cam = Camera.look_at((0, 1, -3), (0, 0, 5), fov_degrees=50,
                         aperture=0.25, focus_dist=8.0)
    out = tmp_path / "dof_env.json"
    save_scene(str(out), scene, cam)
    scene2, cam2, _ = load_scene(str(out))
    assert scene2.sky_mode == SKY_ENVMAP
    # RGBE error bound: 1/128 of the pixel's max channel (shared exponent).
    err = np.abs(scene2.env_map - env) / np.maximum(
        env.max(-1, keepdims=True), 1e-9)
    assert float(err.max()) < 1.0 / 128.0 + 1e-3
    assert float(cam2.aperture) == pytest.approx(0.25)
    assert float(cam2.focus_dist) == pytest.approx(8.0)
    # A named source path is reused rather than re-dumped.
    env_path = str(tmp_path / "named.hdr")
    from spt_tpu.io.hdr import write_hdr
    write_hdr(env_path, env)
    scene3, _, _ = load_scene({"scene": {
        "objects": [{"type": "sphere"}],
        "environment": {"type": "hdri", "path": env_path}}})
    out2 = tmp_path / "named_scene.json"
    save_scene(str(out2), scene3)
    assert json.load(open(out2))["scene"]["environment"]["path"] == env_path


def test_hdr_roundtrip(tmp_path):
    """Radiance RGBE: write -> read preserves HDR values to RGBE precision."""
    from spt_tpu.io.hdr import read_hdr, write_hdr
    rng = np.random.default_rng(11)
    img = (rng.uniform(0, 1, (17, 33, 3)) ** 4 * 1000.0).astype(np.float32)
    img[0, :5] = 0.0          # black pixels
    img[1, 0] = [1e-4, 5e3, 0.5]  # wide dynamic range in one pixel
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # Shared-exponent format: error bound is 1/128 of the pixel max channel.
    err = np.abs(back - img) / np.maximum(img.max(-1, keepdims=True), 1e-9)
    assert float(err.max()) < 1.0 / 128.0 + 1e-3


def test_hdr_rle_wide(tmp_path):
    """RLE path: constant rows (long runs) and wide images decode exactly."""
    from spt_tpu.io.hdr import read_hdr, write_hdr
    img = np.zeros((4, 300, 3), np.float32)
    img[:2] = 2.5             # long runs
    img[2, ::2] = [1.0, 2.0, 3.0]  # alternating (literal-heavy)
    p = str(tmp_path / "rle.hdr")
    write_hdr(p, img)
    back = read_hdr(p)
    np.testing.assert_allclose(back, img, rtol=1.0 / 128.0, atol=1e-6)


def test_write_image_hdr(tmp_path):
    from spt_tpu.io.hdr import read_hdr
    img = np.full((4, 8, 3), 7.5, np.float32)
    write_image(str(tmp_path / "x.hdr"), img)
    np.testing.assert_allclose(read_hdr(str(tmp_path / "x.hdr")), img,
                               rtol=1.0 / 128.0)


def test_bad_scene_errors():
    with pytest.raises(ValueError, match="unsupported object type"):
        load_scene({"scene": {"objects": [{"type": "cube"}]}})
    with pytest.raises(ValueError, match="unknown material"):
        load_scene({"scene": {"objects": [
            {"type": "sphere", "material": "nope"}]}})
    with pytest.raises(ValueError, match="unknown environment"):
        load_scene({"scene": {"environment": {"type": "wat"}}})


def test_png_writers_agree(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (16, 24, 3)).astype(np.float32)
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.png"
    write_png(str(p1), img)
    _write_png_pure(str(p2), (np.clip(img, 0, 1) * 255).astype(np.uint8))
    from PIL import Image
    a = np.asarray(Image.open(p1))
    b = np.asarray(Image.open(p2))
    np.testing.assert_array_equal(a[..., :3], b)


def test_write_image_dispatch(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    write_image(str(tmp_path / "x.ppm"), img)
    write_image(str(tmp_path / "x.npy"), img)
    with pytest.raises(ValueError):
        write_image(str(tmp_path / "x.bmp"), img)


def test_env_map_sampling_directions():
    """Poles and cardinal directions hit the right texels."""
    he, we = 8, 16
    env = np.zeros((he, we, 3), np.float32)
    env[0, :] = [1, 0, 0]        # up (v=0)
    env[-1, :] = [0, 1, 0]       # down
    env = jnp.asarray(env)
    up = sample_env_map(env, jnp.asarray([[0.0, 1.0, 0.0]]))
    down = sample_env_map(env, jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(up[0, 0]) > 0.9 and float(up[0, 1]) < 0.1
    assert float(down[0, 1]) > 0.9 and float(down[0, 0]) < 0.1


def test_env_map_render_furnace():
    """Constant env map == constant sky: white furnace at depth 1."""
    scene = Scene()
    scene.set_environment_map(np.full((4, 8, 3), 2.0, np.float32))
    sd = scene.compile()
    from spt_tpu import Camera
    cam = Camera.look_at((0, 0, 0), (0, 0, 1), fov_degrees=60)
    img = np.asarray(render_megasample(sd, cam, 8, 8, jnp.arange(1),
                                       max_bounces=1, rr_depth=8))
    np.testing.assert_allclose(img, 2.0, rtol=1e-5)


def test_checkpoint_file_roundtrip(tmp_path):
    tracer = create_path_tracer("jax")
    scene = Scene()
    scene.create_sphere("s", (0, 0, 5), 1.0)
    tracer.set_scene(scene)
    s = RenderSettings()
    s.set_resolution(8, 8)
    s.integrator = "reference"
    tracer.set_settings(s)
    tracer.render()
    path = str(tmp_path / "state.npz")
    ckpt.save_render_state(path, tracer)

    tracer2 = create_path_tracer("jax")
    scene2 = Scene()
    scene2.create_sphere("s", (0, 0, 5), 1.0)
    tracer2.set_scene(scene2)
    s2 = RenderSettings()
    s2.set_resolution(8, 8)
    s2.integrator = "reference"
    tracer2.set_settings(s2)
    ckpt.load_render_state(path, tracer2)
    assert tracer2.frame_count == 1
    np.testing.assert_array_equal(
        np.asarray(tracer.get_render_result().image_f32),
        np.asarray(tracer2.get_render_result().image_f32))


def test_exr_roundtrip(tmp_path):
    """Float OpenEXR write/read is lossless (uncompressed FLOAT RGB)."""
    from spt_tpu.io.exr import read_exr, write_exr
    from spt_tpu.io.image import write_image

    rng = np.random.default_rng(9)
    img = (rng.gamma(1.5, 2.0, (13, 17, 3)) - 0.5).astype(np.float32)
    p = str(tmp_path / "x.exr")
    write_exr(p, img)
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)   # bit-exact float
    # dispatch through the extension router too
    write_image(str(tmp_path / "y.exr"), img)
    np.testing.assert_array_equal(read_exr(str(tmp_path / "y.exr")), img)
