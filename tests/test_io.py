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
