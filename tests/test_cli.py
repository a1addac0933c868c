"""End-to-end smoke tests for the application layer (apps/).

The reference's application layer is the SDL/ImGui editor loop
(src/App.cpp:148-331); ours is the headless CLI + inverse-rendering demo.
These run the real entry points in subprocesses (fresh JAX, forced CPU) on
tiny workloads and assert the full pipeline — scene JSON -> engine ->
progressive session -> checkpoint/resume -> image writers — holds together.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "apps", "render_cli.py")
INV = os.path.join(REPO, "apps", "inverse_render.py")
SCENE = os.path.join(REPO, "scenes", "cornell.json")


def run_cli(*args, timeout=300):
    return subprocess.run(
        [sys.executable, CLI, *args], capture_output=True, text=True,
        timeout=timeout, cwd=REPO)


def test_render_cli_writes_png(tmp_path):
    out = str(tmp_path / "out.png")
    r = run_cli(SCENE, "-o", out, "--backend", "jax", "--device", "cpu",
                "--size", "48", "32", "--spp", "4", "--chunk", "2",
                "--max-bounces", "2", "-q")
    assert r.returncode == 0, r.stderr
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_render_cli_resume_matches_uninterrupted(tmp_path):
    """4 spp + resume to 8 spp == one 8-spp run (checkpoint is exact)."""
    kw = ["--backend", "jax", "--device", "cpu", "--size", "32", "24",
          "--chunk", "4", "--max-bounces", "2", "-q"]
    direct = str(tmp_path / "direct.npy")
    r = run_cli(SCENE, "-o", direct, "--spp", "8", *kw)
    assert r.returncode == 0, r.stderr

    state = str(tmp_path / "state.npz")
    part = str(tmp_path / "part.npy")
    r = run_cli(SCENE, "-o", part, "--spp", "4", "--checkpoint", state, *kw)
    assert r.returncode == 0, r.stderr
    resumed = str(tmp_path / "resumed.npy")
    r = run_cli(SCENE, "-o", resumed, "--spp", "8", "--resume", state, *kw)
    assert r.returncode == 0, r.stderr

    np.testing.assert_allclose(np.load(resumed), np.load(direct),
                               rtol=1e-6, atol=1e-7)


def test_render_cli_bad_scene_fails_cleanly(tmp_path):
    r = run_cli(str(tmp_path / "missing.json"), "-o", str(tmp_path / "x.png"),
                "--device", "cpu")
    assert r.returncode != 0


@pytest.mark.slow
def test_inverse_render_loss_decreases(tmp_path):
    r = subprocess.run(
        [sys.executable, INV, "--spheres", "4", "--steps", "6",
         "--size", "24", "24", "--spp", "2", "--target-spp", "4",
         "--device", "cpu", "--seed", "3"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stderr
    # The demo prints per-step losses; first and last prove descent.
    losses = [float(tok.split("loss=")[1].split()[0])
              for tok in r.stdout.splitlines() if "loss=" in tok]
    assert len(losses) >= 2 and losses[-1] < losses[0] * 1.5
