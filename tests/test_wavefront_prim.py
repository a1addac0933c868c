"""Primitive sharding under the Pallas wavefront (parallel/wavefront_prim).

BASELINE config 5 reads "rays AND scene primitives sharded"; until r5 the
prim half ran only through the oracle intersect hooks (VERDICT r4 missing
#3).  These tests pin the wavefront-speed prim shard: leaf blocks split
over the ``prim`` axis, per-shard intersect/any-hit kernels, cross-shard
winner min-reduction and blocked pmax — against the single-device
wavefront on the virtual 8-device CPU mesh (interpret kernels).
"""

import numpy as np
import pytest

from spt_tpu import Camera
from spt_tpu.kernels import wavefront
from spt_tpu.parallel import wavefront_prim as wp
from spt_tpu.parallel.mesh import make_render_mesh

CAM = Camera.look_at((0, 0, -10), (0, 0, 60), fov_degrees=65)
KW = dict(max_bounces=3, rr_depth=2, use_nee=True, use_mis=True, seed=5)
W = H = 64


@pytest.fixture(scope="module")
def scene1k():
    from bench_suite import scene_10k
    return scene_10k(1000).compile(use_bvh=True)


def _close(a, b):
    assert np.isfinite(a).all()
    close = np.abs(a - b) < 1e-4 + 1e-3 * np.abs(b)
    # Cross-shard t-tie resolution (shard id vs candidate order) may flip
    # knife-edge winners; everything else must agree.
    assert close.mean() > 0.999, f"only {close.mean():.5f} close"


def test_prim_sharded_matches_single(scene1k):
    """prim=4 x data=1: pure primitive sharding at 1k prims."""
    mesh = make_render_mesh(data=1, prim=4)
    img_p = np.asarray(wp.render_wavefront_prim_sharded(
        scene1k, CAM, W, H, 0, 2, mesh, interpret=True, **KW))
    img_1 = np.asarray(wavefront.render_wavefront(
        scene1k, CAM, W, H, 0, 2, interpret=True, **KW))
    _close(img_p, img_1)


def test_prim_x_data_sharded_matches_single(scene1k):
    """The full TP x DP composition: data=2 x prim=4 on 8 devices."""
    mesh = make_render_mesh(data=2, prim=4)
    img_p = np.asarray(wp.render_wavefront_prim_sharded(
        scene1k, CAM, W, H, 0, 2, mesh, interpret=True, **KW))
    img_1 = np.asarray(wavefront.render_wavefront(
        scene1k, CAM, W, H, 0, 2, interpret=True, **KW))
    _close(img_p, img_1)


def test_prim_sharded_nonuniform_block_count(scene1k):
    """Block count not divisible by the prim axis: the invalid-block pad
    must be inert (prim=8 over a 1k-prim scene's leaf blocks)."""
    mesh = make_render_mesh(data=1, prim=8)
    img_p = np.asarray(wp.render_wavefront_prim_sharded(
        scene1k, CAM, W, H, 0, 1, mesh, interpret=True, **KW))
    img_1 = np.asarray(wavefront.render_wavefront(
        scene1k, CAM, W, H, 0, 1, interpret=True, **KW))
    _close(img_p, img_1)
