"""Sharded rendering and training steps.

Three first-class parallelism strategies (SURVEY.md §2.4's mandate), all as
``shard_map`` programs over a ``('data','prim')`` mesh:

* **Ray/pixel sharding** (`render_pixel_sharded`) — the primary axis: each
  device renders a horizontal band with *global* pixel ids, so the result
  is bitwise identical to a single-device render (counter RNG keys on
  pixel/sample only).  Zero communication in the forward pass.

* **Sample sharding** (`render_sample_sharded`) — spp split across devices,
  partial radiance sums combined with one ``psum`` — the DP shape for
  progressive refinement at small resolutions.

* **Primitive sharding** (`render_prim_sharded`) — BASELINE config 5: scene
  sphere arrays partitioned over the ``prim`` axis (scene memory scales with
  devices); every bounce intersects locally, then the nearest hit is
  resolved across devices with a min/argmin reduction and the winning
  primitive's attributes are broadcast with a one-hot ``psum``.  This is the
  ring-attention-shaped pattern of rendering: rays stay put, scene chunks
  are logically "visited" via collectives on ICI.

* **Data-parallel gradient step** (`make_dp_grad_step`) — inverse rendering
  with sample-sharded gradient estimation and ``psum`` all-reduce of scene-
  parameter gradients; XLA overlaps the reduction with the backward
  computation automatically inside the jitted program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from ..core import intersect
from ..core.scene import SceneData
from ..engine import integrator_jax


def render_pixel_sharded(scene: SceneData, camera, width: int, height: int,
                         sample_ids, mesh: Mesh, **kw):
    """Rows sharded over the mesh's ``data`` axis; bitwise ≡ single device."""
    n_data = mesh.shape["data"]
    if height % n_data != 0:
        raise ValueError(f"height {height} not divisible by data axis {n_data}")
    h_loc = height // n_data

    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P("data"),
             check_vma=False)
    def run(scene_rep, camera_rep):
        idx = jax.lax.axis_index("data")
        img = integrator_jax.render_megasample(
            scene_rep, camera_rep, width, h_loc, sample_ids,
            row_offset=idx * h_loc, full_height=height, **kw)
        return img

    return jax.jit(run)(scene, camera)


def render_sample_sharded(scene: SceneData, camera, width: int, height: int,
                          samples_per_device: int, mesh: Mesh,
                          start_sample: int = 0, **kw):
    """spp split across ``data``; one psum combines the partial sums."""
    n_data = mesh.shape["data"]

    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
             check_vma=False)
    def run(scene_rep, camera_rep):
        idx = jax.lax.axis_index("data")
        ids = start_sample + idx * samples_per_device \
            + jnp.arange(samples_per_device)
        img = integrator_jax.render_megasample(
            scene_rep, camera_rep, width, height, ids, **kw)
        return jax.lax.psum(img, "data")

    return jax.jit(run)(scene, camera)


# ---------------------------------------------------------------------------
# Primitive sharding (config 5).
# ---------------------------------------------------------------------------


def shard_scene_prims(scene: SceneData, n_shards: int) -> SceneData:
    """Pad the primitive arrays so capacity divides n_shards (host-side)."""
    cap = scene.capacity
    new_cap = -(-cap // n_shards) * n_shards
    if new_cap == cap:
        return scene
    pad = new_cap - cap

    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    return dataclasses.replace(
        scene, centers=pad0(scene.centers), radii=pad0(scene.radii),
        mat_id=pad0(scene.mat_id), prim_valid=pad0(scene.prim_valid))


def _local_nearest(scene_shard, o, d, tmax=jnp.inf):
    return intersect.intersect_spheres(
        o, d, scene_shard.centers, scene_shard.radii, scene_shard.prim_valid,
        tmax=tmax)


def render_prim_sharded(scene: SceneData, camera, width: int, height: int,
                        sample_ids, mesh: Mesh, **kw):
    """Scene primitives sharded over ``prim``; rays replicated on that axis.

    Per bounce: local nearest-hit, global min-t via ``pmin``, winner id via a
    second ``pmin`` on (id where local-t equals global-t).  Material/geometry
    attributes are gathered *locally* on the winning device and broadcast
    with a one-hot ``psum`` — constant traffic per ray per bounce regardless
    of scene size.
    """
    n_prim = mesh.shape["prim"]
    scene_p = shard_scene_prims(scene, n_prim)
    shard_cap = scene_p.capacity // n_prim
    big = jnp.int32(2 ** 30)

    scene_specs = dataclasses.replace(
        scene_p,
        centers=P("prim"), radii=P("prim"), mat_id=P("prim"),
        prim_valid=P("prim"),
        materials=jax.tree.map(lambda _: P(), scene_p.materials),
        light_idx=P(), light_valid=P(), sky_params=P(), bvh=None)
    in_specs = (
        jax.tree.map(lambda x: x if isinstance(x, P) else P(), scene_specs,
                     is_leaf=lambda x: isinstance(x, P)),
        P(),
    )

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
             check_vma=False)
    def run(scene_shard, camera_rep):
        my_prim = jax.lax.axis_index("prim")
        data_idx = jax.lax.axis_index("data")
        n_data = jax.lax.axis_size("data")

        def sharded_intersect(o, d):
            t_loc, id_loc = _local_nearest(scene_shard, o, d)
            t_min = jax.lax.pmin(t_loc, "prim")
            gid_loc = jnp.where(
                (t_loc <= t_min) & (id_loc >= 0),
                id_loc + my_prim * shard_cap, big)
            gid = jax.lax.pmin(gid_loc, "prim")
            hit = jnp.isfinite(t_min) & (gid < big)
            gid = jnp.where(hit, gid, -1)
            return jnp.where(hit, t_min, jnp.inf), gid

        def sharded_occluded(o, d, tmax):
            blocked = intersect.occluded(
                o, d, scene_shard.centers, scene_shard.radii,
                scene_shard.prim_valid, tmax)
            return jax.lax.pmax(blocked.astype(jnp.int32), "prim") > 0

        def gather_prim(ids):
            """Attribute fetch by *global* prim id: each device contributes
            the rows it owns, a one-hot psum broadcasts the winner — scene
            geometry is never replicated, traffic is O(rays) per bounce
            regardless of scene size (the ring-pass of config 5)."""
            local = ids - my_prim * shard_cap
            mine = (local >= 0) & (local < shard_cap)
            lidx = jnp.clip(local, 0, shard_cap - 1)
            c = jnp.where(mine[:, None], scene_shard.centers[lidx], 0.0)
            r = jnp.where(mine, scene_shard.radii[lidx], 0.0)
            m = jnp.where(mine, scene_shard.mat_id[lidx], 0)
            return (jax.lax.psum(c, "prim"), jax.lax.psum(r, "prim"),
                    jax.lax.psum(m, "prim"))

        # Rows additionally sharded over 'data'.
        h_loc = height // n_data
        img = integrator_jax.render_megasample(
            scene_shard, camera_rep, width, h_loc, sample_ids,
            row_offset=data_idx * h_loc, full_height=height,
            intersect_fn=sharded_intersect, occluded_fn=sharded_occluded,
            gather_prim_fn=gather_prim, gather_light_fn=gather_prim,
            **kw)
        return img

    if height % mesh.shape["data"] != 0:
        raise ValueError("height must divide the data axis")
    return jax.jit(run)(scene_p, camera)


# ---------------------------------------------------------------------------
# Data-parallel gradient step for inverse rendering.
# ---------------------------------------------------------------------------


def make_dp_grad_step(loss_fn, mesh: Mesh, samples_per_device: int):
    """Returns step(params, step_idx) -> (loss, grads), sample-sharded.

    Each device evaluates the loss on its own sample ids; loss and scene-
    parameter gradients are psum-averaged over the ``data`` axis — the
    gradient all-reduce that XLA schedules against the backward pass.
    """
    n_data = mesh.shape["data"]

    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
             check_vma=False)
    def step(params, step_idx):
        idx = jax.lax.axis_index("data")
        base = step_idx * n_data * samples_per_device \
            + idx * samples_per_device
        ids = base + jnp.arange(samples_per_device)
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        loss = jax.lax.pmean(loss, "data")
        grads = jax.lax.pmean(grads, "data")
        return loss, grads

    # jit is required: remat'd scans inside shard_map can't be evaluated
    # eagerly, and jit(shard_map) is the intended usage anyway.
    return jax.jit(step)
