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


def render_prim_sharded_gather(scene: SceneData, camera, width: int,
                               height: int, sample_ids, mesh: Mesh, **kw):
    """Primitive sharding, ZeRO-style: persistent storage is sharded 1/N;
    each bounce ``all_gather``s the packed chunk once and intersects the
    full scene locally (the gathered copy is transient bounce workspace,
    like ZeRO-3 gathering a layer's weights per step).

    One collective per bounce (vs the ring's 2(N-1) ppermutes), at N x the
    comm volume — the right trade whenever one transient scene copy fits
    on-chip.  ``render_prim_sharded_ring`` is the streaming fallback for
    scenes where even one copy doesn't fit.
    """
    n_prim = mesh.shape["prim"]
    n_data = mesh.shape["data"]
    if height % n_data != 0:
        raise ValueError("height must divide the data axis")
    scene_p = shard_scene_prims(scene, n_prim)

    lc_all = scene.centers[scene.light_idx]
    lr_all = scene.radii[scene.light_idx]
    lmat_all = scene.mat_id[scene.light_idx]

    scene_specs = dataclasses.replace(
        scene_p,
        centers=P("prim"), radii=P("prim"), mat_id=P("prim"),
        prim_valid=P("prim"),
        materials=jax.tree.map(lambda _: P(), scene_p.materials),
        light_idx=P(), light_valid=P(), sky_params=P(), bvh=None)
    in_specs = (
        jax.tree.map(lambda x: x if isinstance(x, P) else P(), scene_specs,
                     is_leaf=lambda x: isinstance(x, P)),
        P(), P(), P(), P(),
    )

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
             check_vma=False)
    def run(scene_shard, camera_rep, lc_rep, lr_rep, lmat_rep):
        data_idx = jax.lax.axis_index("data")
        chunk = jnp.concatenate([
            scene_shard.centers,
            scene_shard.radii[:, None],
            scene_shard.mat_id.astype(jnp.float32)[:, None],
            scene_shard.prim_valid.astype(jnp.float32)[:, None]], axis=1)

        # One all_gather per render chunk -> transient full (P, 6) scene
        # table, reused by every bounce's intersect and occlusion (it is
        # loop-invariant).  Persistent storage stays 1/N per device.
        g = jax.lax.all_gather(chunk, "prim").reshape(-1, chunk.shape[1])
        c_full, r_full = g[:, 0:3], g[:, 3]
        mid_full, valid_full = g[:, 4].astype(jnp.int32), g[:, 5] > 0.5

        def gather_intersect(o, d):
            t, hid = intersect.intersect_spheres(o, d, c_full, r_full,
                                                 valid_full)
            lidx = jnp.maximum(hid, 0)
            return (jnp.where(hid >= 0, t, jnp.inf), hid,
                    c_full[lidx], r_full[lidx], mid_full[lidx])

        def gather_occluded(o, d, tmax):
            return intersect.occluded(o, d, c_full, r_full, valid_full,
                                      tmax)

        def light_attrs(l_slot):
            return lc_rep[l_slot], lr_rep[l_slot], lmat_rep[l_slot]

        h_loc = height // n_data
        return integrator_jax.render_megasample(
            scene_shard, camera_rep, width, h_loc, sample_ids,
            row_offset=data_idx * h_loc, full_height=height,
            intersect_attrs_fn=gather_intersect,
            occluded_fn=gather_occluded, light_attrs_fn=light_attrs, **kw)

    return jax.jit(run)(scene_p, camera, lc_all, lr_all, lmat_all)


def render_prim_sharded_ring(scene: SceneData, camera, width: int,
                             height: int, sample_ids, mesh: Mesh, **kw):
    """Primitive sharding via a ``ppermute`` ring — the config-5 pattern.

    The one-hot-psum variant (``render_prim_sharded``) moves O(rays) data
    through collectives *every bounce* (two pmins + attribute psums); this
    version rotates the *scene chunk* around the ``prim`` ring instead:
    each of N hops intersects the visiting chunk against the device's own
    rays, carrying the running (min-t, winner attributes) locally, and then
    ``lax.ppermute``s the (capacity/N, 6) chunk to the neighbor.  After N
    hops every ray has seen every primitive and holds its winner's
    attributes — zero reduction collectives, comm volume O(scene/N) per
    bounce (independent of ray count), and every transfer is a neighbor
    exchange that rides ICI at link speed.  This is the ring-attention-
    shaped schedule of rendering (SURVEY.md §2.4 SP/CP row).

    Occlusion (NEE shadow rays) runs the same ring in any-hit form.  Light
    attributes (a handful of spheres) are replicated up front, so NEE needs
    no gather at all.
    """
    n_prim = mesh.shape["prim"]
    n_data = mesh.shape["data"]
    if height % n_data != 0:
        raise ValueError("height must divide the data axis")
    scene_p = shard_scene_prims(scene, n_prim)
    shard_cap = scene_p.capacity // n_prim
    perm = [(i, (i + 1) % n_prim) for i in range(n_prim)]

    # Replicated light table (slot-indexed): tiny, gathered once on host.
    lc_all = scene.centers[scene.light_idx]
    lr_all = scene.radii[scene.light_idx]
    lmat_all = scene.mat_id[scene.light_idx]

    scene_specs = dataclasses.replace(
        scene_p,
        centers=P("prim"), radii=P("prim"), mat_id=P("prim"),
        prim_valid=P("prim"),
        materials=jax.tree.map(lambda _: P(), scene_p.materials),
        light_idx=P(), light_valid=P(), sky_params=P(), bvh=None)
    in_specs = (
        jax.tree.map(lambda x: x if isinstance(x, P) else P(), scene_specs,
                     is_leaf=lambda x: isinstance(x, P)),
        P(), P(), P(), P(),
    )

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
             check_vma=False)
    def run(scene_shard, camera_rep, lc_rep, lr_rep, lmat_rep):
        my_prim = jax.lax.axis_index("prim")
        data_idx = jax.lax.axis_index("data")

        # One packed chunk -> one ppermute per hop.
        chunk0 = jnp.concatenate([
            scene_shard.centers,
            scene_shard.radii[:, None],
            scene_shard.mat_id.astype(jnp.float32)[:, None],
            scene_shard.prim_valid.astype(jnp.float32)[:, None]], axis=1)

        def ring_intersect(o, d):
            n = o.shape[0]
            init = (chunk0,
                    jnp.full((n,), jnp.inf, jnp.float32),      # t_best
                    jnp.full((n,), -1, jnp.int32),             # global id
                    jnp.zeros((n, 3), jnp.float32),            # centers
                    jnp.zeros((n,), jnp.float32),              # radii
                    jnp.zeros((n,), jnp.int32))                # mat id

            def hop(h, carry):
                chunk, t_best, gid, cb, rb, mb = carry
                c = chunk[:, 0:3]
                r = chunk[:, 3]
                mid = chunk[:, 4].astype(jnp.int32)
                valid = chunk[:, 5] > 0.5
                t_loc, id_loc = intersect.intersect_spheres(o, d, c, r, valid)
                better = (id_loc >= 0) & (t_loc < t_best)
                src = (my_prim - h) % n_prim   # chunk's home device
                lidx = jnp.maximum(id_loc, 0)
                t_best = jnp.where(better, t_loc, t_best)
                gid = jnp.where(better, id_loc + src * shard_cap, gid)
                cb = jnp.where(better[:, None], c[lidx], cb)
                rb = jnp.where(better, r[lidx], rb)
                mb = jnp.where(better, mid[lidx], mb)
                chunk = jax.lax.ppermute(chunk, "prim", perm)
                return chunk, t_best, gid, cb, rb, mb

            _, t_best, gid, cb, rb, mb = jax.lax.fori_loop(
                0, n_prim, hop, init)
            t_out = jnp.where(gid >= 0, t_best, jnp.inf)
            return t_out, gid, cb, rb, mb

        def ring_occluded(o, d, tmax):
            def hop(h, carry):
                chunk, blocked = carry
                c = chunk[:, 0:3]
                r = chunk[:, 3]
                valid = chunk[:, 5] > 0.5
                blocked = blocked | intersect.occluded(o, d, c, r, valid,
                                                       tmax)
                chunk = jax.lax.ppermute(chunk, "prim", perm)
                return chunk, blocked

            _, blocked = jax.lax.fori_loop(
                0, n_prim, hop, (chunk0, jnp.zeros(o.shape[:1], bool)))
            return blocked

        def light_attrs(l_slot):
            return lc_rep[l_slot], lr_rep[l_slot], lmat_rep[l_slot]

        h_loc = height // n_data
        return integrator_jax.render_megasample(
            scene_shard, camera_rep, width, h_loc, sample_ids,
            row_offset=data_idx * h_loc, full_height=height,
            intersect_attrs_fn=ring_intersect, occluded_fn=ring_occluded,
            light_attrs_fn=light_attrs, **kw)

    return jax.jit(run)(scene_p, camera, lc_all, lr_all, lmat_all)


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
