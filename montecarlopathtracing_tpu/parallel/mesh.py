"""Device-mesh sharding for rendering: the framework's parallelism story.

The reference's ONLY parallelism is an OpenMP ``parallel for`` over the SPP
samples of one pixel on <= 8 shared-memory threads with a mutex-guarded
accumulate (``MTPC/pathTracing.cpp:300-319``).  The TPU-native equivalent
(SURVEY.md §2.11/§5.8) is SPMD over a ``jax.sharding.Mesh`` with two axes:

* ``tile``  — data parallelism over pixels: the film is tiled across chips;
* ``spp``  — the sample axis (the renderer's counterpart of sequence/context
  parallelism): each chip renders the full tile at spp/n samples and the film
  is ``psum``-reduced over ICI.

Scene + BVH arrays are replicated per chip (they are small relative to HBM);
the per-lane RNG is keyed by absolute (pixel, sample) indices so any mesh
shape averages exactly the same sample set — a 1-chip and an N-chip render
agree to float-reduction order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..accel.lbvh import BVHArrays
from ..config import RenderOptions
from ..integrator.wavefront import render_pixels
from ..scene.types import SceneArrays


def make_mesh(tile: Optional[int] = None, spp: int = 1, devices=None) -> Mesh:
    """2D mesh (tile, spp). Default: all devices on the tile axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tile is None:
        tile = n // spp
    assert tile * spp == n, f"mesh {tile}x{spp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(tile, spp), ("tile", "spp"))


def _padded_ids(n_pixels: int, n_tiles: int, lanes_multiple: int = 8):
    per = -(-n_pixels // n_tiles)
    per = -(-per // lanes_multiple) * lanes_multiple
    ids = np.minimum(np.arange(n_tiles * per, dtype=np.int32), n_pixels - 1)
    return ids.reshape(n_tiles, per), per


def render_image_sharded(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    mesh: Mesh,
    differentiable: bool = False,
):
    """Distributed full-frame render -> (H,W,3) f32, replicated on all chips.

    opts.spp is split evenly over the mesh's spp axis (must divide).
    """
    h, w = scene.camera.height, scene.camera.width
    n = h * w
    n_tiles = mesh.shape["tile"]
    n_spp_shards = mesh.shape["spp"]
    assert opts.spp % n_spp_shards == 0, "spp must divide the spp mesh axis"
    spp_local = opts.spp // n_spp_shards
    local_opts = opts.replace(spp=spp_local)

    ids, per = _padded_ids(n, n_tiles)
    ids = jax.device_put(ids, NamedSharding(mesh, P("tile", None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,  # RNG keys/sample offsets vary per shard by design
        in_specs=(P(), P(), P("tile", None)),
        out_specs=P("tile", None),
    )
    def worker(scene, bvh, ids_tile):
        spp_idx = jax.lax.axis_index("spp")
        radiance, _ = render_pixels(
            scene, bvh, local_opts, ids_tile[0],
            differentiable=differentiable,
            sample_offset=spp_idx * spp_local,
        )
        # Average the sample shards over ICI (the film/SPP psum of SURVEY §5.8).
        radiance = jax.lax.pmean(radiance, "spp")
        return radiance[None]

    out = worker(scene, bvh, ids)  # (n_tiles, per, 3) tile-sharded
    return out.reshape(n_tiles * per, 3)[:n].reshape(h, w, 3)


@functools.lru_cache(maxsize=32)
def _sharded_render_fn(opts: RenderOptions, mesh: Mesh, differentiable: bool):
    return jax.jit(
        lambda s, b: render_image_sharded(s, b, opts, mesh, differentiable)
    )


def render_image_sharded_jit(scene, bvh, opts: RenderOptions, mesh: Mesh,
                             differentiable: bool = False):
    """Jitted distributed render; the executable is cached per (opts, mesh)
    so repeat calls don't retrace."""
    return _sharded_render_fn(opts, mesh, differentiable)(scene, bvh)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    The same mesh/shard_map code then spans all hosts: collectives ride ICI
    within a slice and DCN across hosts transparently (SURVEY.md §5.8).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
