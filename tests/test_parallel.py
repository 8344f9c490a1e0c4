"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4.4):
sharded renders must match single-device renders; the full SPMD training step
must run and agree with the single-device gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.diff.gradients import (
    SceneParams, make_distributed_train_step, train_step,
)
from montecarlopathtracing_tpu.parallel.mesh import (
    _padded_ids, make_mesh, render_image_sharded_jit,
)
from jax.sharding import NamedSharding, PartitionSpec as P

OPTS = RenderOptions(spp=8, max_depth=4, chunk_size=256)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_tile_sharded_render_matches_single(box_scene, box_bvh):
    scene, _ = box_scene
    single = np.asarray(m.render_image(scene, box_bvh, OPTS))
    mesh = make_mesh(tile=8, spp=1)
    sharded = np.asarray(render_image_sharded_jit(scene, box_bvh, OPTS, mesh))
    assert np.allclose(single, sharded, rtol=1e-5, atol=1e-6)


@needs_8
def test_spp_sharded_render_matches_single(box_scene, box_bvh):
    """Sample-axis sharding averages the exact same sample set; only the
    float reduction order differs."""
    scene, _ = box_scene
    single = np.asarray(m.render_image(scene, box_bvh, OPTS))
    mesh = make_mesh(tile=2, spp=4)
    sharded = np.asarray(render_image_sharded_jit(scene, box_bvh, OPTS, mesh))
    assert np.allclose(single, sharded, rtol=1e-4, atol=1e-5)


@needs_8
@pytest.mark.slow
def test_distributed_train_step_matches_single_device(box_scene, box_bvh):
    scene, _ = box_scene
    opts = RenderOptions(spp=4, max_depth=3, chunk_size=256)
    params = SceneParams.from_scene(scene)
    n = 32 * 32

    mesh = make_mesh(tile=4, spp=2)
    ids, per = _padded_ids(n, 4)
    target_full = jnp.zeros((32, 32, 3), jnp.float32)
    target_tiles = target_full.reshape(n, 3)[np.minimum(np.arange(4 * per), n - 1)]
    target_tiles = target_tiles.reshape(4, per, 3)

    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("tile", None)))
    tgt_sh = jax.device_put(target_tiles, NamedSharding(mesh, P("tile", None)))

    step = make_distributed_train_step(scene, box_bvh, opts, mesh, lr=0.05)
    p_dist, loss_dist = step(params, tgt_sh, ids_sh)

    p_single, loss_single = train_step(params, scene, box_bvh, opts,
                                       target_full, lr=0.05)
    # Padding duplicates a handful of lanes of the last pixel, so the two
    # losses/gradients agree only approximately; with per==n/4 they are equal.
    assert per * 4 == n
    assert np.isclose(float(loss_dist), float(loss_single), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_dist.kd), np.asarray(p_single.kd),
                               rtol=1e-3, atol=1e-6)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(img)).all()


@needs_8
def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
