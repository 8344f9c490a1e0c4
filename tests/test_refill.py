"""Persistent-wavefront refill renderer vs the scan renderer.

Comparison uses modern mode (jittered primaries): in compat mode every SPP
sample shoots the identical lattice-corner ray (quirk #1), so many rays hit
triangle edges *exactly*, where hit classification legitimately depends on
FP contraction choices that differ between compilation contexts — a property
of the reference's degenerate sampling, not of either renderer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import MODERN, RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_pixels
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box


@pytest.fixture(scope="module")
def setup():
    scene, _ = load_builtin_box(width=32, height=32, with_specular=True)
    return scene, build_lbvh(scene)


def test_refill_matches_scan(setup):
    scene, bvh = setup
    ids = jnp.arange(1024, dtype=jnp.int32)
    base = RenderOptions(spp=4, max_depth=8, intersector="bvh", compat=MODERN)
    r_scan, n_scan = render_pixels(scene, bvh, base.replace(refill=False), ids)
    r_refill, n_refill = render_pixels(
        scene, bvh, base.replace(refill=True, sort_rays=True), ids
    )
    assert float(n_scan) == float(n_refill)  # identical paths traced
    np.testing.assert_allclose(np.asarray(r_scan), np.asarray(r_refill),
                               rtol=1e-4, atol=1e-5)


def test_refill_sample_offset(setup):
    """The distributed spp-sharding contract: shard k's samples [k*c, (k+1)*c)
    must be the same sample set under both renderers."""
    scene, bvh = setup
    ids = jnp.arange(1024, dtype=jnp.int32)
    base = RenderOptions(spp=2, max_depth=6, intersector="bvh", compat=MODERN)
    r_scan, _ = render_pixels(scene, bvh, base.replace(refill=False), ids,
                              sample_offset=3)
    r_refill, _ = render_pixels(scene, bvh, base.replace(refill=True), ids,
                                sample_offset=3)
    np.testing.assert_allclose(np.asarray(r_scan), np.asarray(r_refill),
                               rtol=1e-4, atol=1e-5)


def test_refill_ragged_spp(setup):
    """spp=3 (queue not a multiple of anything) still averages correctly."""
    scene, bvh = setup
    ids = jnp.arange(256, dtype=jnp.int32)
    base = RenderOptions(spp=3, max_depth=4, intersector="bvh", compat=MODERN)
    r_scan, _ = render_pixels(scene, bvh, base.replace(refill=False), ids)
    r_refill, _ = render_pixels(scene, bvh, base.replace(refill=True), ids)
    np.testing.assert_allclose(np.asarray(r_scan), np.asarray(r_refill),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("h,w,packet", [
    (32, 32, 64),      # pow2 everywhere
    (720, 1280, 64),   # bedroom aspect: ntx=160 (non-pow2 divide path)
    (33, 47, 64),      # ragged edge tiles
    (900, 1200, 64),   # veach aspect
])
def test_swizzle_pixel_fn_matches_table(h, w, packet):
    """The arithmetic slot->pixel map (shift/mask or exact reciprocal-
    multiply divide) must equal the host table for every slot, including
    clamped edge-tile and non-pow2-tile-count shapes."""
    from montecarlopathtracing_tpu.integrator.wavefront import (
        _swizzle_pixel_fn, _tile_swizzled_ids)

    table = _tile_swizzled_ids(h, w, packet)
    fn = _swizzle_pixel_fn(h, w, packet)
    got = np.asarray(fn(jnp.arange(table.shape[0], dtype=jnp.int32)))
    np.testing.assert_array_equal(got, table)


def test_multilight_sorted_matches_unsorted():
    """>= 2 lights takes the post-sort NEE-prep path (wavefront.py
    ``post_nee``): the per-light products are recomputed AFTER the wavefront
    permutation from RNG streams re-derived off the sorted keys.  The
    estimator is identical (same paths, same uniforms); only fusion-level FP
    contraction differs, so agreement is ULP-tight but not bitwise
    (measured max rel diff 1.4e-7 on this config)."""
    import montecarlopathtracing_tpu as m

    scene, _ = m.load_scene("/root/reference/scene", "veach-mis")
    bvh = build_lbvh(scene)
    ids = jnp.arange(256, dtype=jnp.int32) + 1200 * 520  # mid-frame rows
    base = RenderOptions(spp=2, max_depth=4, chunk_size=256, compat=MODERN)
    assert scene.num_lights >= 2
    r_u, n_u = render_pixels(scene, bvh, base.replace(sort_rays=False), ids)
    r_s, n_s = render_pixels(scene, bvh, base.replace(sort_rays=True), ids)
    assert float(n_u) == float(n_s)  # identical paths traced
    np.testing.assert_allclose(np.asarray(r_u), np.asarray(r_s),
                               rtol=1e-5, atol=1e-6)
