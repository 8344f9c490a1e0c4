"""Cluster intersector (kernels/cluster.py) vs the brute-force oracle.

Runs the Pallas kernels in interpreter mode on the CPU test mesh; the same
code path compiles on TPU (validated by bench.py / the driver's entry check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopathtracing_tpu.accel.lbvh import brute_force_intersect
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.kernels.cluster import (
    build_cluster_accel,
    cluster_intersect,
)
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box


@pytest.fixture(scope="module")
def box_scene():
    scene, _ = load_builtin_box(width=16, height=16, with_specular=True)
    return scene


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 1.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_matches_brute_force(box_scene):
    accel = build_cluster_accel(box_scene, width=4)
    o, d = _random_rays(128)
    hb, tb, ib = brute_force_intersect(box_scene, o, d)
    hc, tc, ic = cluster_intersect(accel, o, d, tile=16, mega=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hc))
    ok = np.asarray(hb)
    np.testing.assert_allclose(
        np.asarray(tb)[ok], np.asarray(tc)[ok], rtol=1e-4, atol=1e-5
    )
    # Tri ids may differ only where two triangles tie at identical t.
    same = np.asarray(ib)[ok] == np.asarray(ic)[ok]
    assert same.mean() > 0.99


def test_ragged_ray_count_padding(box_scene):
    accel = build_cluster_accel(box_scene, width=4)
    o, d = _random_rays(53, seed=3)  # not a multiple of tile*mega
    hb, tb, ib = brute_force_intersect(box_scene, o, d)
    hc, tc, ic = cluster_intersect(accel, o, d, tile=16, mega=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hc))
    ok = np.asarray(hb)
    np.testing.assert_allclose(
        np.asarray(tb)[ok], np.asarray(tc)[ok], rtol=1e-4, atol=1e-5
    )


def test_all_miss_rays(box_scene):
    accel = build_cluster_accel(box_scene, width=4)
    o = jnp.full((32, 3), 50.0)
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (32, 1))
    hc, tc, ic = cluster_intersect(accel, o, d, tile=16, mega=2, interpret=True)
    assert not bool(jnp.any(hc))
    assert bool(jnp.all(ic == -1))


def test_render_equal_with_cluster_intersector(box_scene):
    """Full render: cluster kernel (interpret) == packet-BVH path, and ray
    sorting is bitwise invisible."""
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
    from montecarlopathtracing_tpu.integrator.wavefront import render_pixels

    bvh = build_lbvh(box_scene)
    ids = jnp.arange(box_scene.camera.width * box_scene.camera.height,
                     dtype=jnp.int32)
    base = RenderOptions(spp=2, max_depth=4, cluster_width=4, cluster_rays=16)
    ref, _ = render_pixels(box_scene, bvh, base.replace(intersector="bvh"), ids)
    got, _ = render_pixels(
        box_scene, bvh,
        base.replace(intersector="cluster_interpret", sort_rays=True), ids,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_mt_variant_matches_brute_force(box_scene):
    """Modern mode's Moller-Trumbore kernel variant (the _M_* constant layout)
    vs the brute-force MT oracle (ops.intersect.ray_triangle_mt)."""
    accel = build_cluster_accel(box_scene, width=4, mt=True)
    o, d = _random_rays(256, seed=7)
    hb, tb, ib = brute_force_intersect(box_scene, o, d, compat=False)
    hc, tc, ic = cluster_intersect(accel, o, d, tile=16, mega=2,
                                   interpret=True, mt=True)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hc))
    ok = np.asarray(hb)
    np.testing.assert_allclose(
        np.asarray(tb)[ok], np.asarray(tc)[ok], rtol=1e-4, atol=1e-5
    )
    same = np.asarray(ib)[ok] == np.asarray(ic)[ok]
    assert same.mean() > 0.99


def test_modern_render_uses_mt_cluster(box_scene):
    """A MODERN-mode render through the explicit cluster path equals the
    packet-BVH MT path (the ADVICE round-1 finding: the cluster kernel used
    to silently apply the compat plane+sign test in modern mode)."""
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
    from montecarlopathtracing_tpu.config import MODERN
    from montecarlopathtracing_tpu.integrator.wavefront import render_pixels

    bvh = build_lbvh(box_scene)
    ids = jnp.arange(box_scene.camera.width * box_scene.camera.height,
                     dtype=jnp.int32)
    base = RenderOptions(spp=2, max_depth=4, cluster_width=4, cluster_rays=16,
                         compat=MODERN)
    ref, _ = render_pixels(box_scene, bvh, base.replace(intersector="bvh"), ids)
    got, _ = render_pixels(
        box_scene, bvh,
        base.replace(intersector="cluster_interpret", sort_rays=True), ids,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_explicit_cluster_fallback_warns():
    """Past the chunk cap the default policy now resolves to the
    HBM-streaming cluster path (no fallback, no warning); the packet-walk
    substitution + warning survives only under large_mode='chunked'
    (pre-round-5 behavior, kept as an escape hatch)."""
    import warnings

    from montecarlopathtracing_tpu.integrator.wavefront import resolve_plan

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        kind, w, _, n = resolve_plan(
            RenderOptions(intersector="cluster"), num_tris=1 << 24)
    assert kind == "cluster_hbm" and w == 128 and n == 1
    assert not rec
    opts = RenderOptions(intersector="cluster", large_mode="chunked")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        kind, _, _, _ = resolve_plan(opts, num_tris=1 << 24)
    assert kind == "bvh"
    assert any("falling back" in str(w.message) for w in rec)
    # 'auto' stays silent
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        resolve_plan(RenderOptions(intersector="auto"), num_tris=1 << 22)
    assert not rec


def test_chunked_cluster_matches_brute_force(box_scene):
    """Large-scene path: per-chunk tables merged lexicographically must equal
    the single-table result and brute force (chunk boundaries are arbitrary
    width multiples, forced to 3 chunks here)."""
    from montecarlopathtracing_tpu.kernels.cluster import (
        build_cluster_accel_chunked, cluster_intersect_chunked)

    accels, offs = build_cluster_accel_chunked(box_scene, width=4, n_chunks=3)
    assert accels.num_chunks >= 2
    o, d = _random_rays(256, seed=11)
    hb, tb, ib = brute_force_intersect(box_scene, o, d)
    hc, tc, ic = cluster_intersect_chunked(accels, offs, o, d, tile=16,
                                           mega=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hc))
    ok = np.asarray(hb)
    np.testing.assert_allclose(np.asarray(tb)[ok], np.asarray(tc)[ok],
                               rtol=1e-4, atol=1e-5)
    same = np.asarray(ib)[ok] == np.asarray(ic)[ok]
    assert same.mean() > 0.99


def test_plan_selects_chunked_for_large_scenes():
    from montecarlopathtracing_tpu.integrator.wavefront import resolve_plan

    kind, width, group, n_chunks = resolve_plan(
        RenderOptions(intersector="cluster"), num_tris=1 << 19)  # 512k tris
    assert kind == "cluster" and width == 128 and n_chunks > 1


def test_hbm_cluster_matches_brute_force(box_scene):
    """HBM-streaming path (large-scene fallback past the chunk cap): the
    double-buffered per-supergroup DMA kernel must equal brute force, compat
    AND Moller-Trumbore variants (kernels/cluster.py::cluster_intersect_hbm)."""
    from montecarlopathtracing_tpu.kernels.cluster import (
        build_cluster_accel, cluster_intersect_hbm)

    o, d = _random_rays(256, seed=13)
    hb, tb, ib = brute_force_intersect(box_scene, o, d)
    accel = build_cluster_accel(box_scene, width=4)
    hh, th, ih = cluster_intersect_hbm(accel, o, d, tile=16, mega=2,
                                       sgroup=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hh))
    ok = np.asarray(hb)
    np.testing.assert_allclose(np.asarray(tb)[ok], np.asarray(th)[ok],
                               rtol=1e-4, atol=1e-5)
    hb2, tb2, _ = brute_force_intersect(box_scene, o, d, compat=False)
    accel_mt = build_cluster_accel(box_scene, width=4, mt=True)
    hh2, th2, _ = cluster_intersect_hbm(accel_mt, o, d, tile=16, mega=2,
                                        sgroup=2, interpret=True, mt=True)
    np.testing.assert_array_equal(np.asarray(hb2), np.asarray(hh2))
    np.testing.assert_allclose(np.asarray(tb2)[np.asarray(hb2)],
                               np.asarray(th2)[np.asarray(hb2)],
                               rtol=1e-4, atol=1e-5)
