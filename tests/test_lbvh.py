"""LBVH invariants + traversal equivalence vs brute force (SURVEY.md §4.1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from montecarlopathtracing_tpu.accel.lbvh import (
    BIG, brute_force_intersect, build_lbvh, build_lbvh_host, bvh_intersect,
    _advance,
)
from tests.conftest import random_rays


def test_heap_shape(box_scene, box_bvh):
    scene, _ = box_scene
    lc = scene.num_tris_padded
    assert box_bvh.node_min.shape == (2 * lc, 3)
    assert box_bvh.num_leaves == lc


def test_parent_contains_children(box_scene, box_bvh):
    scene, _ = box_scene
    nmin = np.asarray(box_bvh.node_min)
    nmax = np.asarray(box_bvh.node_max)
    lc = box_bvh.num_leaves
    for k in range(1, lc):
        for child in (2 * k, 2 * k + 1):
            # empty children (min>max) are trivially contained
            if (nmin[child] > nmax[child]).any():
                continue
            assert np.all(nmin[k] <= nmin[child] + 1e-6)
            assert np.all(nmax[k] >= nmax[child] - 1e-6)


def test_leaves_bound_triangles(box_scene, box_bvh):
    scene, _ = box_scene
    lc = box_bvh.num_leaves
    nmin = np.asarray(box_bvh.node_min)[lc:]
    nmax = np.asarray(box_bvh.node_max)[lc:]
    valid = np.asarray(scene.tri_valid)
    for arr in (scene.v0, scene.v1, scene.v2):
        a = np.asarray(arr)
        assert np.all(a[valid] >= nmin[valid] - 1e-6)
        assert np.all(a[valid] <= nmax[valid] + 1e-6)
    # padding leaves are empty
    assert np.all(nmin[~valid] > nmax[~valid])


def test_host_build_matches_jit_build(box_scene, box_bvh):
    """build_lbvh_host (NumPy, no device compile) must be bit-identical to
    the jittable build — min/max unions are exact in f32."""
    scene, _ = box_scene
    host = build_lbvh_host(scene)
    assert np.array_equal(np.asarray(host.node_min), np.asarray(box_bvh.node_min))
    assert np.array_equal(np.asarray(host.node_max), np.asarray(box_bvh.node_max))


def test_advance_walks_preorder():
    """_advance must enumerate the preorder successor for every node of a
    depth-3 perfect tree (against a recursive reference walk)."""
    order = []
    def walk(k):
        order.append(k)
        if k < 8:
            walk(2 * k)
            walk(2 * k + 1)
    walk(1)
    # skipping a subtree at k: next is advance(k)
    got = np.asarray(_advance(jnp.arange(1, 16, dtype=jnp.int32)))
    for k in range(1, 16):
        # preorder successor of the subtree rooted at k
        idx = order.index(k)
        sub = set()
        def collect(j):
            sub.add(j)
            if j < 8:
                collect(2 * j)
                collect(2 * j + 1)
        collect(k)
        after = [n for n in order[idx:] if n not in sub]
        want = after[0] if after else 0
        assert got[k - 1] == want, (k, got[k - 1], want)


def test_traversal_matches_brute_force(box_scene, box_bvh):
    scene, _ = box_scene
    o, d = random_rays(512)
    hit_a, t_a, tri_a = jax.jit(lambda o, d: bvh_intersect(box_bvh, scene, o, d))(o, d)
    hit_b, t_b, tri_b = jax.jit(lambda o, d: brute_force_intersect(scene, o, d))(o, d)
    hit_a, hit_b = np.asarray(hit_a), np.asarray(hit_b)
    assert np.array_equal(hit_a, hit_b)
    assert np.allclose(np.asarray(t_a)[hit_a], np.asarray(t_b)[hit_b], rtol=1e-5)
    # tri ids can differ only on exact-tie hits (shared edges)
    same = np.asarray(tri_a) == np.asarray(tri_b)
    assert same[hit_a].mean() > 0.99


def test_traversal_matches_brute_force_cornell():
    import os
    import pytest

    if not os.path.isdir("/root/reference/scene"):
        pytest.skip("reference scenes not mounted")
    import montecarlopathtracing_tpu as m

    scene, _ = m.load_scene("/root/reference/scene", "cornell-box", use_native=False)
    bvh = jax.jit(build_lbvh)(scene)
    o, d = random_rays(256, seed=9, origin_box=((-2, 0.2, -2), (2, 1.8, 2)))
    hit_a, t_a, _ = jax.jit(lambda o, d: bvh_intersect(bvh, scene, o, d))(o, d)
    hit_b, t_b, _ = jax.jit(lambda o, d: brute_force_intersect(scene, o, d))(o, d)
    assert np.array_equal(np.asarray(hit_a), np.asarray(hit_b))
    ha = np.asarray(hit_a)
    assert np.allclose(np.asarray(t_a)[ha], np.asarray(t_b)[ha], rtol=1e-4)


def test_missing_rays_report_no_hit(box_scene, box_bvh):
    scene, _ = box_scene
    # rays starting far outside pointing away
    o = np.full((64, 3), 10.0, np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (64, 1))
    hit, t, tri = bvh_intersect(box_bvh, scene, o, d)
    assert not np.any(np.asarray(hit))
    assert np.all(np.asarray(tri) == -1)
