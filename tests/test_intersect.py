"""Ray-triangle / ray-AABB unit tests vs brute-force geometry (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from montecarlopathtracing_tpu.ops.intersect import (
    barycentric, ray_aabb, ray_triangle_compat, ray_triangle_mt,
)


def _rand_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.normal(size=(n, 3)).astype(np.float32)
    p1 = p0 + rng.normal(size=(n, 3)).astype(np.float32)
    p2 = p0 + rng.normal(size=(n, 3)).astype(np.float32)
    gn = np.cross(p0 - p1, p2 - p0)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
    return p0, p1, p2, gn


def test_triangle_hit_through_centroid():
    p0, p1, p2, gn = _rand_tris(200)
    centroid = (p0 + p1 + p2) / 3
    o = centroid + gn * 2.0
    d = -gn
    for fn in (ray_triangle_compat, ray_triangle_mt):
        hit, t, bary = fn(jnp.asarray(o), jnp.asarray(d), p0, p1, p2, gn)
        assert bool(np.all(np.asarray(hit)))
        assert np.allclose(np.asarray(t), 2.0, atol=1e-3)
        assert np.allclose(np.asarray(bary), 1 / 3, atol=1e-3)


def test_triangle_miss_outside():
    p0, p1, p2, gn = _rand_tris(200, seed=1)
    # aim at a point well outside: centroid + 10x one edge
    target = p0 + (p1 - p0) * 10.0
    o = target + gn * 2.0
    d = -gn
    for fn in (ray_triangle_compat, ray_triangle_mt):
        hit, _, _ = fn(jnp.asarray(o), jnp.asarray(d), p0, p1, p2, gn)
        assert not np.any(np.asarray(hit))


def test_compat_and_mt_agree_on_random_rays():
    p0, p1, p2, gn = _rand_tris(500, seed=2)
    rng = np.random.default_rng(3)
    o = rng.normal(size=(500, 3)).astype(np.float32) * 3
    d = rng.normal(size=(500, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h1, t1, b1 = ray_triangle_compat(o, d, p0, p1, p2, gn)
    h2, t2, b2 = ray_triangle_mt(o, d, p0, p1, p2, gn)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    # accept sets agree except possibly exactly-on-edge cases
    assert (h1 == h2).mean() > 0.995
    both = h1 & h2
    assert np.allclose(np.asarray(t1)[both], np.asarray(t2)[both], rtol=1e-3, atol=1e-4)


def test_barycentric_roundtrip():
    p0, p1, p2, _ = _rand_tris(300, seed=4)
    rng = np.random.default_rng(5)
    w = rng.dirichlet((1, 1, 1), 300).astype(np.float32)
    p = p0 * w[:, :1] + p1 * w[:, 1:2] + p2 * w[:, 2:3]
    got = np.asarray(barycentric(p, p0, p1, p2))
    assert np.allclose(got, w, atol=2e-3)


def test_aabb_basic():
    o = np.array([[0, 0, -5.0], [0, 0, -5.0], [0, 0, 0.0], [5, 5, 5.0]], np.float32)
    d = np.array([[0, 0, 1.0], [0, 1, 0.0], [1, 0, 0.0], [1, 0, 0.0]], np.float32)
    bmin = np.full((4, 3), -1.0, np.float32)
    bmax = np.full((4, 3), 1.0, np.float32)
    hit = np.asarray(ray_aabb(o, 1.0 / d, bmin, bmax))
    # ray0 enters; ray1 points away from the box laterally; ray2 starts inside;
    # ray3 points away
    assert list(hit) == [True, False, True, False]


def test_aabb_rejects_empty_box():
    """Inverted (min=+BIG, max=-BIG) padding boxes must never be hit, for any
    direction sign combination."""
    rng = np.random.default_rng(6)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = rng.normal(size=(128, 3)).astype(np.float32)
    bmin = np.full((128, 3), 1e30, np.float32)
    bmax = np.full((128, 3), -1e30, np.float32)
    assert not np.any(np.asarray(ray_aabb(o, 1.0 / d, bmin, bmax)))


def test_aabb_matches_reference_accept_set():
    """Randomized equivalence with the reference's swap-based slab test
    (MTPC/sceneManagement.cpp:367-390), transcribed as the oracle."""
    rng = np.random.default_rng(7)
    n = 2000
    o = rng.uniform(-3, 3, (n, 3))
    d = rng.normal(size=(n, 3))
    lo = rng.uniform(-2, 0, (n, 3))
    hi = lo + rng.uniform(0.1, 2, (n, 3))

    t0 = (lo - o) / d
    t1 = (hi - o) / d
    tmin = np.minimum(t0, t1)
    tmax = np.maximum(t0, t1)
    want = ~(tmax < 0).any(1) & ((tmin <= 0).all(1) | (tmin.max(1) <= tmax.min(1)))
    got = np.asarray(ray_aabb(o.astype(np.float32), (1.0 / d).astype(np.float32),
                              lo.astype(np.float32), hi.astype(np.float32)))
    assert (got == want).mean() > 0.999
