"""Ray-primitive intersection, fully vectorized over lanes (rays x triangles).

Reference semantics:
* ray-triangle — plane-equation solve for t + three edge-cross-product sign
  agreements, no backface cull, no t-range check (``intersect(Ray&, Face&, ...)``,
  ``MTPC/sceneManagement.cpp:316-338``).  ``compat=True`` reproduces exactly
  that accept test; ``compat=False`` is watertight-ish Moller-Trumbore.
* ray-AABB — classic slab test with swap + early outs
  (``MTPC/sceneManagement.cpp:340-391``).  Implemented here with sign-selected
  near/far planes, which is algebraically the same accept set for non-empty
  boxes and additionally rejects the inverted (min=+BIG, max=-BIG) empty boxes
  used for LBVH padding.  A ``t_max`` argument allows best-hit pruning, which
  never changes the nearest hit (the reference prunes nothing).
* barycentrics — the cross-product formula of ``findGarCor``
  (``MTPC/pathTracing.cpp:394-432``).

Every function broadcasts: ray fields (...,3), triangle fields (...,3).
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def ray_aabb(origin, inv_dir, box_min, box_max, t_max=None):
    """Slab test. origin/inv_dir (...,3); box_min/box_max (...,3). Returns bool.

    Accept set equals the reference's test (MTPC/sceneManagement.cpp:367-390):
    reject if exit < 0, accept iff enter <= exit with enter clamped at 0
    implicitly by the exit>=0 + enter<=exit pair.
    """
    neg = inv_dir < 0
    near = jnp.where(neg, box_max, box_min)
    far = jnp.where(neg, box_min, box_max)
    t_near = (near - origin) * inv_dir
    t_far = (far - origin) * inv_dir
    enter = jnp.max(t_near, axis=-1)
    exit_ = jnp.min(t_far, axis=-1)
    hit = (enter <= exit_) & (exit_ >= 0)
    if t_max is not None:
        hit &= enter <= t_max
    return hit


def ray_triangle_compat(origin, direction, p0, p1, p2, geom_n):
    """Reference plane + sign-product test. Returns (hit, t, bary (...,3)).

    t is computed directly from the plane equation rather than the reference's
    ``(p.x - o.x)/d.x`` reconstruction (quirk #10, MTPC/pathTracing.cpp:347) —
    identical except when d.x == 0, where the reference produces NaN/Inf.
    """
    denom = _dot(geom_n, direction)
    t = _dot(p0 - origin, geom_n) / denom  # inf/nan when parallel -> rejected below
    p = origin + direction * t[..., None]
    c1 = _dot(jnp.cross(p1 - p0, p - p0), geom_n)
    c2 = _dot(jnp.cross(p2 - p1, p - p1), geom_n)
    c3 = _dot(jnp.cross(p0 - p2, p - p2), geom_n)
    hit = (c1 * c2 >= 0) & (c1 * c3 >= 0) & (c2 * c3 >= 0)
    hit &= jnp.isfinite(t)
    return hit, t, barycentric(p, p0, p1, p2)


def ray_triangle_mt(origin, direction, p0, p1, p2, geom_n=None):
    """Moller-Trumbore, no backface cull (matching the reference's no-cull
    behavior). Returns (hit, t, bary (...,3))."""
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(direction, e2)
    det = _dot(e1, pvec)
    inv_det = 1.0 / det  # inf for degenerate; rejected by isfinite below
    tvec = origin - p0
    u = _dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = _dot(direction, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    hit = (u >= 0) & (v >= 0) & (u + v <= 1) & jnp.isfinite(t)
    bary = jnp.stack([1.0 - u - v, u, v], axis=-1)
    return hit, t, bary


def barycentric(p, p0, p1, p2):
    """findGarCor's cross formula (MTPC/pathTracing.cpp:416-428); weights for
    (p0, p1, p2)."""
    e1 = p2 - p1
    e2 = p0 - p2
    e3 = p1 - p0
    d1 = p - p0
    d2 = p - p1
    d3 = p - p2
    n = jnp.cross(e1, e2)
    an = _dot(n, n)
    b0 = _dot(jnp.cross(e1, d3), n) / an
    b1 = _dot(jnp.cross(e2, d1), n) / an
    b2 = _dot(jnp.cross(e3, d2), n) / an
    return jnp.stack([b0, b1, b2], axis=-1)


def ray_triangle(origin, direction, p0, p1, p2, geom_n, compat: bool):
    if compat:
        return ray_triangle_compat(origin, direction, p0, p1, p2, geom_n)
    return ray_triangle_mt(origin, direction, p0, p1, p2, geom_n)
