"""30-bit 3D Morton codes, vectorized.

Reference: ``MTPC/morton code.cpp:3-32`` — magic-number bit expansion
(``expandBits``), 10 bits per axis, codes computed on triangle centroids with
world bounds hardcoded to [-1, 4] (``MTPC/morton code.h:6-7``, quirk #12).
Here the whole centroid array is interleaved in one shot with ``jnp`` integer
ops (runs on VPU); bounds come from the scene AABB unless compat mode pins
them to [-1, 4].
"""

from __future__ import annotations

import jax.numpy as jnp

# Reference hardcoded world bounds (MTPC/morton code.h:6-7).
COMPAT_MINP = -1.0
COMPAT_MAXP = 4.0


def expand_bits(v):
    """Spread the low 10 bits of each uint32 lane out to every 3rd bit.

    Same magic-multiplier sequence as ``expandBits`` (MTPC/morton code.cpp:3-10),
    applied lane-wise on a whole array.
    """
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(xyz01):
    """Morton codes for points normalized to [0,1]^3. xyz01: (N,3) float."""
    q = jnp.clip(xyz01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    xx = expand_bits(q[..., 0])
    yy = expand_bits(q[..., 1])
    zz = expand_bits(q[..., 2])
    # x in the top bit of each triple, then y, then z (MTPC/morton code.cpp:20).
    return xx * jnp.uint32(4) + yy * jnp.uint32(2) + zz


def morton_codes(points, lo=None, hi=None, compat_bounds=True):
    """Codes for world-space points (N,3).

    compat_bounds=True reproduces the hardcoded [-1,4] normalization
    (``getMortonCode``, MTPC/morton code.cpp:23-32); otherwise lo/hi default to
    the array's own AABB.
    """
    points = jnp.asarray(points)
    if compat_bounds:
        lo = jnp.float32(COMPAT_MINP)
        hi = jnp.float32(COMPAT_MAXP)
        normalized = (points - lo) / (hi - lo)
    else:
        lo = jnp.min(points, axis=0) if lo is None else jnp.asarray(lo)
        hi = jnp.max(points, axis=0) if hi is None else jnp.asarray(hi)
        normalized = (points - lo) / jnp.maximum(hi - lo, 1e-20)
    return morton3d(normalized)


def morton_argsort(points, compat_bounds=True):
    """Stable argsort of points by Morton code (the reference's std::sort over
    faces, MTPC/MTPC.cpp:44 + predicate MTPC/sceneManagement.cpp:311-314)."""
    codes = morton_codes(points, compat_bounds=compat_bounds)
    return jnp.argsort(codes, stable=True), codes
