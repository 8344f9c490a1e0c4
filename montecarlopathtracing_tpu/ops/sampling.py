"""BSDF lobe sampling, Fresnel/refraction, and area-light sampling.

Reference semantics being reproduced (all vectorized over lanes):

* ``BRDFImportanceSampling`` (``MTPC/pathTracing.cpp:30-64``): cosine-weighted
  diffuse lobe ``theta = asin(sqrt(u))`` about the shading normal, Phong lobe
  ``theta = acos(u^(1/(Ns+1)))`` about the mirror direction, with a dominant-
  axis tangent frame built from the *unnormalized* axis and only the final
  direction normalized.
* ``Refract`` (``:13-27``) and the Schlick choice in ``nextRay`` (``:77-113``).
* Area-light CDF pick + simplex point sampling (``shade``, ``:177-200``):
  the reference draws three uniforms and normalizes them (NOT uniform over the
  triangle, quirk #3); modern mode uses the sqrt warp.

All sampled directions are wrapped in ``stop_gradient`` — the gradient
estimator is detached-sampling pathwise (SURVEY.md §7): parameters flow through
throughput/radiance arithmetic, never through sample locations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = jnp.float32(jnp.pi)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps=1e-30):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def lobe_frame(axis):
    """Dominant-axis tangent frame (MTPC/pathTracing.cpp:51-60).

    axis may be unnormalized (the reference passes the interpolated shading
    normal / raw mirror direction straight in). Returns (right, axis, front).
    """
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    use_x = jnp.abs(ax) > jnp.abs(ay)
    front = jnp.where(
        use_x[..., None],
        jnp.stack([az, jnp.zeros_like(ax), -ax], axis=-1),
        jnp.stack([jnp.zeros_like(ax), -az, ay], axis=-1),
    )
    front = normalize(front)
    right = jnp.cross(axis, front)
    return right, axis, front


def sample_lobe(axis, u_phi, u_theta, is_diffuse, ns):
    """Sample a direction about ``axis``; diffuse lanes cosine-weighted, the
    rest Phong with exponent ns. Returns a unit direction (detached)."""
    phi = u_phi * (2.0 * PI)
    sqrt_u = jnp.sqrt(u_theta)
    # diffuse: theta = asin(sqrt u)  => sin = sqrt u, cos = sqrt(1-u)
    sin_d = sqrt_u
    cos_d = jnp.sqrt(jnp.maximum(1.0 - u_theta, 0.0))
    # specular: theta = acos(u^(1/(Ns+1)))
    cos_s = jnp.power(u_theta, 1.0 / (ns + 1.0))
    sin_s = jnp.sqrt(jnp.maximum(1.0 - cos_s * cos_s, 0.0))
    sin_t = jnp.where(is_diffuse, sin_d, sin_s)
    cos_t = jnp.where(is_diffuse, cos_d, cos_s)
    sx = sin_t * jnp.cos(phi)
    sy = cos_t
    sz = sin_t * jnp.sin(phi)
    right, up, front = lobe_frame(axis)
    d = right * sx[..., None] + up * sy[..., None] + front * sz[..., None]
    return jax.lax.stop_gradient(normalize(d))


def reflect(incoming, normal):
    """r = i - 2 (i.n) n (MTPC/pathTracing.cpp:108,122); normal may be unnormalized."""
    return incoming - normal * (2.0 * _dot(incoming, normal))


def schlick_fresnel(n1, n2, cos_in):
    """rf0 + (1-rf0)(1-|cos|)^5 (MTPC/pathTracing.cpp:98-99)."""
    rf0 = ((n1 - n2) / (n1 + n2)) ** 2
    return rf0 + (1.0 - rf0) * jnp.power(1.0 - jnp.abs(cos_in), 5.0)


def refract_dir(incoming, normal, eta):
    """Snell refraction (MTPC/pathTracing.cpp:13-27). Returns (ok, direction);
    ok=False means total internal reflection."""
    cosi = _dot(incoming, normal)[..., 0]
    cost2 = 1.0 - eta * eta * (1.0 - cosi * cosi)
    ok = cost2 >= 0.0
    safe = jnp.sqrt(jnp.maximum(cost2, 0.0))
    d = incoming * eta[..., None] - normal * (eta * cosi + safe)[..., None]
    return ok, d


def pick_light_face(cum_area, total_area, u, pick_total=None):
    """Area-weighted CDF pick within one light (MTPC/pathTracing.cpp:177-200).

    cum_area: (F,) cumulative face areas for this light (PARSE order, see
    scene/loader.py); u: (R,) uniforms.  ``pick_total`` is the draw's range:
    None uses this light's own area (unbiased); compat quirk #4 passes the
    scene's FIRST light's total area, reproducing the reference's frozen
    ``static uniform_real_distribution(0, total_aera)`` (:185) — biased for
    multi-light scenes with unequal areas.

    Returns ((R,) int32 face index, (R,) bool found).  found=False means the
    draw exceeded this light's CDF (possible when pick_total > total_area):
    the reference's pick loop then falls through, silently reusing the
    previous light's sample point/material (:53-64).
    """
    rnd = u * (total_area if pick_total is None else pick_total)
    # searchsorted's default 'scan' method is a sequential binary search —
    # log2(F) dependent (R,) gather steps, measured 3.5 ms PER LIGHT per
    # iteration at 64k lanes on the 760-face veach lights (5 inner while
    # loops = 58% of the frame).  Small tables take one dense (R, F)
    # compare; large ones the batch sort-based method (~one extra argsort).
    method = "compare_all" if cum_area.shape[0] <= 64 else "sort"
    j = jnp.searchsorted(cum_area, rnd, side="right", method=method)
    found = rnd < total_area
    return jnp.clip(j, 0, cum_area.shape[0] - 1).astype(jnp.int32), found


def sample_triangle_point(v0, v1, v2, n0, n1, n2, u1, u2, u3, simplex: bool):
    """Point + interpolated normal on a triangle.

    simplex=True: weights r_i / sum(r) (reference, MTPC/pathTracing.cpp:193-197).
    simplex=False: uniform via sqrt warp.
    Positions/normals are detached (light geometry is not differentiated).
    """
    if simplex:
        s = u1 + u2 + u3
        w0, w1, w2 = u1 / s, u2 / s, u3 / s
    else:
        su = jnp.sqrt(u1)
        w0 = 1.0 - su
        w1 = su * (1.0 - u2)
        w2 = su * u2
    x = v0 * w0[..., None] + v1 * w1[..., None] + v2 * w2[..., None]
    n = n0 * w0[..., None] + n1 * w1[..., None] + n2 * w2[..., None]
    return jax.lax.stop_gradient(x), jax.lax.stop_gradient(n)
