"""Primary ray generation.

Reference screen geometry (``generateImg``, ``MTPC/pathTracing.cpp:276-309``):
the screen plane passes through ``look_at`` at distance ``l = |look_at - eye|``,
half-height ``dy = tan(fovy/2) * l``, half-width ``dx = dy * W / H``; ``up`` is
normalized but NOT re-orthogonalized against the view direction (quirk #2);
``screen_x = normalize((look_at - eye) x up)``.  Pixel (i, j) maps to the
*top-left lattice corner* ``start - up*pdy*i + x*pdx*j`` and — in compat mode —
every SPP sample shoots the identical ray through it (quirk #1, no AA).
Modern mode jitters uniformly over the pixel footprint.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.sampling import normalize
from ..scene.types import CameraArrays


def screen_basis(cam: CameraArrays):
    """Returns (eye, start_point, x_step, y_step) where pixel (i,j) corner =
    start_point + x_step*j - y_step*i."""
    up = normalize(cam.up)
    view = cam.look_at - cam.eye
    l = jnp.linalg.norm(view)
    dy = jnp.tan(cam.fovy / 2.0 / 180.0 * jnp.pi) * l
    dx = dy / cam.height * cam.width
    pdx = 2.0 * dx / cam.width
    pdy = 2.0 * dy / cam.height
    x_dir = normalize(jnp.cross(view, up))
    start = cam.look_at - x_dir * dx + up * dy
    return cam.eye, start, x_dir * pdx, up * pdy


def primary_rays(cam: CameraArrays, pixel_ids, jitter=None):
    """Rays for flat pixel ids (R,) (row-major, id = i*W + j).

    jitter: optional (R,2) uniforms in [0,1) displacing the sample point over
    the pixel footprint (modern mode); None reproduces the corner-ray quirk.
    Returns (origin (R,3), direction (R,3) unit).
    """
    eye, start, x_step, y_step = screen_basis(cam)
    w = cam.width
    if w & (w - 1) == 0:
        # Power-of-two width: shift/mask — integer div lowers to a slow
        # multi-op sequence on the VPU and this runs every refill iteration.
        shift = w.bit_length() - 1
        i = (pixel_ids >> shift).astype(jnp.float32)
        j = (pixel_ids & (w - 1)).astype(jnp.float32)
    else:
        i = (pixel_ids // w).astype(jnp.float32)
        j = (pixel_ids % w).astype(jnp.float32)
    if jitter is not None:
        j = j + jitter[:, 0]
        i = i + jitter[:, 1]
    pos = start[None, :] + x_step[None, :] * j[:, None] - y_step[None, :] * i[:, None]
    direction = normalize(pos - eye[None, :])
    origin = jnp.broadcast_to(eye, direction.shape)
    return origin, direction
