"""Texture path (reference quirk #8: nearest-neighbor, frac wrap, row from
vt.x / col from vt.y, texel replaces kd only — MTPC/pathTracing.cpp:147-163,
texture decode MTPC/sceneManagement.h:134-143)."""

import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import _gather_hit, render_pixels
from montecarlopathtracing_tpu.oracle.cpu_reference import oracle_render_pixels
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box


@pytest.fixture(scope="module")
def tex_scene():
    scene, meta = load_builtin_box(width=32, height=32, with_texture=True)
    return scene, meta


def test_texture_loaded(tex_scene):
    scene, meta = tex_scene
    has = np.asarray(scene.has_texture)
    assert has.sum() == 1  # the Checker material
    mat = int(np.argmax(has))
    assert int(scene.tex_h[mat]) == 8 and int(scene.tex_w[mat]) == 8
    atlas = np.asarray(scene.atlas)
    assert atlas.shape[0] >= 64
    # checker corners: (0,0) red-ish, (0,1) blue-ish
    off = int(scene.tex_offset[mat])
    assert atlas[off][0] > 0.9 and atlas[off][2] < 0.1
    assert atlas[off + 1][2] > 0.9 and atlas[off + 1][0] < 0.1


def test_gather_hit_samples_expected_texel(tex_scene):
    """Rays straight at known uv points on the textured back wall must fetch
    the exact checker texel (row from vt.x, col from vt.y)."""
    scene, _ = tex_scene
    opts = RenderOptions()
    # back wall is the z=0 plane; its uv chart maps vt.x along wall-Y and
    # vt.y along wall-X (builtin.py quad winding), so point = (vty*2, vtx*2).
    # quirk: texel row index comes from interpolated vt.x, col from vt.y.
    pts = np.array([[0.125, 0.125], [0.3125, 0.125], [0.125, 0.3125]])  # (vtx, vty)
    origin = np.stack([pts[:, 1] * 2, pts[:, 0] * 2, np.ones(3)], axis=1)
    direction = np.tile([0.0, 0.0, -1.0], (3, 1))
    from montecarlopathtracing_tpu.accel.lbvh import brute_force_intersect

    hit, t, tri = brute_force_intersect(scene, jnp.asarray(origin, jnp.float32),
                                        jnp.asarray(direction, jnp.float32))
    assert bool(jnp.all(hit))
    p, pn, mat, kd = _gather_hit(scene, opts, jnp.asarray(origin, jnp.float32),
                                 jnp.asarray(direction, jnp.float32), t, tri)
    kd = np.asarray(kd)
    # uv (0.125, 0.125) -> texel (1,1): parity even -> red
    assert kd[0, 0] > 0.9 and kd[0, 2] < 0.1
    # uv (0.3125, 0.125) -> texel (2,1): parity odd -> blue
    assert kd[1, 2] > 0.9 and kd[1, 0] < 0.1
    # uv (0.125, 0.3125) -> texel (1,2): parity odd -> blue
    assert kd[2, 2] > 0.9 and kd[2, 0] < 0.1


def test_textured_render_matches_oracle(tex_scene):
    scene, _ = tex_scene
    opts = RenderOptions(spp=4, max_depth=2, chunk_size=256, refill=False)
    ids = jnp.arange(256, dtype=jnp.int32)
    got, _ = render_pixels(scene, build_lbvh(scene), opts, ids)
    want = oracle_render_pixels(scene, opts, np.asarray(ids))
    got = np.asarray(got, np.float64)
    rel = np.abs(got - want) / (np.abs(want) + 1e-6)
    assert np.median(rel) < 1e-5
    assert (rel.max(axis=1) < 1e-3).mean() > 0.97
