"""Integrator behavior tests (SURVEY.md §4.2): emitter short-circuit, color
bleeding, estimator equivalence between intersectors, determinism."""

import dataclasses

import jax
import numpy as np

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.config import MODERN, RenderOptions


def _render(scene, bvh, **kw):
    opts = RenderOptions(**{**dict(spp=8, max_depth=6, chunk_size=1024), **kw})
    return np.asarray(m.render_image(scene, bvh, opts))


def test_render_finite_nonzero(box_scene, box_bvh):
    scene, _ = box_scene
    img = _render(scene, box_bvh)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_emitter_pixels_return_radiance(box_scene, box_bvh):
    """Primary emitter hits return the light radiance exactly
    (MTPC/pathTracing.cpp:141-144) — with radiance (30,30,30), the max pixel
    equals 30 and nothing exceeds it."""
    scene, _ = box_scene
    img = _render(scene, box_bvh, spp=2, max_depth=2)
    assert np.isclose(img.max(), 30.0)


def test_color_bleeding_walls(box_scene, box_bvh):
    """Left wall is red, right is green: pixels in the left third should skew
    red relative to the right third."""
    scene, _ = box_scene
    img = _render(scene, box_bvh, spp=16)
    left = img[:, :8]
    right = img[:, -8:]
    assert (left[..., 0] / np.maximum(left[..., 1], 1e-6)).mean() > 1.2
    assert (right[..., 1] / np.maximum(right[..., 0], 1e-6)).mean() > 1.2


def test_deterministic_same_seed(box_scene, box_bvh):
    scene, _ = box_scene
    a = _render(scene, box_bvh, seed=7)
    b = _render(scene, box_bvh, seed=7)
    assert np.array_equal(a, b)
    c = _render(scene, box_bvh, seed=8)
    assert not np.array_equal(a, c)


def test_bvh_and_brute_force_agree(box_scene, box_bvh):
    """Same RNG + same nearest hits => identical estimator, regardless of
    intersector (bit-exact up to tie-broken shared edges)."""
    scene, _ = box_scene
    a = _render(scene, box_bvh, spp=4, intersector="bvh")
    b = _render(scene, box_bvh, spp=4, intersector="brute")
    close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.99


def test_chunk_size_invariance(box_scene, box_bvh):
    """Pixel chunking is an implementation detail: RNG is keyed by absolute
    pixel id, so chunk size must not change the image.  Modern (jittered)
    mode: compat's lattice-corner rays hit triangle edges exactly, where hit
    classification legitimately varies with compilation shape (FP
    contraction) — see tests/test_refill.py."""
    scene, _ = box_scene
    a = _render(scene, box_bvh, spp=4, chunk_size=1024, compat=MODERN)
    b = _render(scene, box_bvh, spp=4, chunk_size=256, compat=MODERN)
    assert np.allclose(a, b, rtol=1e-5, atol=1e-6)


def test_modern_mode_renders(box_scene, box_bvh):
    scene, _ = box_scene
    img = _render(scene, box_bvh, spp=8, compat=MODERN)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_more_spp_reduces_variance(box_scene, box_bvh):
    """MC sanity: distance to a high-SPP reference shrinks with SPP."""
    scene, _ = box_scene
    ref = _render(scene, box_bvh, spp=128, seed=99)
    lo = _render(scene, box_bvh, spp=4, seed=1)
    hi = _render(scene, box_bvh, spp=64, seed=1)
    err_lo = np.abs(lo - ref).mean()
    err_hi = np.abs(hi - ref).mean()
    assert err_hi < err_lo


def test_direct_only_matches_full_when_no_bounce(box_scene, box_bvh):
    """max_depth=1 isolates NEE direct lighting; it must lower-bound the full
    render on average (indirect adds energy)."""
    scene, _ = box_scene
    direct = _render(scene, box_bvh, spp=32, max_depth=1, seed=3)
    full = _render(scene, box_bvh, spp=32, max_depth=8, seed=3)
    assert full.mean() >= direct.mean()


def test_specular_scene_renders(box_scene_dir):
    scene, _ = m.load_scene(box_scene_dir, "boxspec", use_native=False)
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh

    bvh = jax.jit(build_lbvh)(scene)
    img = _render(scene, bvh, spp=8)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_glass_scene_renders():
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_box
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh

    scene, _ = load_builtin_box(with_glass=True, width=16, height=16)
    bvh = jax.jit(build_lbvh)(scene)
    img = _render(scene, bvh, spp=4, chunk_size=256)
    assert np.isfinite(img).all()
