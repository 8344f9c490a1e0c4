"""Gradient tests vs finite differences (SURVEY.md §4.3; BASELINE.json
"pixel-grad allclose")."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.diff.gradients import (
    SceneParams, apply_params, image_loss, pixel_gradient, render_with_params,
    train_step,
)

OPTS = RenderOptions(spp=4, max_depth=4, chunk_size=256)


def _scalar_render(scene, bvh, params):
    return float(jnp.sum(render_with_params(params, scene, bvh, OPTS)))


def _fd_check(scene, bvh, get, set_, eps, rtol):
    """Central finite difference on one coordinate vs autodiff."""
    params = SceneParams.from_scene(scene)

    def scalar(p):
        return jnp.sum(render_with_params(p, scene, bvh, OPTS))

    g = jax.grad(scalar)(params)
    gval = float(get(g))
    plus = set_(params, eps)
    minus = set_(params, -eps)
    fd = (_scalar_render(scene, bvh, plus) - _scalar_render(scene, bvh, minus)) / (2 * eps)
    assert np.isclose(gval, fd, rtol=rtol, atol=1e-3), (gval, fd)
    return gval


def test_kd_gradient_matches_fd(box_scene, box_bvh):
    """d(image)/d(kd of the white walls): the dominant light path is linear or
    low-order polynomial in kd -> FD matches tightly."""
    scene, meta = box_scene
    mi = meta.material_names.index("White")

    gval = _fd_check(
        scene, box_bvh,
        get=lambda g: g.kd[mi, 0],
        set_=lambda p, e: dataclasses.replace(p, kd=p.kd.at[mi, 0].add(e)),
        eps=1e-3, rtol=2e-2,
    )
    assert gval > 0  # brighter walls -> brighter image


def test_light_radiance_gradient_matches_fd(box_scene, box_bvh):
    """Radiance enters the estimator linearly -> FD matches up to f32
    cancellation in the central difference (sum over ~1e3 pixels)."""
    scene, meta = box_scene

    gval = _fd_check(
        scene, box_bvh,
        get=lambda g: g.light_radiance[0, 1],
        set_=lambda p, e: dataclasses.replace(
            p, light_radiance=p.light_radiance.at[0, 1].add(e)),
        eps=1e-2, rtol=5e-3,
    )
    assert gval > 0


def test_red_wall_gradient_is_channelwise(box_scene, box_bvh):
    """The red wall's kd.green only affects green-channel radiance."""
    scene, meta = box_scene
    mi = meta.material_names.index("Red")
    params = SceneParams.from_scene(scene)

    def red_sum(p):
        img = render_with_params(p, scene, box_bvh, OPTS)
        return jnp.sum(img[..., 0])  # red channel only

    g = jax.grad(red_sum)(params)
    # green kd of any material cannot influence the red channel
    assert float(jnp.abs(jnp.asarray(g.kd)[:, 1]).max()) == 0.0
    assert float(g.kd[mi, 0]) > 0.0


def test_pixel_gradient_api(box_scene, box_bvh):
    scene, _ = box_scene
    ids = jnp.arange(64, dtype=jnp.int32)
    g = pixel_gradient(scene, box_bvh, OPTS, ids)
    assert np.isfinite(np.asarray(g.kd)).all()
    assert np.isfinite(np.asarray(g.light_radiance)).all()


def test_inverse_rendering_step_reduces_loss(box_scene, box_bvh):
    """One SGD step toward a darker target must reduce MSE."""
    scene, _ = box_scene
    params = SceneParams.from_scene(scene)
    target = render_with_params(params, scene, box_bvh, OPTS) * 0.5
    loss0 = float(image_loss(params, scene, box_bvh, OPTS, target))
    p1, l1 = train_step(params, scene, box_bvh, OPTS, target, lr=0.05)
    loss1 = float(image_loss(p1, scene, box_bvh, OPTS, target))
    assert np.isclose(float(l1), loss0, rtol=1e-5)
    assert loss1 < loss0


@pytest.mark.slow  # 30 s: 4096-spp MC estimate of a score-function gradient
def test_ns_gradient_matches_fd(tmp_path):
    """d(image)/d(Ns) via the score-function surrogate (wavefront._next_ray)
    vs central finite differences, on a setup built to make the Ns signal
    strong and near-binary: a pure-specular floor under a SMALL overhead
    light, camera looking straight down — the specular path hits the light
    with probability ~cos^(Ns+1)(theta0), so dE/dNs is O(1%) per unit Ns and
    both estimators (REINFORCE through d/dNs log p; fixed-stream FD through
    the sampled directions) converge at moderate sample counts."""
    import montecarlopathtracing_tpu as m
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
    from montecarlopathtracing_tpu.diff.gradients import apply_params
    from montecarlopathtracing_tpu.integrator.wavefront import render_pixels

    (tmp_path / "ns.mtl").write_text(
        "newmtl Mirror\nKd 0 0 0\nKs 1 1 1\nNs 32\nNi 1\n"
        "newmtl Light\nKd 0 0 0\nKs 0 0 0\nNs 1\nNi 1\n")
    (tmp_path / "ns.obj").write_text(
        "v 0 0 0\nv 2 0 0\nv 2 0 2\nv 0 0 2\n"
        "v 0.8 1.9 0.8\nv 1.2 1.9 0.8\nv 1.2 1.9 1.2\nv 0.8 1.9 1.2\n"
        "usemtl Mirror\nf 1 2 3\nf 1 3 4\n"
        "usemtl Light\nf 5 6 7\nf 5 7 8\n")
    (tmp_path / "ns.camera").write_text(
        "eye 1 1.0 1\nlookat 1 0 1\nup 0 0 1\nfovy 8\nwidth 4\nheight 4\n"
        "mtlname Light 10 10 10\n")
    scene, meta = m.load_scene(str(tmp_path), "ns", use_native=False)
    bvh = jax.jit(build_lbvh)(scene)
    ids = jnp.arange(16, dtype=jnp.int32)
    opts = RenderOptions(spp=4096, max_depth=2, chunk_size=16,
                         ns_gradient=True)

    def scalar(p):
        rad, _ = render_pixels(apply_params(scene, p), bvh, opts, ids,
                               differentiable=True)
        return jnp.sum(rad)

    mi = meta.material_names.index("Mirror")
    params = SceneParams.from_scene(scene)
    gval = float(jax.grad(scalar)(params).ns[mi])
    eps = 8.0
    plus = dataclasses.replace(params, ns=params.ns.at[mi].add(eps))
    minus = dataclasses.replace(params, ns=params.ns.at[mi].add(-eps))
    fd = (float(scalar(plus)) - float(scalar(minus))) / (2 * eps)
    # Sharper lobes concentrate on the small light: gradient must be positive
    # and match FD within MC tolerance.
    assert gval > 0 and fd > 0, (gval, fd)
    assert np.isclose(gval, fd, rtol=0.25, atol=0.02), (gval, fd)


def test_bwd_seg_budget(box_scene, box_bvh):
    """bwd_seg_per_sample controls the differentiable scan length.  A sane
    budget must reproduce the default-budget film exactly and report a
    positive ray count; a starvation budget must flag itself by negating
    n_rays (wavefront.py render_pixels_refill, differentiable branch) instead
    of silently dropping tail samples."""
    from montecarlopathtracing_tpu.integrator.wavefront import (
        render_image_stats)
    scene, meta = box_scene
    opts = RenderOptions(spp=2, max_depth=4, chunk_size=256)
    img0, nr0 = render_image_stats(scene, box_bvh, opts, differentiable=True)
    assert float(nr0) > 0
    img1, nr1 = render_image_stats(
        scene, box_bvh, opts.replace(bwd_seg_per_sample=2.6),
        differentiable=True)
    assert float(nr1) > 0
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    img2, nr2 = render_image_stats(
        scene, box_bvh, opts.replace(bwd_seg_per_sample=0.01, max_depth=1),
        differentiable=True)
    assert float(nr2) < 0  # truncated budget is flagged, not silent
