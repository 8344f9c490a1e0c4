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
