"""Differentiable rendering: pixel gradients w.r.t. scene parameters.

The reference has no differentiability at all; this module is the framework's
inverse-rendering surface (BASELINE.json north star: "pixel-grad allclose" vs
finite differences).

Estimator: detached-sampling pathwise gradients (SURVEY.md §7 hard part 4) —
all discrete/discontinuous quantities (traversal, visibility, RR, lobe choice,
sampled directions) are ``stop_gradient``-ed inside the integrator, while the
radiance estimate stays a smooth polynomial in the continuous parameters:

* ``kd``/``ks`` material albedos (throughput + NEE products),
* emitter radiance (NEE + emitter-hit terms; linear),
* texture texels (gathered kd; gradient scatters back into the atlas),
* ``Ns`` Phong exponents (opt-in: ``RenderOptions.ns_gradient=True``) — via
  a score-function (REINFORCE) surrogate folded into the specular bounce
  weight (wavefront._next_ray): the lobe DIRECTION is the only Ns-dependent
  quantity, so the pathwise-detached estimator's Ns gradient would be zero;
  the surrogate exp(logp - sg(logp)) contributes
  E[f * d/dNs log p(omega|Ns)] while leaving the forward pass bitwise
  unchanged.  Higher-variance than the albedo gradients (no baseline), and
  off by default (its reverse-mode path costs ~40%% extra backward time).

Performance note: prefer ``jax.grad`` over ``jax.value_and_grad`` around
these losses — materializing the primal alongside the rematerialized
backward costs +44%% on v5e (measured); log the loss from a separate cheap
forward when needed.

This is unbiased for these parameters because the sampling distributions do
not depend on them (Ns's distributional dependence is covered by the score
term) — except the kd/ks lobe *ratio* test and RR, whose decision thresholds
do involve |kd|,|ks|; those comparisons are detached, matching the standard
"detach the discrete, differentiate the continuous" estimator.  Geometry
gradients remain out of scope (edge/visibility terms).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..accel.lbvh import BVHArrays
from ..config import RenderOptions
from ..integrator.wavefront import render_image_stats, render_pixels
from ..scene.types import SceneArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneParams:
    """The differentiable subset of SceneArrays."""

    kd: Any  # (M,3)
    ks: Any  # (M,3)
    ns: Any  # (M,)
    light_radiance: Any  # (L,3)
    atlas: Any  # (A,3)

    @staticmethod
    def from_scene(scene: SceneArrays) -> "SceneParams":
        return SceneParams(
            kd=scene.kd, ks=scene.ks, ns=scene.ns,
            light_radiance=scene.light_radiance, atlas=scene.atlas,
        )


def apply_params(scene: SceneArrays, params: SceneParams) -> SceneArrays:
    """Graft parameters back into the scene; emitter-hit emission and NEE
    radiance are tied to the same light_radiance tensor so its gradient sums
    both paths."""
    emission = jnp.zeros_like(scene.emission)
    if scene.num_lights:
        emission = emission.at[scene.light_mat].set(params.light_radiance)
    return dataclasses.replace(
        scene,
        kd=params.kd, ks=params.ks, ns=params.ns, atlas=params.atlas,
        light_radiance=params.light_radiance, emission=emission,
    )


def render_with_params(params: SceneParams, scene: SceneArrays, bvh: BVHArrays,
                       opts: RenderOptions):
    img, _ = render_image_stats(apply_params(scene, params), bvh, opts,
                                differentiable=True)
    return img


def image_loss(params: SceneParams, scene: SceneArrays, bvh: BVHArrays,
               opts: RenderOptions, target):
    """Mean-squared error against a target image (inverse rendering)."""
    img = render_with_params(params, scene, bvh, opts)
    return jnp.mean((img - target) ** 2)


@functools.partial(jax.jit, static_argnames=("opts",))
def loss_and_grad(params, scene, bvh, opts: RenderOptions, target):
    return jax.value_and_grad(image_loss)(params, scene, bvh, opts, target)


@functools.partial(jax.jit, static_argnames=("opts", "lr"))
def train_step(params, scene, bvh, opts: RenderOptions, target, lr: float = 0.1):
    """One SGD step of inverse rendering. Returns (new_params, loss)."""
    loss, grads = jax.value_and_grad(image_loss)(params, scene, bvh, opts, target)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def pixel_gradient(scene: SceneArrays, bvh: BVHArrays, opts: RenderOptions,
                   pixel_ids, select=None):
    """d(sum of selected pixel radiance)/d(params) — the BASELINE.json
    "pixel-grad" quantity. select: optional (R,3) weighting."""
    params = SceneParams.from_scene(scene)

    def scalar(params):
        s = apply_params(scene, params)
        rad, _ = render_pixels(s, bvh, opts, pixel_ids, differentiable=True)
        if select is not None:
            rad = rad * select
        return jnp.sum(rad)

    return jax.grad(scalar)(params)


def make_distributed_train_step(scene, bvh, opts: RenderOptions, mesh, lr: float = 0.1):
    """Full SPMD training step over a (tile, spp) mesh: pixels tiled across
    chips, samples split over the spp axis, parameter gradients psum-reduced
    over BOTH axes (the gradient all-reduce of SURVEY.md §5.8, overlapped with
    backward by XLA's collective scheduler).

    Returns step(params, target_tiles, ids_tiles) -> (params, loss), jittable;
    target_tiles/ids_tiles are (n_tiles, per, 3)/(n_tiles, per) arrays sharded
    P('tile', None).
    """
    from jax.sharding import PartitionSpec as P

    n_spp_shards = mesh.shape["spp"]
    assert opts.spp % n_spp_shards == 0
    spp_local = opts.spp // n_spp_shards
    local_opts = opts.replace(spp=spp_local)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,  # RNG keys/sample offsets vary per shard by design
        in_specs=(P(), P("tile", None), P("tile", None)),
        out_specs=(P(), P()),
    )
    def step(params, target_tile, ids_tile):
        def local_loss(params):
            s = apply_params(scene, params)
            rad, _ = render_pixels(
                s, bvh, local_opts, ids_tile[0], differentiable=True,
                sample_offset=jax.lax.axis_index("spp") * spp_local,
            )
            rad = jax.lax.pmean(rad, "spp")
            return jnp.mean((rad - target_tile[0]) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # Global mean over tiles; spp shards agree post-pmean but psum-average
        # anyway to keep replicas bitwise identical.
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, ("tile", "spp")), grads
        )
        loss = jax.lax.pmean(loss, ("tile", "spp"))
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return jax.jit(step)
