"""Inverse rendering demo: recover a wall albedo from a target image.

The differentiable renderer (integrator/wavefront.py, ``differentiable=True``)
reverse-differentiates the full path-tracing estimator w.r.t. scene
parameters (kd/ks/emission/texels — see diff/gradients.py).  This demo

1. renders a TARGET image of the built-in Cornell-style box,
2. perturbs the red wall's diffuse albedo,
3. runs gradient descent on the image L2 loss until the albedo recovers.

Runs on CPU in ~1 min (default) or on the TPU (--tpu).  Counterpart in the
reference: none — the C++ renderer (MTPC/pathTracing.cpp) is forward-only;
differentiability is a new capability of this framework.

    python examples/inverse_rendering.py [--steps 60] [--tpu]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.9)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU (default: force CPU)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.diff.gradients import (
        SceneParams, image_loss, render_with_params,
    )
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_box

    scene, meta = load_builtin_box(width=48, height=48)
    bvh = build_lbvh_host(scene)
    opts = RenderOptions(spp=4, max_depth=6, chunk_size=2304)

    mi = meta.material_names.index("Red")
    true_params = SceneParams.from_scene(scene)
    target = render_with_params(true_params, scene, bvh, opts)
    print(f"target rendered ({scene.camera.width}x{scene.camera.height}, "
          f"spp {opts.spp}); true red-wall kd = "
          f"{[round(float(v), 3) for v in true_params.kd[mi]]}")

    # Perturb: start the optimization from a grey wall.
    params = dataclasses.replace(
        true_params, kd=true_params.kd.at[mi].set(jnp.array([0.5, 0.5, 0.5])))

    grad_fn = jax.jit(jax.grad(image_loss), static_argnames=("opts",))

    t0 = time.perf_counter()
    for step in range(args.steps):
        g = grad_fn(params, scene, bvh, opts, target)
        # Optimize only the perturbed material (the rest are at truth).
        kd = params.kd.at[mi].add(-args.lr * g.kd[mi])
        params = dataclasses.replace(params, kd=jnp.clip(kd, 0.0, 1.0))
        if step % 10 == 0 or step == args.steps - 1:
            loss = float(image_loss(params, scene, bvh, opts, target))
            kd_now = [round(float(v), 3) for v in params.kd[mi]]
            print(f"step {step:3d}  loss {loss:.6f}  kd[Red] = {kd_now}")

    err = float(jnp.abs(params.kd[mi] - true_params.kd[mi]).max())
    print(f"recovered in {time.perf_counter() - t0:.1f} s; "
          f"max |kd error| = {err:.4f}")
    return 0 if err < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
