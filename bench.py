"""Benchmark: cornell-box rays/s on the current backend (TPU when available).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: BASELINE.json's north star is >1e9 rays/s fwd+bwd on a v5e-16, i.e.
6.25e7 rays/s/chip; vs_baseline = measured fwd+bwd rays/s/chip / 6.25e7.
The reference itself publishes no throughput numbers (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

PER_CHIP_TARGET = 1e9 / 16  # rays/s/chip, from BASELINE.json north star


def main() -> None:
    import jax
    import numpy as np

    import montecarlopathtracing_tpu as m
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.diff.gradients import (
        SceneParams, apply_params, render_with_params,
    )
    from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats

    scene_dir = os.environ.get("MCPT_BENCH_SCENE_DIR", "/root/reference/scene")
    scene_name = os.environ.get("MCPT_BENCH_SCENE", "cornell-box")
    spp = int(os.environ.get("MCPT_BENCH_SPP", "16"))
    spp_bwd = int(os.environ.get("MCPT_BENCH_SPP_BWD", "4"))

    if os.path.isdir(scene_dir):
        scene, meta = m.load_scene(scene_dir, scene_name)
    else:  # fall back to the built-in box at cornell-like resolution
        from montecarlopathtracing_tpu.scene.builtin import load_builtin_box

        scene, meta = load_builtin_box(width=1024, height=1024)

    bvh = jax.jit(build_lbvh)(scene)
    jax.block_until_ready(bvh.node_min)

    opts = RenderOptions(spp=spp, chunk_size=int(os.environ.get("MCPT_BENCH_CHUNK", "65536")))

    # ---- forward ----
    img, rays = render_image_stats(scene, bvh, opts)  # compile + warm up
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img, rays = render_image_stats(scene, bvh, opts)
    jax.block_until_ready(img)
    dt_fwd = time.perf_counter() - t0
    n_rays_fwd = float(rays)
    fwd_rps = n_rays_fwd / dt_fwd

    # ---- forward + backward (gradient render) ----
    opts_b = opts.replace(spp=spp_bwd)
    params = SceneParams.from_scene(scene)

    def loss(params):
        return render_with_params(params, scene, bvh, opts_b).mean()

    gfn = jax.jit(jax.grad(loss))
    g = gfn(params)
    jax.block_until_ready(g.kd)
    # ray count for the backward config (forward pass of it)
    _, rays_b = render_image_stats(scene, bvh, opts_b)
    n_rays_bwd = float(rays_b)
    t0 = time.perf_counter()
    g = gfn(params)
    jax.block_until_ready(g.kd)
    dt_bwd = time.perf_counter() - t0
    fwdbwd_rps = n_rays_bwd / dt_bwd

    result = {
        "metric": "cornell-box fwd+bwd rays/s/chip (fwd-only in parens)",
        "value": round(fwdbwd_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(fwdbwd_rps / PER_CHIP_TARGET, 4),
        "fwd_rays_per_s": round(fwd_rps, 1),
        "fwd_seconds": round(dt_fwd, 3),
        "fwdbwd_seconds": round(dt_bwd, 3),
        "spp": spp,
        "spp_bwd": spp_bwd,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
