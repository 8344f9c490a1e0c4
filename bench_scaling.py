"""Scaling benchmark: rays/s vs device count over a (tile, spp) mesh.

Prints one JSON line per mesh size plus a final summary with parallel
efficiency relative to the single-device run (SURVEY.md §7 step 8 / north
star: >85% multi-host efficiency).

On this round's hardware only ONE real TPU chip is reachable, so the sweep
degenerates to n=1 there; the harness itself is exercised on a virtual CPU
mesh in CI (tests/test_parallel.py) and is ready for real slices:

    # virtual 8-device demonstration
    XLA_FLAGS=--xla_force_host_platform_device_count=8 MCPT_FORCE_CPU=1 \
        python bench_scaling.py

    # real slice (multi-host: run under jax.distributed, one process per host)
    python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    if os.environ.get("MCPT_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    import montecarlopathtracing_tpu as m
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.parallel.mesh import make_mesh, render_image_sharded_jit
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_box

    scene_dir = os.environ.get("MCPT_BENCH_SCENE_DIR", "/root/reference/scene")
    name = os.environ.get("MCPT_BENCH_SCENE", "cornell-box")
    spp = int(os.environ.get("MCPT_BENCH_SPP", "8"))
    if os.path.isdir(scene_dir):
        scene, meta = m.load_scene(scene_dir, name)
    else:
        scene, meta = load_builtin_box(width=256, height=256)
    if os.environ.get("MCPT_FORCE_CPU"):
        # CPU mesh demo: keep the config tiny
        import dataclasses
        cam = dataclasses.replace(scene.camera, width=64, height=64)
        scene = dataclasses.replace(scene, camera=cam)

    bvh = build_lbvh_host(scene)
    jax.block_until_ready(bvh.node_min)

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_dev]
    results = []
    import dataclasses
    for n in sizes:
        mesh = make_mesh(tile=n, spp=1, devices=jax.devices()[:n])
        opts = RenderOptions(spp=spp, chunk_size=16384)
        img = render_image_sharded_jit(scene, bvh, opts, mesh)  # compile + warm
        jax.block_until_ready(img)
        # Perturb the input per timed run: the tunneled TPU memoizes
        # bitwise-identical (executable, input) dispatches, so a repeat of the
        # warm-up call would time nothing.
        scene2 = dataclasses.replace(scene, kd=scene.kd * (1.0 + 1e-7))
        jax.block_until_ready(scene2.kd)
        t0 = time.perf_counter()
        img = render_image_sharded_jit(scene2, bvh, opts, mesh)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        results.append({"devices": n, "seconds": round(dt, 4)})
        print(json.dumps(results[-1]))

    base = results[0]["seconds"]
    for r in results:
        speedup = base / r["seconds"]
        r["efficiency"] = round(speedup / r["devices"], 4)
    print(json.dumps({
        "metric": "scaling efficiency vs 1 device",
        "results": results,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
