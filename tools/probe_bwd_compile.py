"""Probe: where does the backward (gradient) phase spend its time?

Times jax trace/lower and XLA compile separately for the differentiable
refill render at a given config, with a throwaway compilation cache dir so
the measurement is cold.  Usage:
    python tools/probe_bwd_compile.py <h> <w> <spp> <lanes> [sort]
"""
import sys, time, tempfile
import jax

cache = tempfile.mkdtemp(prefix="mcpt_probe_cache_")
jax.config.update("jax_compilation_cache_dir", cache)

h, w, spp, lanes = (int(a) for a in sys.argv[1:5])
sort = None if len(sys.argv) < 6 else (sys.argv[5] == "1")

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.diff.gradients import SceneParams, apply_params
from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats

scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
import dataclasses
scene = dataclasses.replace(scene, camera=dataclasses.replace(scene.camera, width=w, height=h))
t0 = time.perf_counter()
bvh = jax.jit(build_lbvh)(scene)
jax.block_until_ready(bvh.node_min)
print(f"bvh build+compile: {time.perf_counter()-t0:.1f}s", flush=True)

opts = RenderOptions(spp=spp, max_depth=32, chunk_size=lanes, sort_rays=sort)
params = SceneParams.from_scene(scene)

def loss(p, off):
    img, nr = render_image_stats(apply_params(scene, p), bvh, opts,
                                 differentiable=True, sample_offset=off)
    return img.mean()

gfn = jax.grad(loss)
t0 = time.perf_counter()
lowered = jax.jit(gfn).lower(params, 0)
t_lower = time.perf_counter() - t0
print(f"trace+lower: {t_lower:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
print(f"xla compile: {t_compile:.1f}s", flush=True)
t0 = time.perf_counter()
g = compiled(params, 0)
jax.block_until_ready(g.kd)
print(f"run1: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
g = compiled(params, 1)
jax.block_until_ready(g.kd)
print(f"run2: {time.perf_counter()-t0:.1f}s", flush=True)
print("RESULT", t_lower, t_compile)
