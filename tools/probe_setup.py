"""Probe: breakdown of per-process setup cost (import, device init, scene
load, BVH build) plus forward-phase compile/run at the bench config."""
import sys, time, tempfile

t00 = time.perf_counter()
import jax
cache = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mcpt_probe_cache_")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
print(f"import jax: {time.perf_counter()-t00:.1f}s", flush=True)

t0 = time.perf_counter()
d = jax.devices()
print(f"devices init: {time.perf_counter()-t0:.1f}s ({d[0]})", flush=True)

t0 = time.perf_counter()
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
print(f"scene load: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
lowered = jax.jit(build_lbvh).lower(scene)
print(f"bvh lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"bvh compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
bvh = compiled(scene)
jax.block_until_ready(bvh.node_min)
print(f"bvh run: {time.perf_counter()-t0:.1f}s", flush=True)

from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats
opts = RenderOptions(spp=16, max_depth=32, chunk_size=65536, spp_chunk=16)
t0 = time.perf_counter()
lowered = jax.jit(render_image_stats, static_argnames=("opts", "differentiable")).lower(scene, bvh, opts)
print(f"fwd lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
cfwd = lowered.compile()
print(f"fwd compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
img, nr = cfwd(scene, bvh)
jax.block_until_ready(img)
dt = time.perf_counter() - t0
print(f"fwd run1: {dt:.1f}s ({float(nr)/dt:.3g} rays/s)", flush=True)
t0 = time.perf_counter()
img, nr = cfwd(scene, bvh)
jax.block_until_ready(img)
dt = time.perf_counter() - t0
print(f"fwd run2: {dt:.1f}s ({float(nr)/dt:.3g} rays/s)", flush=True)
print(f"TOTAL: {time.perf_counter()-t00:.1f}s", flush=True)
