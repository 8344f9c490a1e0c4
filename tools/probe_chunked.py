"""Probe the single-dispatch chunked intersector: compile time and one-call
latency on the 400k-tri builtin scene, vs brute-force spot agreement.

Usage: python tools/probe_chunked.py [tris] [rays]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from montecarlopathtracing_tpu.scene.builtin import load_builtin_large
from montecarlopathtracing_tpu.kernels.cluster import (
    build_cluster_accel_chunked, cluster_intersect_chunked)
from montecarlopathtracing_tpu.integrator.wavefront import resolve_plan
from montecarlopathtracing_tpu.config import RenderOptions

tris = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
scene, meta = load_builtin_large(tris)
opts = RenderOptions()
kind, width, group, n_chunks = resolve_plan(opts, scene.num_tris_padded)
print("plan:", kind, width, group, n_chunks, flush=True)

t0 = time.perf_counter()
accel, offs = build_cluster_accel_chunked(scene, width=width,
                                          n_chunks=n_chunks)
jax.block_until_ready(accel.tconst)
print(f"build: {time.perf_counter()-t0:.1f}s  K={accel.num_chunks} "
      f"C={accel.clusters_per_chunk}", flush=True)

rng = np.random.default_rng(0)
lo = np.asarray(jnp.min(accel.kmin, axis=0))
hi = np.asarray(jnp.max(accel.kmax, axis=0))
o = jnp.asarray(rng.uniform(lo + 0.2 * (hi - lo), hi - 0.2 * (hi - lo),
                            (n_rays, 3)).astype(np.float32))
d = rng.normal(size=(n_rays, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
d = jnp.asarray(d)

fn = jax.jit(lambda o, d: cluster_intersect_chunked(
    accel, offs, o, d, tile=64, mega=16, group=group))
t0 = time.perf_counter()
lowered = fn.lower(o, d)
print(f"trace: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
h, t, i = compiled(o, d)
jax.block_until_ready(t)
print(f"first run: {time.perf_counter()-t0:.2f}s", flush=True)
# Value-dependent chaining defeats the tunnel memoizer.
t0 = time.perf_counter()
for k in range(5):
    h, t, i = compiled(o + 1e-6 * t[:, None].astype(jnp.float32), d)
jax.block_until_ready(t)
print(f"warm: {(time.perf_counter()-t0)/5*1e3:.1f} ms/call "
      f"hits={float(jnp.mean(h)):.3f}", flush=True)
