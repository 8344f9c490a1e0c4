"""Benchmark: cornell-box rays/s on the current backend (TPU when available).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: BASELINE.json's north star is >1e9 rays/s fwd+bwd on a v5e-16, i.e.
6.25e7 rays/s/chip; vs_baseline = measured fwd+bwd rays/s/chip / 6.25e7.
The reference itself publishes no throughput numbers (SURVEY.md §6); for
scale: the reference binary compiled by tools/refbin renders cornell-box at
~1.6e5 rays/s/thread on this host's CPU.

Forward and forward+backward run at MATCHED estimator configs (same scene,
spp, max_depth 32, same renderer architecture); the backward accumulates
gradients over spp chunks (each a separate dispatch, summed on device) so
single-dispatch wall time stays under the tunneled-TPU watchdog.

Hardware-model context emitted alongside the headline:
* ``est_vpu_util`` — measured intersection-test throughput against a VPU
  roofline: tests/s x FLOPS_PER_TEST / VPU_PEAK_F32.  FLOPS_PER_TEST models
  the cluster kernel's dense panel work per candidate (cluster, subtile)
  pair: tile(64) x width(32) x ~34 f32 ops for the compat plane+sign test.
  Candidate counts are measured (kernels.cluster.candidate_stats), not
  assumed.  VPU_PEAK_F32 = 2e12 is a stated model constant for one v5e core.

Each phase (forward render, gradient render) runs in its OWN subprocess: the
tunneled axon TPU occasionally wedges a process's device state after several
large heterogeneous programs (every later execution fails INVALID_ARGUMENT),
and a fresh process recovers it.  Phases are retried once on failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PER_CHIP_TARGET = 1e9 / 16  # rays/s/chip, from BASELINE.json north star
VPU_PEAK_F32 = 2.0e12       # model constant: one v5e core's vector f32 peak
FLOPS_PER_TEST_PANEL = 64 * 32 * 34  # tile x width x ops (see module doc)

_COMMON = r"""
import json, time, sys, os
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box
cfg = json.loads(sys.argv[1])
if os.path.isdir(cfg["scene_dir"]):
    scene, meta = m.load_scene(cfg["scene_dir"], cfg["scene"])
else:
    scene, meta = load_builtin_box(width=1024, height=1024)
bvh = jax.jit(build_lbvh)(scene)
jax.block_until_ready(bvh.node_min)
"""

_FWD_PHASE = _COMMON + r"""
from montecarlopathtracing_tpu.integrator.wavefront import render_image_host_chunked
# One dispatch for the whole frame (spp 16 ~ 5 s on v5e, under the watchdog);
# the backward phase keeps smaller chunks (its dispatches cost ~2.5x more).
opts = RenderOptions(spp=cfg["spp"], max_depth=32, chunk_size=cfg["chunk"],
                     spp_chunk=cfg["spp"])
render_image_host_chunked(scene, bvh, opts)  # warm up / compile
t0 = time.perf_counter()
img, n_rays = render_image_host_chunked(scene, bvh, opts)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "rays": float(n_rays), "seconds": dt,
    "backend": jax.default_backend(), "device": str(jax.devices()[0]),
}))
"""

_BWD_PHASE = _COMMON + r"""
from montecarlopathtracing_tpu.diff.gradients import SceneParams, apply_params
from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats

# Matched config: same spp/max_depth as forward; gradient accumulated over
# spp chunks (d mean(render[0..spp]) = mean of chunk gradients).
spp_chunk = cfg["spp_chunk"]
opts = RenderOptions(spp=spp_chunk, max_depth=32, chunk_size=cfg["chunk"])
params = SceneParams.from_scene(scene)

def chunk_loss(p, off):
    img, nr = render_image_stats(apply_params(scene, p), bvh, opts,
                                 differentiable=True, sample_offset=off)
    return img.mean(), nr

# jax.grad (not value_and_grad): producing the primal alongside the
# rematerialized backward costs +44% on v5e (measured); gradient descent
# loops that need the loss should log it from a separate cheap forward.
gfn = jax.jit(jax.grad(lambda p, off: chunk_loss(p, off)[0]))
rays_fn = jax.jit(lambda p, off: chunk_loss(p, off)[1])
g = gfn(params, 0)
jax.block_until_ready(g.kd)  # compile
rays_c = float(rays_fn(params, 0))

n_chunks = max(1, cfg["spp"] // spp_chunk)
t0 = time.perf_counter()
acc = None
for k in range(n_chunks):
    g = gfn(params, 1 + k * spp_chunk)
    acc = g if acc is None else jax.tree_util.tree_map(lambda a, b: a + b, acc, g)
jax.block_until_ready(acc.kd)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({"rays": rays_c * n_chunks, "seconds": dt}))
"""

_LARGE_PHASE = r"""
import json, time, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mcpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from montecarlopathtracing_tpu.scene.builtin import load_builtin_large
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_image_host_chunked
cfg = json.loads(sys.argv[1])
scene, meta = load_builtin_large(cfg.get("large_tris", 400_000))
bvh = jax.jit(build_lbvh)(scene)
jax.block_until_ready(bvh.node_min)
opts = RenderOptions(spp=4, max_depth=32, chunk_size=cfg["chunk"], spp_chunk=2)
render_image_host_chunked(scene, bvh, opts)  # warm up
t0 = time.perf_counter()
img, n_rays = render_image_host_chunked(scene, bvh, opts)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({"rays": float(n_rays), "seconds": dt,
                              "tris": int(meta.num_faces)}))
"""

_STATS_PHASE = _COMMON + r"""
# Measured intersection-test statistics for the roofline estimate: candidate
# (cluster, subtile) pairs per estimator ray on real sorted wavefronts.
from montecarlopathtracing_tpu.kernels.cluster import candidate_stats
print("RESULT " + json.dumps(candidate_stats(scene, RenderOptions(
    spp=2, max_depth=32, chunk_size=cfg["chunk"]), bvh)))
"""


def _run_phase(code: str, cfg: dict, attempts: int = 2) -> dict:
    last = ""
    for k in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code, json.dumps(cfg)],
                capture_output=True, text=True, timeout=700,
            )
            out, err = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:  # hung device counts as a failed attempt
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            err += "\n[phase timed out after 700s]"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        last = out[-2000:] + err[-2000:]
        if k < attempts - 1:
            time.sleep(120)  # wedged-tunnel recovery window
    sys.stderr.write(last)
    raise RuntimeError("bench phase failed")


def main() -> None:
    cfg = {
        "scene_dir": os.environ.get("MCPT_BENCH_SCENE_DIR", "/root/reference/scene"),
        "scene": os.environ.get("MCPT_BENCH_SCENE", "cornell-box"),
        "spp": int(os.environ.get("MCPT_BENCH_SPP", "16")),
        "chunk": int(os.environ.get("MCPT_BENCH_CHUNK", "65536")),
        "spp_chunk": int(os.environ.get("MCPT_BENCH_SPP_CHUNK", "8")),
    }
    fwd = _run_phase(_FWD_PHASE, cfg)
    bwd = _run_phase(_BWD_PHASE, cfg)
    try:
        stats = _run_phase(_STATS_PHASE, cfg, attempts=1)
    except Exception:
        stats = {}
    try:
        large = _run_phase(_LARGE_PHASE, cfg, attempts=1)
    except Exception:
        large = {}
    fwd_rps = fwd["rays"] / fwd["seconds"]
    fwdbwd_rps = bwd["rays"] / bwd["seconds"]

    result = {
        "metric": "cornell-box fwd+bwd rays/s/chip (matched spp/depth; fwd-only in fwd_rays_per_s)",
        "value": round(fwdbwd_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(fwdbwd_rps / PER_CHIP_TARGET, 4),
        "fwd_rays_per_s": round(fwd_rps, 1),
        "fwd_seconds": round(fwd["seconds"], 3),
        "fwdbwd_seconds": round(bwd["seconds"], 3),
        "bwd_over_fwd": round(fwd_rps / max(fwdbwd_rps, 1e-9), 2),
        "spp": cfg["spp"],
        "max_depth": 32,
        "backend": fwd.get("backend", "unknown"),
        "device": fwd.get("device", "unknown"),
    }
    if large:
        result["large_scene_tris"] = large["tris"]
        result["large_scene_rays_per_s"] = round(large["rays"] / large["seconds"], 1)
    if stats:
        tests_per_ray = stats.get("candidates_per_ray", 0.0)
        result["cand_clusters_per_ray"] = round(tests_per_ray, 2)
        result["est_vpu_util"] = round(
            fwd_rps * tests_per_ray / 64.0 * FLOPS_PER_TEST_PANEL / VPU_PEAK_F32, 4
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
