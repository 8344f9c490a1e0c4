"""Benchmark: cornell-box rays/s on the current backend (TPU when available).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: BASELINE.json's north star is >1e9 rays/s fwd+bwd on a v5e-16, i.e.
6.25e7 rays/s/chip; vs_baseline = measured fwd+bwd rays/s/chip / 6.25e7.
The reference itself publishes no throughput numbers (SURVEY.md §6).

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

_FWD_PHASE = r"""
import json, time, sys
import jax
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_image_host_chunked
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box
import os
cfg = json.loads(sys.argv[1])
if os.path.isdir(cfg["scene_dir"]):
    scene, meta = m.load_scene(cfg["scene_dir"], cfg["scene"])
else:
    scene, meta = load_builtin_box(width=1024, height=1024)
bvh = jax.jit(build_lbvh)(scene)
jax.block_until_ready(bvh.node_min)
opts = RenderOptions(spp=cfg["spp"], chunk_size=cfg["chunk"], spp_chunk=cfg["spp_chunk"])
render_image_host_chunked(scene, bvh, opts)  # warm up / compile
t0 = time.perf_counter()
img, n_rays = render_image_host_chunked(scene, bvh, opts)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "rays": float(n_rays), "seconds": dt,
    "backend": jax.default_backend(), "device": str(jax.devices()[0]),
}))
"""

_BWD_PHASE = r"""
import json, time, sys
import jax
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.diff.gradients import SceneParams, render_with_params
from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box
import os
cfg = json.loads(sys.argv[1])
if os.path.isdir(cfg["scene_dir"]):
    scene, meta = m.load_scene(cfg["scene_dir"], cfg["scene"])
else:
    scene, meta = load_builtin_box(width=1024, height=1024)
bvh = jax.jit(build_lbvh)(scene)
jax.block_until_ready(bvh.node_min)
opts_b = RenderOptions(spp=cfg["spp_bwd"], max_depth=8, chunk_size=cfg["chunk"])
params = SceneParams.from_scene(scene)
def loss(p):
    return render_with_params(p, scene, bvh, opts_b).mean()
gfn = jax.jit(jax.grad(loss))
g = gfn(params); jax.block_until_ready(g.kd)  # compile
_, rays_b = render_image_stats(scene, bvh, opts_b, differentiable=True)
rays_b = float(rays_b)
t0 = time.perf_counter()
g = gfn(params); jax.block_until_ready(g.kd)
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({"rays": rays_b, "seconds": dt}))
"""


def _run_phase(code: str, cfg: dict, attempts: int = 2) -> dict:
    last = ""
    for k in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code, json.dumps(cfg)],
                capture_output=True, text=True, timeout=1800,
            )
            out, err = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:  # hung device counts as a failed attempt
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            err += "\n[phase timed out after 1800s]"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        last = out[-2000:] + err[-2000:]
        if k < attempts - 1:
            time.sleep(5)
    sys.stderr.write(last)
    raise RuntimeError("bench phase failed")


def main() -> None:
    cfg = {
        "scene_dir": os.environ.get("MCPT_BENCH_SCENE_DIR", "/root/reference/scene"),
        "scene": os.environ.get("MCPT_BENCH_SCENE", "cornell-box"),
        "spp": int(os.environ.get("MCPT_BENCH_SPP", "16")),
        "spp_bwd": int(os.environ.get("MCPT_BENCH_SPP_BWD", "2")),
        "chunk": int(os.environ.get("MCPT_BENCH_CHUNK", "65536")),
        "spp_chunk": int(os.environ.get("MCPT_BENCH_SPP_CHUNK", "4")),
    }
    fwd = _run_phase(_FWD_PHASE, cfg)
    bwd = _run_phase(_BWD_PHASE, cfg)
    fwd_rps = fwd["rays"] / fwd["seconds"]
    fwdbwd_rps = bwd["rays"] / bwd["seconds"]

    result = {
        "metric": "cornell-box fwd+bwd rays/s/chip (fwd-only in fwd_rays_per_s)",
        "value": round(fwdbwd_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(fwdbwd_rps / PER_CHIP_TARGET, 4),
        "fwd_rays_per_s": round(fwd_rps, 1),
        "fwd_seconds": round(fwd["seconds"], 3),
        "fwdbwd_seconds": round(bwd["seconds"], 3),
        "spp": cfg["spp"],
        "spp_bwd": cfg["spp_bwd"],
        "backend": fwd.get("backend", "unknown"),
        "device": fwd.get("device", "unknown"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
