"""Profile one warm backward (gradient) dispatch under jax.profiler and
aggregate device-op durations from the trace.

Usage: python tools/profile_bwd.py [spp_chunk]
"""
import glob, gzip, json, os, sys, time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.diff.gradients import SceneParams, apply_params
from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats

spp_chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
bvh = build_lbvh_host(scene)
opts = RenderOptions(spp=spp_chunk, max_depth=32, chunk_size=65536,
                     bwd_seg_per_sample=(float(os.environ["MCPT_BWD_SEG"])
                                         if "MCPT_BWD_SEG" in os.environ
                                         else None))
params = SceneParams.from_scene(scene)


def chunk_loss(p, off):
    img, nr = render_image_stats(apply_params(scene, p), bvh, opts,
                                 differentiable=True, sample_offset=off)
    return img.mean(), nr


gfn = jax.jit(jax.grad(chunk_loss, has_aux=True))
g, nr = gfn(params, 0)
jax.block_until_ready(g.kd)  # compile + warm

logdir = "/tmp/mcpt_profile_bwd"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
t0 = time.perf_counter()
g, nr = gfn(params, 1)
jax.block_until_ready(g.kd)
dt = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"bwd chunk: {dt:.3f} s  {float(nr)/dt:.4g} rays/s", flush=True)

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, "no trace written"
ev_dur = defaultdict(float)
ev_cnt = defaultdict(int)
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        ev_dur[name] += ev["dur"]; ev_cnt[name] += 1
top = sorted(ev_dur.items(), key=lambda kv: -kv[1])[:45]
total = sum(ev_dur.values())
print(f"total event time {total/1e6:.2f} s over {sum(ev_cnt.values())} events")
for name, d in top:
    print(f"{d/1e3:9.1f} ms {ev_cnt[name]:6d}x  {name[:110]}")
