"""Profile one warm forward frame of the 400k-tri builtin large scene under
jax.profiler; aggregate device-op durations like tools/profile_frame.py.

Usage: python tools/profile_large.py [tris] [spp]
"""
import glob, gzip, json, os, sys, time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from montecarlopathtracing_tpu.scene.builtin import load_builtin_large
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import (
    render_image_host_chunked, resolve_plan)

tris = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
mode = sys.argv[3] if len(sys.argv) > 3 else "hbm"
scene, meta = load_builtin_large(tris)
bvh = build_lbvh_host(scene)
opts = RenderOptions(spp=spp, max_depth=32, chunk_size=65536, spp_chunk=spp,
                     large_mode=mode)
print("plan:", resolve_plan(opts, scene.num_tris_padded), flush=True)
render_image_host_chunked(scene, bvh, opts)  # compile + warm

logdir = "/tmp/mcpt_profile_large"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
t0 = time.perf_counter()
img, n_rays = render_image_host_chunked(scene, bvh, opts)
dt = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"frame: {dt:.3f} s  {float(n_rays)/dt:.4g} rays/s", flush=True)

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
top = sorted(ev_dur.items(), key=lambda kv: -kv[1])[:40]
total = sum(ev_dur.values())
print(f"total event time {total/1e6:.2f} s over {sum(ev_cnt.values())} events")
for name, d in top:
    print(f"{d/1e3:9.1f} ms {ev_cnt[name]:6d}x  {name[:110]}")
