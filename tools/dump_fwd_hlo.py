"""Dump the optimized HLO of the bench forward program (TPU backend) so
trace event names (fusion.NNN, cond.NNN, sort.NNN) can be matched to real
ops.  Compile-only: nothing executes on the device.

Usage: python tools/dump_fwd_hlo.py [out.txt] [grep ...]
"""
import os, re, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import (
    _device_ids, _swizzle_pixel_fn, render_pixels_refill, swizzle_tile)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fwd_hlo.txt"
scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
bvh = build_lbvh_host(scene)
opts = RenderOptions(spp=16, max_depth=32, chunk_size=65536, spp_chunk=16)
h, w = scene.camera.height, scene.camera.width
tile = swizzle_tile(opts, scene.num_tris_padded)
ids = _device_ids(h, w, tile)

fn = jax.jit(render_pixels_refill,
             static_argnames=("opts", "lanes", "pixel_fn"))
lowered = fn.lower(scene, bvh, opts, ids, sample_offset=0, lanes=65536,
                   pixel_fn=_swizzle_pixel_fn(h, w, tile))
txt = lowered.compile().as_text()
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {out}: {len(txt)} bytes")
for pat in sys.argv[2:]:
    for m_ in re.finditer(rf"^\s*(?:ROOT )?%?{re.escape(pat)} = .*$", txt,
                          re.MULTILINE):
        print(m_.group(0)[:400])
