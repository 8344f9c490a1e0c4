"""Dump the optimized HLO of the bench backward program (TPU backend) so
trace event names (fusion.NNN, while.NNN) can be matched to real ops.

Usage: python tools/dump_bwd_hlo.py [out.txt]
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.diff.gradients import SceneParams, apply_params
from montecarlopathtracing_tpu.integrator.wavefront import render_image_stats

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bwd_hlo.txt"
scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
bvh = build_lbvh_host(scene)
opts = RenderOptions(spp=16, max_depth=32, chunk_size=65536,
                     bwd_seg_per_sample=float(os.environ.get("MCPT_BWD_SEG", "2.15")))
params = SceneParams.from_scene(scene)


def chunk_loss(p, off):
    img, nr = render_image_stats(apply_params(scene, p), bvh, opts,
                                 differentiable=True, sample_offset=off)
    return img.mean(), nr


gfn = jax.jit(jax.grad(chunk_loss, has_aux=True))
txt = gfn.lower(params, 0).compile().as_text()
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)} bytes to {out}")
