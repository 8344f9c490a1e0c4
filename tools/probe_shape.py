"""One-config-per-process kernel-shape probe: spp16 cornell frame.
Usage: python tools/probe_shape.py <tile> <width> <group> [spp]"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_image_host_chunked

tile, width, group = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spp = int(sys.argv[4]) if len(sys.argv) > 4 else 16
nosort = "nosort" in sys.argv[5:]
kw = dict(kv.split("=") for kv in sys.argv[5:] if "=" in kv)
lanes = int(kw.get("lanes", 65536)); gap = int(kw.get("gap", 19)); mega = int(kw.get("mega", 16))
scene, meta = m.load_scene("/root/reference/scene", "cornell-box", RenderOptions(cluster_gap_bits=gap))
bvh = build_lbvh_host(scene)
opts = RenderOptions(spp=spp, max_depth=32, chunk_size=lanes, spp_chunk=spp,
                     cluster_rays=tile, cluster_width=width, cluster_group=group,
                     sort_rays=(False if nosort else None), cluster_gap_bits=gap,
                     cluster_mega=mega)
render_image_host_chunked(scene, bvh, opts)
t0 = time.perf_counter()
img, n_rays = render_image_host_chunked(scene, bvh, opts)
dt = time.perf_counter() - t0
print(f"tile{tile} w{width} g{group} spp{spp} lanes{lanes} gap{gap} mega{mega}{' nosort' if nosort else ''}: {float(n_rays)/dt:.4g} rays/s ({dt:.2f} s)")
