"""Reproduce the reference's published result grid (its only "benchmark"):
cornell-box SPP {2,16,25,50,100,256} + veach-mis SPP {10,100}
(/root/reference/result/ directory, README.md:19-23), rendered by THIS
framework on the TPU, into docs/renders/.

Compat mode reproduces the reference images; --modern adds jittered-AA
variants with the quirk fixes (docs/COMPAT.md).

Usage: python tools/gen_render_grid.py [--modern] [--out docs/renders]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MCPT_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import MODERN, RenderOptions
from montecarlopathtracing_tpu.film.film import tonemap, write_png
from montecarlopathtracing_tpu.integrator.wavefront import (
    render_image_host_chunked)

GRID = [
    ("cornell-box", (2, 16, 25, 50, 100, 256)),
    ("veach-mis", (10, 100)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modern", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "renders"))
    ap.add_argument("--scene-dir", default="/root/reference/scene")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for scene_name, spps in GRID:
        scene, meta = m.load_scene(args.scene_dir, scene_name)
        bvh = build_lbvh_host(scene)
        for spp in spps:
            # spp_chunk 16 keeps each dispatch under the tunnel watchdog.
            kw = dict(spp=spp, max_depth=32, chunk_size=65536,
                      spp_chunk=min(16, spp))
            if args.modern:
                kw["compat"] = MODERN
            opts = RenderOptions(**kw)
            t0 = time.perf_counter()
            img, n_rays = render_image_host_chunked(scene, bvh, opts)
            dt = time.perf_counter() - t0
            tag = "-modern" if args.modern else ""
            name = f"{scene_name}{tag}-SPP{spp}.png"
            write_png(os.path.join(args.out, name), tonemap(img))
            print(f"{name}: {dt:.1f} s, {float(n_rays)/dt:.3g} rays/s",
                  flush=True)


if __name__ == "__main__":
    main()
