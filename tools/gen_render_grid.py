"""Reproduce the reference's published result grid (its only "benchmark"):
cornell-box SPP {2,16,25,50,100,256} + veach-mis SPP {10,100}
(/root/reference/result/ directory, README.md:19-23), rendered by THIS
framework on the TPU, into docs/renders/.

Each (scene, spp) item runs in its OWN subprocess: the tunneled device
occasionally wedges a process after many large programs (INVALID_ARGUMENT on
every later dispatch — see CLAUDE.md); a fresh process recovers, and the
repo-local compile cache makes the per-process restart cost ~15 s.  A failed
item is retried once in another fresh process.

Compat mode reproduces the reference images; --modern adds jittered-AA
variants with the quirk fixes (docs/COMPAT.md).

Usage: python tools/gen_render_grid.py [--modern] [--out docs/renders]
       python tools/gen_render_grid.py --only cornell-box:25  (child mode)
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = [
    ("cornell-box", (2, 16, 25, 50, 100, 256)),
    ("veach-mis", (10, 100)),
]


def render_one(scene_name, spp, modern, out_dir, scene_dir):
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

    scene, meta = m.load_scene(scene_dir, scene_name)
    bvh = build_lbvh_host(scene)
    # spp_chunk 16 keeps each dispatch under the tunnel watchdog.
    kw = dict(spp=spp, max_depth=32, chunk_size=65536,
              spp_chunk=min(16, spp))
    if modern:
        kw["compat"] = MODERN
    opts = RenderOptions(**kw)
    t0 = time.perf_counter()
    img, n_rays = render_image_host_chunked(scene, bvh, opts, retries=1)
    dt = time.perf_counter() - t0
    tag = "-modern" if modern else ""
    name = f"{scene_name}{tag}-SPP{spp}.png"
    write_png(os.path.join(out_dir, name), tonemap(img))
    print(f"{name}: {dt:.1f} s, {float(n_rays)/dt:.3g} rays/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modern", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "renders"))
    ap.add_argument("--scene-dir", default="/root/reference/scene")
    ap.add_argument("--only", default=None,
                    help="scene:spp — render one item in-process (child mode)")
    ap.add_argument("--skip-existing", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.only:
        scene_name, spp = args.only.rsplit(":", 1)
        render_one(scene_name, int(spp), args.modern, args.out, args.scene_dir)
        return

    failures = []
    for scene_name, spps in GRID:
        for spp in spps:
            tag = "-modern" if args.modern else ""
            name = f"{scene_name}{tag}-SPP{spp}.png"
            if args.skip_existing and os.path.exists(
                    os.path.join(args.out, name)):
                print(f"{name}: exists, skipped", flush=True)
                continue
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--only", f"{scene_name}:{spp}",
                   "--out", args.out, "--scene-dir", args.scene_dir]
            if args.modern:
                cmd.append("--modern")
            for attempt in range(2):
                rc = subprocess.run(cmd).returncode
                if rc == 0:
                    break
            else:
                failures.append(name)
    if failures:
        print(f"FAILED: {failures}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
