"""Command-line driver.

The reference hardcodes scene + SPP in main() (``MTPC/MTPC.cpp:71-91``); here
they are runtime arguments:

    python -m montecarlopathtracing_tpu render scene/ cornell-box --spp 25
    python -m montecarlopathtracing_tpu bench
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="montecarlopathtracing_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render a scene to PNG")
    r.add_argument("scene_dir")
    r.add_argument("name")
    r.add_argument("--spp", type=int, default=25)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--out-dir", default="result")
    r.add_argument("--max-depth", type=int, default=32)
    r.add_argument("--chunk-size", type=int, default=65536)
    r.add_argument("--spp-chunk", type=int, default=0,
                   help="progressive accumulation chunk (0 = single pass)")
    r.add_argument("--checkpoint", default=None,
                   help="film checkpoint path for resume")
    r.add_argument("--intersector", default="auto",
                   choices=["auto", "cluster", "cluster_interpret", "bvh",
                            "bvh_perray", "brute"])
    r.add_argument("--modern", action="store_true",
                   help="fixed-quirks mode (AA jitter, uniform light sampling, "
                        "single receiver cosine, MT triangle test, ...)")
    r.add_argument("--gamma", action="store_true", help="gamma-2.2 tonemap")
    r.add_argument("--mesh-tile", type=int, default=0,
                   help="shard the render over a (tile, spp) device mesh")
    r.add_argument("--mesh-spp", type=int, default=1)
    r.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler device trace of the render "
                        "(inspect with tensorboard or the trace.json.gz)")

    sub.add_parser("bench", help="run the benchmark (prints one JSON line)")

    d = sub.add_parser("devices", help="list JAX devices")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "bench":
        import os
        import sys

        # bench.py lives at the repo root (not in the package): resolve it
        # relative to this file so `... bench` also works installed/elsewhere.
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if os.path.exists(os.path.join(root, "bench.py")):
            sys.path.insert(0, root)
        try:
            import bench
        except ImportError:
            print("bench.py not found (it ships at the repository root, "
                  "not inside the package)", file=sys.stderr)
            return 2
        bench.main()
        return 0
    if args.cmd == "devices":
        import jax

        for d in jax.devices():
            print(d)
        return 0

    from .config import MODERN, RenderOptions
    from .api import load_scene, render_progressive, render_scene
    from .film.film import output_name, tonemap, write_png

    import contextlib

    opts = RenderOptions(
        spp=args.spp, seed=args.seed, max_depth=args.max_depth,
        chunk_size=args.chunk_size, intersector=args.intersector,
        **({"compat": MODERN} if args.modern else {}),
    )

    # Profiling and the missing-asset guard apply to ALL render entry points
    # (single-device, --mesh-tile, --spp-chunk). Assets are pre-checked so a
    # FileNotFoundError later (e.g. the output directory vanishing mid-run)
    # surfaces as itself, not as a missing-scene message.
    import os

    base = os.path.join(args.scene_dir, args.name)
    for ext in (".obj", ".mtl", ".camera"):
        if not os.path.exists(base + ext):
            print(f"error: scene asset not found: {base + ext}", file=sys.stderr)
            return 2

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)

    def load_checked(options):
        return load_scene(args.scene_dir, args.name, options)

    if args.mesh_tile:
        import jax

        from .accel.lbvh import build_lbvh_host
        from .parallel.mesh import make_mesh, render_image_sharded_jit

        scene, meta = load_checked(opts)
        with profile_ctx:
            bvh = build_lbvh_host(scene)
            mesh = make_mesh(tile=args.mesh_tile, spp=args.mesh_spp)
            img = render_image_sharded_jit(scene, bvh, opts, mesh)
            jax.block_until_ready(img)
        path = output_name(args.out_dir, args.name, args.spp)
        write_png(path, tonemap(img, gamma=args.gamma))
        print(path)
        return 0

    if args.spp_chunk:
        import jax

        from .accel.lbvh import build_lbvh_host

        opts = opts.replace(spp_chunk=args.spp_chunk)
        scene, meta = load_checked(opts)
        with profile_ctx:
            bvh = build_lbvh_host(scene)
            film = render_progressive(scene, opts, bvh,
                                      checkpoint_path=args.checkpoint)
        path = output_name(args.out_dir, args.name, args.spp)
        write_png(path, tonemap(film.mean, gamma=args.gamma))
        print(path)
        return 0

    with profile_ctx:
        _, path = render_scene(args.scene_dir, args.name, spp=args.spp,
                               options=opts, out_dir=args.out_dir,
                               gamma=args.gamma)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
