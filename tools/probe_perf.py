"""TPU perf probes for round-3 measurements.  Each subcommand runs ONE
measurement and prints one line, so a fresh process per probe keeps the
tunneled device state clean.

    python tools/probe_perf.py sppsweep     # fwd rays/s at spp 4/8/16 (VERDICT item 3)
    python tools/probe_perf.py bedroom      # 1280x720 96-material large scene (item 4)
    python tools/probe_perf.py packetwalk   # >1.3M-tri packet-walk fallback (item 7)
    python tools/probe_perf.py chunk16      # chunked tables at 16 chunks (item 7 alt)
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_image_host_chunked

mode = sys.argv[1]


def timed_frame(scene, bvh, opts):
    render_image_host_chunked(scene, bvh, opts)  # compile + warm
    t0 = time.perf_counter()
    img, n_rays = render_image_host_chunked(scene, bvh, opts)
    dt = time.perf_counter() - t0
    return float(n_rays) / dt, dt


if mode == "sppsweep" or (mode.startswith("spp") and mode[3:].isdigit()):
    # Single-spp modes (spp4/spp8/spp16): the tunneled device reliably wedges
    # when one process compiles+runs a SECOND distinct large program, so the
    # sweep must run one spp per process.
    spps = (4, 8, 16) if mode == "sppsweep" else (int(mode[3:]),)
    scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
    bvh = build_lbvh_host(scene)
    for spp in spps:
        opts = RenderOptions(spp=spp, max_depth=32,
                             chunk_size=int(os.environ.get("MCPT_CHUNK",
                                                           "65536")),
                             spp_chunk=spp)  # single dispatch per frame
        rps, dt = timed_frame(scene, bvh, opts)
        print(f"spp{spp}: {rps:.4g} rays/s ({dt:.2f} s)", flush=True)

elif mode == "bedroom":
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_large
    scene, meta = load_builtin_large(400_000)  # 1280x720, 96 mats, 8 textures
    print(f"tris={meta.num_faces} mats={scene.num_materials} "
          f"atlas={scene.atlas.shape[0]}", flush=True)
    bvh = build_lbvh_host(scene)
    opts = RenderOptions(spp=4, max_depth=32, chunk_size=65536, spp_chunk=2)
    rps, dt = timed_frame(scene, bvh, opts)
    print(f"bedroom: {rps:.4g} rays/s ({dt:.2f} s)", flush=True)

elif mode in ("packetwalk", "chunk16"):
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_large
    from montecarlopathtracing_tpu.integrator.wavefront import _cluster_plan
    scene, meta = load_builtin_large(1_500_000, width=512, height=512)
    opts = RenderOptions(spp=2, max_depth=32, chunk_size=65536, spp_chunk=1)
    if mode == "packetwalk":
        opts = opts.replace(intersector="bvh")  # the XLA packet walk
    else:
        opts = opts.replace(max_table_chunks=32)  # chunked tables past the cap
    print(f"tris={meta.num_faces} plan={_cluster_plan(opts, scene.num_tris_padded)}",
          flush=True)
    bvh = build_lbvh_host(scene)
    rps, dt = timed_frame(scene, bvh, opts)
    print(f"{mode}: {rps:.4g} rays/s ({dt:.2f} s)", flush=True)
