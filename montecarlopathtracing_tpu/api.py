"""Top-level user API.

Parity surface with the reference driver (``render_scene(path, filename, SPP)``,
``MTPC/MTPC.cpp:35-68``): parse -> Morton sort -> LBVH -> render -> PNG, with
the same two phase timings printed.  Everything beyond that (progressive SPP
chunks, checkpoint/resume, distributed meshes) is new capability.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import numpy as np

from .accel.lbvh import BVHArrays, build_lbvh_host
from .config import RenderOptions
from .film.film import Film, load_checkpoint, output_name, save_checkpoint, tonemap, write_png
from .integrator.wavefront import render_image
from .scene.types import SceneArrays, SceneMeta
from .utils.logging import get_logger

log = get_logger(__name__)


def load_scene(scene_dir: str, name: str, options: Optional[RenderOptions] = None,
               use_native: bool = True) -> Tuple[SceneArrays, SceneMeta]:
    """Parse <dir>/<name>.{obj,mtl,camera} into device arrays.

    Tries the C++ fast parser first (scene/native.py), falls back to Python.
    """
    options = options or RenderOptions()
    if use_native:
        try:
            from .scene.native import build_scene_native

            return build_scene_native(scene_dir, name, options)
        except Exception as exc:  # pragma: no cover - fallback path
            log.debug("native loader unavailable (%s); using python parser", exc)
    from .scene.loader import build_scene

    return build_scene(scene_dir, name, options)


def render(scene: SceneArrays, options: Optional[RenderOptions] = None,
           bvh: Optional[BVHArrays] = None):
    """Render to a (H,W,3) float32 radiance image (pre-tonemap)."""
    options = options or RenderOptions()
    if bvh is None:
        bvh = build_lbvh_host(scene)
    return render_image(scene, bvh, options)


def render_progressive(scene: SceneArrays, options: RenderOptions,
                       bvh: Optional[BVHArrays] = None,
                       film: Optional[Film] = None,
                       checkpoint_path: Optional[str] = None):
    """Render options.spp samples in chunks of options.spp_chunk, folding each
    chunk into a Film. Resumable: pass the previous Film (or checkpoint_path to
    auto-load/save). Chunk k renders absolute sample indices [k*c, (k+1)*c) of
    the SAME per-pixel RNG streams a single full-SPP render consumes
    (``sample_offset`` continuation, identical to render_image_host_chunked) —
    so a progressive SPP-N render equals a one-shot SPP-N render modulo fp
    accumulation order, and resuming with a different spp_chunk changes
    nothing."""
    if bvh is None:
        bvh = build_lbvh_host(scene)
    if film is None:
        if checkpoint_path and os.path.exists(checkpoint_path):
            try:
                film = load_checkpoint(checkpoint_path)
                log.info("resumed film at %s samples", float(film.n_samples))
            except Exception as exc:
                # SURVEY.md §5.3 failure recovery: a corrupt/truncated
                # checkpoint (crash mid-save) must not wedge the render —
                # sample_offset keying makes starting over idempotent.
                log.warning("checkpoint %s unreadable (%s); restarting render",
                            checkpoint_path, exc)
                film = Film.zeros(scene.camera.height, scene.camera.width)
        else:
            film = Film.zeros(scene.camera.height, scene.camera.width)
    done = int(np.asarray(film.n_samples))
    while done < options.spp:
        n = min(options.spp_chunk, options.spp - done)
        chunk_opts = options.replace(spp=n)
        img = render_image(scene, bvh, chunk_opts, sample_offset=done)
        film = film.add(img, float(n))
        done += n
        if checkpoint_path:
            save_checkpoint(checkpoint_path, film)
    return film


def render_scene(scene_dir: str, name: str, spp: int = 25,
                 options: Optional[RenderOptions] = None,
                 out_dir: str = "result", write: bool = True,
                 gamma: bool = False):
    """Reference-parity driver (MTPC/MTPC.cpp:35-68): returns (image_f32, path).

    Prints the same two phase timings ("Phase 1 read scene + bvh build",
    "Phase 2 ray tracing").
    """
    options = (options or RenderOptions()).replace(spp=spp)

    t0 = time.perf_counter()
    scene, meta = load_scene(scene_dir, name, options)
    bvh = build_lbvh_host(scene)
    jax.block_until_ready(bvh.node_min)
    t1 = time.perf_counter()
    log.info("Phase 1 (read scene + bvh build) time cost = %.1f ms", (t1 - t0) * 1e3)
    log.info("scene '%s': %d verts, %d faces (%d padded), %d materials, %d lights",
             name, meta.num_vertices, meta.num_faces, scene.num_tris_padded,
             scene.num_materials, scene.num_lights)

    t2 = time.perf_counter()
    from .integrator.wavefront import render_image_host_chunked

    img, n_rays = render_image_host_chunked(
        scene, bvh, options,
        progress=lambda i, n: log.info("chunk %d/%d", i, n),
    )
    t3 = time.perf_counter()
    log.info("Phase 2 (ray tracing) = %.1f ms  (%.2e rays/s)",
             (t3 - t2) * 1e3, n_rays / (t3 - t2))

    path = None
    if write:
        path = output_name(out_dir, name, spp)
        write_png(path, tonemap(img, gamma=gamma))
        log.info("wrote %s", path)
    return img, path
