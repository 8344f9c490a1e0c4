"""Failure detection / recovery (SURVEY.md §5.3) — exercised, not asserted.

The reference has nothing here (a render runs to completion or is lost).
This framework's recovery story rests on one invariant: every chunk's sample
set is keyed by (pixel, ABSOLUTE sample index), so re-rendering any chunk —
after a crash, a corrupt checkpoint, or a transient device fault — produces
exactly the same samples.  These tests inject each failure mode and assert
the recovered film equals the uninterrupted one.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from montecarlopathtracing_tpu.api import render_progressive
from montecarlopathtracing_tpu.config import MODERN, RenderOptions
from montecarlopathtracing_tpu.integrator import wavefront
from montecarlopathtracing_tpu.integrator.wavefront import (
    render_image, render_image_host_chunked)

OPTS = RenderOptions(spp=6, spp_chunk=2, max_depth=6, seed=5, compat=MODERN)


def test_killed_process_resume_equals_uninterrupted(box_scene_dir, box_bvh,
                                                    box_scene, tmp_path):
    """A render process is KILLED mid-progressive-render (os._exit after the
    2nd chunk checkpoint — an injected crash, not a polite early return); a
    fresh process resumes from the checkpoint file alone and must match the
    uninterrupted render."""
    ckpt = str(tmp_path / "film.npz")
    child = f"""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.config import MODERN, RenderOptions
from montecarlopathtracing_tpu.film import film as film_mod
from montecarlopathtracing_tpu import api

scene, _ = m.load_scene({box_scene_dir!r}, "box", use_native=False)
saves = []
orig = film_mod.save_checkpoint
def crashing_save(path, f):
    orig(path, f)
    saves.append(1)
    if len(saves) == 2:
        os._exit(137)  # hard kill mid-render: no cleanup, no final film
api.save_checkpoint = crashing_save
api.render_progressive(
    scene, RenderOptions(spp=6, spp_chunk=2, max_depth=6, seed=5,
                         compat=MODERN),
    checkpoint_path={ckpt!r})
raise SystemExit("unreachable: render survived the injected crash")
"""
    proc = subprocess.run([sys.executable, "-c", child], capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 137, proc.stderr[-2000:]
    assert os.path.exists(ckpt)

    scene, _ = box_scene
    film_resumed = render_progressive(scene, OPTS, bvh=box_bvh,
                                      checkpoint_path=ckpt)
    film_full = render_progressive(scene, OPTS, bvh=box_bvh)
    assert float(film_resumed.n_samples) == OPTS.spp
    np.testing.assert_allclose(
        np.asarray(film_resumed.mean), np.asarray(film_full.mean),
        rtol=1e-5, atol=1e-6,
    )


def test_corrupt_checkpoint_restarts_cleanly(box_scene, box_bvh, tmp_path):
    """A truncated checkpoint (crash mid-save) must be detected and the
    render restarted, not crash — and the result matches a fresh render."""
    ckpt = str(tmp_path / "film.npz")
    with open(ckpt, "wb") as f:
        f.write(b"PK\x03\x04garbage-truncated-npz")
    scene, _ = box_scene
    film = render_progressive(scene, OPTS, bvh=box_bvh, checkpoint_path=ckpt)
    film_full = render_progressive(scene, OPTS, bvh=box_bvh)
    np.testing.assert_allclose(
        np.asarray(film.mean), np.asarray(film_full.mean),
        rtol=1e-5, atol=1e-6,
    )


def test_transient_device_fault_retried(box_scene, box_bvh, monkeypatch):
    """A dispatch that raises once (transient fault) is retried by
    render_image_host_chunked(retries=1) and the film comes out identical to
    a fault-free run — demonstrating the idempotent-chunk claim."""
    scene, _ = box_scene
    clean, clean_rays = render_image_host_chunked(scene, box_bvh, OPTS)

    real = wavefront._render_refill_jit
    state = {"calls": 0}

    def flaky(*args, **kw):
        state["calls"] += 1
        if state["calls"] == 2:  # fail the SECOND chunk dispatch once
            raise RuntimeError("injected transient device fault")
        return real(*args, **kw)

    monkeypatch.setattr(wavefront, "_render_refill_jit", flaky)
    img, rays = render_image_host_chunked(scene, box_bvh, OPTS, retries=1)
    assert state["calls"] >= 4  # 3 chunks + 1 retried failure
    np.testing.assert_array_equal(np.asarray(img), np.asarray(clean))

    # Without retries the same fault propagates (failure DETECTION).
    state["calls"] = 0
    with pytest.raises(RuntimeError, match="injected"):
        render_image_host_chunked(scene, box_bvh, OPTS)
