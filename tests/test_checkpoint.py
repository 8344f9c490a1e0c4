"""Checkpoint/resume and progressive rendering (SURVEY.md §5.4).

The reference has no checkpointing — a render runs to completion or is lost
(SURVEY.md §5: "none").  Here the Film's (radiance_sum, n_samples) state plus
``sample_offset``-continued RNG streams make progressive accumulation,
mid-render checkpoint/resume, and a one-shot full-SPP render all produce the
same sample set: a progressive SPP-N render equals the single-pass SPP-N
render modulo floating-point accumulation order.
"""

import numpy as np
import pytest

from montecarlopathtracing_tpu.api import render_progressive
from montecarlopathtracing_tpu.config import MODERN, RenderOptions
from montecarlopathtracing_tpu.film.film import Film, load_checkpoint, save_checkpoint
from montecarlopathtracing_tpu.integrator.wavefront import render_image


# MODERN (jittered) mode: compat quirk #1 shoots identical lattice-corner
# primaries that hit triangle edges EXACTLY, so hit classification varies with
# FP contraction between differently-compiled programs (CLAUDE.md) — the
# sample-set contract under test here is mode-independent.
OPTS = RenderOptions(spp=6, spp_chunk=2, max_depth=6, seed=3, compat=MODERN)


def test_progressive_matches_single_pass(box_scene, box_bvh):
    scene, _ = box_scene
    film = render_progressive(scene, OPTS, bvh=box_bvh)
    assert float(film.n_samples) == OPTS.spp
    one_shot = render_image(scene, box_bvh, OPTS)
    np.testing.assert_allclose(
        np.asarray(film.mean), np.asarray(one_shot), rtol=1e-4, atol=1e-5
    )


def test_resume_mid_spp_equals_uninterrupted(box_scene, box_bvh, tmp_path):
    scene, _ = box_scene
    ckpt = str(tmp_path / "film.npz")

    # "Crash" after 2 of 6 samples: render only the first chunk...
    film_partial = render_progressive(scene, OPTS.replace(spp=2), bvh=box_bvh,
                                      checkpoint_path=ckpt)
    assert float(film_partial.n_samples) == 2

    # ...then a fresh call resumes from the checkpoint file alone and must
    # reproduce the uninterrupted render exactly (same absolute sample set).
    film_resumed = render_progressive(scene, OPTS, bvh=box_bvh,
                                      checkpoint_path=ckpt)
    film_full = render_progressive(scene, OPTS, bvh=box_bvh)
    assert float(film_resumed.n_samples) == OPTS.spp
    np.testing.assert_allclose(
        np.asarray(film_resumed.mean), np.asarray(film_full.mean),
        rtol=1e-5, atol=1e-6,
    )


def test_resume_with_different_chunking(box_scene, box_bvh):
    """Resuming with a different spp_chunk must not change the image: chunk
    boundaries only slide the sample_offset window, never reseed."""
    scene, _ = box_scene
    film_a = render_progressive(scene, OPTS.replace(spp_chunk=2), bvh=box_bvh)
    film_b = render_progressive(scene, OPTS.replace(spp_chunk=5), bvh=box_bvh)
    np.testing.assert_allclose(
        np.asarray(film_a.mean), np.asarray(film_b.mean), rtol=1e-4, atol=1e-5
    )


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    film = Film(rng.uniform(size=(4, 5, 3)).astype(np.float32), np.float32(7))
    path = str(tmp_path / "f.npz")
    save_checkpoint(path, film)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(back.radiance_sum),
                                  np.asarray(film.radiance_sum))
    assert float(back.n_samples) == 7


def test_film_merge_is_addition():
    a = Film(np.full((2, 2, 3), 2.0, np.float32), np.float32(4))
    b = Film(np.full((2, 2, 3), 1.0, np.float32), np.float32(2))
    m = a.merge(b)
    assert float(m.n_samples) == 6
    np.testing.assert_allclose(np.asarray(m.mean), 0.5)
