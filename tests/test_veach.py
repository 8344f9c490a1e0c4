"""veach-mis: the multi-light + glossy-Phong scene (5 lights of widely
different areas/radiances, Ns 300-100000 — scene/veach-mis.camera:7-11,
veach-mis.mtl). Exercises per-light NEE loops, the Phong lobe, and the
specular emitter-hit path (how the reference renders the light strips'
glossy reflections, SURVEY.md quirk #6)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_pixels
from montecarlopathtracing_tpu.oracle.cpu_reference import oracle_render_pixels

SCENE_DIR = "/root/reference/scene"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SCENE_DIR, "veach-mis.obj")),
    reason="reference veach-mis assets not available",
)


@pytest.fixture(scope="module")
def veach():
    import montecarlopathtracing_tpu as m

    scene, meta = m.load_scene(SCENE_DIR, "veach-mis")
    return scene, meta


def test_veach_structure(veach):
    scene, meta = veach
    assert meta.num_faces == 3812
    assert scene.num_lights == 5
    # widely different light areas (quirk #4 context: the reference's frozen
    # static CDF would mis-sample these; we use per-light CDFs)
    areas = np.asarray(scene.light_total_area)
    assert areas.max() / areas.min() > 100


def test_veach_matches_oracle(veach):
    """Center-strip pixels (glossy plates + lights) against the f64 oracle."""
    scene, _ = veach
    bvh = build_lbvh(scene)
    w = scene.camera.width
    # a row crossing the glossy plates
    row = int(scene.camera.height * 0.55)
    ids = jnp.asarray(np.arange(w // 2 - 64, w // 2 + 64, dtype=np.int32) + row * w)
    opts = RenderOptions(spp=2, max_depth=3, chunk_size=128, refill=False)
    got, _ = render_pixels(scene, bvh, opts, ids)
    want = oracle_render_pixels(scene, opts, np.asarray(ids))
    got = np.asarray(got, np.float64)
    rel = np.abs(got - want) / (np.abs(want) + 1e-4)
    assert np.median(rel) < 1e-4
    assert (rel.max(axis=1) < 1e-2).mean() > 0.95
