"""Golden-image anchors against the ACTUAL reference binary's output.

tools/refbin compiles the unmodified reference sources (/root/reference/MTPC)
on this machine; tests/golden/*.png are its renders (tools/refbin/
gen_golden.sh), using a deterministic synthetic stand-in for the unshipped
cherry-wood texture (consumed by BOTH renderers, so comparisons are
apples-to-apples).  This checks the framework against the C++ binary itself —
not against the author's own oracle.

On the reference repo's own shipped result/*.png (SURVEY.md §4.2): bedroom
and cornell-box SPP{2,16,25,50} are intact; cornell-box-SPP256.png decodes
but its content stops at row 24; cornell-box-SPP100.png is anomalously dark
(mean 15/255 vs ~58 for every other SPP — apparently rendered with different
code/settings); the veach PNGs are deflate-truncated (899/900 rows recover
under PIL truncated-image mode).  The intact cornell goldens additionally
embed the REAL cherry-wood texture, so they serve only as a loose secondary
anchor here.

The comparison is statistical (different RNG engines): block-averaged means
over a subsampled pixel grid, tolerances calibrated against measured
agreement (block-max 0.037 / mean 0.008 vs the fresh golden at spp16).
"""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_pixels

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
REF_SCENES = "/root/reference/scene"


def _load_png(path):
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    return np.asarray(Image.open(path).convert("RGB")).astype(np.float32) / 255.0


@pytest.fixture(scope="module")
def cornell_scene(tmp_path_factory):
    """cornell-box with the synthetic Table texture the goldens used."""
    d = tmp_path_factory.mktemp("golden_scene")
    for f in ("cornell-box.obj", "cornell-box.mtl", "cornell-box.camera"):
        shutil.copy(os.path.join(REF_SCENES, f), d)
    shutil.copy(os.path.join(GOLDEN, "cherry-wood-texture.jpg"), d)
    scene, _ = m.load_scene(str(d), "cornell-box")
    return scene


def _subsampled_blocks(scene, spp, stride, block, seed=0):
    h, w = scene.camera.height, scene.camera.width
    ys, xs = np.arange(0, h, stride), np.arange(0, w, stride)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    ids = (yy * w + xx).reshape(-1).astype(np.int32)
    bvh = jax.jit(build_lbvh)(scene)
    opts = RenderOptions(spp=spp, max_depth=16, seed=seed)
    rad, _ = jax.jit(render_pixels, static_argnames=("opts", "differentiable"))(
        scene, bvh, opts, jnp.asarray(ids)
    )
    ours = np.clip(np.asarray(rad).reshape(len(ys), len(xs), 3), 0.0, 1.0)

    def blocks(img):
        gy = (len(ys) // block) * block
        gx = (len(xs) // block) * block
        return img[:gy, :gx].reshape(gy // block, block, gx // block, block, 3
                                     ).mean(axis=(1, 3))

    return ours, (ys, xs), blocks


def test_cornell_matches_reference_binary(cornell_scene):
    ours, (ys, xs), blocks = _subsampled_blocks(cornell_scene, spp=16, stride=16,
                                                block=8)
    gold = _load_png(os.path.join(GOLDEN, "ref-cornell-box-SPP64.png"))
    gs = gold[::16, ::16]
    bo, bg = blocks(ours), blocks(gs)
    diff = np.abs(bo - bg)
    assert abs(ours.mean() - gs.mean()) < 0.02, (ours.mean(), gs.mean())
    assert diff.mean() < 0.02, diff.mean()
    assert diff.max() < 0.08, diff.max()


@pytest.mark.slow
def test_cornell_vs_shipped_result_png(cornell_scene):
    """Loose secondary anchor against the repo's own shipped SPP25 render
    (rendered with the REAL texture, hence the wider tolerance)."""
    ours, (ys, xs), blocks = _subsampled_blocks(cornell_scene, spp=8, stride=16,
                                                block=8, seed=5)
    shipped = _load_png(os.path.join("/root/reference/result",
                                     "cornell-box-SPP25.png"))
    ss = shipped[::16, ::16]
    bo, bs = blocks(ours), blocks(ss)
    diff = np.abs(bo - bs)
    assert abs(ours.mean() - ss.mean()) < 0.03, (ours.mean(), ss.mean())
    assert diff.max() < 0.12, diff.max()


@pytest.mark.slow
@pytest.mark.parametrize("shipped_spp,our_spp,seed", [(2, 2, 7), (50, 16, 9)])
def test_cornell_vs_shipped_spp_grid(cornell_scene, shipped_spp, our_spp,
                                     seed):
    """Two MORE anchor points on the reference's published result grid
    (result/cornell-box-SPP{2,50}.png are intact, unlike SPP100/256; see the
    module doc) beyond the SPP25 anchor above.  Shipped images embed the REAL
    cherry-wood texture (ours is the synthetic stand-in) and SPP2 is noisy,
    hence the loose tolerances; block means are texture-dominated only on the
    table region so the global mean still anchors overall brightness."""
    ours, (ys, xs), blocks = _subsampled_blocks(
        cornell_scene, spp=our_spp, stride=16, block=8, seed=seed)
    shipped = _load_png(os.path.join(
        "/root/reference/result", f"cornell-box-SPP{shipped_spp}.png"))
    ss = shipped[::16, ::16]
    bo, bs = blocks(ours), blocks(ss)
    diff = np.abs(bo - bs)
    assert abs(ours.mean() - ss.mean()) < 0.03, (ours.mean(), ss.mean())
    assert diff.max() < (0.15 if shipped_spp <= 2 else 0.12), diff.max()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN, "ref-veach-mis-SPP32.png")),
    reason="veach golden not generated",
)
@pytest.mark.slow
def test_veach_matches_reference_binary(tmp_path_factory):
    d = tmp_path_factory.mktemp("veach_scene")
    for f in ("veach-mis.obj", "veach-mis.mtl", "veach-mis.camera"):
        shutil.copy(os.path.join(REF_SCENES, f), d)
    scene, _ = m.load_scene(str(d), "veach-mis")
    ours, (ys, xs), blocks = _subsampled_blocks(scene, spp=8, stride=20,
                                                block=9)
    gold = _load_png(os.path.join(GOLDEN, "ref-veach-mis-SPP32.png"))
    gs = gold[::20, ::20]
    bo, bg = blocks(ours), blocks(gs)
    diff = np.abs(bo - bg)
    assert abs(ours.mean() - gs.mean()) < 0.03, (ours.mean(), gs.mean())
    assert diff.mean() < 0.03, diff.mean()
    assert diff.max() < 0.12, diff.max()
