"""C++ fast parser (csrc/scene_loader.cpp) must be bit-identical to the
Python parser. Skipped when no g++ toolchain is available."""

import os
import shutil

import numpy as np
import pytest

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


@needs_gxx
def test_native_matches_python(box_scene_dir):
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.scene.loader import build_scene
    from montecarlopathtracing_tpu.scene.native import build_scene_native

    sn, mn = build_scene_native(box_scene_dir, "box", RenderOptions())
    sp, mp = build_scene(box_scene_dir, "box", RenderOptions())
    assert mn.num_faces == mp.num_faces
    assert mn.num_vertices == mp.num_vertices
    for field in ("v0", "v1", "v2", "n0", "uv0", "mat_id", "tri_valid",
                  "light_face_tri", "light_face_cum_area"):
        a, b = np.asarray(getattr(sn, field)), np.asarray(getattr(sp, field))
        assert np.array_equal(a, b), field


@needs_gxx
@pytest.mark.skipif(not os.path.isdir("/root/reference/scene"),
                    reason="reference scenes not mounted")
def test_native_matches_python_cornell():
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.scene.loader import build_scene
    from montecarlopathtracing_tpu.scene.native import build_scene_native

    sn, mn = build_scene_native("/root/reference/scene", "cornell-box", RenderOptions())
    sp, mp = build_scene("/root/reference/scene", "cornell-box", RenderOptions())
    assert mn.num_faces == mp.num_faces == 15056
    assert np.array_equal(np.asarray(sn.v0), np.asarray(sp.v0))
    assert np.array_equal(np.asarray(sn.mat_id), np.asarray(sp.mat_id))
