"""Parser unit tests (SURVEY.md §4.1): counts vs the reference scene files,
material/light tables, per-light CDFs."""

import os

import numpy as np
import pytest

from montecarlopathtracing_tpu.scene.loader import (
    build_scene, parse_camera, parse_mtl, parse_obj, triangle_areas,
)
from montecarlopathtracing_tpu.config import RenderOptions
from tests.conftest import REFERENCE_SCENES

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SCENES), reason="reference scenes not mounted"
)


def test_box_scene_counts(box_scene):
    scene, meta = box_scene
    # 6 quads = 12 tris, 24 verts
    assert meta.num_faces == 12
    assert meta.num_vertices == 24
    assert scene.num_tris_padded == 16  # next pow2
    assert scene.num_materials == 4
    assert scene.num_lights == 1
    assert int(np.asarray(scene.tri_valid).sum()) == 12


def test_box_light_tables(box_scene):
    scene, meta = box_scene
    li_mat = int(np.asarray(scene.light_mat)[0])
    assert meta.material_names[li_mat] == "Light"
    assert np.allclose(np.asarray(scene.light_radiance)[0], [30, 30, 30])
    assert bool(np.asarray(scene.is_emitter)[li_mat])
    assert np.allclose(np.asarray(scene.emission)[li_mat], [30, 30, 30])
    # light is a 0.6x0.6 quad -> area 0.36
    assert np.isclose(float(np.asarray(scene.light_total_area)[0]), 0.36, rtol=1e-5)
    cum = np.asarray(scene.light_face_cum_area)[0]
    assert np.all(np.diff(cum) >= -1e-7)
    assert np.isclose(cum[-1], 0.36, rtol=1e-5)
    # light face tri ids all point at Light-material triangles
    tris = np.asarray(scene.light_face_tri)[0]
    assert np.all(np.asarray(scene.mat_id)[tris] == li_mat)


def test_geom_normal_matches_calnorm(box_scene):
    """geom_n = normalize((v0-v1) x (v2-v0)) (Face::calNorm,
    MTPC/sceneManagement.cpp:408-412)."""
    scene, meta = box_scene
    v0 = np.asarray(scene.v0)[:12]
    v1 = np.asarray(scene.v1)[:12]
    v2 = np.asarray(scene.v2)[:12]
    n = np.cross(v0 - v1, v2 - v0)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    assert np.allclose(np.asarray(scene.geom_n)[:12], n, atol=1e-6)


def test_morton_sorted(box_scene):
    from montecarlopathtracing_tpu.scene.loader import morton_codes_np

    scene, _ = box_scene
    c = (np.asarray(scene.v0) + np.asarray(scene.v1) + np.asarray(scene.v2))[:12] / 3
    codes = morton_codes_np(c)
    assert np.all(codes[:-1] <= codes[1:])


def test_triangle_area_formula():
    p0 = np.array([[0, 0, 0.0]])
    p1 = np.array([[1, 0, 0.0]])
    p2 = np.array([[0, 1, 0.0]])
    assert np.isclose(triangle_areas(p0, p1, p2)[0], 0.5)


def test_negative_and_missing_indices(tmp_path):
    (tmp_path / "s.mtl").write_text("newmtl A\nKd 1 0 0\nKs 0 0 0\nNs 1\nNi 1\n")
    (tmp_path / "s.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl A\nf -3 -2 -1\n"
    )
    (tmp_path / "s.camera").write_text(
        "eye 0 0 2\nlookat 0 0 0\nup 0 1 0\nfovy 45\nwidth 8\nheight 8\n"
    )
    scene, meta = build_scene(str(tmp_path), "s", RenderOptions())
    assert meta.num_faces == 1
    # missing vn falls back to geometric normal
    assert np.allclose(np.asarray(scene.n0)[0], np.asarray(scene.geom_n)[0])


def test_quad_fan_triangulation(tmp_path):
    (tmp_path / "q.mtl").write_text("newmtl A\nKd 1 1 1\nKs 0 0 0\nNs 1\nNi 1\n")
    (tmp_path / "q.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nusemtl A\nf 1 2 3 4\n"
    )
    (tmp_path / "q.camera").write_text("eye 0 0 2\nlookat 0 0 0\nup 0 1 0\nfovy 45\nwidth 8\nheight 8\n")
    scene, meta = build_scene(str(tmp_path), "q", RenderOptions())
    assert meta.num_faces == 2


@needs_reference
def test_cornell_box_counts():
    """Counts verified against the reference scene (SURVEY.md §4.1)."""
    mats = parse_mtl(os.path.join(REFERENCE_SCENES, "cornell-box.mtl"))
    idx = {m.name: i for i, m in enumerate(mats)}
    vs, vns, vts, f_v, f_vt, f_vn, f_mat = parse_obj(
        os.path.join(REFERENCE_SCENES, "cornell-box.obj"), idx
    )
    assert len(vs) == 11912
    assert len(f_mat) == 15056
    cam, lights = parse_camera(os.path.join(REFERENCE_SCENES, "cornell-box.camera"))
    assert cam["width"] == 1024 and cam["height"] == 1024
    assert np.isclose(cam["fovy"], 19.5)
    assert lights == [("Light", (50.0, 50.0, 50.0))]


@needs_reference
def test_veach_mis_counts():
    mats = parse_mtl(os.path.join(REFERENCE_SCENES, "veach-mis.mtl"))
    idx = {m.name: i for i, m in enumerate(mats)}
    vs, _, _, _, _, _, f_mat = parse_obj(
        os.path.join(REFERENCE_SCENES, "veach-mis.obj"), idx
    )
    assert len(vs) == 2506
    assert len(f_mat) == 3812
    cam, lights = parse_camera(os.path.join(REFERENCE_SCENES, "veach-mis.camera"))
    assert cam["width"] == 1200 and cam["height"] == 900
    assert len(lights) == 5


def test_zero_face_light_row_is_minus_one(tmp_path):
    """A camera-file light whose material no face uses gets a -1-padded
    light_face_tri row, so the membership visibility test (wavefront.
    _nee_resolve) can never count a real triangle as one of its faces."""
    import montecarlopathtracing_tpu as m
    from tests.conftest import make_box_scene

    obj, mtl, cam = make_box_scene()
    mtl += "newmtl Ghost\nKd 0 0 0\nKs 0 0 0\nNs 1\nNi 1\n"
    cam += "mtlname Ghost 5 5 5\n"
    (tmp_path / "ghost.obj").write_text(obj)
    (tmp_path / "ghost.mtl").write_text(mtl)
    (tmp_path / "ghost.camera").write_text(cam)
    scene, meta = m.load_scene(str(tmp_path), "ghost", use_native=False)
    assert scene.num_lights == 2
    lf = np.asarray(scene.light_face_tri)
    # Real light row: valid triangle ids of the Light material.
    li_mat = int(np.asarray(scene.light_mat)[0])
    assert np.all(np.asarray(scene.mat_id)[lf[0]] == li_mat)
    # Ghost row: all -1.
    assert np.all(lf[1] == -1)


def test_zero_face_light_membership_visibility(tmp_path):
    """Shadow ray hitting triangle 0 with smat == the ghost light's material
    must be INVISIBLE (an all-zero row would falsely match triangle 0)."""
    import jax.numpy as jnp
    import montecarlopathtracing_tpu as m
    from montecarlopathtracing_tpu.integrator.wavefront import _nee_resolve
    from tests.conftest import make_box_scene

    obj, mtl, cam = make_box_scene()
    mtl += "newmtl Ghost\nKd 0 0 0\nKs 0 0 0\nNs 1\nNi 1\n"
    cam += "mtlname Ghost 5 5 5\n"
    (tmp_path / "ghost.obj").write_text(obj)
    (tmp_path / "ghost.mtl").write_text(mtl)
    (tmp_path / "ghost.camera").write_text(cam)
    scene, _ = m.load_scene(str(tmp_path), "ghost", use_native=False)
    opts = RenderOptions(spp=1)
    ghost_mat = int(np.asarray(scene.light_mat)[1])
    l, r = 2, 4
    contrib = jnp.ones((l, r, 3), jnp.float32)
    ok = jnp.ones((l, r), bool)
    dist = jnp.ones((l, r), jnp.float32)
    # Every shadow ray hits triangle 0 and claims the ghost material.
    smat = jnp.full((l, r), ghost_mat, jnp.int32)
    hit_s = jnp.ones((l, r), bool)
    t_s = jnp.full((l, r), 0.5, jnp.float32)
    tri_s = jnp.zeros((l, r), jnp.int32)
    out = np.asarray(_nee_resolve(scene, opts, contrib, ok, dist, smat,
                                  hit_s, t_s, tri_s))
    assert np.all(out == 0.0)


def test_scene_extent_guard(tmp_path):
    """Geometry beyond the 5e8 parked-ray threshold must be rejected at load
    (kernels/cluster.py park-at-1e9 contract)."""
    import montecarlopathtracing_tpu as m
    from tests.conftest import make_box_scene

    obj, mtl, cam = make_box_scene()
    # 24 verts in the box scene; absolute indices for the far triangle.
    obj += "v 2e8 0 0\nv 2e8 1 0\nv 2e8 0 1\nusemtl White\nf 25 26 27\n"
    (tmp_path / "far.obj").write_text(obj)
    (tmp_path / "far.mtl").write_text(mtl)
    (tmp_path / "far.camera").write_text(cam)
    with pytest.raises(ValueError, match="extent"):
        m.load_scene(str(tmp_path), "far", use_native=False)
