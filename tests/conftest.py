"""Test harness config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4.4). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin (axon) ignores JAX_PLATFORMS; force via config.
jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/scene"


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: tests marked ``slow`` (the widest oracle/golden/
    multi-process anchors, ~8 extra minutes) run only with MCPT_SLOW=1 or an
    explicit ``-m slow``.  The default tier keeps a faster variant of every
    covered behavior and stays under ~6-7 minutes (round-2 VERDICT weak #7)."""
    if os.environ.get("MCPT_SLOW") == "1" or "slow" in (
        config.getoption("markexpr", "") or ""
    ):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set MCPT_SLOW=1 (or -m slow) for the full anchors")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def make_box_scene(spp_light=(30.0, 30.0, 30.0), with_specular=False):
    """A tiny cornell-like box built inline: 5 diffuse walls, one area light.

    Written as OBJ/MTL/camera text so it exercises the real parsers.
    """
    mtl = """newmtl White
Kd 0.75 0.75 0.75
Ks 0 0 0
Ns 1
Ni 1
newmtl Red
Kd 0.63 0.065 0.05
Ks 0 0 0
Ns 1
Ni 1
newmtl Green
Kd 0.14 0.45 0.091
Ks 0 0 0
Ns 1
Ni 1
newmtl Light
Kd 0 0 0
Ks 0 0 0
Ns 1
Ni 1
"""
    if with_specular:
        mtl += """newmtl Mirror
Kd 0.05 0.05 0.05
Ks 0.9 0.9 0.9
Ns 500
Ni 1
"""
    # Box [0,2]^3 open at +z; camera looks down -z... keep inside [-1,4] so the
    # compat Morton bounds hold.
    def quad(a, b, c, d):
        return [(a, b, c), (a, c, d)]

    verts = []
    faces = []  # (tri, mtl)

    def add_quad(p, mtlname):
        base = len(verts) + 1
        verts.extend(p)
        faces.append(((base, base + 1, base + 2), mtlname))
        faces.append(((base, base + 2, base + 3), mtlname))

    # floor y=0 (normal +y)
    add_quad([(0, 0, 0), (2, 0, 0), (2, 0, 2), (0, 0, 2)], "White")
    # ceiling y=2
    add_quad([(0, 2, 0), (0, 2, 2), (2, 2, 2), (2, 2, 0)], "White")
    # back wall z=0
    add_quad([(0, 0, 0), (0, 2, 0), (2, 2, 0), (2, 0, 0)], "White")
    # left x=0
    add_quad([(0, 0, 0), (0, 0, 2), (0, 2, 2), (0, 2, 0)], "Red")
    # right x=2
    add_quad([(2, 0, 0), (2, 2, 0), (2, 2, 2), (2, 0, 2)], "Green")
    # light patch just under ceiling
    add_quad([(0.7, 1.98, 0.7), (1.3, 1.98, 0.7), (1.3, 1.98, 1.3), (0.7, 1.98, 1.3)], "Light")
    if with_specular:
        add_quad([(0.4, 0.01, 0.4), (1.6, 0.01, 0.4), (1.6, 0.01, 1.6), (0.4, 0.01, 1.6)], "Mirror")

    lines = []
    for v in verts:
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    cur = None
    for (tri, mtlname) in faces:
        if mtlname != cur:
            lines.append(f"usemtl {mtlname}")
            cur = mtlname
        lines.append("f {0} {1} {2}".format(*tri))
    obj = "\n".join(lines) + "\n"

    cam = f"""eye 1 1 4.5
lookat 1 1 0
up 0 1 0
fovy 39
width 32
height 32
mtlname Light {spp_light[0]} {spp_light[1]} {spp_light[2]}
"""
    return obj, mtl, cam


@pytest.fixture(scope="session")
def box_scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scenes")
    obj, mtl, cam = make_box_scene()
    (d / "box.obj").write_text(obj)
    (d / "box.mtl").write_text(mtl)
    (d / "box.camera").write_text(cam)
    obj, mtl, cam = make_box_scene(with_specular=True)
    (d / "boxspec.obj").write_text(obj)
    (d / "boxspec.mtl").write_text(mtl)
    (d / "boxspec.camera").write_text(cam)
    return str(d)


@pytest.fixture(scope="session")
def box_scene(box_scene_dir):
    import montecarlopathtracing_tpu as m

    scene, meta = m.load_scene(box_scene_dir, "box", use_native=False)
    return scene, meta


@pytest.fixture(scope="session")
def box_bvh(box_scene):
    import jax
    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh

    scene, _ = box_scene
    return jax.jit(build_lbvh)(scene)


def random_rays(n, seed=0, origin_box=((0.2, 0.2, 0.2), (1.8, 1.8, 1.8))):
    rng = np.random.default_rng(seed)
    lo, hi = np.array(origin_box[0]), np.array(origin_box[1])
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d
