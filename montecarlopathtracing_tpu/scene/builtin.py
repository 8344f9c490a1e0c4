"""Built-in procedural test scenes (the reference ships cornell-box/veach-mis
assets; these are original, tiny, self-contained equivalents emitted as
OBJ/MTL/.camera text so demos/tests/CI exercise the real parsers without any
external assets)."""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from ..config import RenderOptions


def box_scene_text(light_radiance=(30.0, 30.0, 30.0), with_specular=False,
                   with_glass=False, with_texture=False, width=32, height=32):
    """A cornell-like box: 5 diffuse walls + area light; optional glossy floor
    panel, glass panel, and checker-textured back wall (``with_texture``
    references ``checker.png`` via map_Kd, exercising the reference's
    nearest-neighbor frac-wrap texel fetch, quirk #8).  Geometry stays inside
    the compat Morton bounds [-1, 4]. Returns (obj_text, mtl_text, camera_text)."""
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
    if with_glass:
        mtl += """newmtl Glass
Kd 0 0 0
Ks 0.9 0.9 0.9
Ns 1000
Ni 1.5
"""
    if with_texture:
        mtl += """newmtl Checker
Kd 1 1 1
Ks 0 0 0
Ns 1
Ni 1
map_Kd checker.png
"""

    verts = []
    uvs = []
    faces = []

    def add_quad(p, mtlname, uv=None):
        base = len(verts) + 1
        verts.extend(p)
        if uv is None:
            faces.append(((base, base + 1, base + 2), None, mtlname))
            faces.append(((base, base + 2, base + 3), None, mtlname))
        else:
            tbase = len(uvs) + 1
            uvs.extend(uv)
            faces.append(((base, base + 1, base + 2),
                          (tbase, tbase + 1, tbase + 2), mtlname))
            faces.append(((base, base + 2, base + 3),
                          (tbase, tbase + 2, tbase + 3), mtlname))

    add_quad([(0, 0, 0), (2, 0, 0), (2, 0, 2), (0, 0, 2)], "White")      # floor
    add_quad([(0, 2, 0), (0, 2, 2), (2, 2, 2), (2, 2, 0)], "White")      # ceiling
    add_quad([(0, 0, 0), (0, 2, 0), (2, 2, 0), (2, 0, 0)],
             "Checker" if with_texture else "White",
             uv=[(0, 0), (1, 0), (1, 1), (0, 1)] if with_texture else None)  # back
    add_quad([(0, 0, 0), (0, 0, 2), (0, 2, 2), (0, 2, 0)], "Red")        # left
    add_quad([(2, 0, 0), (2, 2, 0), (2, 2, 2), (2, 0, 2)], "Green")      # right
    add_quad([(0.7, 1.98, 0.7), (1.3, 1.98, 0.7), (1.3, 1.98, 1.3), (0.7, 1.98, 1.3)], "Light")
    if with_specular:
        add_quad([(0.4, 0.01, 0.4), (1.6, 0.01, 0.4), (1.6, 0.01, 1.6), (0.4, 0.01, 1.6)], "Mirror")
    if with_glass:
        add_quad([(0.5, 0.4, 1.7), (1.5, 0.4, 1.7), (1.5, 1.4, 1.7), (0.5, 1.4, 1.7)], "Glass")

    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in verts]
    lines += [f"vt {t[0]} {t[1]}" for t in uvs]
    cur = None
    for tri, tuv, mtlname in faces:
        if mtlname != cur:
            lines.append(f"usemtl {mtlname}")
            cur = mtlname
        if tuv is None:
            lines.append("f {0} {1} {2}".format(*tri))
        else:
            lines.append("f {0}/{3} {1}/{4} {2}/{5}".format(*tri, *tuv))
    obj = "\n".join(lines) + "\n"

    cam = (
        f"eye 1 1 4.5\nlookat 1 1 0\nup 0 1 0\nfovy 39\n"
        f"width {width}\nheight {height}\n"
        f"mtlname Light {light_radiance[0]} {light_radiance[1]} {light_radiance[2]}\n"
    )
    return obj, mtl, cam


def write_box_scene(directory: str, name: str = "box", **kw) -> str:
    obj, mtl, cam = box_scene_text(**kw)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, name + ".obj"), "w") as f:
        f.write(obj)
    with open(os.path.join(directory, name + ".mtl"), "w") as f:
        f.write(mtl)
    with open(os.path.join(directory, name + ".camera"), "w") as f:
        f.write(cam)
    if kw.get("with_texture"):
        import numpy as np
        from PIL import Image

        # 8x8 red/blue checkerboard (distinct channels so tests can assert
        # which texel a uv hit).
        yy, xx = np.mgrid[0:8, 0:8]
        check = ((yy + xx) % 2).astype(np.uint8)
        img = np.zeros((8, 8, 3), np.uint8)
        img[..., 0] = np.where(check == 0, 255, 16)
        img[..., 2] = np.where(check == 1, 255, 16)
        Image.fromarray(img).save(os.path.join(directory, "checker.png"))
    return directory


def load_builtin_box(options: Optional[RenderOptions] = None, name: str = "box", **kw):
    """Build the box scene in a temp dir and load it. Returns (scene, meta)."""
    from .loader import build_scene

    with tempfile.TemporaryDirectory() as d:
        write_box_scene(d, name, **kw)
        return build_scene(d, name, options or RenderOptions())
