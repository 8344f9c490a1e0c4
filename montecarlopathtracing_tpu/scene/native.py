"""ctypes binding to the C++ fast scene parser (csrc/scene_loader.cpp).

The reference's entire runtime is native C++; here the host-side hot loop —
OBJ tokenization over hundreds of thousands of lines — is the piece that
benefits from native code (device-side compute is XLA/Pallas).  The library is
compiled on first use with g++ and cached under ``csrc/build/``; if the
toolchain is unavailable the pure-Python parser (scene/loader.py) is used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_library() -> str:
    src = os.path.join(_CSRC, "scene_loader.cpp")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    build_dir = os.path.join(_CSRC, "build")
    os.makedirs(build_dir, exist_ok=True)
    lib_path = os.path.join(build_dir, "libsceneloader.so")
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
        return lib_path
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", lib_path]
    subprocess.run(cmd, check=True, capture_output=True)
    return lib_path


def _get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_library())
            lib.mcpt_parse_obj.restype = ctypes.c_void_p
            lib.mcpt_parse_obj.argtypes = [ctypes.c_char_p]
            lib.mcpt_result_counts.restype = None
            lib.mcpt_result_counts.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_long)]
            lib.mcpt_result_copy.restype = None
            lib.mcpt_result_copy.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_double),  # v
                ctypes.POINTER(ctypes.c_double),  # vn
                ctypes.POINTER(ctypes.c_double),  # vt
                ctypes.POINTER(ctypes.c_long),    # f_v
                ctypes.POINTER(ctypes.c_long),    # f_vt
                ctypes.POINTER(ctypes.c_long),    # f_vn
                ctypes.POINTER(ctypes.c_long),    # f_mat_slot (index into usemtl order)
            ]
            lib.mcpt_result_material_names.restype = ctypes.c_char_p
            lib.mcpt_result_material_names.argtypes = [ctypes.c_void_p]
            lib.mcpt_result_free.restype = None
            lib.mcpt_result_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def parse_obj_native(path: str, material_index):
    """Drop-in replacement for scene.loader.parse_obj using the C++ parser."""
    lib = _get_lib()
    handle = lib.mcpt_parse_obj(path.encode())
    if not handle:
        raise RuntimeError(f"native parser failed on {path}")
    try:
        counts = (ctypes.c_long * 5)()
        lib.mcpt_result_counts(handle, counts)
        nv, nvn, nvt, nf, _nm = (int(c) for c in counts)
        v = np.empty((nv, 3), np.float64)
        vn = np.empty((max(nvn, 1), 3), np.float64)
        vt = np.empty((max(nvt, 1), 2), np.float64)
        f_v = np.empty((nf, 3), np.int64)
        f_vt = np.empty((nf, 3), np.int64)
        f_vn = np.empty((nf, 3), np.int64)
        f_slot = np.empty(nf, np.int64)

        def p(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        lib.mcpt_result_copy(handle, p(v, ctypes.c_double), p(vn, ctypes.c_double),
                             p(vt, ctypes.c_double), p(f_v, ctypes.c_long),
                             p(f_vt, ctypes.c_long), p(f_vn, ctypes.c_long),
                             p(f_slot, ctypes.c_long))
        names = lib.mcpt_result_material_names(handle).decode()
        usemtl_names = names.split("\n") if names else []
    finally:
        lib.mcpt_result_free(handle)

    # Map usemtl slot -> material table index (unknown names -> 0, like loader).
    slot_to_mat = np.array(
        [material_index.get(n, 0) for n in usemtl_names] or [0], np.int64
    )
    f_mat = slot_to_mat[np.clip(f_slot, 0, len(slot_to_mat) - 1)]
    if nvn == 0:
        vn = np.zeros((0, 3), np.float64)
    if nvt == 0:
        vt = np.zeros((0, 2), np.float64)
    return v, vn, vt, f_v, f_vt, f_vn, f_mat


def build_scene_native(scene_dir: str, name: str, options):
    """build_scene with the OBJ stage parsed natively; MTL/.camera stay in
    Python (tiny files)."""
    from .loader import build_scene, parse_camera, parse_mtl

    base = os.path.join(scene_dir, name)
    materials = parse_mtl(base + ".mtl")
    mat_index = {m.name: i for i, m in enumerate(materials)}
    obj = parse_obj_native(base + ".obj", mat_index)
    cam, light_list = parse_camera(base + ".camera")
    return build_scene(scene_dir, name, options,
                       parsed=(materials, mat_index, obj, cam, light_list))
