"""Device-side scene representation.

The reference stores scenes as an AoS of denormalized ``Face`` structs with
per-face copies of all vertex data plus string material names resolved through
``std::map`` lookups at shade time (``MTPC/sceneManagement.h:109-163``,
``MTPC/pathTracing.cpp:71,141-147``).  On TPU that becomes a set of SoA
``jnp`` arrays (one flat array per attribute) with integer material ids, all
replicated per chip, so every per-lane access is a vectorized gather.

Triangle arrays are padded to a power of two: the padding triangles are
degenerate (all vertices at +inf, material id 0, emission 0) so they can never
produce a valid hit, and the padded leaf count makes the LBVH a *perfect*
implicit heap — the TPU-native replacement for the reference's virtual-node
compaction (``MTPC/BVH.cpp:99-104``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraArrays:
    """Pinhole camera (``.camera`` file; parser ``MTPC/sceneManagement.cpp:191-262``).

    Numeric fields are arrays so they can be differentiated / donated; the film
    resolution is static metadata (it fixes array shapes under jit).
    """

    eye: Any  # (3,) f32
    look_at: Any  # (3,) f32
    up: Any  # (3,) f32
    fovy: Any  # () f32, degrees
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneArrays:
    """SoA scene pytree. T = padded triangle count (power of two), M = materials,
    L = lights, F = max faces per light."""

    # Triangles (Morton-sorted; see ops/morton.py). Padding rows are +inf.
    v0: Any  # (T,3) f32 vertex positions
    v1: Any
    v2: Any
    n0: Any  # (T,3) f32 per-corner shading normals
    n1: Any
    n2: Any
    uv0: Any  # (T,2) f32 texture coords
    uv1: Any
    uv2: Any
    geom_n: Any  # (T,3) f32 unit geometric normal, (v0-v1)x(v2-v0) like calNorm
    mat_id: Any  # (T,) i32; padding = 0 but valid=False
    tri_valid: Any  # (T,) bool — False for padding rows

    # Materials (MTL table; parser MTPC/sceneManagement.cpp:17-74).
    kd: Any  # (M,3)
    ks: Any  # (M,3)
    ns: Any  # (M,) Phong exponent
    ni: Any  # (M,) index of refraction
    emission: Any  # (M,3) radiance if emitter else 0
    is_emitter: Any  # (M,) bool
    has_texture: Any  # (M,) bool
    tex_offset: Any  # (M,) i32 into atlas
    tex_h: Any  # (M,) i32
    tex_w: Any  # (M,) i32

    # Texture atlas, flattened row-major per material: (sum(h*w), 3) f32 RGB.
    # Untextured scenes carry shape (0, 3) — the empty shape is the static
    # no-texture signal for the integrator and oracle.
    atlas: Any

    # Lights (.camera `mtlname` lines + per-material face lists,
    # MTPC/sceneManagement.cpp:241-258 and :182).
    light_mat: Any  # (L,) i32 material id of each light
    light_radiance: Any  # (L,3)
    light_face_tri: Any  # (L,F) i32 tri index per light face (padded w/ last; all -1 for a zero-face light)
    light_face_cum_area: Any  # (L,F) cumulative face areas; pad rows = total
    light_total_area: Any  # (L,)

    camera: CameraArrays

    @property
    def num_tris_padded(self) -> int:
        return self.v0.shape[0]

    @property
    def num_materials(self) -> int:
        return self.kd.shape[0]

    @property
    def num_lights(self) -> int:
        return self.light_mat.shape[0]


@dataclasses.dataclass
class SceneMeta:
    """Host-side, non-traced metadata kept next to a SceneArrays."""

    name: str
    material_names: list
    light_names: list
    num_vertices: int
    num_faces: int  # un-padded triangle count
    obj_path: str = ""


def pad_pow2(n: int) -> int:
    """Smallest power of two >= n (leaf-slot count, MTPC/BVH.cpp:47)."""
    return 1 if n <= 1 else int(2 ** int(np.ceil(np.log2(n))))
