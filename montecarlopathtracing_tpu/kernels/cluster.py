"""Cluster-culled nearest-hit intersector — the TPU-shaped replacement for the
reference's recursive BVH walk (``bvh_intersect``, ``MTPC/pathTracing.cpp:334-374``).

A per-ray pointer walk is the wrong shape for a lockstep vector machine: every
step is a data-dependent gather the VPU serializes (measured ~1e4 rays/s on
v5e).  This module restructures the same pruning idea into two phases that are
each dense vector math:

1. **Candidate phase (pure XLA).**  The Morton sort (``ops/morton.py``) makes
   any ``width`` consecutive triangles spatially coherent, so the triangle
   array is cut into ``C = T/width`` contiguous *clusters* — a fixed BVH level,
   but addressable by plain slicing.  For every tile of ``tile`` coherent rays
   we slab-test all cluster AABBs densely — an (R, C) broadcast, pure VPU — and
   emit, per tile, a front-to-back *candidate list* of the clusters any of its
   rays touch.

2. **Test phase (Pallas).**  One grid step per ray tile: the tile's rays sit
   in VMEM registers, the candidate list sits in SMEM where it can steer
   control flow, and a ``fori_loop`` over just the hit clusters dynamically
   slices that cluster's triangle block from a VMEM-resident constant table
   and runs a dense (tile × width) intersection test.  Skipped clusters cost
   nothing — the loop never visits them.

The triangle test itself is the reference's plane + edge-sign-product accept
(``MTPC/sceneManagement.cpp:316-338``) refactored around per-triangle
constants so the inner loop is pure broadcast FMA with zero cross products:

    t   = (n.v0 - n.o) / (n.d)
    c_i = o.m_i + t * (d.m_i) - k_i          m_i = n x e_i,  k_i = vert_i . m_i
    hit = signs of c_1, c_2, c_3 agree       (same accept set, since
                                              cross(e, q).n == q.(n x e))

Large triangles are segregated into their own leading clusters at scene load
(scene/loader.py) so Morton ranges don't inherit near-scene-sized bounding
boxes; a best-t early exit was measured net-negative on v5e (the per-candidate
vector->scalar max sync outweighs the skipped work in closed scenes), so the
test loop is a plain counted fori with an order-independent lexicographic
(t, triangle id) best-hit update.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = jnp.float32(1e30)

_BRANCHLESS = False
# Kernel A/B probe switch (tools/probe_kernel.py): read once at trace time,
# so set it before the first jit of a fresh process.  "" = production.
_KVAR = os.environ.get("MCPT_KVAR", "")

# Row layout of the per-triangle constant table (16 rows per cluster block),
# compat (plane + edge-sign) variant.
_R_N = 0      # rows 0..2   geometric normal n
_R_KN = 3     # row  3      n . v0
_R_M1 = 4     # rows 4..6   m1 = n x (v1 - v0)
_R_K1 = 7     # row  7      v0 . m1
_R_M2 = 8     # rows 8..10  m2 = n x (v2 - v1)
_R_K2 = 11    # row 11      v1 . m2
_R_M3 = 12    # rows 12..14 m3 = n x (v0 - v2)
_R_K3 = 15    # row 15      v2 . m3

# Moller-Trumbore variant (modern mode, ops.intersect.ray_triangle_mt
# semantics).  The MT quantities are bilinear in (origin, direction), so with
# one per-ray precomputed w = o x d they reduce to the same dense
# constants-panel FMA form as the compat test:
#     det      = -d . n_raw                      (n_raw = e1 x e2, unnormalized)
#     t * det  = o . n_raw - kn                  (kn = v0 . n_raw)
#     u * det  =  w . e2 + d . k_u               (k_u = v0 x e2)
#     v * det  = -w . e1 + d . k_v               (k_v = e1 x v0)
# accept: u >= 0, v >= 0, u + v <= 1, decided by sign products with det so no
# extra divisions are needed (t still takes the one division, like compat).
_M_N = 0      # rows 0..2   n_raw = e1 x e2
_M_KN = 3     # row  3      v0 . n_raw
_M_E1 = 4     # rows 4..6   e1 = v1 - v0
_M_E2 = 7     # rows 7..9   e2 = v2 - v0
_M_KU = 10    # rows 10..12 k_u = v0 x e2
_M_KV = 13    # rows 13..15 k_v = e1 x v0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterAccel:
    """Precomputed intersection tables (device arrays).

    tconst: (C, 16, width) f32 — per-cluster triangle constant blocks
            (rows per the _R_* layout; padding triangles zeroed => never hit).
    cmin/cmax: (C, 3) f32 cluster AABBs (padding-only clusters inverted-empty).
    """

    tconst: Any
    cmin: Any
    cmax: Any

    @property
    def num_clusters(self) -> int:
        return self.tconst.shape[0]

    @property
    def width(self) -> int:
        return self.tconst.shape[2]


def build_cluster_accel(scene, width: int = 128, mt: bool = False) -> ClusterAccel:
    """Derive the constant tables from a (Morton-sorted) SceneArrays. Jittable.

    ``mt=False`` builds the compat plane+sign constants (_R_* layout);
    ``mt=True`` the Moller-Trumbore constants (_M_* layout) for modern mode
    (compat.plane_sign_triangle_test=False).
    """
    t = scene.num_tris_padded
    width = min(width, t)
    valid = scene.tri_valid[:, None]
    v0 = jnp.where(valid, scene.v0, 0.0)
    v1 = jnp.where(valid, scene.v1, 0.0)
    v2 = jnp.where(valid, scene.v2, 0.0)

    if mt:
        e1 = v1 - v0
        e2 = v2 - v0
        n = jnp.cross(e1, e2)
        # Padding triangles (all-zero verts) give n = 0 => det = 0 => t = inf:
        # never hit, like the compat table's zeroed rows.
        ku = jnp.cross(v0, e2)
        kv = jnp.cross(e1, v0)
        rows = jnp.stack(
            [
                n[:, 0], n[:, 1], n[:, 2], jnp.sum(v0 * n, axis=-1),
                e1[:, 0], e1[:, 1], e1[:, 2],
                e2[:, 0], e2[:, 1], e2[:, 2],
                ku[:, 0], ku[:, 1], ku[:, 2],
                kv[:, 0], kv[:, 1], kv[:, 2],
            ],
            axis=0,
        )  # (16, T)
    else:
        n = jnp.where(valid, scene.geom_n, 0.0)
        m1 = jnp.cross(n, v1 - v0)
        m2 = jnp.cross(n, v2 - v1)
        m3 = jnp.cross(n, v0 - v2)
        rows = jnp.stack(
            [
                n[:, 0], n[:, 1], n[:, 2], jnp.sum(n * v0, axis=-1),
                m1[:, 0], m1[:, 1], m1[:, 2], jnp.sum(v0 * m1, axis=-1),
                m2[:, 0], m2[:, 1], m2[:, 2], jnp.sum(v1 * m2, axis=-1),
                m3[:, 0], m3[:, 1], m3[:, 2], jnp.sum(v2 * m3, axis=-1),
            ],
            axis=0,
        )  # (16, T)
    tconst = rows.reshape(16, t // width, width).transpose(1, 0, 2)

    vmin = jnp.where(valid, jnp.minimum(jnp.minimum(scene.v0, scene.v1), scene.v2), BIG)
    vmax = jnp.where(valid, jnp.maximum(jnp.maximum(scene.v0, scene.v1), scene.v2), -BIG)
    cmin = jnp.min(vmin.reshape(-1, width, 3), axis=1)
    cmax = jnp.max(vmax.reshape(-1, width, 3), axis=1)
    return ClusterAccel(tconst=tconst, cmin=cmin, cmax=cmax)


def _key_kernel(flags_ref, rays_ref, caabb_ref, key_ref, *, tile: int,
                mega: int):
    """Per-(ray subtile, cluster) slab keys, reduced over each subtile in VMEM.

    One grid step covers ``mega`` subtiles of ``tile`` rays (amortizing the
    per-step pipeline overhead, which dominates at small step sizes).

    flags: SMEM (1, mega+1) i32 — slot 0: 1 = EVERY subtile of this step is
    parked (whole-step skip: the wavefront sort leaves parked lanes
    contiguous at the tail, so most parked subtiles live in wholly-parked
    steps and one branch replaces ``mega`` scalar-loop iterations); slots
    1..mega: 1 = every ray in that subtile is parked (computed in XLA from
    the ray origins).  rays: (mega*tile, 8) VMEM block; caabb: (8, C) VMEM
    rows [minx miny minz maxx maxy maxz 0 0]; key out: (1, mega, C) — min
    over each subtile's rays of the clamped slab entry distance, 1e30 where
    no ray hits the cluster.
    """
    step_parked = flags_ref[0, 0, 0] == 1

    @pl.when(step_parked)
    def _():
        key_ref[0, :, :] = jnp.full(
            (mega, key_ref.shape[2]), 1e30, jnp.float32)

    def subtile(s, _):
        # All-parked subtiles (inactive lanes, primary-reuse lanes, unlit
        # shadow rays — origin 1e9) skip the slab math: 30-50% of subtiles
        # at spp >= 4 compat renders.  The flag must be ALL-parked (not
        # first-ray-parked): parked shadow rays are scattered through the
        # shadow half, not contiguous.
        parked = flags_ref[0, 0, s + 1] == 1

        @pl.when(parked)
        def _():
            key_ref[0, pl.ds(s, 1), :] = jnp.full(
                (1, key_ref.shape[2]), 1e30, jnp.float32)

        @pl.when(jnp.logical_not(parked))
        def _():
            sub = rays_ref[pl.ds(s * tile, tile), :]
            ox, oy, oz = sub[:, 0:1], sub[:, 1:2], sub[:, 2:3]
            ix = 1.0 / sub[:, 3:4]
            iy = 1.0 / sub[:, 4:5]
            iz = 1.0 / sub[:, 5:6]

            def axis(lo_row, hi_row, o, inv):
                lo = caabb_ref[lo_row:lo_row + 1, :]  # (1, C)
                hi = caabb_ref[hi_row:hi_row + 1, :]
                near = jnp.where(inv < 0, hi, lo)  # (tile, C)
                far = jnp.where(inv < 0, lo, hi)
                tn = (near - o) * inv
                tf = (far - o) * inv
                # 0 * inf (zero direction component, origin exactly on the
                # slab plane) yields NaN; resolve it conservatively as an
                # open axis — candidates may only be ADDED by this, never
                # lost.
                tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
                tf = jnp.where(jnp.isnan(tf), jnp.inf, tf)
                return tn, tf

            nx, fx = axis(0, 3, ox, ix)
            ny, fy = axis(1, 4, oy, iy)
            nz, fz = axis(2, 5, oz, iz)
            enter = jnp.maximum(jnp.maximum(nx, ny), nz)
            exit_ = jnp.minimum(jnp.minimum(fx, fy), fz)
            hit = (enter <= exit_) & (exit_ >= 0)
            key = jnp.where(hit, jnp.maximum(enter, 0.0), 1e30)
            key_ref[0, pl.ds(s, 1), :] = jnp.min(key, axis=0, keepdims=True)

        return 0

    @pl.when(jnp.logical_not(step_parked))
    def _():
        jax.lax.fori_loop(0, mega, subtile, 0)


@functools.partial(jax.jit, static_argnames=("tile", "mega", "interpret"))
def _candidate_keys(rays, caabb, tile: int, mega: int, interpret: bool):
    n_steps = rays.shape[0] // (tile * mega)
    c = caabb.shape[1]
    # Per-subtile all-parked flags (cheap XLA segment-min over origin-x).
    # Threshold 5e8 vs the exact 1e9 park sentinel: halfway leaves slack for
    # any epsilon arithmetic on parked origins.  Scenes are guaranteed within
    # |x| <= 1e8 by the extent check in scene/loader.py, so a real ray origin
    # can never cross it.  Slot 0 of each row: the whole-step flag.
    sub_parked = (jnp.min(rays[:, 0].reshape(n_steps, mega, tile), axis=2)
                  > 5e8).astype(jnp.int32)
    step_parked = jnp.min(sub_parked, axis=1, keepdims=True)
    flags = jnp.concatenate([step_parked, sub_parked], axis=1
                            ).reshape(n_steps, 1, mega + 1)
    key = pl.pallas_call(
        functools.partial(_key_kernel, tile=tile, mega=mega),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, mega + 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile * mega, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mega, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, mega, c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(flags, rays, caabb)
    return key.reshape(-1, c)


def _ftb_order(key, c: int, group: int, mega: int):
    """Front-to-back candidate order from per-(subtile, cluster) entry keys,
    as ONE i32 sort: the non-negative f32 entry bitcasts order-preservingly
    to i32, its low ceil(log2(C)) mantissa bits are replaced by the cluster
    id, and the packed word is sorted.  Half the cost of the (f32, i32) pair
    sort it replaces (measured 0.53 ms vs ~0.26 ms per chunk-iteration at
    2048 subtiles x 1280 clusters).

    Exactness: candidate ORDER only needs to be approximately front-to-back
    (the deferred-best update is order-independent), and the group-boundary
    exit keys come out quantized DOWN (clearing low mantissa bits of a
    non-negative float rounds toward zero), which can only make the
    early-exit rule MORE conservative — never skip a panel whose true entry
    could beat a ray's best t."""
    idb = max(1, (c - 1).bit_length())
    mask = (1 << idb) - 1
    kbits = jax.lax.bitcast_convert_type(key, jnp.int32)
    iota = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), key.shape)
    packed = jnp.sort((kbits & ~mask) | iota, axis=1)
    order = packed & mask
    gq = jax.lax.bitcast_convert_type(packed & ~mask, jnp.float32)
    return order, gq[:, ::group].reshape(-1, mega, c // group)


def _candidates(rays, cmin, cmax, tile: int, mega: int, interpret: bool,
                ftb: bool = False, group: int = 1):
    """Candidate cluster lists per ray subtile.

    Default (``ftb=False``): ids ASCENDING — the non-deferred test kernel's
    within-group argmin then resolves equal-t ties to the lowest triangle
    index, exactly matching a full in-order scan.  (A best-t early exit over
    entry-sorted candidates was measured NET-NEGATIVE on cornell-class
    scenes: the per-candidate `max(best_t)` reduce is a vector->scalar sync
    that costs more than the ~5 candidate clusters it could skip.)

    ``ftb=True``: ids sorted FRONT-TO-BACK by the subtile's min slab-entry
    distance, plus a second (nSteps, mega, C/group) f32 array of each
    group-boundary candidate's entry key — the test kernel's early-exit
    while_loop stops once the next panel's entry exceeds every ray's current
    best t.  On large chunked scenes a bounce subtile's candidate union is
    ~100 clusters (the ray crosses the whole interior) and the hit is almost
    always in the first panel or two; tie-breaking stays exact because the
    stop rule is strict (entry > max best t) and the deferred-best update is
    order-independent.  Requires the deferred kernel.

    Returns (cand (nSteps, mega, C+8) i32 [count, 7 pad, ids...], gkeys or
    None).
    """
    c = cmin.shape[0]
    caabb = jnp.concatenate(
        [cmin.T, cmax.T, jnp.zeros((2, c), cmin.dtype)], axis=0
    )  # (8, C)
    key = _candidate_keys(rays, caabb, tile, mega, interpret)  # (nT, C)
    hit = key < BIG
    gkeys = None
    if ftb:
        order, gkeys = _ftb_order(key, c, group, mega)
    else:
        iota = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), key.shape)
        order = jnp.sort(jnp.where(hit, iota, iota + c), axis=1)
        # values < 2c, so "mod c" is one compare+subtract (per-lane integer
        # division is a slow multi-op VPU sequence — profiled at 0.6 ms/iter).
        order = jnp.where(order >= c, order - c, order)
    counts = jnp.sum(hit, axis=1, dtype=jnp.int32)[:, None]
    cand = jnp.concatenate(
        [counts, jnp.zeros((key.shape[0], 7), jnp.int32), order], axis=1
    ).reshape(-1, mega, c + 8)
    # Whole-step-empty flag in pad slot 1 of each step's row 0 (see
    # _intersect_kernel): one branch skips the whole mega loop.
    step_empty = (jnp.max(cand[:, :, 0], axis=1) == 0).astype(jnp.int32)
    return cand.at[:, 0, 1].set(step_empty), gkeys


def _intersect_kernel(cand_ref, *refs, width: int, tile: int, mega: int,
                      group: int, mt: bool = False, defer: bool = True,
                      ftb: bool = False):
    """One grid step = ``mega`` ray subtiles of ``tile`` rays.

    cand: SMEM (1, mega, C+8) i32 rows [count, 7 pad, cluster ids (C)] —
    pad slot 1 of row 0 holds the whole-step-empty flag (1 = every subtile's
    count is 0: fill both outputs with one branch instead of ``mega``
    scalar-loop iterations; the wavefront sort concentrates parked lanes so
    most empty subtiles live in wholly-empty steps);
    rays: VMEM (mega*tile, 8) packed [ox oy oz dx dy dz 0 0] (16 wide with
    w = o x d in cols 6..8 when ``mt``); tconst: VMEM
    (C, 16, width), resident across all grid steps.

    Outputs are LANE-MAJOR (mega, tile) blocks — subtile s writes row s as a
    (1, tile) vector — because a (tile, 1) column store touches tile/8 vregs
    at 1/128 lane utilization (minor-dim-1 layout) and the all-parked fill
    was ~25%% of the kernel's occupancy-independent floor.

    ``ftb=True`` (requires ``defer``): candidates arrive front-to-back and a
    second SMEM input gkeys (1, mega, C/group) carries each panel's first
    entry key; the candidate loop becomes a while_loop that stops once the
    next panel's entry strictly exceeds every ray's current best t (exact:
    a hit at t >= entry > best can neither win nor tie).

    Each loop iteration tests ``group`` candidate clusters at once: their
    constant blocks are concatenated into one (16, group*width) panel so the
    dense test runs at full VPU lane width while culling stays at the finer
    ``width`` granularity — the flop/cull sweet spot (width 32, group 4
    behaves like a 128-wide test with 4x tighter boxes).  Past-the-count ids
    in the final partial group are just non-hit clusters — testing them is
    redundant but correct.

    The best hit is tracked lexicographically on (t, triangle id); candidate
    ids ascend, so within-panel argmin ties and cross-panel updates both
    resolve to the lowest triangle index, exactly matching a full in-order
    scan (brute force / the reference's DFS, MTPC/pathTracing.cpp:355-361).

    ``defer=True`` (the measured-faster variant on v5e) keeps a per-COLUMN
    running lexicographic best (tile, group*width) across the candidate loop
    — pure elementwise compare/select per iteration — and reduces to the
    per-ray best ONCE after the loop; ``defer=False`` is the original
    min+argmin-per-iteration formulation (kept for A/B probing).  Both
    produce identical (t, tri): per column the running pair is the
    lexicographic min over that column's panels, and the final two
    reductions (min t, then min tri among t-ties) pick the same global
    winner an in-order scan would.
    """
    if ftb:
        gkeys_ref, rays_ref, tconst_ref, bt_ref, bi_ref = refs
    else:
        rays_ref, tconst_ref, bt_ref, bi_ref = refs

    step_empty = cand_ref[0, 0, 1] == 1

    @pl.when(step_empty)
    def _():
        bt_ref[:, :] = jnp.full((mega, tile), 1e30, jnp.float32)
        bi_ref[:, :] = jnp.full((mega, tile), -1, jnp.int32)

    def subtile(s, _):
        n = cand_ref[0, s, 0]

        if _BRANCHLESS:
            # n == 0 (parked / miss-everything subtiles) falls through the
            # general path with a 0-trip candidate fori: the final reductions
            # over the untouched 1e30 init panels produce (1e30, -1) — the
            # branch pair this replaces cost more scalar-unit time than the
            # constant vector reductions it saved (probe_kernel round 4).
            _subtile_tests(s, n)
        elif _KVAR == "nostore":
            # Diagnostic: parked subtiles write NOTHING (garbage outputs for
            # them) — isolates the fill-store cost from the scalar
            # loop/branch overhead in the all-parked floor.
            @pl.when(n > 0)
            def _():
                _subtile_tests(s, n)
        else:
            @pl.when(n == 0)
            def _():
                bt_ref[pl.ds(s, 1), :] = jnp.full(
                    (1, tile), 1e30, jnp.float32)
                bi_ref[pl.ds(s, 1), :] = jnp.full(
                    (1, tile), -1, jnp.int32)

            @pl.when(n > 0)
            def _():
                _subtile_tests(s, n)

        return 0

    def _subtile_tests(s, n):
        sub = rays_ref[pl.ds(s * tile, tile), :]
        ox, oy, oz = sub[:, 0:1], sub[:, 1:2], sub[:, 2:3]
        dx, dy, dz = sub[:, 3:4], sub[:, 4:5], sub[:, 5:6]
        if mt:
            wx, wy, wz = sub[:, 6:7], sub[:, 7:8], sub[:, 8:9]

        def panel(k, bt):
            """Shared candidate-panel test: returns (cids, tm) where tm is
            (tile, group*W) masked hit distances (1e30 = miss).  ``bt`` (the
            running per-ray best) only participates in the non-deferred
            formulation's mask."""
            cids = [cand_ref[0, s, 8 + k * group + g] for g in range(group)]
            if _KVAR == "dup":
                # Diagnostic: same FLOPs/assembly shape but all slices read
                # the FIRST candidate's block — isolates dynamic-slice
                # variety cost (produces wrong results; probe only).
                tc = jnp.concatenate([tconst_ref[cids[0]]] * group, axis=1)
            else:
                tc = jnp.concatenate([tconst_ref[c] for c in cids], axis=1)

            def dot(r, ax, ay, az):
                return ax * tc[r:r + 1] + ay * tc[r + 1:r + 2] + az * tc[r + 2:r + 3]

            if mt:
                det = -dot(_M_N, dx, dy, dz)
                o_n = dot(_M_N, ox, oy, oz)
                t = (o_n - tc[_M_KN:_M_KN + 1]) / det  # (tile, group*W)
                au = dot(_M_E2, wx, wy, wz) + dot(_M_KU, dx, dy, dz)
                av = -dot(_M_E1, wx, wy, wz) + dot(_M_KV, dx, dy, dz)
                # u,v,(1-u-v) >= 0 decided by sign agreement with det (u =
                # au/det etc.); det == 0 gives t = +-inf/NaN, failing below.
                inside = (au * det >= 0) & (av * det >= 0) & \
                    ((det - au - av) * det >= 0)
            else:
                n_o = dot(_R_N, ox, oy, oz)
                n_d = dot(_R_N, dx, dy, dz)
                if _KVAR == "recip":
                    t = (tc[_R_KN:_R_KN + 1] - n_o) * pl.reciprocal(
                        n_d, approx=True)
                elif _KVAR == "nodiv":
                    # Diagnostic: no division at all (wrong results).
                    t = tc[_R_KN:_R_KN + 1] - n_o + n_d
                else:
                    t = (tc[_R_KN:_R_KN + 1] - n_o) / n_d  # (tile, group*W)
                c1 = dot(_R_M1, ox, oy, oz) + t * dot(_R_M1, dx, dy, dz) - tc[_R_K1:_R_K1 + 1]
                c2 = dot(_R_M2, ox, oy, oz) + t * dot(_R_M2, dx, dy, dz) - tc[_R_K2:_R_K2 + 1]
                c3 = dot(_R_M3, ox, oy, oz) + t * dot(_R_M3, dx, dy, dz) - tc[_R_K3:_R_K3 + 1]
                inside = (c1 * c2 >= 0) & (c1 * c3 >= 0) & (c2 * c3 >= 0)
            ok = inside & (t > 0)  # NaN t fails every compare
            if bt is not None:
                ok = ok & (t <= bt)
            return cids, jnp.where(ok, t, 1e30)

        n_groups = (n + (group - 1)) // group
        imax = jnp.iinfo(jnp.int32).max
        if defer:
            # Per-column triangle ids are panel-local: column c of a panel is
            # triangle cids[c // width] * width + (c % width).
            col = jax.lax.broadcasted_iota(jnp.int32, (1, group * width), 1)
            sh = width.bit_length() - 1  # width is a power of two (32/128)
            blk_col = col >> sh
            within_col = col & (width - 1)

            def body(k, state):
                bt128, bi128 = state
                cids, tm = panel(k, None)
                cid_col = jnp.full_like(col, cids[0])
                for g in range(1, group):
                    cid_col = jnp.where(blk_col == g, cids[g], cid_col)
                tri_col = cid_col * width + within_col  # (1, group*W)
                better = (tm < bt128) | ((tm == bt128) & (tm < 1e30)
                                         & (tri_col < bi128))
                bt128 = jnp.where(better, tm, bt128)
                bi128 = jnp.where(better, tri_col, bi128)
                return bt128, bi128

            bt0 = jnp.full((tile, group * width), 1e30, jnp.float32)
            bi0 = jnp.full((tile, group * width), imax, jnp.int32)
            if ftb:
                # Early-exit while over front-to-back panels: stop once the
                # next panel's first (smallest) entry key strictly exceeds
                # every ray's current best t.  The vector->scalar bmax
                # reduce stalls the VPU pipeline, so the check runs every
                # FTB_STRIDE panels (a per-panel check measured slower than
                # no exit at all); trailing past-the-count panels inside a
                # stride test miss-clusters — redundant but correct, like
                # the fori path's final partial group.
                stride = 4

                def cond_fn(st):
                    k, _, _, bmax = st
                    # Clamped SMEM read: k may be one past the last panel
                    # when every cluster is a candidate; the k < n_groups
                    # term kills the conjunction there, but the read must
                    # stay in bounds.
                    kk = jnp.minimum(k, jnp.int32(gkeys_ref.shape[2] - 1))
                    return (k < n_groups) & (gkeys_ref[0, s, kk] <= bmax)

                # Per-ray exit bound: a ray is satisfied once the next
                # panel's entry exceeds min(its best t, its exit distance
                # from the enclosing chunk/scene AABB, rays col 6/9) —
                # without the cap, one miss-everything ray (parked for this
                # chunk by the routing, or escaping the scene) pins bmax at
                # 1e30 and the exit never fires.  Sound because a cluster
                # inside the chunk AABB cannot be entered after the ray has
                # exited the chunk: entry_i(cluster) <= exit_i(chunk).
                exit_col = sub[:, 9] if mt else sub[:, 6]  # (tile,)

                def body_fn(st):
                    k, bt128, bi128, _ = st
                    for j in range(stride):
                        bt128, bi128 = body(
                            jnp.minimum(k + j, n_groups - 1), (bt128, bi128))
                    bmax = jnp.max(jnp.minimum(jnp.min(bt128, axis=1),
                                               exit_col))
                    return k + stride, bt128, bi128, bmax

                _, bt128, bi128, _ = jax.lax.while_loop(
                    cond_fn, body_fn,
                    (jnp.int32(0), bt0, bi0, jnp.float32(1e30)))
            else:
                bt128, bi128 = jax.lax.fori_loop(0, n_groups, body,
                                                 (bt0, bi0))
            bt = jnp.min(bt128, axis=1, keepdims=True)  # (tile, 1)
            bi = jnp.min(jnp.where(bt128 == bt, bi128, imax),
                         axis=1, keepdims=True)
        else:
            def body(k, state):
                bt, bi = state
                cids, tm = panel(k, bt)
                tj = jnp.min(tm, axis=1, keepdims=True)  # (tile, 1)
                j = jnp.argmin(tm, axis=1).reshape(tile, 1).astype(jnp.int32)
                blk = j // width
                cid_j = jnp.full_like(j, cids[0])
                for g in range(1, group):
                    cid_j = jnp.where(blk == g, cids[g], cid_j)
                tri = cid_j * width + (j - blk * width)
                better = (tj < bt) | ((tj == bt) & (tj < 1e30) & (tri < bi))
                bt = jnp.where(better, tj, bt)
                bi = jnp.where(better, tri, bi)
                return bt, bi

            bt0 = jnp.full((tile, 1), 1e30, jnp.float32)
            bi0 = jnp.full((tile, 1), imax, jnp.int32)
            bt, bi = jax.lax.fori_loop(0, n_groups, body, (bt0, bi0))

        bt_ref[pl.ds(s, 1), :] = bt.reshape(1, tile)
        bi_ref[pl.ds(s, 1), :] = jnp.where(bt < 1e30, bi, -1).reshape(1, tile)

    @pl.when(jnp.logical_not(step_empty))
    def _():
        jax.lax.fori_loop(0, mega, subtile, 0)


@functools.partial(
    jax.jit, static_argnames=("tile", "mega", "group", "interpret", "mt",
                              "defer")
)
def _cluster_intersect_padded(accel: ClusterAccel, rays, cand, gkeys,
                              tile: int, mega: int, group: int, interpret: bool,
                              mt: bool = False, defer: bool = True):
    n_steps = rays.shape[0] // (tile * mega)
    c = accel.num_clusters
    ray_w = rays.shape[1]
    # The deferred-best variant indexes panel columns with shifts/masks,
    # which requires a power-of-two cluster width.
    defer = defer and (accel.width & (accel.width - 1) == 0)
    group = min(group, c)
    ftb = gkeys is not None
    assert not (ftb and not defer), "front-to-back early exit requires defer"
    kernel = functools.partial(_intersect_kernel, width=accel.width,
                               tile=tile, mega=mega, group=group,
                               mt=mt, defer=defer, ftb=ftb)
    gkey_specs = [pl.BlockSpec((1, mega, c // group), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)] if ftb else []
    bt, bi = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, mega, c + 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + gkey_specs + [
            pl.BlockSpec((tile * mega, ray_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(accel.tconst.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mega, tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mega, tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_steps * mega, tile), jnp.float32),
            jax.ShapeDtypeStruct((n_steps * mega, tile), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*([cand] + ([gkeys] if ftb else []) + [rays, accel.tconst]))
    return bt.reshape(-1), bi.reshape(-1)


def cluster_intersect(accel: ClusterAccel, origin, direction,
                      tile: int = 256, mega: int = 16, group: int = 4,
                      interpret: bool | None = None, mt: bool = False,
                      defer: bool = True, ftb: bool = False, t_cap=None):
    """Nearest-hit query: (hit (R,) bool, t (R,) f32, tri (R,) i32).

    Same result contract as accel.lbvh.bvh_intersect / brute_force_intersect
    (smallest t > 0, MTPC/pathTracing.cpp:355-361); ties between coincident
    triangles may resolve to a different triangle id at identical t.
    ``mt`` selects the Moller-Trumbore test (the accel must have been built
    with the matching ``build_cluster_accel(..., mt=...)`` table).
    ``ftb`` sorts candidates front-to-back and early-exits the test loop —
    identical results, a win only at large candidate densities (the chunked
    large-scene path enables it).
    """
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    r = origin.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = min(tile, max(8, r))
    mega = max(1, min(mega, r // tile if r >= tile else 1))
    # The kernel's final partial group reads candidate ids up to index
    # ceil(n/group)*group - 1, which stays inside the C-wide id region only
    # when group divides C. C is a power of two, so round group down to one
    # (an OOB SMEM read is index-clamped in interpret mode but undefined on
    # hardware).
    group = min(max(1, group), accel.num_clusters)
    group = 1 << (group.bit_length() - 1)
    step = tile * mega
    pad = (-r) % step
    if pad:
        # Dummy rays far outside every scene: candidate lists stay empty.
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, origin.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.array([[1.0, 0.0, 0.0]], direction.dtype), (pad, 1))]
        )
        if t_cap is not None:
            t_cap = jnp.concatenate(
                [t_cap, jnp.full((pad,), -1.0, jnp.float32)])
    ftb = ftb and (accel.width & (accel.width - 1) == 0)  # needs defer
    # Col 6 (9 under mt) carries the per-ray exit cap for the ftb early
    # exit; 1e30 = uncapped.
    if t_cap is None:
        cap = jnp.full((origin.shape[0], 1), 1e30, origin.dtype)
    else:
        cap = t_cap[:, None]
    zeros = jnp.zeros((origin.shape[0], 1), origin.dtype)
    rays = jnp.concatenate([origin, direction, cap, zeros], axis=1)  # (R, 8)
    cand, gkeys = _candidates(rays, accel.cmin, accel.cmax, tile, mega,
                              interpret, ftb=ftb, group=group)
    if mt:
        # MT needs w = o x d per ray (see the _M_* layout note); widen to 16
        # columns [o d w cap 0*6] so the lane dim stays padding-free.
        w = jnp.cross(origin, direction)
        rays = jnp.concatenate(
            [origin, direction, w, cap,
             jnp.zeros((origin.shape[0], 6), origin.dtype)],
            axis=1,
        )
    bt, bi = _cluster_intersect_padded(accel, rays, cand, gkeys, tile, mega,
                                       group, interpret, mt, defer)
    bt, bi = bt[:r], bi[:r]
    hit = bi >= 0
    return hit, jnp.where(hit, bt, BIG), bi


def candidate_stats(scene, opts, bvh=None):
    """Measured candidate-cluster density for the roofline estimate in
    bench.py: mean candidate clusters per ray subtile, on (a) the frame's
    sorted primary tiles and (b) a bounce-like wavefront (cosine lobes about
    the primary hits' normals, sorted by (hit cluster, octant) exactly like
    the renderer's wavefront sort).  Returns a weighted mix approximating the
    renderer's segment composition (~30% primary, ~70% bounce/shadow).
    """
    import numpy as np

    from ..integrator.camera import primary_rays
    from ..integrator.wavefront import (_tile_swizzled_ids, resolve_plan,
                                        swizzle_tile)

    kind, width, group = resolve_plan(opts, scene.num_tris_padded)[:3]
    if not (kind or "").startswith("cluster"):
        return {"candidates_per_ray": 0.0}
    accel = build_cluster_accel(scene, width=width)
    tile, mega = opts.cluster_rays, 16
    h, w = scene.camera.height, scene.camera.width
    ids = _tile_swizzled_ids(h, w, swizzle_tile(opts, scene.num_tris_padded))
    r = min(65536, (len(ids) // (tile * mega)) * (tile * mega))
    # Whole tiles strided across the FRAME (a contiguous prefix would sample
    # only the top image rows), preserving subtile coherence.
    tiles = ids.reshape(-1, tile)
    step = max(1, tiles.shape[0] // (r // tile))
    ids = jnp.asarray(tiles[::step][: r // tile].reshape(-1))
    r = int(ids.shape[0])
    o, d = primary_rays(scene.camera, ids)

    def popmean(o, d):
        rays = jnp.concatenate([o, d, jnp.zeros((o.shape[0], 2))], axis=1)
        cand = np.asarray(_candidates(rays, accel.cmin, accel.cmax, tile,
                                      mega, jax.default_backend() != "tpu")[0])
        counts = cand[..., 0]  # per-subtile candidate counts
        return float(counts.mean())

    prim = popmean(o, d)

    hit, t, tri = cluster_intersect(accel, o, d, tile=tile, group=group)
    p = np.asarray(o + d * jnp.where(hit, t, 1.0)[:, None])
    gn = np.asarray(scene.geom_n)[np.maximum(np.asarray(tri), 0)]
    rng_ = np.random.default_rng(0)
    u = rng_.uniform(size=(r, 2))
    phi, ct = 2 * np.pi * u[:, 0], np.sqrt(u[:, 1])
    st = np.sqrt(1 - ct * ct)
    a = np.where(np.abs(gn[:, :1]) > 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    tx = np.cross(gn, a)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-9)
    ty = np.cross(gn, tx)
    bd = (tx * (st * np.cos(phi))[:, None] + ty * (st * np.sin(phi))[:, None]
          + gn * ct[:, None]).astype(np.float32)
    # Mirror the renderer's 6-bit direction bin (sign + |component| > 0.5
    # per axis, wavefront.py wavefront sort) so the measured candidate
    # density matches what the production sort actually produces.
    db = ((bd[:, 0] > 0) * 32 + (bd[:, 1] > 0) * 16 + (bd[:, 2] > 0) * 8
          + (np.abs(bd[:, 0]) > 0.5) * 4 + (np.abs(bd[:, 1]) > 0.5) * 2
          + (np.abs(bd[:, 2]) > 0.5)).astype(int)
    key = np.maximum(np.asarray(tri), 0) // width * 64 + db
    perm = np.argsort(key, kind="stable")
    bounce = popmean(jnp.asarray(p[perm] + bd[perm] * 0.01), jnp.asarray(bd[perm]))

    return {"candidates_per_ray": float(0.3 * prim + 0.7 * bounce),
            "primary_cand": float(prim), "bounce_cand": float(bounce)}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChunkedClusterAccel:
    """Stacked per-chunk tables for the single-dispatch chunked intersector.

    tconst: (K*C, 16, width) — chunk k's constant blocks at rows
            [k*C, (k+1)*C) (the final chunk zero-padded: zeroed rows give
            t = 0/0 = NaN, never hit).
    cmin/cmax: (K, C, 3) cluster AABBs (padding clusters inverted-empty).
    kmin/kmax: (K, 3) whole-chunk AABBs for ray routing.
    offsets: (K,) i32 — chunk k's first GLOBAL (Morton-sorted, padded)
             triangle id.
    """

    tconst: Any
    cmin: Any
    cmax: Any
    kmin: Any
    kmax: Any
    offsets: Any

    @property
    def num_chunks(self) -> int:
        return self.cmin.shape[0]

    @property
    def clusters_per_chunk(self) -> int:
        return self.cmin.shape[1]

    @property
    def width(self) -> int:
        return self.tconst.shape[2]


def build_cluster_accel_chunked(scene, width: int, n_chunks: int,
                                mt: bool = False):
    """Split the (Morton-sorted, padded) triangle range into ``n_chunks``
    width-aligned contiguous chunks and stack their VMEM-sized tables into
    one ChunkedClusterAccel.  Chunk k covers triangles
    [offsets[k], offsets[k+1]); Morton contiguity keeps each chunk spatially
    tight, so a ray's candidate clusters concentrate in few chunks (the
    others park at routing time and cost only skipped-subtile overhead).
    Returns (accel, offsets) — offsets also as a Python list for callers
    that need static values."""
    import dataclasses as _dc

    t = scene.num_tris_padded
    per = -(-(t // width) // n_chunks) * width
    accels, offsets = [], []
    for k in range(n_chunks):
        a, b = k * per, min((k + 1) * per, t)
        if a >= b:
            break
        sub = _dc.replace(
            scene,
            v0=scene.v0[a:b], v1=scene.v1[a:b], v2=scene.v2[a:b],
            geom_n=scene.geom_n[a:b], tri_valid=scene.tri_valid[a:b],
        )
        accels.append(build_cluster_accel(sub, width=width, mt=mt))
        offsets.append(a)
    # Common C a multiple of 8 so any kernel group size (<= 8) divides it:
    # the final partial group's SMEM id reads must stay inside the C-wide id
    # region.  Padding clusters are inverted-empty (never candidates) and
    # their zeroed tconst rows give t = 0/0 = NaN (never hit).
    c = -(-max(a.num_clusters for a in accels) // 8) * 8
    tconst = jnp.concatenate([
        jnp.pad(a.tconst, ((0, c - a.num_clusters), (0, 0), (0, 0)))
        for a in accels
    ])  # (K*C, 16, width)
    cmin = jnp.stack([
        jnp.pad(a.cmin, ((0, c - a.num_clusters), (0, 0)),
                constant_values=BIG) for a in accels
    ])
    cmax = jnp.stack([
        jnp.pad(a.cmax, ((0, c - a.num_clusters), (0, 0)),
                constant_values=-BIG) for a in accels
    ])
    accel = ChunkedClusterAccel(
        tconst=tconst, cmin=cmin, cmax=cmax,
        kmin=jnp.min(cmin, axis=1), kmax=jnp.max(cmax, axis=1),
        offsets=jnp.asarray(offsets, jnp.int32),
    )
    return accel, offsets


def cluster_intersect_chunked(accel: ChunkedClusterAccel, offsets, origin,
                              direction,
                              tile: int = 256, mega: int = 16, group: int = 4,
                              interpret: bool | None = None, mt: bool = False):
    """Nearest-hit over a chunked accel in TWO Pallas dispatches total (one
    key kernel, one test kernel, each with a (K, n_steps) grid), merged
    lexicographically on (t, global triangle id) — identical contract to the
    single-table kernel (chunks ascend in triangle id, so strict-< merging
    reproduces the in-order tie-break).  The per-chunk-call formulation this
    replaces paid 2K Pallas dispatch fixed costs, K separate candidate
    sorts, and K rounds of XLA merge glue per intersect call.

    Ray ROUTING: one cheap slab pass against the K chunk AABBs parks each
    ray (origin -> 1e9) for every chunk it cannot hit, so the per-(chunk,
    subtile) candidate and test work is skipped at subtile/step granularity
    via the kernels' parked flags — instead of paying K full dense candidate
    phases per ray.  Identical results: a ray missing chunk k's AABB (the
    union of its cluster AABBs) can hit nothing inside it.

    The per-chunk constant table rides a (C, 16, width) BlockSpec indexed by
    the grid's k axis alone: with k the OUTER grid dimension the block is
    fetched once per chunk and stays VMEM-resident across that chunk's
    n_steps inner steps."""
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    r = origin.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_n = accel.num_chunks
    c = accel.clusters_per_chunk
    width = accel.width
    assert width & (width - 1) == 0, "chunked path requires power-of-2 width"
    tile = min(tile, max(8, r))
    mega = max(1, min(mega, r // tile if r >= tile else 1))
    group = min(max(1, group), c)
    group = 1 << (group.bit_length() - 1)
    step = tile * mega
    pad = (-r) % step
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, origin.dtype)])
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.array([[1.0, 0.0, 0.0]], direction.dtype), (pad, 1))]
        )
    rp = origin.shape[0]
    n_steps = rp // step

    # --- Routing slab pass against the K chunk AABBs.
    inv = 1.0 / direction  # (R, 3); +-inf on zero components
    lo = (accel.kmin[None] - origin[:, None]) * inv[:, None]  # (R, K, 3)
    hi = (accel.kmax[None] - origin[:, None]) * inv[:, None]
    tn = jnp.minimum(lo, hi)
    tf = jnp.maximum(lo, hi)
    # 0 * inf NaNs (origin exactly on a zero-direction slab plane) resolve
    # conservatively open, like the key kernel's slab test.
    tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
    tf = jnp.where(jnp.isnan(tf), jnp.inf, tf)
    enter = jnp.max(tn, axis=2)
    exit_ = jnp.min(tf, axis=2)
    touch = (enter <= exit_) & (exit_ >= 0)  # (R, K)

    # Per-chunk parked rays + per-(ray, chunk) exit caps, stacked over K.
    o_k = jnp.where(touch.T[:, :, None], origin[None], 1e9)  # (K, R, 3)
    cap_k = jnp.where(touch.T, exit_.T, -1.0)  # (K, R)
    d_b = jnp.broadcast_to(direction[None], (k_n, rp, 3))
    if mt:
        w = jnp.cross(o_k, d_b)
        rays = jnp.concatenate(
            [o_k, d_b, w, cap_k[:, :, None],
             jnp.zeros((k_n, rp, 6), origin.dtype)], axis=2)
    else:
        rays = jnp.concatenate(
            [o_k, d_b, cap_k[:, :, None],
             jnp.zeros((k_n, rp, 1), origin.dtype)], axis=2)
    ray_w = rays.shape[2]
    rays = rays.reshape(k_n * rp, ray_w)

    # --- Candidate phase: ONE key-kernel dispatch over the (K, n_steps)
    # grid, then one packed front-to-back sort over all (chunk, subtile)
    # rows at once.
    caabb = jnp.concatenate(
        [accel.cmin.transpose(0, 2, 1), accel.cmax.transpose(0, 2, 1),
         jnp.zeros((k_n, 2, c), origin.dtype)], axis=1
    ).reshape(k_n * 8, c)
    sub_parked = (jnp.min(rays[:, 0].reshape(k_n * n_steps, mega, tile),
                          axis=2) > 5e8).astype(jnp.int32)
    step_parked = jnp.min(sub_parked, axis=1, keepdims=True)
    flags = jnp.concatenate([step_parked, sub_parked], axis=1
                            ).reshape(k_n * n_steps, 1, mega + 1)
    key = pl.pallas_call(
        functools.partial(_key_kernel, tile=tile, mega=mega),
        grid=(k_n, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, mega + 1), lambda k, i: (k * n_steps + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((step, ray_w), lambda k, i: (k * n_steps + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda k, i: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, mega, c), lambda k, i: (k * n_steps + i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_n * n_steps, mega, c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(flags, rays, caabb).reshape(-1, c)

    order, gkeys = _ftb_order(key, c, group, mega)
    counts = jnp.sum(key < BIG, axis=1, dtype=jnp.int32)[:, None]
    cand = jnp.concatenate(
        [counts, jnp.zeros((key.shape[0], 7), jnp.int32), order], axis=1
    ).reshape(-1, mega, c + 8)
    step_empty = (jnp.max(cand[:, :, 0], axis=1) == 0).astype(jnp.int32)
    cand = cand.at[:, 0, 1].set(step_empty)

    # --- Test phase: ONE dispatch; chunk k's table is the k-indexed block.
    kernel = functools.partial(_intersect_kernel, width=width,
                               tile=tile, mega=mega, group=group,
                               mt=mt, defer=True, ftb=True)
    bt, bi = pl.pallas_call(
        kernel,
        grid=(k_n, n_steps),
        in_specs=[
            pl.BlockSpec((1, mega, c + 8), lambda k, i: (k * n_steps + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mega, c // group),
                         lambda k, i: (k * n_steps + i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((step, ray_w), lambda k, i: (k * n_steps + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 16, width), lambda k, i: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mega, tile), lambda k, i: (k * n_steps + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mega, tile), lambda k, i: (k * n_steps + i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_n * n_steps * mega, tile), jnp.float32),
            jax.ShapeDtypeStruct((k_n * n_steps * mega, tile), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(cand, gkeys, rays, accel.tconst)
    bt = bt.reshape(k_n, rp)[:, :r]
    bi = bi.reshape(k_n, rp)[:, :r]

    # --- Lexicographic (t, global tri) merge across chunks.
    hit_k = bi >= 0
    imax = jnp.int32(jnp.iinfo(jnp.int32).max)
    tri_g = jnp.where(hit_k, bi + accel.offsets[:, None], imax)
    t_k = jnp.where(hit_k, bt, BIG)
    best_t, best_i = t_k[0], tri_g[0]
    for k in range(1, k_n):
        better = (t_k[k] < best_t) | ((t_k[k] == best_t) & (tri_g[k] < best_i))
        best_t = jnp.where(better, t_k[k], best_t)
        best_i = jnp.where(better, tri_g[k], best_i)
    hit = best_t < BIG
    return hit, jnp.where(hit, best_t, BIG), jnp.where(hit, best_i, -1)


# --------------------------------------------------------------------------
# HBM-streaming intersector: scenes past the VMEM-resident table budget.
#
# The chunked formulation (above) multiplies the per-subtile kernel floor by
# the number of chunks a subtile's rays touch (measured 2.5 chunks/ray, 66%
# active (chunk, subtile) pairs on the 400k-tri interior => 4.6x the row
# count of a single-table pass), and its dense per-chunk candidate phase
# scales linearly with scene size.  Here the WHOLE constant table stays in
# HBM and the candidate unit coarsens to a SUPERGROUP of `sgroup` clusters:
#
#   * candidate phase: one dense slab pass + one packed sort over S = C/sg
#     supergroup AABBs -- 1/sg of the cluster-granular cost;
#   * test phase: per subtile, iterate candidate supergroups front-to-back,
#     DMAing each one's (sg, 16, width) constant block HBM->VMEM with
#     double buffering (next block in flight while testing the current),
#     early-exiting once the next supergroup's entry exceeds every ray's
#     best t (a closed-interior hit is almost always in the first block).
#
# One subtile row per subtile (no chunk axis), no routing, no merge; scene
# size only grows the candidate phase's S, not the per-row test cost.
# --------------------------------------------------------------------------


def _intersect_hbm_kernel(cand_ref, gkeys_ref, rays_ref, tconst_ref,
                          bt_ref, bi_ref, buf_ref, sem_ref, *, sgroup: int,
                          width: int, tile: int, mega: int, mt: bool):
    """Test kernel over HBM-resident constants.

    cand: SMEM (1, mega, S+8) [count, whole-step-empty flag in pad slot 1 of
    row 0, 6 pad, supergroup ids front-to-back]; gkeys: SMEM (1, mega, S)
    quantized-down entry keys aligned with the id list; rays: VMEM
    (mega*tile, 8|16); tconst: ANY/HBM (C, 16, width); buf: VMEM scratch
    (2, sgroup, 16, width); sem: 2 DMA semaphores.  Outputs lane-major
    (mega, tile) like _intersect_kernel.

    Exactness matches the in-order scan for the same reasons as the ftb
    deferred-best kernel: the per-column running best is order-independent
    lexicographic min on (t, global tri id), and the exit rule compares the
    next supergroup's quantized-DOWN entry (<= its true entry) against every
    ray's best t, so no potentially-winning block is skipped.
    """
    step_empty = cand_ref[0, 0, 1] == 1
    imax = jnp.iinfo(jnp.int32).max

    @pl.when(step_empty)
    def _():
        bt_ref[:, :] = jnp.full((mega, tile), 1e30, jnp.float32)
        bi_ref[:, :] = jnp.full((mega, tile), -1, jnp.int32)

    def _dma(slot, sup):
        # tconst is pre-swizzled (S, 16, sgroup*width): one supergroup = one
        # contiguous panel-layout block, so the DMA lands test-ready (no
        # in-kernel concat, no dynamic scratch indexing).
        return pltpu.make_async_copy(
            tconst_ref.at[sup], buf_ref.at[slot], sem_ref.at[slot])

    def _tests(s, n):
        sub = rays_ref[pl.ds(s * tile, tile), :]
        ox, oy, oz = sub[:, 0:1], sub[:, 1:2], sub[:, 2:3]
        dx, dy, dz = sub[:, 3:4], sub[:, 4:5], sub[:, 5:6]
        if mt:
            wx, wy, wz = sub[:, 6:7], sub[:, 7:8], sub[:, 8:9]
        exit_col = sub[:, 9] if mt else sub[:, 6]  # per-ray scene-exit cap

        cols = sgroup * width
        col = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)

        def body_fn(st):
            k, bt_c, bi_c, _ = st
            sup_k = cand_ref[0, s, 8 + k]

            @pl.when(k + 1 < n)
            def _():
                _dma((k + 1) & 1, cand_ref[0, s, 8 + k + 1]).start()

            _dma(k & 1, sup_k).wait()
            tc = buf_ref[k & 1]  # (16, sgroup*width), panel-ready

            def dot(r, ax, ay, az):
                return (ax * tc[r:r + 1] + ay * tc[r + 1:r + 2]
                        + az * tc[r + 2:r + 3])

            if mt:
                det = -dot(_M_N, dx, dy, dz)
                o_n = dot(_M_N, ox, oy, oz)
                t = (o_n - tc[_M_KN:_M_KN + 1]) / det
                au = dot(_M_E2, wx, wy, wz) + dot(_M_KU, dx, dy, dz)
                av = -dot(_M_E1, wx, wy, wz) + dot(_M_KV, dx, dy, dz)
                inside = (au * det >= 0) & (av * det >= 0) & \
                    ((det - au - av) * det >= 0)
            else:
                n_o = dot(_R_N, ox, oy, oz)
                n_d = dot(_R_N, dx, dy, dz)
                t = (tc[_R_KN:_R_KN + 1] - n_o) / n_d
                c1 = (dot(_R_M1, ox, oy, oz) + t * dot(_R_M1, dx, dy, dz)
                      - tc[_R_K1:_R_K1 + 1])
                c2 = (dot(_R_M2, ox, oy, oz) + t * dot(_R_M2, dx, dy, dz)
                      - tc[_R_K2:_R_K2 + 1])
                c3 = (dot(_R_M3, ox, oy, oz) + t * dot(_R_M3, dx, dy, dz)
                      - tc[_R_K3:_R_K3 + 1])
                inside = (c1 * c2 >= 0) & (c1 * c3 >= 0) & (c2 * c3 >= 0)
            ok = inside & (t > 0)
            tm = jnp.where(ok, t, 1e30)
            tri_col = sup_k * cols + col  # global: supergroups are aligned
            better = (tm < bt_c) | ((tm == bt_c) & (tm < 1e30)
                                    & (tri_col < bi_c))
            bt_c = jnp.where(better, tm, bt_c)
            bi_c = jnp.where(better, tri_col, bi_c)
            bmax = jnp.max(jnp.minimum(jnp.min(bt_c, axis=1), exit_col))
            return k + 1, bt_c, bi_c, bmax

        def cond_fn(st):
            k, _, _, bmax = st
            kk = jnp.minimum(k, jnp.int32(gkeys_ref.shape[2] - 1))
            return (k < n) & (gkeys_ref[0, s, kk] <= bmax)

        _dma(0, cand_ref[0, s, 8]).start()
        bt0 = jnp.full((tile, cols), 1e30, jnp.float32)
        bi0 = jnp.full((tile, cols), imax, jnp.int32)
        k_end, bt_c, bi_c, _ = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.int32(0), bt0, bi0, jnp.float32(1e30)))

        # Drain: an early exit leaves the k_end-th block's DMA in flight on
        # slot k_end & 1; the wait is size-based, so any in-range id works.
        @pl.when(k_end < n)
        def _():
            _dma(k_end & 1, cand_ref[0, s, 8 + k_end]).wait()

        bt = jnp.min(bt_c, axis=1, keepdims=True)
        bi = jnp.min(jnp.where(bt_c == bt, bi_c, imax), axis=1, keepdims=True)
        bt_ref[pl.ds(s, 1), :] = bt.reshape(1, tile)
        bi_ref[pl.ds(s, 1), :] = jnp.where(
            bt < 1e30, bi, -1).reshape(1, tile)

    def subtile(s, _):
        n = cand_ref[0, s, 0]

        @pl.when(n == 0)
        def _():
            bt_ref[pl.ds(s, 1), :] = jnp.full((1, tile), 1e30, jnp.float32)
            bi_ref[pl.ds(s, 1), :] = jnp.full((1, tile), -1, jnp.int32)

        @pl.when(n > 0)
        def _():
            _tests(s, n)

        return 0

    @pl.when(jnp.logical_not(step_empty))
    def _():
        jax.lax.fori_loop(0, mega, subtile, 0)


def supergroup_size(num_clusters: int, max_s: int = 2048) -> int:
    """Smallest power-of-two supergroup size keeping S = C/sg <= max_s (SMEM
    candidate rows scale with S; the DMA block scales with sg)."""
    sg = 4
    while -(-num_clusters // sg) > max_s:
        sg *= 2
    return sg


def cluster_intersect_hbm(accel: ClusterAccel, origin, direction,
                          tile: int = 64, mega: int = 16,
                          sgroup: int | None = None,
                          interpret: bool | None = None, mt: bool = False,
                          t_cap=None):
    """Nearest-hit over an HBM-resident constant table (see the module-level
    streaming note).  Same result contract as cluster_intersect."""
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    r = origin.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = min(tile, max(8, r))
    mega = max(1, min(mega, r // tile if r >= tile else 1))
    step = tile * mega
    pad = (-r) % step
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, origin.dtype)])
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.array([[1.0, 0.0, 0.0]], direction.dtype), (pad, 1))]
        )
        if t_cap is not None:
            t_cap = jnp.concatenate([t_cap, jnp.full((pad,), -1.0, jnp.float32)])
    rp = origin.shape[0]
    n_steps = rp // step
    c = accel.num_clusters
    width = accel.width
    assert width & (width - 1) == 0
    sg = sgroup or supergroup_size(c)
    s_n = -(-c // sg)
    # Pad the cluster AABBs to a whole number of supergroups (empty boxes).
    smin = jnp.min(jnp.pad(accel.cmin, ((0, s_n * sg - c), (0, 0)),
                           constant_values=BIG).reshape(s_n, sg, 3), axis=1)
    smax = jnp.max(jnp.pad(accel.cmax, ((0, s_n * sg - c), (0, 0)),
                           constant_values=-BIG).reshape(s_n, sg, 3), axis=1)

    if t_cap is None:
        cap = jnp.full((rp, 1), 1e30, origin.dtype)
    else:
        cap = t_cap[:, None]
    zeros = jnp.zeros((rp, 1), origin.dtype)
    rays8 = jnp.concatenate([origin, direction, cap, zeros], axis=1)
    caabb = jnp.concatenate(
        [smin.T, smax.T, jnp.zeros((2, s_n), origin.dtype)], axis=0)
    key = _candidate_keys(rays8, caabb, tile, mega, interpret)  # (nT, S)
    order, gkeys = _ftb_order(key, s_n, 1, mega)
    counts = jnp.sum(key < BIG, axis=1, dtype=jnp.int32)[:, None]
    cand = jnp.concatenate(
        [counts, jnp.zeros((key.shape[0], 7), jnp.int32), order], axis=1
    ).reshape(-1, mega, s_n + 8)
    step_empty = (jnp.max(cand[:, :, 0], axis=1) == 0).astype(jnp.int32)
    cand = cand.at[:, 0, 1].set(step_empty)

    if mt:
        w = jnp.cross(origin, direction)
        rays = jnp.concatenate(
            [origin, direction, w, cap, jnp.zeros((rp, 6), origin.dtype)],
            axis=1)
    else:
        rays = rays8
    ray_w = rays.shape[1]
    # Pre-swizzle the HBM table to (S, 16, sg*width): one supergroup = one
    # contiguous panel-layout DMA block.  transpose(0, 2, 1, 3) keeps
    # (cluster, within-cluster) lexicographic in the columns, so column c of
    # supergroup sup is STILL triangle sup*sg*width + c.  Padding rows are
    # zeroed (t = 0/0 = NaN, never hit).
    tconst = accel.tconst
    if s_n * sg != c:
        tconst = jnp.pad(tconst, ((0, s_n * sg - c), (0, 0), (0, 0)))
    tconst = tconst.reshape(s_n, sg, 16, width).transpose(0, 2, 1, 3) \
        .reshape(s_n, 16, sg * width)

    kernel = functools.partial(_intersect_hbm_kernel, sgroup=sg, width=width,
                               tile=tile, mega=mega, mt=mt)
    bt, bi = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, mega, s_n + 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mega, s_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((step, ray_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((mega, tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mega, tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_steps * mega, tile), jnp.float32),
            jax.ShapeDtypeStruct((n_steps * mega, tile), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, sg * width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(cand, gkeys, rays, tconst)
    bt = bt.reshape(-1)[:r]
    bi = bi.reshape(-1)[:r]
    hit = bi >= 0
    return hit, jnp.where(hit, bt, BIG), jnp.where(hit, bi, -1)
