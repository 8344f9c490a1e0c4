"""Wavefront path-tracing integrator.

This replaces the reference's recursive ``shade`` (``MTPC/pathTracing.cpp:
137-266``) with a masked, bounded bounce loop carrying per-lane throughput —
the standard recursion->iteration transform, provably the same estimator:

    shade(p) = NEE(p) + [RR] w_lobe/P_RR * shade(next)
  =>
    L = sum_b  beta_b * NEE(p_b),  beta_0 = 1,  beta_{b+1} = beta_b * w_b / P_RR
    (+ emitter short-circuit terms, see below)

with exactly the reference's event semantics (SURVEY.md §2 quirks):

* emissive hit returns the light radiance immediately (:141-144);
* NEE: one area sample per light per bounce, diffuse term only (:165-232);
* RR continuation p=0.6, compensation 1/p, no depth cap (:237-245) — we cap
  at ``max_depth`` (default 32, bias < 0.6^32);
* indirect weights: DIFFUSE multiplies kd and contributes ZERO if the bounce
  lands on an emitter (NEE double-count guard, :247-253); SPECULAR multiplies
  ks and DOES see emitters (:254-258); TRANSMISSION passes through unweighted
  (:259-261);
* lobe/event selection: refraction considered iff Ni>1 with Schlick Fresnel
  and TIR fallback to mirror reflection (:77-113); otherwise specular iff
  ks != 0 and |kd|/|ks| < u — an unnormalized ratio test with no 1/p
  compensation (:116-130);
* textures replace kd only: nearest-neighbor, frac wrap (:147-163).

All lanes run in lockstep; dead lanes are masked.  The forward-only path uses
``lax.while_loop`` with an all-dead early exit (expected depth 2.5); the
differentiable path uses ``lax.scan`` (reverse-mode needs a static trip count)
with per-bounce rematerialization.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ..accel.lbvh import BVHArrays, bvh_intersect, brute_force_intersect, packet_intersect
from ..config import RenderOptions
from ..ops.intersect import barycentric
from ..ops.sampling import (
    PI,
    normalize,
    pick_light_face,
    reflect,
    refract_dir,
    sample_lobe,
    sample_triangle_point,
    schlick_fresnel,
)
from ..scene.types import SceneArrays
from . import rng
from .camera import primary_rays

RAY_DIFFUSE = 0
RAY_SPECULAR = 1
RAY_TRANSMISSION = 2

BIG = jnp.float32(1e30)


@functools.lru_cache(maxsize=16)
def _tile_swizzled_ids(h: int, w: int, packet_size: int):
    """Pixel ids reordered so every ``packet_size`` consecutive lanes form a
    compact 2D tile (sqrt(P) x sqrt(P)) — packet frusta stay narrow, which is
    what makes the shared-trail traversal (accel.lbvh.packet_intersect) cheap.
    Off-image lanes in edge tiles are clamped to the tile's last valid pixel
    (duplicate ids re-render the identical sample, so the scatter is benign).

    Host-side (static h/w): returns np.int32 (n_tiles*packet_size,).
    lru_cached (~130 ms/build at 1 Mpixel, profiled as per-frame host
    overhead); treat the result as read-only.
    """
    import numpy as np

    ts = int(np.sqrt(packet_size))
    if ts * ts != packet_size or (h < ts and w < ts):
        n = h * w
        n_pad = -(-n // packet_size) * packet_size
        return np.minimum(np.arange(n_pad, dtype=np.int32), n - 1)
    nty, ntx = -(-h // ts), -(-w // ts)
    ty, tx = np.meshgrid(np.arange(nty), np.arange(ntx), indexing="ij")
    iy, ix = np.meshgrid(np.arange(ts), np.arange(ts), indexing="ij")
    yy = np.minimum(ty[:, :, None, None] * ts + iy[None, None], h - 1)
    xx = np.minimum(tx[:, :, None, None] * ts + ix[None, None], w - 1)
    return (yy * w + xx).reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _swizzle_pixel_fn(h: int, w: int, packet_size: int):
    """Arithmetic twin of _tile_swizzled_ids: maps a slot index to its pixel
    id with shifts/masks (pow2 tile counts) or a float-reciprocal multiply
    with compare-subtract correction (non-pow2, e.g. w=1280 ts=8 => ntx=160)
    instead of a (R,) table gather — TPU scalar-gathers cost ~7 ns/row,
    ~0.5 ms per refill iteration at 64k lanes, and per-lane integer div/mod
    is an equally slow multi-op VPU sequence.  lru_cached so the returned
    callable is a stable jit static argument."""
    ts = int(np.sqrt(packet_size))
    n = h * w
    if ts * ts != packet_size or (h < ts and w < ts):
        return lambda slot: jnp.minimum(slot, n - 1)
    ntx = -(-w // ts)

    def div(a, b):
        if b & (b - 1) == 0:
            sh = b.bit_length() - 1
            return a >> sh, a & (b - 1)
        # Exact unsigned divide by the constant b: f32 reciprocal estimate
        # (error < 1 for the slot ranges here: a < 2^22, 24-bit mantissa),
        # then one compare-subtract correction in each direction.
        q = jnp.floor(a.astype(jnp.float32) * np.float32(1.0 / b)).astype(jnp.int32)
        r = a - q * b
        over = r >= b
        q = jnp.where(over, q + 1, q)
        r = jnp.where(over, r - b, r)
        under = r < 0
        q = jnp.where(under, q - 1, q)
        r = jnp.where(under, r + b, r)
        return q, r

    def fn(slot):
        tile, within = div(slot, ts * ts)
        ty, tx = div(tile, ntx)
        iy, ix = div(within, ts)
        yy = jnp.minimum(ty * ts + iy, h - 1)
        xx = jnp.minimum(tx * ts + ix, w - 1)
        return yy * w + xx

    return fn


def resolve_intersector(opts: RenderOptions) -> str:
    """'auto' picks the Pallas cluster kernel on TPU, the XLA packet walk
    elsewhere (CPU test meshes, interpreter runs)."""
    if opts.intersector != "auto":
        return opts.intersector
    import jax

    return "cluster" if jax.default_backend() == "tpu" else "bvh"


def resolve_plan(opts: RenderOptions, num_tris: int):
    """The intersector that will actually run for this (options, scene) pair:
    a 4-tuple ('cluster'|'cluster_interpret', width, group, n_chunks) for the
    Pallas kernel (n_chunks > 1 = chunked VMEM tables), or
    (kind, None, None, 1) for the XLA fallbacks.

    A cluster request (explicit or via 'auto') falls back to the XLA packet
    walk when the scene exceeds the VMEM-resident table budget; an EXPLICIT
    request warns about the substitution (silent fallback hid both the kernel
    change and the now-pointless wavefront sorting)."""
    kind = resolve_intersector(opts)
    if kind in ("cluster", "cluster_interpret"):
        plan = _cluster_plan(opts, num_tris)
        if plan is not None and (plan[2] == 1 or opts.large_mode != "hbm_always"):
            return kind, plan[0], plan[1], plan[2]
        if opts.large_mode in ("hbm", "hbm_always"):
            # HBM-streaming intersector: the constant table never needs to
            # fit VMEM, so scenes past the chunk cap still run the cluster
            # pipeline (measured 2.3e6 rays/s at 400k tris vs the chunked
            # kernel's 6.2e6 — per-candidate DMA latency — but ~80x the old
            # packet-walk fallback; "hbm_always" forces it for A/B probes).
            g = max(1, (opts.cluster_width * opts.cluster_group) // 128)
            return kind + "_hbm", 128, g, 1
        if opts.intersector != "auto":
            import warnings

            warnings.warn(
                f"intersector={opts.intersector!r} requested but the scene's "
                f"{num_tris} (padded) triangles exceed the VMEM-resident "
                "cluster-table budget; falling back to the XLA packet walk",
                stacklevel=2,
            )
        kind = "bvh"
    return kind, None, None, 1


def swizzle_tile(opts: RenderOptions, num_tris: int) -> int:
    """Pixel-tile granularity for ray coherence, matched to the intersector
    that will actually run (cluster kernel tiles vs packet-walk packets)."""
    kind = resolve_plan(opts, num_tris)[0]
    return opts.cluster_rays if kind.startswith("cluster") else opts.packet_size


_VMEM_TABLE_BUDGET = 10 << 20  # leave headroom under the ~16 MB VMEM
# Chunked tables ride a k-indexed BlockSpec, which Pallas DOUBLE-BUFFERS:
# each chunk's table must fit twice (+ rays/outputs) under the 16 MB scoped
# limit.  Smaller chunks also tighten per-chunk AABBs for the ray routing.
_VMEM_CHUNK_BUDGET = 5 << 20


def _tconst_bytes_per_tri(width: int) -> int:
    """tconst is (T/width, 16, width) f32 with the lane dim padded to 128."""
    return 16 * max(width, 128) * 4 // width


def _cluster_plan(opts: RenderOptions, num_tris: int):
    """(width, group) fitting the VMEM-resident constant table.

    Pick the finest culling granularity that keeps the table comfortably
    under the VMEM budget (width 32 costs 256 B/tri from lane padding; width
    128 is pad-free at 64 B/tri); beyond that the cluster kernel cannot hold
    the scene resident and the caller falls back to the XLA packet walk.
    """
    if num_tris * _tconst_bytes_per_tri(opts.cluster_width) <= _VMEM_TABLE_BUDGET:
        return opts.cluster_width, opts.cluster_group, 1
    if num_tris * _tconst_bytes_per_tri(128) <= _VMEM_TABLE_BUDGET:
        # coarser clusters, same 128-lane test panel
        return 128, max(1, (opts.cluster_width * opts.cluster_group) // 128), 1
    # Larger than one VMEM-resident table: contiguous Morton-range CHUNKS,
    # stacked into one two-dispatch intersector (kernels.cluster.
    # cluster_intersect_chunked).  Per-chunk fixed cost caps the chunk count;
    # beyond that the XLA packet walk takes over.
    n_chunks = -(-num_tris * _tconst_bytes_per_tri(128) // _VMEM_CHUNK_BUDGET)
    if n_chunks <= opts.max_table_chunks:
        return 128, max(1, (opts.cluster_width * opts.cluster_group) // 128), int(n_chunks)
    return None  # use the packet walk


def intersect_any(scene, bvh, origin, direction, opts: RenderOptions):
    """Nearest-hit dispatch (the reference's ray_intersect, MTPC/pathTracing.cpp:382)."""
    compat_tri = opts.compat.plane_sign_triangle_test
    kind, width, group, n_chunks = resolve_plan(opts, scene.num_tris_padded)
    if kind == "brute":
        return brute_force_intersect(scene, origin, direction, compat=compat_tri)
    if kind in ("cluster_hbm", "cluster_interpret_hbm"):
        from ..kernels.cluster import (build_cluster_accel,
                                       cluster_intersect_hbm)

        accel = build_cluster_accel(scene, width=width, mt=not compat_tri)
        return cluster_intersect_hbm(
            accel, origin, direction, tile=opts.cluster_rays,
            mega=opts.cluster_mega,
            interpret=True if kind == "cluster_interpret_hbm" else None,
            mt=not compat_tri)
    if kind in ("cluster", "cluster_interpret"):
        interp = True if kind == "cluster_interpret" else None
        if n_chunks > 1:
            from ..kernels.cluster import (build_cluster_accel_chunked,
                                           cluster_intersect_chunked)

            accels, offs = build_cluster_accel_chunked(
                scene, width=width, n_chunks=n_chunks, mt=not compat_tri)
            return cluster_intersect_chunked(
                accels, offs, origin, direction, tile=opts.cluster_rays,
                mega=opts.cluster_mega, group=group, interpret=interp,
                mt=not compat_tri)
        from ..kernels.cluster import build_cluster_accel, cluster_intersect

        # modern mode (plane_sign=False) selects the kernel's Moller-Trumbore
        # variant, matching the packet/brute paths' ray_triangle_mt semantics.
        accel = build_cluster_accel(scene, width=width, mt=not compat_tri)
        return cluster_intersect(
            accel, origin, direction, tile=opts.cluster_rays,
            mega=opts.cluster_mega, group=group, interpret=interp,
            mt=not compat_tri,
        )
    if kind == "bvh_perray":
        return bvh_intersect(bvh, scene, origin, direction, compat=compat_tri)
    return packet_intersect(bvh, scene, origin, direction, compat=compat_tri,
                            packet_size=opts.packet_size,
                            leaf_width=opts.leaf_width)


def _gather_i32(table, idx):
    """(R,) int32 gather via f32 bitcast: int-typed 1D gathers lower to a
    pathologically slow scalar-layout path on TPU."""
    as_f = jax.lax.bitcast_convert_type(table.astype(jnp.int32), jnp.float32)
    return jax.lax.bitcast_convert_type(as_f[idx], jnp.int32)


@jax.custom_vjp
def _permuted_take(mat, perm):
    """``mat[perm]`` whose VJP is a gather by the INVERSE permutation.

    XLA transposes a gather into a scatter-add (it cannot know the indices
    are a permutation); at 64k lanes x 47 f32 columns that scatter was the
    single largest backward op (0.55 ms/iteration, ~12% of the whole
    fwd+bwd iteration).  ``perm`` is always a full permutation here (it
    comes from argsort over all lanes), so the cotangent is exactly
    ``ct[argsort(perm)]`` — another row gather, ~5x cheaper."""
    return jnp.take(mat, perm, axis=0)


def _permuted_take_fwd(mat, perm):
    # Named so the checkpoint policy can SAVE it ((r,) i32, ~0.26 MB/iter):
    # recomputing it in the remat pass costs an extra per-iteration sort.
    from jax.ad_checkpoint import checkpoint_name
    return jnp.take(mat, perm, axis=0), checkpoint_name(
        jnp.argsort(perm), "perm_inv")


def _permuted_take_bwd(inv, ct):
    return jnp.take(ct, inv, axis=0), None


_permuted_take.defvjp(_permuted_take_fwd, _permuted_take_bwd)


def _permute_rows(perm, f32_fields, int_fields):
    """Permute per-lane state with ONE row gather (separate (R,) int/bool
    takes are the same slow scalar-gather pattern as above).  f32_fields:
    (R,k) arrays; int_fields: (R,) or (R,k) int32/uint32/bool arrays,
    returned with their input dtypes and shapes."""
    kinds = [(f.dtype, f.ndim == 1, 1 if f.ndim == 1 else f.shape[1])
             for f in int_fields]
    int_cols = [
        (jax.lax.bitcast_convert_type(f.astype(jnp.int32), jnp.float32)
         if f.dtype != jnp.bool_ else f.astype(jnp.float32)).reshape(
             f.shape[0], -1)
        for f in int_fields
    ]
    widths = [f.shape[1] for f in f32_fields]
    payload = _permuted_take(
        jnp.concatenate(list(f32_fields) + int_cols, axis=1), perm)
    out_f, pos = [], 0
    for w in widths:
        out_f.append(payload[:, pos:pos + w])
        pos += w
    out_i = []
    for dt, squeeze, k in kinds:
        col = payload[:, pos:pos + k]
        if squeeze:
            col = col[:, 0]
        pos += k
        if dt == jnp.bool_:
            out_i.append(col != 0)
        else:
            as_i = jax.lax.bitcast_convert_type(col, jnp.int32)
            out_i.append(as_i if dt == jnp.int32 else as_i.astype(dt))
    return out_f, out_i


# Packed material-row columns (see _shading_tables).
_MF_KD = slice(0, 3)
_MF_KS = slice(3, 6)
_MF_EMIT = slice(6, 9)
_MF_NS = 9
_MF_NI = 10
_MF_IS_EMITTER = 11
_MF_HAS_TEX = 12
_MF_TEX_OFF = 13
_MF_TEX_H = 14
_MF_TEX_W = 15


def _shading_tables(scene):
    """Packed per-triangle (T, 32) and per-material (M, 16) shading tables.

    TPU gathers pay a large per-gather fixed cost; one row gather replaces the
    ~13 separate per-field gathers of the hit record.  Scene-derived and
    loop-invariant, so XLA hoists the packing out of the bounce loop.
    """
    t = scene.num_tris_padded
    tab = jnp.concatenate(
        [
            scene.v0, scene.v1, scene.v2,          # 0-8
            scene.n0, scene.n1, scene.n2,          # 9-17
            scene.uv0, scene.uv1, scene.uv2,       # 18-23
            jax.lax.bitcast_convert_type(
                scene.mat_id.astype(jnp.int32), jnp.float32)[:, None],  # 24
            jnp.zeros((t, 7), jnp.float32),
        ],
        axis=1,
    )
    mtab = jnp.concatenate(
        [
            scene.kd, scene.ks, scene.emission,                   # 0-8
            scene.ns[:, None], scene.ni[:, None],                 # 9, 10
            scene.is_emitter[:, None].astype(jnp.float32),        # 11
            scene.has_texture[:, None].astype(jnp.float32),       # 12
            scene.tex_offset[:, None].astype(jnp.float32),        # 13
            scene.tex_h[:, None].astype(jnp.float32),             # 14
            scene.tex_w[:, None].astype(jnp.float32),             # 15
        ],
        axis=1,
    )
    return tab, mtab


def _material_rows(scene, mtab, mat):
    """(R, 16) material fields. Small tables go through a one-hot matmul
    instead of a gather (differentiable w.r.t. kd/ks/emission via the matmul
    transpose, and much faster than TPU's scalar gather path).

    Precision.HIGHEST is required: the TPU default matmul path is bf16, which
    would quantize material constants — catastrophically for the integer-
    valued texture offset/extent columns (a 512x512 atlas offset rounds to a
    multiple of 2048) and subtly for kd/ks/emission (breaking the oracle
    stream-lockstep contract)."""
    m = scene.num_materials
    if m <= 64:
        onehot = (mat[:, None] == jnp.arange(m, dtype=mat.dtype)[None, :])
        return jnp.matmul(onehot.astype(jnp.float32), mtab,
                          precision=jax.lax.Precision.HIGHEST)
    return mtab[mat]


def _gather_hit(scene, opts, origin, direction, t, tri):
    """Hit record: position, interpolated shading normal, material row, kd.

    Mirrors the leaf bookkeeping of bvh_intersect (MTPC/pathTracing.cpp:341-361)
    plus shade's texture-vs-kd selection (:147-163).  Returns
    (p (R,3), pn (R,3), matf (R,16) packed material fields, kd (R,3)).
    """
    tab, mtab = _shading_tables(scene)
    tri_c = jnp.maximum(tri, 0)
    rowt = tab[tri_c]  # (R, 32): the one per-triangle gather
    p = origin + direction * jax.lax.stop_gradient(t)[:, None]
    p0, p1, p2 = rowt[:, 0:3], rowt[:, 3:6], rowt[:, 6:9]
    bary = jax.lax.stop_gradient(barycentric(p, p0, p1, p2))
    pn = (
        rowt[:, 9:12] * bary[:, 0:1]
        + rowt[:, 12:15] * bary[:, 1:2]
        + rowt[:, 15:18] * bary[:, 2:3]
    )
    if not opts.compat.unnormalized_shading_normal:
        pn = normalize(pn)
    pn = jax.lax.stop_gradient(pn)
    mat = jax.lax.bitcast_convert_type(rowt[:, 24], jnp.int32)
    matf = _material_rows(scene, mtab, mat)
    kd = matf[:, _MF_KD]

    if scene.atlas.shape[0] > 0:  # static: untextured scenes have a (0,3) atlas
        # Texture fetch (quirk #8): row from interpolated vt.x, col from
        # vt.y, frac wrap, nearest-neighbor; clamped at the high edge (the
        # reference's int cast can index one past the image at frac -> 1).
        row = (rowt[:, 18] * bary[:, 0] + rowt[:, 20] * bary[:, 1]
               + rowt[:, 22] * bary[:, 2])
        col = (rowt[:, 19] * bary[:, 0] + rowt[:, 21] * bary[:, 1]
               + rowt[:, 23] * bary[:, 2])
        h = matf[:, _MF_TEX_H]
        w = matf[:, _MF_TEX_W]
        r = jnp.clip((row - jnp.floor(row)) * h, 0, h - 1).astype(jnp.int32)
        c = jnp.clip((col - jnp.floor(col)) * w, 0, w - 1).astype(jnp.int32)
        idx = matf[:, _MF_TEX_OFF].astype(jnp.int32) + r * w.astype(jnp.int32) + c
        texel = scene.atlas[idx]
        kd = jnp.where(matf[:, _MF_HAS_TEX:_MF_HAS_TEX + 1] > 0, texel, kd)
    return p, pn, matf, kd


def _nee_prep(scene, opts: RenderOptions, p, pn, kd, u, alive):
    """Per-light NEE shadow rays and (visibility-independent) contribution
    values — the sampling/geometry half of the reference's direct-lighting
    loop (MTPC/pathTracing.cpp:165-232, minus the ray_intersect at :206-212).

    Returns (so (L,R,3), dirn (L,R,3), contrib (L,R,3), ok (L,R), dist (L,R)):
    origin/direction of each light's shadow ray (dead/black-kd lanes parked at
    1e9 so the cluster kernel sees empty candidate lists), the contribution
    that applies IF the visibility test passes, the non-visibility accept
    mask, and the real light distance (modern-mode visibility).
    """
    compat = opts.compat
    tab, _ = _shading_tables(scene)  # once, not per light
    pn_len = jnp.linalg.norm(pn, axis=-1)
    pick_total = scene.light_total_area[0] if compat.frozen_light_pick else None
    # Quirk #4 fall-through state: a not-found pick silently reuses the
    # previous light's sample point/normal/material (initially a zero Face —
    # material id -1 never matches, so visibility kills the term).
    prev_xl = jnp.zeros_like(p)
    prev_vnl = jnp.zeros_like(p)
    prev_mat = jnp.full(p.shape[:1], -1, jnp.int32)
    so_l, dirn_l, contrib_l, ok_l, dist_l, smat_l = [], [], [], [], [], []
    for li in range(scene.num_lights):
        base = rng.N_BASE_SLOTS + 4 * li
        u_pick, u1, u2, u3 = u[:, base], u[:, base + 1], u[:, base + 2], u[:, base + 3]
        j, found = pick_light_face(scene.light_face_cum_area[li],
                                   scene.light_total_area[li], u_pick,
                                   pick_total)
        n_faces = scene.light_face_tri.shape[1]
        if n_faces <= 4:
            # Few-face lights (every reference scene: 2): the face-id gather
            # + row gather per light (~1 ms/iteration at 64k lanes, paid
            # AGAIN in the backward remat) collapse to a select chain over
            # the loop-invariant (F, 32) per-light table.
            ltab = tab[scene.light_face_tri[li]]  # (F, 32), hoisted by XLA
            lrow = jnp.broadcast_to(ltab[n_faces - 1][None, :],
                                    (j.shape[0], ltab.shape[1]))
            for f in range(n_faces - 2, -1, -1):
                lrow = jnp.where((j == f)[:, None], ltab[f][None, :], lrow)
        else:
            # (Replacing this pair with one row gather from a hoisted
            # (F, 32) per-light table measured 3% SLOWER on veach — twice;
            # the big-table row gather lowers better than the small one.)
            tri = _gather_i32(scene.light_face_tri[li], j)
            lrow = tab[tri]  # one row gather for the light's fields
        xl, vnl = sample_triangle_point(
            lrow[:, 0:3], lrow[:, 3:6], lrow[:, 6:9],
            lrow[:, 9:12], lrow[:, 12:15], lrow[:, 15:18],
            u1, u2, u3, simplex=compat.simplex_light_sampling,
        )
        xl = jnp.where(found[:, None], xl, prev_xl)
        vnl = jnp.where(found[:, None], vnl, prev_vnl)
        smat = jnp.where(found, scene.light_mat[li], prev_mat)
        prev_xl, prev_vnl, prev_mat = xl, vnl, smat
        delta = xl - p
        dist_real = jnp.linalg.norm(delta, axis=-1)
        dirn = delta / jnp.maximum(dist_real, 1e-30)[:, None]
        lit = alive & jnp.any(kd != 0, axis=-1)
        so = jnp.where(lit[:, None], p + dirn * opts.ray_epsilon, 1e9)

        cos_l = jnp.abs(jnp.sum(dirn * normalize(vnl), axis=-1))
        kd_dots = jnp.sum(dirn * pn, axis=-1)
        dist = jnp.maximum(1.0, dist_real) if compat.clamp_light_distance else dist_real
        area = scene.light_total_area[li]  # pdf = 1/A of the WHOLE light (:218)
        rad = scene.light_radiance[li]
        if compat.double_receiver_cosine:
            cos_r = jnp.abs(kd_dots) / jnp.maximum(pn_len, 1e-30)
            geom = cos_l * cos_r / (dist * dist) * area * kd_dots
        else:
            cos_r = kd_dots / jnp.maximum(pn_len, 1e-30)
            geom = cos_l * jnp.maximum(cos_r, 0.0) / (dist * dist) * area
        ok = alive & (kd_dots > 0)
        contrib = kd * rad[None, :] * (geom / PI)[:, None]
        so_l.append(so); dirn_l.append(dirn); contrib_l.append(contrib)
        ok_l.append(ok); dist_l.append(dist_real); smat_l.append(smat)
    stk = lambda xs: jnp.stack(xs, axis=0)
    return (stk(so_l), stk(dirn_l), stk(contrib_l), stk(ok_l), stk(dist_l),
            stk(smat_l))


def _nee_resolve(scene, opts: RenderOptions, contrib, ok, dist_real, smat,
                 hit_s, t_s, tri_s):
    """Visibility half of NEE: combine the per-light shadow results
    ((L,R) each) with the prepped contributions.  Returns (R,3) direct light.
    smat: (L,R) sampled-face material id (can be a PREVIOUS light's under
    quirk #4 fall-through; the reference compares the HIT's material against
    sample_face.material, MTPC/pathTracing.cpp:77).
    """
    compat = opts.compat
    # smat is always a LIGHT material id or -1 (quirk #4 fall-through), and
    # light materials map 1:1 to light face lists, so mat_id[tri] == smat is
    # equivalent to tri being one of that light's faces.  With few total
    # light faces that's a handful of (R,) vector compares instead of a
    # per-light (R,) scalar-path gather (~0.47 ms each at 64k lanes — 2.3
    # ms/iteration on the 5-light veach scene).  Zero-face lights are safe:
    # the loader pads their light_face_tri row with -1, which never equals a
    # real hit triangle id (mat_id equality on such a light is likewise
    # never true — no triangle carries its material).
    lf = scene.light_face_tri
    small_faces = (scene.num_lights * lf.shape[1] <= 64
                   if scene.num_lights else False)
    l_dir = 0.0
    for li in range(scene.num_lights):
        if compat.material_equality_visibility:
            if small_faces:
                vis = jnp.zeros(tri_s[li].shape, bool)
                for lj in range(scene.num_lights):
                    member = jnp.any(
                        tri_s[li][:, None] == lf[lj][None, :], axis=1)
                    vis = vis | ((smat[li] == scene.light_mat[lj]) & member)
                vis = hit_s[li] & vis
            else:
                m_s = _gather_i32(scene.mat_id, jnp.maximum(tri_s[li], 0))
                vis = hit_s[li] & (m_s == smat[li])
        else:
            vis = (~hit_s[li]) | (t_s[li] + opts.ray_epsilon >= dist_real[li] - 1e-3)
        l_dir = l_dir + jnp.where((ok[li] & vis)[:, None], contrib[li], 0.0)
    return l_dir


def _nee_direct(scene, bvh, opts: RenderOptions, p, pn, kd, u, alive):
    """Next-event estimation, reference semantics (MTPC/pathTracing.cpp:165-232).

    One area sample per light; diffuse term only; visibility by material
    equality (quirk #5); inverse-square clamp dist=max(1,d) (quirk #3); the
    receiver cosine enters twice in compat mode (:220-228).
    """
    so, dirn, contrib, ok, dist, smat = _nee_prep(scene, opts, p, pn, kd, u,
                                                  alive)
    # Shadow rays with the same +0.01 origin nudge (:208) and a FULL
    # nearest-hit query, exactly like the reference (no early-out any-hit);
    # dead / black-kd lanes arrive parked from _nee_prep.
    hs, ts, tris = [], [], []
    for li in range(scene.num_lights):
        h, t_s, tr = intersect_any(scene, bvh, so[li], dirn[li], opts)
        hs.append(h); ts.append(t_s); tris.append(tr)
    return _nee_resolve(scene, opts, contrib, ok, dist, smat,
                        jnp.stack(hs), jnp.stack(ts), jnp.stack(tris))


def _next_ray(scene, opts: RenderOptions, p, pn, matf, kd, incoming, u):
    """Lobe/event selection (nextRay, MTPC/pathTracing.cpp:66-134).

    incoming: the current ray direction (the reference passes wo = -incoming
    and immediately re-negates it). matf: packed (R,16) material rows from
    _gather_hit. Returns (origin, direction, ray_type, weight).  Directions
    are detached; the weight (kd/ks/1) carries gradients.
    """
    compat = opts.compat
    ni = matf[:, _MF_NI]
    ks = matf[:, _MF_KS]
    cos_in = jnp.sum(incoming * pn, axis=-1)  # = (-wo).pn (:80)
    exiting = cos_in > 0
    normal_r = jnp.where(exiting[:, None], -pn, pn)
    n1 = jnp.where(exiting, ni, 1.0)
    n2 = jnp.where(exiting, 1.0, ni)
    fresnel = schlick_fresnel(n1, n2, cos_in)
    take_refract = (ni > 1.0) & (fresnel < u[:, 1])

    ok_refr, d_refr = refract_dir(incoming, normal_r, n1 / n2)
    d_tir = reflect(incoming, normal_r)
    # Reference leaves transmission/TIR directions unnormalized when the
    # shading normal is (|pn| != 1 after interpolation) — reproduced verbatim.
    d_trans = jnp.where(ok_refr[:, None], d_refr, d_tir)
    type_trans = jnp.where(ok_refr, RAY_TRANSMISSION, RAY_SPECULAR)

    kd_n = jnp.linalg.norm(jax.lax.stop_gradient(kd), axis=-1)
    ks_n = jnp.linalg.norm(jax.lax.stop_gradient(ks), axis=-1)
    ratio = jnp.where(ks_n > 0, kd_n / jnp.maximum(ks_n, 1e-30), jnp.inf)
    spec = (ks_n != 0) & (ratio < u[:, 2])
    mirror = reflect(incoming, pn)
    axis = jnp.where(spec[:, None], mirror, pn)
    d_lobe = sample_lobe(axis, u[:, 3], u[:, 4], ~spec, matf[:, _MF_NS])
    type_lobe = jnp.where(spec, RAY_SPECULAR, RAY_DIFFUSE)

    direction = jax.lax.stop_gradient(
        jnp.where(take_refract[:, None], d_trans, d_lobe)
    )
    ray_type = jnp.where(take_refract, type_trans, type_lobe)

    # Epsilon offset: 0.01*dir for diffuse/specular bounces (:132) but NONE for
    # the transmission/TIR branch (:102,109) in compat mode.
    eps = jnp.where(
        take_refract & compat.no_transmission_epsilon, 0.0, opts.ray_epsilon
    )
    origin = p + direction * eps[:, None]

    weight = jnp.where(
        (ray_type == RAY_TRANSMISSION)[:, None],
        jnp.ones_like(kd),
        jnp.where((ray_type == RAY_SPECULAR)[:, None], ks, kd),
    )

    # Ns gradient (SURVEY.md §7 step 7): the Phong lobe DIRECTION depends on
    # Ns (theta = acos(u^(1/(Ns+1)))), which the detached-sampling estimator
    # cannot see.  Fold in a score-function surrogate: exp(logp - sg(logp))
    # has value exactly 1 (the forward pass is bitwise unchanged) and
    # gradient d logp/dNs, giving the unbiased REINFORCE term
    # E[f * d/dNs log p(omega | Ns)] for everything downstream of a Phong
    # bounce.  p(omega) = (Ns+1)/(2pi) cos^Ns(theta); the score is taken at
    # the FIXED sampled direction, so log cos(theta) = log(u)/(Ns+1) must be
    # DETACHED (differentiating it through Ns would double-count the
    # reparameterization and break E[score] = 0):
    # logp = log(Ns+1) + Ns * sg(log cos theta) + const.
    if opts.ns_gradient:
        ns = matf[:, _MF_NS]
        phong = (ray_type == RAY_SPECULAR) & ~take_refract
        logcos = jax.lax.stop_gradient(
            jnp.log(jnp.maximum(u[:, 4], 1e-12)) / (ns + 1.0)
        )
        logp = jnp.log(ns + 1.0) + ns * logcos
        surrogate = jnp.where(
            phong, jnp.exp(logp - jax.lax.stop_gradient(logp)), 1.0
        )
        weight = weight * surrogate[:, None]
    return origin, direction, ray_type, weight


def _should_sort(opts: RenderOptions, num_tris: int) -> bool:
    if opts.sort_rays is not None:
        return opts.sort_rays
    return resolve_plan(opts, num_tris)[0] == "cluster"


def trace_paths(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    keys,
    origin,
    direction,
    differentiable: bool = False,
):
    """Full light transport for a batch of primary rays.

    Returns (radiance (R,3), n_rays ()) where n_rays counts the *useful* rays
    traced (primary + per-live-lane shadow and bounce rays) — the quantity a
    depth-first tracer like the reference would have cast, used for rays/s
    accounting.

    Wavefront sorting (opts.sort_rays, default on with the cluster
    intersector): after lobe sampling, the live wavefront is permuted by
    (hit-cluster, new-direction bin) so both the NEE shadow rays (origins
    = hit points, grouped by cluster) and the bounce rays (grouped by origin
    AND direction cone) present coherent tiles to the intersector — the TPU
    counterpart of a GPU wavefront tracer's ray-compaction pass.  Every
    per-lane quantity (including the RNG key) rides the permutation, so the
    estimate is bitwise independent of sorting; a `slot` index unscrambles
    the film at the end.
    """
    hit, t, tri = intersect_any(scene, bvh, origin, direction, opts)
    mat0 = scene.mat_id[jnp.maximum(tri, 0)]
    emit0 = hit & scene.is_emitter[mat0]
    # Primary emitter hit: shade() returns the light radiance (:141-144).
    radiance = jnp.where(emit0[:, None], scene.emission[mat0], 0.0)
    alive = hit & ~emit0
    beta = jnp.ones_like(radiance)
    n_slots = rng.n_bounce_slots(scene.num_lights)
    n_rays = jnp.float32(origin.shape[0])
    do_sort = (_should_sort(opts, scene.num_tris_padded)
               and origin.shape[0] > opts.cluster_rays)
    slot = jnp.arange(origin.shape[0], dtype=jnp.int32)

    def bounce(state, depth):
        alive, origin, direction, t, tri, beta, radiance, keys, slot, n_rays = state
        u = rng.bounce_uniforms(keys, depth, n_slots)
        p, pn, mat, kd = _gather_hit(scene, opts, origin, direction, t, tri)
        cont = alive & (u[:, 0] < opts.rr_probability)  # russian_Roulette (:3-11,240)
        new_o, new_d, ray_type, weight = _next_ray(scene, opts, p, pn, mat, kd, direction, u)

        if do_sort:
            w = opts.cluster_width
            cluster = (jnp.maximum(tri, 0) >> (w.bit_length() - 1)
                       if w & (w - 1) == 0 else jnp.maximum(tri, 0) // w)
            # Same 6-bit direction bin as the refill renderer's sort.
            db = (
                (new_d[:, 0] > 0).astype(jnp.int32) * 32
                + (new_d[:, 1] > 0).astype(jnp.int32) * 16
                + (new_d[:, 2] > 0).astype(jnp.int32) * 8
                + (jnp.abs(new_d[:, 0]) > 0.5).astype(jnp.int32) * 4
                + (jnp.abs(new_d[:, 1]) > 0.5).astype(jnp.int32) * 2
                + (jnp.abs(new_d[:, 2]) > 0.5).astype(jnp.int32)
            )
            sort_key = jnp.where(alive, cluster * 64 + db, jnp.int32(2**30))
            perm = jnp.argsort(sort_key)
            (p, pn, kd, new_o, new_d, weight, beta, radiance, u), \
                (ray_type, keys, slot, alive, cont) = _permute_rows(
                    perm,
                    (p, pn, kd, new_o, new_d, weight, beta, radiance, u),
                    (ray_type, keys, slot, alive, cont),
                )

        radiance = radiance + jnp.where(
            alive[:, None],
            beta * _nee_direct(scene, bvh, opts, p, pn, kd, u, alive),
            0.0,
        )
        beta2 = (beta / opts.rr_probability) * weight

        # Park RR-terminated lanes (same trick as the shadow rays above).
        new_o = jnp.where(cont[:, None], new_o, 1e9)
        hit2, t2, tri2 = intersect_any(scene, bvh, new_o, new_d, opts)
        mat2 = scene.mat_id[jnp.maximum(tri2, 0)]
        emit2 = hit2 & scene.is_emitter[mat2]
        alive2 = cont & hit2
        # SPECULAR/TRANSMISSION bounces see emitters; DIFFUSE contributes zero
        # on emitter hits (NEE double-count guard, :247-261).
        sees_emitter = alive2 & emit2 & (ray_type != RAY_DIFFUSE)
        radiance = radiance + jnp.where(
            sees_emitter[:, None], beta2 * scene.emission[mat2], 0.0
        )
        alive_next = alive2 & ~emit2
        n_rays = n_rays + jnp.sum(alive) * scene.num_lights + jnp.sum(cont)
        return (alive_next, new_o, new_d, t2, tri2, beta2, radiance, keys,
                slot, n_rays), None

    state = (alive, origin, direction, t, tri, beta, radiance, keys, slot, n_rays)

    if differentiable:
        body = bounce
        if opts.max_depth > 4:
            body = jax.checkpoint(bounce)  # O(1) residuals per bounce
        state, _ = jax.lax.scan(body, state, jnp.arange(opts.max_depth))
    else:
        def cond(carry):
            depth, st = carry
            return (depth < opts.max_depth) & jnp.any(st[0])

        def while_body(carry):
            depth, st = carry
            st, _ = bounce(st, depth)
            return depth + 1, st

        _, state = jax.lax.while_loop(cond, while_body, (jnp.int32(0), state))

    radiance, slot, n_rays = state[-4], state[-2], state[-1]
    if do_sort:
        radiance = jnp.zeros_like(radiance).at[slot].set(radiance)
    return radiance, n_rays


KIND_PRIMARY = -1  # `kind` of a camera segment; bounce segments carry RAY_*.


def render_pixels_refill(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    pixel_ids,
    sample_offset=0,
    lanes: int | None = None,
    differentiable: bool = False,
    pixel_fn=None,
):
    """Persistent-wavefront renderer with pixel-pinned lane refill.

    The scan-over-samples path (render_pixels) re-runs the bounce loop at full
    width while Russian roulette kills 40% of lanes per bounce — occupancy
    decays 0.6^depth, so ~90% of every iteration's lockstep work is masked-out
    dead lanes.  Here the wavefront is a lane *pool* over a work queue of
    PIXELS: a lane pops a pixel slot and runs all ``spp`` of its samples
    back-to-back, accumulating their radiance in the lane's own register
    (``rad``); only when the pixel completes does the sum get staged for a
    film write.  This pinning buys two large wins over per-(pixel, sample)
    item scheduling (both profiled on v5e, see git log):

    * **Film scatter amortization.**  Completed pixels stage into
      (pend_slot, pend_rad) lane registers and are flushed by ONE scatter
      every ``spp`` iterations under ``lax.cond`` — safe because a pixel
      takes >= spp iterations (each sample needs >= 1), so a lane cannot
      complete two pixels between flushes.  The dummy index for non-pending
      lanes is ``n_pix + lane`` — out of bounds for the (n_pix, 3) film, so
      the ``mode='drop'`` scatter skips those rows while keeping every
      flush's index set unique.  Replaces a full-width scatter-add EVERY
      iteration (~3.4 ms/iter).
    * **In-lane primary-hit reuse** (compat mode): every sample of a pixel
      shoots the IDENTICAL primary ray (quirk #1, MTPC/pathTracing.cpp:
      305-309), so the first sample's hit (t, tri, hit) is cached in lane
      registers and samples 2..spp skip traversal entirely — their rays are
      parked so the cluster kernel sees empty candidate lists.  No tables,
      no gathers; bitwise identical to re-intersecting (same program, same
      inputs).  Disabled under modern-mode jittered AA.

    Estimator and per-path RNG streams are identical to render_pixels (keys
    are (pixel, sample, depth)-keyed, so lane scheduling is invisible); only
    the film's floating-point accumulation order differs.

    ``differentiable=True`` swaps the while_loop for a lax.scan with a static
    iteration budget (reverse-mode needs a static trip count), rematerialized
    per iteration: budget = total samples * E[segments/path] (geometric RR at
    p=0.6 => 1/(1-p)=2.5, an upper bound since misses terminate early) with
    20% slack, + drain margin.  Paths unfinished at the budget (measure ~0:
    lane-pool concentration over millions of Bernoulli segments) are dropped.
    Completed pixels leave the scan as stacked (rad, slot) outputs and are
    scattered once after the loop.

    ``lanes`` sizes the lane pool independently of the pixel set (default: one
    lane per pixel): a whole frame's pixel queue can be drained by a fixed
    64k-lane pool in a single device program, paying the end-of-queue
    occupancy tail once per frame.

    Returns (mean radiance (n_pix,3) aligned with pixel_ids, rays traced ()).
    """
    n_pix = pixel_ids.shape[0]
    r = min(lanes or n_pix, n_pix)
    spp = opts.spp
    n_slots = rng.n_bounce_slots(scene.num_lights)
    do_sort = _should_sort(opts, scene.num_tris_padded) and r > opts.cluster_rays
    compat = opts.compat
    num_lights = scene.num_lights
    reuse_primary = compat.no_pixel_jitter  # quirk #1: identical primaries
    lane_iota = jnp.arange(r, dtype=jnp.int32)
    # Unique OUT-OF-BOUNDS dummies: mode='drop' skips these rows in the film
    # flush, so only lanes with a real completed pixel pay scatter work.
    dummy_slot = jnp.int32(n_pix) + lane_iota
    # Pending-slot depth: each lax.cond flush fire costs ~5 ms at a 1M-pixel
    # film (the cond's film branch copy runs at scatter speed), and a lane
    # can complete a pixel every spp iterations — so at low spp the old
    # flush-every-spp cadence fired 2-16x more often than at spp 16 (the
    # measured ~40% low-spp throughput gap, round-2 VERDICT item 3).  Giving
    # each lane n_pend staging slots stretches the safe cadence to
    # n_pend * spp iterations at the price of a larger sort payload — capped
    # at 2 slots: at P=4/spp=4 the 59-column permute payload stopped fusing
    # with its gather and cost 1.33 ms/iter in payload-assembly copies
    # (profiled; <= 55 columns fuses).  Lane-LOCAL pend registers (out of
    # the sort payload entirely) were measured worse at every spp: the sort
    # concentrates completions into physical-lane regions, forcing either
    # ~9-iteration flush fires (P=8 guard-only: 20.5 ms/fire at 524k rows)
    # or overwrite-unsafe staging — see the round-3 journey notes.
    n_pend = 1 if differentiable else max(1, min(2, -(-16 // spp)))
    dummy_pend = (jnp.int32(n_pix) + lane_iota[:, None] * n_pend
                  + jnp.arange(n_pend, dtype=jnp.int32)[None, :])  # (r, P)

    def primary_for(pix, keys):
        jitter = None if compat.no_pixel_jitter else rng.primary_uniforms(keys)
        return primary_rays(scene.camera, pix, jitter)

    pix0 = pixel_ids[:r]
    keys0 = rng.lane_keys(opts.seed, pix0, jnp.asarray(sample_offset))
    o0, d0 = primary_for(pix0, keys0)

    # In differentiable mode every scan level stacks per-step state as
    # (n_iter, *field) residuals for its backward — the OUTER scan stacks
    # block-boundary carries, and the inner scan's linearization stacks each
    # STEP's carry during the remat recompute.  An (r, 3) field pads its
    # minor dim 3 -> 128 on TPU (42x HBM blowup; moving the packing to block
    # boundaries only was measured at 6.35 s vs 3.68 s per spp-16 chunk), so
    # the seven f32 vector fields travel packed as one (12 + 2*n_pend, r)
    # array (sublane pad only) and are transposed in/out of the step.  The
    # forward while_loop keeps the unpacked layout.
    if differentiable:
        def pack_f(o, d, b, rd, pr, pg, pb):
            return (jnp.concatenate([o.T, d.T, b.T, rd.T, pr.T, pg.T, pb.T],
                                    axis=0),)

        def unpack_f(packed):
            (fs,) = packed
            p0 = 12 + n_pend
            return (fs[0:3].T, fs[3:6].T, fs[6:9].T, fs[9:12].T,
                    fs[12:p0].T, fs[p0:p0 + n_pend].T,
                    fs[p0 + n_pend:p0 + 2 * n_pend].T)
    else:
        def pack_f(o, d, b, rd, pr, pg, pb):
            return (o, d, b, rd, pr, pg, pb)

        def unpack_f(packed):
            return packed

    def step(state):
        """One wavefront iteration sans film writes: returns (state',
        flush_rad (r,3), flush_slot (r,)) — the pixel sums completed THIS
        iteration (zeros / unique dummy slots elsewhere), which the caller
        either stages (forward, flushed on a cadence) or stacks
        (differentiable scan, scattered once at the end).

        Pipeline shape: the lane's ARRIVAL (hit, t, tri) is carried in from
        the previous iteration's combined intersect.  This step shades it,
        builds the NEE shadow rays AND the next segment's rays, sorts the
        wavefront, then issues ONE combined intersect over
        [next arrivals; all lights' shadow rays] — (1+L)*r rays — and
        resolves NEE visibility from the shadow part in the same iteration.
        One call per iteration instead of 1+L pays the candidate-phase fixed
        cost (~1.2 ms at 64k lanes) once.
        """
        (q, n_rays, active, slot, pix, samp, samp_left, keys, depth, kind,
         was_fresh, hit_a, t_a, tri_a, prim_ok, prim_hit, prim_t, prim_tri,
         pend_slot, pend_count, *fvec) = state
        origin, direction, beta, rad, pend_r, pend_g, pend_b = unpack_f(
            tuple(fvec))

        # n_rays counts estimator-level segments (what the reference would
        # cast); cached primaries are memoized, not skipped, estimator-wise.
        n_rays = n_rays + jnp.sum(active)

        # Cache the pixel's first-sample primary hit for reuse.
        is_prim = kind == KIND_PRIMARY
        fresh_prim = active & was_fresh & is_prim
        prim_hit = jnp.where(fresh_prim, hit_a, prim_hit)
        prim_t = jnp.where(fresh_prim, t_a, prim_t)
        prim_tri = jnp.where(fresh_prim, tri_a, prim_tri)
        prim_ok = prim_ok | fresh_prim

        # One packed row gather serves both the arrival logic and shading.
        p, pn, matf, kd = _gather_hit(scene, opts, origin, direction, t_a, tri_a)
        emit = hit_a & (matf[:, _MF_IS_EMITTER] > 0)
        emission = matf[:, _MF_EMIT]
        # Emitter-hit terms: primary returns the light radiance
        # (MTPC/pathTracing.cpp:141-144); SPECULAR/TRANSMISSION bounces see
        # emitters, DIFFUSE does not (NEE double-count guard, :247-261).
        add_prim = active & is_prim & emit
        rad = rad + jnp.where(add_prim[:, None], emission, 0.0)
        add_spec = active & ~is_prim & emit & (kind != RAY_DIFFUSE)
        rad = rad + jnp.where(add_spec[:, None], beta * emission, 0.0)

        shade = active & hit_a & ~emit & (depth < opts.max_depth)
        sample_done = active & ~shade

        u = rng.bounce_uniforms(keys, depth, n_slots)
        # NEE sampling/geometry; visibility resolves after the combined call.
        # The contribution is scaled by the PRE-RR-update beta.  With >= 2
        # lights the per-light NEE products (11L permute columns) would push
        # the sort payload past its ~55-column gather-fusion cliff (measured
        # 1.33 ms/iter of payload-assembly copies), so the prep moves AFTER
        # the sort: only its compact inputs ride (p, pn, kd, pre-RR beta,
        # pre-transition keys/depth — 15 columns, L-independent) and the
        # uniforms are re-derived from the sorted counter-RNG keys, giving
        # bitwise-identical streams.
        post_nee = do_sort and num_lights >= 2
        if post_nee:
            beta_nee = beta
            keys_nee = keys
            depth_nee = depth
        else:
            so_s, dirn_s, contrib, ok_n, dist_n, smat_n = _nee_prep(
                scene, opts, p, pn, kd, u, shade)
            contrib = contrib * beta[None]
        cont = shade & (u[:, 0] < opts.rr_probability)
        new_o, new_d, rtype, weight = _next_ray(
            scene, opts, p, pn, matf, kd, direction, u
        )
        beta = jnp.where(cont[:, None], (beta / opts.rr_probability) * weight, beta)
        sample_done = sample_done | (shade & ~cont)
        n_rays = n_rays + jnp.sum(shade) * num_lights

        # --- Sample / pixel transitions.
        pixel_done = sample_done & (samp_left <= 0)
        next_samp = sample_done & (samp_left > 0)

        # Next sample of the SAME pixel and/or next pixel from the queue:
        # merged into ONE key-derivation + camera evaluation.
        rank = jnp.cumsum(pixel_done.astype(jnp.int32)) - 1
        new_slot = q + rank
        take = pixel_done & (new_slot < n_pix)
        # The completed pixel's film slot, captured BEFORE the lane moves on
        # to its next queue slot (staged after the NEE resolve below).
        slot_done = jnp.where(pixel_done, slot, dummy_slot)
        safe_slot = jnp.minimum(new_slot, n_pix - 1)
        # pixel_fn (when the caller's pixel_ids are the standard tile
        # swizzle) computes the pixel id arithmetically; otherwise gather.
        pix_new = pixel_fn(safe_slot) if pixel_fn is not None \
            else _gather_i32(pixel_ids, safe_slot)
        restart = next_samp | take
        pix2 = jnp.where(take, pix_new, pix)
        samp2 = jnp.where(take, jnp.asarray(sample_offset),
                          jnp.where(next_samp, samp + 1, samp))
        keys2 = rng.lane_keys(opts.seed, pix2, samp2)
        o_prim, d_prim = primary_for(pix2, keys2)
        # Under compat the cached primary hit replaces traversal for repeat
        # samples of the same pixel (quirk #1: identical primaries).
        reuse = next_samp & prim_ok if reuse_primary else jnp.zeros_like(next_samp)

        active = (active & ~sample_done) | restart
        slot = jnp.where(take, new_slot, slot)
        pix = pix2
        samp = samp2
        samp_left = jnp.where(take, spp - 1,
                              jnp.where(next_samp, samp_left - 1, samp_left))
        keys = jnp.where(restart[:, None], keys2, keys)
        depth = jnp.where(restart, 0, depth + cont.astype(jnp.int32))
        kind = jnp.where(restart, KIND_PRIMARY, jnp.where(cont, rtype, kind))
        origin = jnp.where(restart[:, None], o_prim,
                           jnp.where(cont[:, None], new_o, origin))
        direction = jnp.where(restart[:, None], d_prim,
                              jnp.where(cont[:, None], new_d, direction))
        beta = jnp.where(restart[:, None], 1.0, beta)
        prim_ok = prim_ok & ~take
        was_fresh = active & ~reuse
        q = q + jnp.sum(take)

        if do_sort:
            # Coherence grouping for the UPCOMING combined call: bounce
            # segments by (origin cluster, new direction bin); camera
            # segments share one bucket; cached/inactive lanes park at the
            # end.  Shadow rays inherit their lane's position, so they sort
            # coherently too (origins cluster with the bounce origins).
            w = opts.cluster_width
            cluster = (jnp.maximum(tri_a, 0) >> (w.bit_length() - 1)
                       if w & (w - 1) == 0 else jnp.maximum(tri_a, 0) // w)
            # 6-bit direction bin: sign + |component| > 0.5 per axis — a
            # finer split than the plain octant tightens each bounce
            # subtile's candidate union.
            db = (
                (direction[:, 0] > 0).astype(jnp.int32) * 32
                + (direction[:, 1] > 0).astype(jnp.int32) * 16
                + (direction[:, 2] > 0).astype(jnp.int32) * 8
                + (jnp.abs(direction[:, 0]) > 0.5).astype(jnp.int32) * 4
                + (jnp.abs(direction[:, 1]) > 0.5).astype(jnp.int32) * 2
                + (jnp.abs(direction[:, 2]) > 0.5).astype(jnp.int32)
            )
            bucket = jnp.where(kind == KIND_PRIMARY, jnp.int32(1 << 20), cluster)
            sort_key = jnp.where(active & was_fresh, bucket * 64 + db,
                                 jnp.where(active, jnp.int32(1 << 27),
                                           jnp.int32(2 ** 30)))
            perm = jnp.argsort(sort_key)
            l = num_lights
            if post_nee:
                (origin, direction, beta, rad, pend_r, pend_g, pend_b,
                 f_pack, p_s, pn_s, kd_s, beta_nee), \
                    (slot, pix, samp, samp_left, keys, depth, kind, active,
                     was_fresh, prim_ok, prim_hit, prim_tri, pend_slot,
                     pend_count, shade, take, pixel_done, slot_done,
                     keys_nee, depth_nee) = _permute_rows(
                        perm,
                        (origin, direction, beta, rad, pend_r, pend_g,
                         pend_b, prim_t[:, None], p, pn, kd, beta_nee),
                        (slot, pix, samp, samp_left, keys, depth, kind,
                         active, was_fresh, prim_ok, prim_hit, prim_tri,
                         pend_slot, pend_count, shade, take, pixel_done,
                         slot_done, keys_nee, depth_nee),
                    )
                prim_t = f_pack[:, 0]
                u2 = rng.bounce_uniforms(keys_nee, depth_nee, n_slots)
                so_s, dirn_s, contrib, ok_n, dist_n, smat_n = _nee_prep(
                    scene, opts, p_s, pn_s, kd_s, u2, shade)
                contrib = contrib * beta_nee[None]
            else:
                (origin, direction, beta, rad, pend_r, pend_g, pend_b, f_pack,
                 so_p, dn_p, ct_p), \
                    (slot, pix, samp, samp_left, keys, depth, kind, active,
                     was_fresh, prim_ok, prim_hit, prim_tri, pend_slot,
                     pend_count, shade, take, pixel_done, slot_done, ok_p,
                     smat_p) = _permute_rows(
                        perm,
                        (origin, direction, beta, rad, pend_r, pend_g, pend_b,
                         jnp.stack([prim_t] + [dist_n[i] for i in range(l)],
                                   axis=1),
                         so_s.transpose(1, 0, 2).reshape(r, 3 * l),
                         dirn_s.transpose(1, 0, 2).reshape(r, 3 * l),
                         contrib.transpose(1, 0, 2).reshape(r, 3 * l)),
                        (slot, pix, samp, samp_left, keys, depth, kind, active,
                         was_fresh, prim_ok, prim_hit, prim_tri, pend_slot,
                         pend_count, shade, take, pixel_done, slot_done,
                         ok_n.T.astype(jnp.int32) if l > 1 else ok_n[0],
                         smat_n.T if l > 1 else smat_n[0]),
                    )
                prim_t = f_pack[:, 0]
                dist_n = f_pack[:, 1:].T
                so_s = so_p.reshape(r, l, 3).transpose(1, 0, 2)
                dirn_s = dn_p.reshape(r, l, 3).transpose(1, 0, 2)
                contrib = ct_p.reshape(r, l, 3).transpose(1, 0, 2)
                ok_n = (ok_p.T != 0) if l > 1 else ok_p[None]
                smat_n = smat_p.T if l > 1 else smat_p[None]

        # --- ONE combined intersect: next arrivals + all shadow rays.
        ray_o = jnp.where((active & was_fresh)[:, None], origin, 1e9)
        all_o = jnp.concatenate([ray_o] + [so_s[i] for i in range(num_lights)])
        all_d = jnp.concatenate([direction] + [dirn_s[i] for i in range(num_lights)])
        hit_q, t_q, tri_q = intersect_any(scene, bvh, all_o, all_d, opts)
        if differentiable:
            # Saved as reverse-pass residuals (save_only_these_names below):
            # traversal is stop-gradient everywhere, so rematerializing the
            # intersector kernels in the backward pass is pure waste — saving
            # (hit, t, tri) skips it (~1.5 MB/iteration at 64k lanes).
            from jax.ad_checkpoint import checkpoint_name
            hit_q = checkpoint_name(hit_q, "isect_hit")
            t_q = checkpoint_name(t_q, "isect_t")
            tri_q = checkpoint_name(tri_q, "isect_tri")
        hit2, t2, tri2 = hit_q[:r], t_q[:r], tri_q[:r]
        hs = hit_q[r:].reshape(num_lights, r)
        ts = t_q[r:].reshape(num_lights, r)
        tris = tri_q[r:].reshape(num_lights, r)

        # NEE visibility resolution (same iteration, post-call).
        l_dir = _nee_resolve(scene, opts, contrib, ok_n, dist_n, smat_n,
                             hs, ts, tris)
        rad = rad + jnp.where(shade[:, None], l_dir, 0.0)

        # Flush outputs for the differentiable scan path; the forward path
        # instead stages into the pend registers just below.
        flush_slot = slot_done
        flush_rad = jnp.where(pixel_done[:, None], rad, 0.0)
        # Stage completed pixel sums into the lane's next free pending slot;
        # a lane completes at most one pixel per spp iterations, so n_pend
        # slots are flushed before any can be overwritten (cadence
        # n_pend * spp below).
        pc = jnp.minimum(pend_count, n_pend - 1)
        stage = ((jnp.arange(n_pend, dtype=jnp.int32)[None, :] == pc[:, None])
                 & pixel_done[:, None])  # (r, P)
        pend_slot = jnp.where(stage, slot_done[:, None], pend_slot)
        # Channel-split staging: pend radiance lives as three (r, P) arrays
        # so the update is a pure 2D broadcast — every packed-RGB variant
        # ((r, P, 3) reshape, repeat/tile to (r, 3P)) materializes a
        # minor-dim-3-ish layout that costs ~1.2 ms/iter at P = 4 (profiled;
        # the round-2 low-spp gap's residue).  The (r*P, 3) update matrix is
        # assembled only inside do_flush, once per flush cadence.
        pend_r = jnp.where(stage, rad[:, 0:1], pend_r)
        pend_g = jnp.where(stage, rad[:, 1:2], pend_g)
        pend_b = jnp.where(stage, rad[:, 2:3], pend_b)
        pend_count = pend_count + pixel_done.astype(jnp.int32)
        rad = jnp.where(take[:, None], 0.0, rad)  # next_samp keeps the sum

        # Arrival carry for the next iteration: fresh traversal results, or
        # the cached primary hit for reuse lanes.
        hit_a = jnp.where(was_fresh, hit2, prim_hit)
        t_a = jnp.where(was_fresh, t2, prim_t)
        tri_a = jnp.where(was_fresh, tri2, prim_tri)

        return ((q, n_rays, active, slot, pix, samp, samp_left, keys, depth,
                 kind, was_fresh, hit_a, t_a, tri_a, prim_ok, prim_hit,
                 prim_t, prim_tri, pend_slot, pend_count)
                + pack_f(origin, direction, beta, rad, pend_r, pend_g,
                         pend_b),
                flush_rad, flush_slot)

    # Bootstrap: the loop carries each lane's arrival, so the first batch of
    # primaries is intersected once up front.
    hit0, t0, tri0 = intersect_any(scene, bvh, o0, d0, opts)

    state0 = (
        jnp.int32(r),                      # q: first r pixel slots issued below
        jnp.float32(0),                    # n_rays
        jnp.ones((r,), bool),              # active
        lane_iota,                         # slot: pixel slots 0..r-1
        pix0,
        jnp.full((r,), sample_offset, jnp.int32),   # samp (absolute)
        jnp.full((r,), spp - 1, jnp.int32),         # samp_left
        keys0,
        jnp.zeros((r,), jnp.int32),        # depth
        jnp.full((r,), KIND_PRIMARY, jnp.int32),
        jnp.ones((r,), bool),              # was_fresh
        hit0,                              # hit_a
        t0,                                # t_a
        tri0,                              # tri_a
        jnp.zeros((r,), bool),             # prim_ok
        jnp.zeros((r,), bool),             # prim_hit
        jnp.zeros((r,), jnp.float32),      # prim_t
        jnp.zeros((r,), jnp.int32),        # prim_tri
        dummy_pend,                        # pend_slot (r, n_pend)
        jnp.zeros((r,), jnp.int32),        # pend_count
    ) + pack_f(
        o0,
        d0,
        jnp.ones((r, 3), jnp.float32),     # beta
        jnp.zeros((r, 3), jnp.float32),    # rad
        jnp.zeros((r, n_pend), jnp.float32),  # pend_r
        jnp.zeros((r, n_pend), jnp.float32),  # pend_g
        jnp.zeros((r, n_pend), jnp.float32),  # pend_b
    )

    if differentiable:
        # Static iteration budget for reverse-mode.
        # Expected lane-iterations per sample: the RR bound 1/(1-p) * 1.2
        # covers any scene; a measured opts.bwd_seg_per_sample (cornell-box:
        # 2.30) trims ~25% off the scan length.  An insufficient budget is
        # DETECTED below (negative n_rays), not silent.
        e_seg = (opts.bwd_seg_per_sample
                 if opts.bwd_seg_per_sample is not None
                 else 1.2 / (1.0 - opts.rr_probability))
        n_iter = (int(np.ceil(n_pix * spp * e_seg / r))
                  + opts.max_depth + spp + 4)

        # Nested scan: an outer scan over checkpointed K-step blocks, K =
        # n_pend * spp (the pend-register safe cadence: a lane retires at
        # most one pixel per spp iterations, so pend slots cannot overwrite
        # within a block).  Completed pixel sums stage into the carried pend
        # registers and leave the loop ONCE per block as (r, n_pend)
        # channel-split outputs — 1/spp of the per-step flush-output traffic
        # the flat scan stacked (16 B/lane/iteration), and the outer scan
        # saves block-boundary carries only.  Backward recompute volume is
        # unchanged (each step rematerialized once, from its block's entry
        # carry), and the saved intersect residuals still skip the kernels.
        k_steps = max(1, n_pend * spp)
        n_outer = -(-n_iter // k_steps)

        def block(state, _):
            def inner(st, _):
                st, _, _ = step(st)  # retires ride the pend registers
                return st, None
            state = jax.lax.scan(inner, state, None, length=k_steps)[0]
            (q, n_rays_c, active, slot, pix, samp, samp_left, keys, depth,
             kind, was_fresh, hit_a, t_a, tri_a, prim_ok, prim_hit, prim_t,
             prim_tri, pend_slot, pend_count, *fvec) = state
            origin, direction, beta, rad, pend_r, pend_g, pend_b = unpack_f(
                tuple(fvec))
            # FLAT (n_pend * r) block outputs: an (r, 1) output would stack
            # to (n_blocks, r, 1), whose minor dim pads 1 -> 128 on TPU.
            out = (pend_slot.reshape(-1), pend_r.reshape(-1),
                   pend_g.reshape(-1), pend_b.reshape(-1))
            zero_p = jnp.zeros((r, n_pend), jnp.float32)
            state = (q, n_rays_c, active, slot, pix, samp, samp_left, keys,
                     depth, kind, was_fresh, hit_a, t_a, tri_a, prim_ok,
                     prim_hit, prim_t, prim_tri, dummy_pend,
                     jnp.zeros((r,), jnp.int32)) + pack_f(
                origin, direction, beta, rad, zero_p, zero_p, zero_p)
            return state, out

        remat_block = jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.save_only_these_names(
                "isect_hit", "isect_t", "isect_tri", "perm_inv"),
        )
        state, (slot_out, r_out, g_out, b_out) = jax.lax.scan(
            remat_block, state0, None, length=n_outer
        )
        # Channel-split 1-D scatter-adds (the pend registers are already
        # channel-split, so no (N, 3) assembly/transpose is needed).  Real
        # slots are unique across the frame (each pixel retires once), but
        # dummy slots repeat across blocks — mode='drop' without a
        # unique_indices claim.
        idx = slot_out.reshape(-1)
        film = jnp.stack([
            jnp.zeros((n_pix,), jnp.float32).at[idx].add(
                r_out.reshape(-1), mode="drop"),
            jnp.zeros((n_pix,), jnp.float32).at[idx].add(
                g_out.reshape(-1), mode="drop"),
            jnp.zeros((n_pix,), jnp.float32).at[idx].add(
                b_out.reshape(-1), mode="drop"),
        ], axis=1)
        # Budget check: samples still in flight past the static scan length
        # were dropped from the film.  Signalled as a negated ray count so
        # the (differentiable, aux) calling convention needn't change.
        incomplete = (state[0] < n_pix) | jnp.any(state[2])
        n_rays = jnp.where(incomplete, -state[1], state[1])
    else:
        flush_every = max(1, n_pend * spp)

        def do_flush(film, pend_slot, pend_r, pend_g, pend_b, pend_count):
            # Index set is unique by construction: real slots are owned by
            # exactly one (lane, position); dummies are
            # n_pix + lane * n_pend + position (out of bounds, dropped).
            # The film is CHANNEL-MAJOR (3, n_pix): three 1-D scatter-adds
            # measured ~half the cost of one row-of-3 scatter (the (N, 3)
            # layout pays minor-dim padding in the cond's film branch copy;
            # tools/probe_flush.py), and the pend registers are already
            # channel-split.
            idx = pend_slot.reshape(-1)
            film = jnp.stack([
                film[0].at[idx].add(pend_r.reshape(-1),
                                    unique_indices=True, mode="drop"),
                film[1].at[idx].add(pend_g.reshape(-1),
                                    unique_indices=True, mode="drop"),
                film[2].at[idx].add(pend_b.reshape(-1),
                                    unique_indices=True, mode="drop"),
            ])
            return film, dummy_pend, jnp.zeros((r,), jnp.int32)

        def cond(carry):
            i, state, film = carry
            q, active = state[0], state[2]
            return (q < n_pix) | jnp.any(active)

        def body(carry):
            i, state, film = carry
            state, _, _ = step(state)
            film, pend_slot, pend_count = jax.lax.cond(
                (i + 1) % flush_every == 0,
                do_flush,
                lambda f, ps, pr, pg, pb, pc: (f, ps, pc),
                film, state[18], state[24], state[25], state[26], state[19],
            )
            state = state[:18] + (pend_slot, pend_count) + state[20:]
            return i + 1, state, film

        _, state, film = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), state0, jnp.zeros((3, n_pix), jnp.float32)),
        )
        # Drain pendings staged since the last cadence boundary.
        film, _, _ = do_flush(film, state[18], state[24], state[25],
                              state[26], state[19])
        film = film.T  # back to (n_pix, 3) once per dispatch
        n_rays = state[1]
    return film / spp, n_rays


def render_pixels(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    pixel_ids,
    differentiable: bool = False,
    sample_offset=0,
):
    """Average radiance over opts.spp samples for flat pixel ids (R,).

    The per-pixel SPP loop (generateImg's OpenMP region,
    MTPC/pathTracing.cpp:303-319) becomes a scan over sample indices; samples
    are embarrassingly independent so this axis equally shards across chips
    (parallel/) — ``sample_offset`` gives each shard its slice of the global
    sample-index stream so an N-chip render averages exactly the same sample
    set as a 1-chip render.

    Returns (mean radiance (R,3), rays traced ()).
    """
    if opts.refill:
        return render_pixels_refill(scene, bvh, opts, pixel_ids, sample_offset,
                                    differentiable=differentiable)

    compat = opts.compat

    def sample_body(acc, s):
        acc_rad, acc_rays = acc
        keys = rng.lane_keys(opts.seed, pixel_ids, s + sample_offset)
        jitter = None if compat.no_pixel_jitter else rng.primary_uniforms(keys)
        origin, direction = primary_rays(scene.camera, pixel_ids, jitter)
        radiance, n_rays = trace_paths(
            scene, bvh, opts, keys, origin, direction, differentiable
        )
        return (acc_rad + radiance, acc_rays + n_rays), None

    body = sample_body
    if differentiable:
        body = jax.checkpoint(sample_body)
    acc0 = (jnp.zeros((pixel_ids.shape[0], 3), jnp.float32), jnp.float32(0))
    (acc, rays), _ = jax.lax.scan(body, acc0, jnp.arange(opts.spp))
    return acc / opts.spp, rays


@functools.partial(jax.jit, static_argnames=("opts", "differentiable"))
def render_image_stats(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    differentiable: bool = False,
    sample_offset=0,
):
    """Full-frame render -> ((H, W, 3) float32 radiance, rays traced ()).

    Forward renders drain the whole frame's (pixel, sample) queue through one
    opts.chunk_size lane pool (render_pixels_refill) — one device program, one
    occupancy tail.  The differentiable / scan path processes pixels in
    chunks of opts.chunk_size lanes via lax.map to bound live wavefront state.

    ``sample_offset`` slides the absolute sample-index window so progressive /
    resumed renders continue the exact same per-pixel RNG streams a single
    full-SPP render would consume (SURVEY.md §5.4).
    """
    h, w = scene.camera.height, scene.camera.width
    n = h * w
    chunk = min(opts.chunk_size, max(1024, n))
    ids_np = _tile_swizzled_ids(h, w, swizzle_tile(opts, scene.num_tris_padded))  # (n_pad,)

    if opts.refill:
        ids = jnp.asarray(ids_np)
        out, rays = render_pixels_refill(
            scene, bvh, opts, ids, sample_offset, lanes=chunk,
            differentiable=differentiable,
            pixel_fn=_swizzle_pixel_fn(h, w, swizzle_tile(opts, scene.num_tris_padded)))
        flat = jnp.zeros((n, 3), out.dtype).at[ids].set(out)
        return flat.reshape(h, w, 3), rays

    n_pad = ((ids_np.shape[0] + chunk - 1) // chunk) * chunk
    pad = n_pad - ids_np.shape[0]
    if pad:
        ids_np = np.concatenate([ids_np, np.full(pad, ids_np[-1], np.int32)])
    ids = jnp.asarray(ids_np).reshape(-1, chunk)

    def do_chunk(pix):
        return render_pixels(scene, bvh, opts, pix, differentiable,
                             sample_offset=sample_offset)

    out, rays = jax.lax.map(do_chunk, ids)  # (n_chunks, chunk, 3), (n_chunks,)
    flat = jnp.zeros((n, 3), out.dtype).at[ids.reshape(-1)].set(out.reshape(-1, 3))
    return flat.reshape(h, w, 3), jnp.sum(rays)


def render_image(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    differentiable: bool = False,
    sample_offset=0,
):
    """Full-frame render -> (H, W, 3) float32 radiance (pre-tonemap)."""
    return render_image_stats(scene, bvh, opts, differentiable, sample_offset)[0]


_render_chunk_jit = jax.jit(
    render_pixels, static_argnames=("opts", "differentiable")
)

_render_refill_jit = jax.jit(
    render_pixels_refill, static_argnames=("opts", "lanes", "pixel_fn")
)


@functools.partial(jax.jit, static_argnames=("h", "w", "spp"))
def _assemble_frame_jit(acc, ids, h: int, w: int, spp: int):
    flat = jnp.zeros((h * w, 3), acc.dtype).at[ids].set(acc / spp)
    return flat.reshape(h, w, 3)


@functools.lru_cache(maxsize=16)
def _device_ids(h: int, w: int, tile: int):
    """Device-resident swizzled pixel-id table.  Uploading the 4 MB id array
    through the axon tunnel costs ~0.1-0.3 s; renders of the same frame shape
    reuse one upload."""
    return jnp.asarray(_tile_swizzled_ids(h, w, tile))


def render_image_host_chunked(
    scene: SceneArrays,
    bvh: BVHArrays,
    opts: RenderOptions,
    progress=None,
    retries: int = 0,
):
    """Full-frame render dispatched as one device execution per
    (pixel-chunk, spp-chunk) from the host.

    Same result as render_image (identical RNG keying), but each device
    program is short — required on fronted/tunneled TPUs that cap single
    execution wall time, and it gives natural progress/checkpoint points
    (SURVEY.md §5.3/§5.4: a failed chunk is re-renderable idempotently).
    ``retries`` > 0 turns that idempotence into an automated recovery path:
    a dispatch that raises (transient device fault) is re-issued up to
    ``retries`` times — the chunk's sample set is keyed by
    (pixel, absolute sample index), so the retry renders exactly the same
    samples and the film is unaffected by the failure.

    In refill mode (the forward default) each dispatch drains the whole
    frame's queue for a slice of spp_chunk samples; otherwise each dispatch
    renders one pixel chunk at full spp.  Returns ((H,W,3) f32, rays traced).
    The frame is a DEVICE array in both modes (assembled on device in refill
    mode; pulling the 12 MB film through the axon tunnel costs ~0.4-0.5 s
    that callers writing a PNG pay exactly once via np.asarray) — callers
    must not mutate it in place.
    """
    import numpy as np

    h, w = scene.camera.height, scene.camera.width
    n = h * w
    chunk = min(opts.chunk_size, max(1024, n))
    ids_np = _tile_swizzled_ids(h, w, swizzle_tile(opts, scene.num_tris_padded))
    spp_chunk = max(1, min(opts.spp_chunk, opts.spp))

    def dispatch(fn, *args, **kw):
        for attempt in range(retries + 1):
            try:
                out = fn(*args, **kw)
                jax.block_until_ready(out[0])  # surface async device faults here
                return out
            except Exception:
                if attempt == retries:
                    raise
        raise AssertionError("unreachable")

    if opts.refill:
        ids = _device_ids(h, w, swizzle_tile(opts, scene.num_tris_padded))
        acc = None
        done = 0
        total_rays = 0.0
        n_steps = -(-opts.spp // spp_chunk)
        # Balanced chunk sizes: spp 25 at spp_chunk 8 renders 5x5, not
        # 8+8+8+1 — a 1-spp remainder dispatch runs at ~40% of headline
        # throughput (per-frame fixed cost, see BASELINE spp sweep).  Prefer
        # EQUAL chunks (one compiled program — the tunneled device wedges a
        # process that compiles+runs a second distinct large program, and
        # one program also halves cold-compile time); fall back to
        # base/base+1 (two programs) when no divisor lands near the
        # requested chunk size.
        for n in range(n_steps, min(2 * n_steps, opts.spp) + 1):
            if opts.spp % n == 0:
                n_steps = n
                break
        base, extra = divmod(opts.spp, n_steps)
        step = 0
        while done < opts.spp:
            k = base + (1 if step < extra else 0)
            rad, rays = dispatch(
                _render_refill_jit,
                scene, bvh, opts.replace(spp=k), ids,
                sample_offset=done, lanes=chunk,
                pixel_fn=_swizzle_pixel_fn(
                    h, w, swizzle_tile(opts, scene.num_tris_padded)),
            )
            acc = rad * k if acc is None else acc + rad * k
            total_rays += float(rays)
            done += k
            step += 1
            if progress is not None:
                progress(step, n_steps)
        # Assemble the frame ON DEVICE and return a device array: pulling the
        # 12 MB film through the axon tunnel costs ~0.4-0.5 s (profiled) and
        # is not device work — callers materialize it when writing the PNG.
        # Duplicate ids (edge-tile clamps) write bitwise-identical values
        # (same pixel id => same RNG streams => same estimator sum).
        flat = _assemble_frame_jit(acc, ids, h, w, opts.spp)
        return flat, total_rays

    n_pad = ((ids_np.shape[0] + chunk - 1) // chunk) * chunk
    if n_pad != ids_np.shape[0]:
        ids_np = np.concatenate(
            [ids_np, np.full(n_pad - ids_np.shape[0], ids_np[-1], np.int32)]
        )
    ids_np = ids_np.reshape(-1, chunk)

    flat = np.zeros((n, 3), np.float32)
    total_rays = 0.0
    n_chunks = ids_np.shape[0]
    for ci in range(n_chunks):
        ids = jnp.asarray(ids_np[ci])
        acc = None
        done = 0
        while done < opts.spp:
            k = min(spp_chunk, opts.spp - done)
            part_opts = opts.replace(spp=k)
            rad, rays = dispatch(
                _render_chunk_jit, scene, bvh, part_opts, ids,
                sample_offset=done,
            )
            acc = rad * k if acc is None else acc + rad * k
            total_rays += float(rays)
            done += k
        flat[ids_np[ci]] = np.asarray(acc) / opts.spp
        if progress is not None:
            progress(ci + 1, n_chunks)
    # Same return type as the refill branch (device array, not a mutable
    # host ndarray) so callers see one contract regardless of opts.refill.
    return jnp.asarray(flat.reshape(h, w, 3)), total_rays
