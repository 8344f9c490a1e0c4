"""LBVH over Morton-sorted triangles as a *perfect* implicit heap.

Reference build: bottom-up, level-synchronous construction of an implicit
complete binary tree with "virtual" (missing) nodes elided from the flat array
via popcount index compaction (``BVH::buildBVH`` ``MTPC/BVH.cpp:44-85``,
``findIndex`` ``:99-104``).  The compaction exists only to save CPU memory.

TPU-native redesign: the triangle array is padded to ``Lc = 2^ceil(log2 t)``
leaves (same leaf-slot count as the reference, ``MTPC/BVH.cpp:47``) with
*empty* boxes (min=+BIG, max=-BIG), making the tree perfect:

* flat SoA node arrays of size ``2*Lc`` in 1-based heap order — children of
  ``k`` are ``2k`` and ``2k+1``, parent is ``k>>1``, leaves are ``k in [Lc, 2Lc)``;
* no index compaction: a "virtual" subtree is just an empty box the slab test
  rejects (union(empty, real) == real, so internal AABBs equal the reference's);
* the build is log2(Lc) pairwise min/max reductions — pure vectorized XLA;
* traversal is *stackless* with O(1) per-ray state: descend-left on hit,
  otherwise advance to the next preorder subtree by stripping trailing 1-bits
  of the heap key (a closed-form replacement for "pop until not a right
  child"), which maps onto lockstep SIMD lanes with no VMEM stack at all.
  The reference instead recurses depth-first (``bvh_intersect``,
  ``MTPC/pathTracing.cpp:334-374``); the visit order differs but the nearest
  hit is identical.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.intersect import ray_aabb, ray_triangle

BIG = jnp.float32(1e30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVHArrays:
    """1-based heap: slot 0 unused, root at 1, leaves at [num_leaves, 2*num_leaves)."""

    node_min: Any  # (2*Lc, 3) f32
    node_max: Any  # (2*Lc, 3) f32

    @property
    def num_leaves(self) -> int:
        return self.node_min.shape[0] // 2


def build_lbvh(scene) -> BVHArrays:
    """Level-synchronous bottom-up build (jittable).

    Internal AABB = union of children; padded subtrees stay empty, so a node
    whose right subtree is entirely padding gets exactly the single-child copy
    the reference performs (``findBondingBox(BVHNode&)``, MTPC/BVH.cpp:116-124).
    """
    lc = scene.num_tris_padded
    valid = scene.tri_valid[:, None]
    leaf_min = jnp.where(valid, jnp.minimum(jnp.minimum(scene.v0, scene.v1), scene.v2), BIG)
    leaf_max = jnp.where(valid, jnp.maximum(jnp.maximum(scene.v0, scene.v1), scene.v2), -BIG)

    # levels[d] holds the 2^d nodes of depth d; leaves are depth log2(Lc).
    mins = [leaf_min]
    maxs = [leaf_max]
    while mins[0].shape[0] > 1:
        m = mins[0].reshape(-1, 2, 3)
        x = maxs[0].reshape(-1, 2, 3)
        mins.insert(0, jnp.min(m, axis=1))
        maxs.insert(0, jnp.max(x, axis=1))

    # Heap layout: concat by depth gives node k at flat position k-1; prepend
    # a dummy slot 0 so children are 2k / 2k+1 without the -1 bookkeeping.
    node_min = jnp.concatenate([jnp.full((1, 3), BIG)] + mins, axis=0)
    node_max = jnp.concatenate([jnp.full((1, 3), -BIG)] + maxs, axis=0)
    return BVHArrays(node_min=node_min, node_max=node_max)


def build_lbvh_host(scene) -> BVHArrays:
    """NumPy twin of build_lbvh, run on the host.

    Bit-identical node arrays (min/max are exact in f32), but skips the
    device-program compile entirely — on the tunneled axon TPU a fresh
    process pays a large remote-compile round trip for even this tiny
    program, which dominated benchmark/CLI setup time.  Use this for
    host-driven setup; keep ``build_lbvh`` for in-jit contexts (e.g. the
    multichip dryrun's traced build).
    """
    import numpy as np

    v0 = np.asarray(scene.v0)
    v1 = np.asarray(scene.v1)
    v2 = np.asarray(scene.v2)
    valid = np.asarray(scene.tri_valid)[:, None]
    big = np.float32(1e30)
    leaf_min = np.where(valid, np.minimum(np.minimum(v0, v1), v2), big)
    leaf_max = np.where(valid, np.maximum(np.maximum(v0, v1), v2), -big)
    mins, maxs = [leaf_min], [leaf_max]
    while mins[0].shape[0] > 1:
        mins.insert(0, np.min(mins[0].reshape(-1, 2, 3), axis=1))
        maxs.insert(0, np.max(maxs[0].reshape(-1, 2, 3), axis=1))
    node_min = np.concatenate([np.full((1, 3), big, np.float32)] + mins, axis=0)
    node_max = np.concatenate([np.full((1, 3), -big, np.float32)] + maxs, axis=0)
    return BVHArrays(node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max))


def _advance(k):
    """Next subtree in preorder: strip trailing 1-bits (pop while right child),
    then step to the sibling. Returns 0 (done sentinel) past the root.

    For 1-based heap keys, 'is a right child' == lowest bit set, so the pop
    loop collapses to one divide by the lowest zero bit: z = ~k & (k+1)."""
    z = jnp.bitwise_and(jnp.bitwise_not(k), k + 1)
    up = k // z
    return jnp.where(up <= 1, 0, up + 1)


def bvh_intersect(bvh: BVHArrays, scene, origin, direction, compat: bool = True,
                  max_steps: int | None = None):
    """Nearest-hit query for a batch of rays.

    origin/direction: (R,3). Returns (hit (R,) bool, t (R,) f32, tri (R,) i32).
    Matches the reference's 'smallest t > 0' rule (MTPC/pathTracing.cpp:355-361).
    Not differentiable (lax.while_loop) by design: hit topology is detached in
    the gradient estimator (SURVEY.md §7 hard part 4).
    """
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    lc = bvh.num_leaves
    r = origin.shape[0]
    inv_dir = 1.0 / direction

    if max_steps is None:
        max_steps = 4 * lc + 64  # full-tree preorder walk upper bound

    def cond(state):
        k, best_t, best_tri, steps = state
        return jnp.any(k > 0) & (steps < max_steps)

    def body(state):
        k, best_t, best_tri, steps = state
        active = k > 0
        ksafe = jnp.maximum(k, 1)
        bmin = bvh.node_min[ksafe]
        bmax = bvh.node_max[ksafe]
        hit_box = ray_aabb(origin, inv_dir, bmin, bmax, t_max=best_t) & active

        is_leaf = ksafe >= lc
        tri = jnp.where(is_leaf, ksafe - lc, 0)
        test_tri = hit_box & is_leaf
        p0 = scene.v0[tri]
        p1 = scene.v1[tri]
        p2 = scene.v2[tri]
        gn = scene.geom_n[tri]
        hit_t, t, _ = ray_triangle(origin, direction, p0, p1, p2, gn, compat)
        better = test_tri & hit_t & scene.tri_valid[tri] & (t > 0) & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_tri = jnp.where(better, tri, best_tri)

        descend = hit_box & ~is_leaf
        k_next = jnp.where(descend, 2 * ksafe, _advance(ksafe))
        k = jnp.where(active, k_next, 0)
        return k, best_t, best_tri, steps + 1

    zero = (origin[:, 0] + direction[:, 0]) * 0.0  # ray-derived: matches varying type
    k0 = zero.astype(jnp.int32) + 1
    best_t0 = zero + BIG
    best_tri0 = zero.astype(jnp.int32) - 1
    steps0 = k0[0] - 1  # varying-typed scalar zero
    _, best_t, best_tri, _ = jax.lax.while_loop(cond, body, (k0, best_t0, best_tri0, steps0))
    hit = best_tri >= 0
    return hit, jnp.where(hit, best_t, BIG), best_tri


def packet_intersect(bvh: BVHArrays, scene, origin, direction,
                     compat: bool = True, packet_size: int = 1024,
                     leaf_width: int = 8, max_steps: int | None = None):
    """TPU-shaped nearest-hit: packet traversal with fat leaves.

    Per-lane tree walks (bvh_intersect) are gather-bound on TPU — every step
    reads a different node per lane, which the VPU serializes (measured ~2e3
    rays/s on v5e vs ~2e5 for dense brute force).  This variant restructures
    the work into what the VPU does at full rate:

    * one *shared* trail per packet of ``packet_size`` rays — the traversal
      state is a single scalar heap key, and node AABBs are fetched by scalar
      dynamic-slice (no per-lane gather at all);
    * a node is entered if ANY ray in the packet hits its box (per-ray
      best-t pruning keeps the test tight);
    * traversal stops ``log2(leaf_width)`` levels above the leaves ("fat
      leaves"): the Morton sort makes any ``leaf_width`` consecutive
      triangles spatially coherent, and testing the whole block densely
      against the whole packet is pure vector math on contiguous rows.

    Results are identical to bvh_intersect / brute force (pruning never
    changes the nearest hit).  Efficiency depends on ray coherence within a
    packet; render chunks are contiguous pixel tiles, and shadow rays aim at
    the same light, so primary/NEE packets are naturally coherent.
    """
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    r = origin.shape[0]
    lc = bvh.num_leaves
    leaf_width = min(leaf_width, lc)
    packet_size = min(packet_size, r)
    pad = (-r) % packet_size
    if pad:
        # Parked rays far outside every scene keep edge packets legal.
        origin = jnp.concatenate(
            [origin, jnp.full((pad, 3), 1e9, origin.dtype)])
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.array([[1.0, 0.0, 0.0]], direction.dtype), (pad, 1))])
    fat_start = lc // leaf_width  # heap key of the first fat leaf
    if max_steps is None:
        max_steps = 8 * fat_start + 64

    wide = jnp.arange(leaf_width)

    def one_packet(args):
        o, d = args
        inv_dir = 1.0 / d

        def cond(state):
            k, best_t, best_tri, steps = state
            return (k > 0) & (steps < max_steps)

        def leaf_test(k, hits, best_t, best_tri):
            """Dense (P, W) triangle test of one fat leaf's block."""
            tri0 = jnp.clip((k - fat_start) * leaf_width, 0, lc - leaf_width)
            p0 = jax.lax.dynamic_slice(scene.v0, (tri0, 0), (leaf_width, 3))
            p1 = jax.lax.dynamic_slice(scene.v1, (tri0, 0), (leaf_width, 3))
            p2 = jax.lax.dynamic_slice(scene.v2, (tri0, 0), (leaf_width, 3))
            gn = jax.lax.dynamic_slice(scene.geom_n, (tri0, 0), (leaf_width, 3))
            valid = jax.lax.dynamic_slice(scene.tri_valid, (tri0,), (leaf_width,))
            ht, t, _ = ray_triangle(
                o[:, None, :], d[:, None, :],
                p0[None], p1[None], p2[None], gn[None], compat,
            )  # (P, W)
            ok = ht & valid[None] & (t > 0) & (t < best_t[:, None]) & hits[:, None]
            t = jnp.where(ok, t, BIG)
            j = jnp.argmin(t, axis=1)
            tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            better = tj < best_t
            return (jnp.where(better, tj, best_t),
                    jnp.where(better, (tri0 + j).astype(jnp.int32), best_tri))

        def body(state):
            k, best_t, best_tri, steps = state
            bmin = jax.lax.dynamic_slice(bvh.node_min, (k, 0), (1, 3))
            bmax = jax.lax.dynamic_slice(bvh.node_max, (k, 0), (1, 3))
            hits = ray_aabb(o, inv_dir, bmin, bmax, t_max=best_t)  # (P,)
            any_hit = jnp.any(hits)
            is_fat = k >= fat_start

            # Only fat-leaf visits pay for the dense block test (true branch
            # under scalar control flow, not a select).
            best_t, best_tri = jax.lax.cond(
                any_hit & is_fat,
                leaf_test,
                lambda k, hits, bt, bi: (bt, bi),
                k, hits, best_t, best_tri,
            )

            k = jnp.where(any_hit & ~is_fat, 2 * k, _advance(k))
            return k, best_t, best_tri, steps + 1

        # Derive carries from the rays so their sharding/varying type matches
        # what the loop body produces (required under shard_map).
        zero = (o[:, 0] + d[:, 0]) * 0.0
        zs = zero[0].astype(jnp.int32)  # varying-typed scalar zero
        init = (zs + 1, zero + BIG, zero.astype(jnp.int32) - 1, zs)
        _, best_t, best_tri, _ = jax.lax.while_loop(cond, body, init)
        return best_t, best_tri

    best_t, best_tri = jax.lax.map(
        one_packet,
        (origin.reshape(-1, packet_size, 3), direction.reshape(-1, packet_size, 3)),
    )
    best_t = best_t.reshape(-1)[:r]
    best_tri = best_tri.reshape(-1)[:r]
    hit = best_tri >= 0
    return hit, jnp.where(hit, best_t, BIG), best_tri


def brute_force_intersect(scene, origin, direction, compat: bool = True,
                          block: int = 512):
    """Test every triangle (reference-free oracle for traversal tests).

    Scans triangle blocks to bound the (R, block) live set.
    """
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    tpad = scene.num_tris_padded
    block = min(block, tpad)
    nblocks = tpad // block
    r = origin.shape[0]

    def body(carry, bi):
        best_t, best_tri = carry
        s = bi * block
        idx = s + jnp.arange(block)
        p0 = jax.lax.dynamic_slice_in_dim(scene.v0, s, block)
        p1 = jax.lax.dynamic_slice_in_dim(scene.v1, s, block)
        p2 = jax.lax.dynamic_slice_in_dim(scene.v2, s, block)
        gn = jax.lax.dynamic_slice_in_dim(scene.geom_n, s, block)
        valid = jax.lax.dynamic_slice_in_dim(scene.tri_valid, s, block)
        o = origin[:, None, :]
        d = direction[:, None, :]
        hit, t, _ = ray_triangle(o, d, p0[None], p1[None], p2[None], gn[None], compat)
        ok = hit & valid[None, :] & (t > 0)
        t = jnp.where(ok, t, BIG)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        better = tj < best_t
        best_t = jnp.where(better, tj, best_t)
        best_tri = jnp.where(better, idx[j], best_tri)
        return (best_t, best_tri), None

    init = (jnp.full((r,), BIG), jnp.full((r,), -1, jnp.int32))
    (best_t, best_tri), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    hit = best_tri >= 0
    return hit, best_t, best_tri
