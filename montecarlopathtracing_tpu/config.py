"""Render configuration.

The reference (``/root/reference/MTPC/MTPC.cpp:71-91``) hardcodes scene name and
SPP in ``main()`` and has no config system at all.  Here every knob — including a
``compat`` block reproducing each behavioral quirk of the reference integrator
(see SURVEY.md §2 "Behavioral quirks") — is an explicit, hashable dataclass so it
can be passed as a static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CompatOptions:
    """Flags reproducing reference quirks. Defaults = bit-for-bit reference semantics
    (modulo RNG streams and f32 vs f64).

    Each flag cites the reference behavior it gates.
    """

    # Quirk 1 (MTPC/pathTracing.cpp:305-309): all SPP samples of a pixel shoot
    # the identical primary ray through the pixel's top-left lattice corner.
    # False => jittered sub-pixel AA through the pixel area ("modern" mode).
    no_pixel_jitter: bool = True

    # Quirk 3 (MTPC/pathTracing.cpp:193-197): point-in-triangle sampled via three
    # normalized uniforms r_i / sum(r) — NOT uniform over the triangle.
    # False => sqrt-based uniform triangle sampling.
    simplex_light_sampling: bool = True

    # Quirk 3 (MTPC/pathTracing.cpp:221-222): inverse-square distance clamped,
    # dist = max(1, |xl - p|).
    clamp_light_distance: bool = True

    # MTPC/pathTracing.cpp:220-228: the receiver cosine enters NEE twice
    # (cos_theta_hat AND kd_dots). False => single cosine (physically correct).
    double_receiver_cosine: bool = True

    # Quirk 4 (MTPC/pathTracing.cpp:185): the light-pick distribution is a
    # function-local ``static uniform_real_distribution(0, total_aera)`` —
    # its range freezes at the FIRST light's total area forever.  With
    # multiple lights of different areas (veach-mis spans 0.011..10.06) the
    # draw covers only [0, A_first) of each light's parse-order area CDF, so
    # larger lights are sampled only in their first few faces while still
    # weighted by their FULL area; if A_first exceeds a light's area, the
    # stale previous sample point/material is reused (the loop never picks).
    # False => each light's own area (unbiased pick).
    frozen_light_pick: bool = True

    # Quirk 5 (MTPC/pathTracing.cpp:206-215): shadow-ray visibility decided by
    # material-id equality of nearest hit vs the sampled light triangle.
    # False => occlusion decided by comparing hit distance to light distance.
    material_equality_visibility: bool = True

    # MTPC/sceneManagement.cpp:316-338: ray-triangle via plane solve + edge
    # sign-product test. False => watertight Moller-Trumbore.
    plane_sign_triangle_test: bool = True

    # Quirk 12 (MTPC/morton code.h:6-7): Morton world bounds hardcoded [-1, 4].
    # False => bounds from the scene AABB.
    hardcoded_morton_bounds: bool = True

    # MTPC/pathTracing.cpp:351: shading normal = barycentric-interpolated vertex
    # normals, NOT renormalized. False => renormalize.
    unnormalized_shading_normal: bool = True

    # MTPC/pathTracing.cpp:102,109: transmission / TIR rays leave from the hit
    # point with NO epsilon offset (diffuse/specular bounces and shadow rays get
    # +0.01*dir, :132,:208). False => epsilon offset for all secondary rays.
    no_transmission_epsilon: bool = True


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static options for one render. Hashable => usable as a jit static arg."""

    spp: int = 25
    seed: int = 0
    # RR continuation probability (MTPC/pathTracing.cpp:237).
    rr_probability: float = 0.6
    # The reference has no depth cap (termination purely RR, expected depth
    # 1/(1-0.6) = 2.5). A cap of 32 biases by < 0.6^32 ~ 8e-8: negligible.
    max_depth: int = 32
    # Secondary/shadow ray origin offset (MTPC/pathTracing.cpp:132,208).
    ray_epsilon: float = 0.01
    # Rays per wavefront chunk; pixels are processed in chunks of this many
    # lanes to bound live-state memory. Must be a multiple of 8*128.
    chunk_size: int = 65536
    # Samples rendered per accumulation pass (checkpointable progressive SPP).
    spp_chunk: int = 8
    # "auto" = "cluster" (Pallas cluster kernel, kernels/cluster.py) on TPU,
    # "bvh" (XLA packet traversal) elsewhere. Explicit: "cluster",
    # "cluster_interpret" (Pallas interpreter, any backend), "bvh",
    # "bvh_perray" (per-lane stackless walk), "brute" (test oracle).
    intersector: str = "auto"
    # Rays per shared-trail packet and triangles per fat leaf (see
    # accel.lbvh.packet_intersect). chunk_size must divide by packet_size.
    packet_size: int = 1024
    leaf_width: int = 8
    # Cluster kernel shape: rays per subtile / triangles per cluster /
    # clusters tested per loop iteration as one concatenated panel
    # (kernels/cluster.py: culling granularity = width, VPU lane width =
    # width * group; smaller subtiles tighten the per-subtile candidate
    # union at more loop iterations).  64/32/8 is the measured v5e optimum
    # under the deferred-best kernel (round 3: 1.52e7 rays/s vs 1.39e7 at
    # g4; g16, tile 32/128, width 16/64 all measured worse).
    cluster_rays: int = 64
    cluster_width: int = 32
    cluster_group: int = 8
    # Subtiles per Pallas grid step (amortizes per-step pipeline overhead).
    cluster_mega: int = 16
    # Cluster-boundary gap padding at scene build (scene/loader.py): insert
    # invalid padding so Morton discontinuities above this bit level start a
    # fresh width-aligned cluster — tighter cluster AABBs, fewer candidates
    # in the cluster intersector.  0 disables (pure Morton runs).
    cluster_gap_bits: int = 19
    # Triangle ordering that defines the cluster decomposition
    # (scene/loader.py): "morton_gap" = Morton sort + gap padding (above);
    # "median" = recursive best-axis median split to width-sized leaves
    # (tighter cluster AABBs than fixed-width Morton runs; width-aligned
    # splits so only each group's tail leaf is partial).  Estimator-neutral:
    # triangle order only affects equal-t tie-breaking, like the big-triangle
    # segregation (docs/COMPAT.md).
    cluster_order: str = "median"
    # VMEM-table chunk cap for the cluster intersector: scenes needing more
    # than this many chunked tables fall back to the XLA packet walk
    # (integrator/wavefront.py::_cluster_plan).  Since round 5 all chunks
    # ride ONE two-dispatch intersector (a (K, n_steps) Pallas grid), so a
    # chunk costs a grid row — not a separate dispatch + sort + merge — and
    # routing-parked (chunk, subtile) pairs skip at flag speed.  64 covers
    # ~5M tris at the 5 MB/chunk table budget; the packet walk remains only
    # as the CPU/test and explicit-opt-in path (measured 24x slower at 1.5M
    # tris in round 3).
    max_table_chunks: int = 64
    # Large-scene policy past the single VMEM-table budget.  The stacked
    # VMEM-chunk two-dispatch kernel always wins while it fits (6.2e6 vs
    # 2.3e6 rays/s at 400k tris); past max_table_chunks the fallback is:
    # "hbm" (default) — the HBM-streaming intersector (kernels/cluster.py::
    # cluster_intersect_hbm): double-buffered per-supergroup DMA, no
    # table-size cap, ~80x the packet walk this replaces as the beyond-cap
    # path; "chunked" — warn + XLA packet walk (the pre-round-5 behavior);
    # "hbm_always" — force HBM streaming for any >1-table scene (A/B probe).
    large_mode: str = "hbm"
    # Wavefront ray sorting by (hit cluster, direction bin) per bounce —
    # restores tile coherence for shadow/bounce rays. None = on iff the
    # cluster intersector is active. The estimator is identical either way
    # (same paths, same RNG streams); single-light renders are bitwise
    # sort-independent, multi-light renders agree to FP-contraction ULPs
    # (the post-sort NEE recompute fuses differently; tested ~1e-7 rel).
    sort_rays: Optional[bool] = None
    # Persistent-wavefront lane refill: retire finished paths and refill
    # lanes with fresh samples instead of re-running the bounce loop at
    # decaying occupancy. Same estimator and RNG streams; only the film's fp
    # accumulation order differs. Differentiable renders use the refill
    # architecture too, as a lax.scan with a static iteration budget (paths
    # still unfinished at the budget — probability ~0 at real lane counts —
    # are dropped); refill=False selects the scan-over-samples renderer for
    # both.
    refill: bool = True
    # Score-function (REINFORCE) Ns gradient surrogate in the specular bounce
    # weight (wavefront._next_ray).  Forward values are bitwise unchanged,
    # but the extra reverse-mode path costs ~40% backward time (measured on
    # v5e) — enable when optimizing Phong exponents.
    ns_gradient: bool = False
    # Differentiable-path iteration budget, as expected lane-iterations per
    # sample (camera segment + bounces + idle/tail overhead).  None = the
    # conservative RR bound 1/(1-rr_probability) * 1.2; a measured value
    # (cornell-box: 2.30 at 64k lanes) cuts the static lax.scan length — and
    # with it BOTH the in-grad forward and the backward scan — by ~25%.
    # A too-small budget drops unfinished tail samples; render_pixels_refill
    # signals that by returning a NEGATIVE n_rays (callers should treat the
    # film as biased and raise the budget).
    bwd_seg_per_sample: Optional[float] = None
    compat: CompatOptions = dataclasses.field(default_factory=CompatOptions)

    def replace(self, **kw) -> "RenderOptions":
        return dataclasses.replace(self, **kw)


MODERN = CompatOptions(
    no_pixel_jitter=False,
    simplex_light_sampling=False,
    clamp_light_distance=False,
    double_receiver_cosine=False,
    frozen_light_pick=False,
    material_equality_visibility=False,
    plane_sign_triangle_test=False,
    hardcoded_morton_bounds=False,
    unnormalized_shading_normal=False,
    no_transmission_epsilon=False,
)
