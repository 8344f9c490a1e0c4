"""Counter-based RNG keyed (pixel, sample, bounce, purpose).

The reference uses function-local ``static default_random_engine e(time(NULL))``
instances shared across OpenMP threads (``MTPC/pathTracing.cpp:5,32,68,169``) —
seeded by wall clock, thread-unsafe, and in one case frozen with stale state
(quirk #4).  Deliberately NOT reproduced: a stateless counter-based stream
keyed by (pixel, sample, bounce, slot) is deterministic, race-free by
construction, and — critically for the distributed path — independent of how
lanes are sharded or sorted across chips, so a 1-chip and an N-chip render of
the same seed are bitwise identical (SURVEY.md §5.2).

Implementation: a 32-bit finalizing mixer (lowbias32-style avalanche hash,
two multiply-xorshift rounds) rather than threefry — ~10 integer VPU ops per
uniform instead of 20+ rounds, which matters because the integrator draws
``n_slots`` uniforms per lane per bounce in the hot loop.  The NumPy oracle
(oracle/cpu_reference.py) calls these same functions, so oracle and TPU
renders consume the exact same stream by construction.

Per-bounce uniform slot layout (stable so the oracle can replay the stream):

    0: russian roulette          (MTPC/pathTracing.cpp:240)
    1: fresnel lobe choice       (:100)
    2: diffuse/specular ratio    (:118)
    3: phi                       (:35)
    4: theta                     (:40,45)
    5 + 4*li + {0,1,2,3}: light li's (cdf pick, r1, r2, r3)   (:186,194)

Primary-ray jitter (modern mode only) uses slots from ``primary_uniforms``.
"""

from __future__ import annotations

import jax.numpy as jnp

N_BASE_SLOTS = 5

_GOLD = jnp.uint32(0x9E3779B9)   # 2^32 / phi — Weyl increment
_GOLD2 = jnp.uint32(0x85EBCA6B)  # murmur3 c1


def _mix(x):
    """lowbias32 avalanche finalizer (public-domain constant set)."""
    x = jnp.uint32(x)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _to_unit(bits):
    """uint32 -> f32 in [0, 1) using the top 24 bits."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def n_bounce_slots(num_lights: int) -> int:
    return N_BASE_SLOTS + 4 * num_lights


def lane_keys(seed, pixel_ids, sample_idx):
    """One stream key per lane — uint32 (R, 2). pixel_ids (R,) int32;
    sample_idx scalar or (R,) (the refill wavefront runs mixed samples).

    The key is a 64-bit pair of independently-mixed words: a single 32-bit
    hash of (seed, pixel, sample) has birthday collisions between distinct
    work items at frame scale (~n^2/2^33 pairs — a 1M-item queue yields ~100
    pairs whose whole uniform streams would coincide).  Both words enter the
    per-bounce stream derivation (see _stream), so a full-stream collision
    now needs a 64-bit coincidence; residual per-bounce 32-bit collisions of
    the derived base affect only that bounce's handful of draws
    (statistically invisible).
    """
    pix = pixel_ids.astype(jnp.uint32)
    samp = jnp.asarray(sample_idx).astype(jnp.uint32)
    k = _mix(jnp.uint32(seed) + _GOLD)
    k1 = _mix(_mix(k ^ pix) + (samp + 1) * _GOLD2)
    # Independent second word: different constant path and mixing order.
    k2 = _mix(_mix(k + (pix + 1) * _GOLD2) ^ (samp * _GOLD + jnp.uint32(0x6A09E667)))
    return jnp.stack([k1, k2], axis=-1)


def _stream(keys, stream_id):
    """Per-(lane, stream) base folding BOTH key words — one extra mix per
    lane per stream vs the 32-bit scheme; per-uniform cost unchanged."""
    b = _mix(keys[..., 0] ^ (jnp.asarray(stream_id).astype(jnp.uint32) + 1) * _GOLD)
    return _mix(b + keys[..., 1])


def bounce_uniforms(keys, depth, n_slots: int):
    """(R, n_slots) uniforms in [0,1) for bounce ``depth`` (scalar or (R,))."""
    b = _stream(keys, depth)
    slots = (jnp.arange(n_slots, dtype=jnp.uint32) + 1) * _GOLD2
    return _to_unit(_mix(b[:, None] + slots[None, :]))


_PRIMARY_STREAM = 0x7FFFFFFF  # bounce streams use small depth ints; keep clear


def primary_uniforms(keys):
    """(R, 2) sub-pixel jitter uniforms (modern mode only)."""
    b = _stream(keys, _PRIMARY_STREAM)
    slots = (jnp.arange(2, dtype=jnp.uint32) + 1) * _GOLD2
    return _to_unit(_mix(b[:, None] + slots[None, :]))
