"""Counter-based RNG keyed (pixel, sample, bounce, purpose).

The reference uses function-local ``static default_random_engine e(time(NULL))``
instances shared across OpenMP threads (``MTPC/pathTracing.cpp:5,32,68,169``) —
seeded by wall clock, thread-unsafe, and in one case frozen with stale state
(quirk #4).  Deliberately NOT reproduced: a counter-based threefry stream keyed
by (pixel, sample, bounce) is deterministic, race-free by construction, and —
critically for the distributed path — independent of how lanes are sharded
across chips, so a 1-chip and an N-chip render of the same seed are bitwise
identical (SURVEY.md §5.2).

Per-bounce uniform slot layout (stable so the NumPy oracle can replay the
exact same stream):

    0: russian roulette          (MTPC/pathTracing.cpp:240)
    1: fresnel lobe choice       (:100)
    2: diffuse/specular ratio    (:118)
    3: phi                       (:35)
    4: theta                     (:40,45)
    5 + 4*li + {0,1,2,3}: light li's (cdf pick, r1, r2, r3)   (:186,194)

Primary-ray jitter (modern mode only) uses slots from ``primary_uniforms``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_BASE_SLOTS = 5


def n_bounce_slots(num_lights: int) -> int:
    return N_BASE_SLOTS + 4 * num_lights


def lane_keys(seed, pixel_ids, sample_idx):
    """One threefry key per lane. pixel_ids (R,) int32; sample_idx scalar."""
    base = jax.random.fold_in(jax.random.key(seed), sample_idx)
    return jax.vmap(lambda p: jax.random.fold_in(base, p))(pixel_ids)


def bounce_uniforms(keys, depth, n_slots: int):
    """(R, n_slots) uniforms in [0,1) for bounce ``depth``."""
    ks = jax.vmap(lambda k: jax.random.fold_in(k, depth))(keys)
    return jax.vmap(lambda k: jax.random.uniform(k, (n_slots,)))(ks)


_PRIMARY_STREAM = 0x7FFFFFFF  # bounce streams use small depth ints; keep clear


def primary_uniforms(keys):
    """(R, 2) sub-pixel jitter uniforms (modern mode only)."""
    ks = jax.vmap(lambda k: jax.random.fold_in(k, _PRIMARY_STREAM))(keys)
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(ks)
