"""Morton code unit tests vs the reference bit-twiddling (SURVEY.md §4.1)."""

import numpy as np

from montecarlopathtracing_tpu.ops.morton import expand_bits, morton3d, morton_codes
from montecarlopathtracing_tpu.scene.loader import morton_codes_np


def reference_expand_bits(v: int) -> int:
    """Literal transcription of expandBits (MTPC/morton code.cpp:3-10) as the
    test oracle."""
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v & 0xFFFFFFFF


def reference_morton(x, y, z):
    """getMortonCode semantics (MTPC/morton code.cpp:12-32) in scalar Python."""
    def q(c):
        c = (c - (-1.0)) / 5.0
        return int(min(max(np.float32(c) * np.float32(1024.0), np.float32(0.0)),
                       np.float32(1023.0)))

    return (reference_expand_bits(q(x)) * 4 + reference_expand_bits(q(y)) * 2
            + reference_expand_bits(q(z))) & 0xFFFFFFFF


def test_expand_bits_matches_reference():
    vals = np.arange(1024, dtype=np.uint32)
    got = np.asarray(expand_bits(vals))
    want = np.array([reference_expand_bits(int(v)) for v in vals], np.uint32)
    assert np.array_equal(got, want)


def test_expand_bits_interleave_property():
    # expanded bits occupy every 3rd position
    vals = np.asarray(expand_bits(np.arange(1024, dtype=np.uint32)))
    assert np.all((vals & ~np.uint32(0x49249249)) == 0)


def test_morton_codes_match_reference_scalar():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 4, (256, 3))
    got = np.asarray(morton_codes(pts.astype(np.float32), compat_bounds=True))
    want = np.array([reference_morton(*p) for p in pts], np.uint32)
    assert np.array_equal(got, want)


def test_numpy_and_jnp_agree():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 4, (512, 3)).astype(np.float32)
    assert np.array_equal(morton_codes_np(pts), np.asarray(morton_codes(pts)))


def test_morton_locality():
    # points sorted by code should have near-sorted x at coarse scale
    a = morton3d(np.array([[0.0, 0.0, 0.0]], np.float32))
    b = morton3d(np.array([[1.0, 1.0, 1.0]], np.float32))
    assert int(a[0]) == 0
    assert int(b[0]) == 2**30 - 1
