"""Opt-in REAL-TPU test lane (round-1 verdict item 8): the production Pallas
kernel is CI-tested in interpret mode only; these run it on silicon.

Each case runs in a fresh subprocess (the tunneled axon device can wedge a
process after failures — CLAUDE.md), with the conftest's CPU-forcing bypassed.

Run with:  MCPT_TPU=1 python -m pytest -m tpu tests/test_tpu.py -v
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(os.environ.get("MCPT_TPU") != "1",
                       reason="set MCPT_TPU=1 to run real-TPU tests"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, timeout=560) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout


def test_cluster_kernel_matches_brute_on_hardware():
    """Compiled-kernel (not interpret) vs brute force — the class of bug
    interpret mode hides (SMEM OOB, layout, tiling)."""
    out = _run(r"""
import numpy as np, jax, jax.numpy as jnp
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import brute_force_intersect
from montecarlopathtracing_tpu.kernels.cluster import build_cluster_accel, cluster_intersect
assert jax.default_backend() == "tpu", jax.default_backend()
scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
accel = build_cluster_accel(scene, width=32)
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-0.9, 0.9, (4096, 3)).astype(np.float32) + np.array([0, 1, -0.5], np.float32))
d = rng.normal(size=(4096, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
d = jnp.asarray(d)
hb, tb, ib = brute_force_intersect(scene, o, d)
hc, tc, ic = cluster_intersect(accel, o, d, tile=64, group=4, interpret=False)
np.testing.assert_array_equal(np.asarray(hb), np.asarray(hc))
ok = np.asarray(hb)
np.testing.assert_allclose(np.asarray(tb)[ok], np.asarray(tc)[ok], rtol=1e-4, atol=1e-5)
assert (np.asarray(ib)[ok] == np.asarray(ic)[ok]).mean() > 0.99
print("TPU_KERNEL_OK")
""")
    assert "TPU_KERNEL_OK" in out


def test_render_matches_oracle_on_hardware():
    """A small MODERN-mode hardware render against the f64 oracle."""
    out = _run(r"""
import numpy as np, jax, jax.numpy as jnp
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import MODERN, RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import render_pixels
from montecarlopathtracing_tpu.oracle.cpu_reference import oracle_render_pixels
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box
assert jax.default_backend() == "tpu"
scene, _ = load_builtin_box(width=32, height=32)
bvh = jax.jit(build_lbvh)(scene)
opts = RenderOptions(spp=4, max_depth=6, chunk_size=1024, compat=MODERN)
ids = jnp.arange(1024, dtype=jnp.int32)
got, _ = render_pixels(scene, bvh, opts, ids)
want = oracle_render_pixels(scene, opts, np.asarray(ids))
rel = np.abs(np.asarray(got, np.float64) - want) / np.maximum(np.abs(want), 1e-2)
assert np.median(rel) < 1e-4, np.median(rel)
assert (rel.max(axis=1) < 1e-2).mean() > 0.97
print("TPU_ORACLE_OK")
""")
    assert "TPU_ORACLE_OK" in out
