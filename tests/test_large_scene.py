"""Scene-size scaling: the cluster kernel's constant table must fit VMEM
(kernels/cluster.py); larger scenes pick coarser clusters or fall back to the
XLA packet walk (integrator/wavefront.py::_cluster_plan)."""

import numpy as np
import pytest

from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.wavefront import _cluster_plan


def test_cluster_plan_thresholds():
    opts = RenderOptions()  # width 32, group 8 (round-3 default)
    assert _cluster_plan(opts, 16384) == (32, 8, 1)
    assert _cluster_plan(opts, 32768) == (32, 8, 1)
    w, g, n = _cluster_plan(opts, 1 << 17)  # 131072 tris: coarse plan
    assert w == 128 and n == 1
    assert w * g == opts.cluster_width * opts.cluster_group
    w, g, n = _cluster_plan(opts, 1 << 20)  # 1M tris: chunked tables
    assert w == 128 and 8 <= n <= 16
    w, g, n = _cluster_plan(opts, 1 << 22)  # 4M tris: still chunked (cap 64)
    assert w == 128 and 16 < n <= 64
    assert _cluster_plan(opts, 1 << 24) is None  # beyond chunking: packet


def test_medium_scene_intersect():
    """~51k triangles (past the fine-width budget): the coarse plan must agree
    with brute force."""
    import jax.numpy as jnp

    from montecarlopathtracing_tpu.accel.lbvh import brute_force_intersect
    from montecarlopathtracing_tpu.kernels.cluster import (
        build_cluster_accel, cluster_intersect,
    )
    from montecarlopathtracing_tpu.scene.builtin import write_box_scene
    from montecarlopathtracing_tpu.api import load_scene
    import tempfile

    # Tessellate extra geometry into the box OBJ: a 180x120 grid of quads on
    # a slab inside the box -> 43.2k extra faces + walls (past the fine-width budget).
    nx, nz = 180, 120
    xs = np.linspace(0.2, 1.8, nx + 1)
    zs = np.linspace(0.2, 1.8, nz + 1)
    verts, faces = [], []
    for i in range(nx + 1):
        for k in range(nz + 1):
            verts.append((xs[i], 0.5 + 0.05 * np.sin(3 * xs[i]) * np.cos(3 * zs[k]), zs[k]))
    def vid(i, k):
        return i * (nz + 1) + k + 1
    for i in range(nx):
        for k in range(nz):
            faces.append((vid(i, k), vid(i + 1, k), vid(i + 1, k + 1)))
            faces.append((vid(i, k), vid(i + 1, k + 1), vid(i, k + 1)))

    with tempfile.TemporaryDirectory() as d:
        write_box_scene(d, "box")
        with open(f"{d}/box.obj") as g:
            off = sum(1 for line in g if line.startswith("v "))
        with open(f"{d}/box.obj", "a") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            f.write("usemtl White\n")
            for a, b, c in faces:
                f.write(f"f {a + off} {b + off} {c + off}\n")
        scene, meta = load_scene(d, "box", use_native=False)

    assert meta.num_faces > 43000
    plan = _cluster_plan(RenderOptions(), scene.num_tris_padded)
    assert plan is not None and plan[0] == 128

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform([0.3, 0.6, 0.3], [1.7, 1.9, 1.7], (32, 3)).astype(np.float32))
    dd = rng.normal(size=(32, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    dd = jnp.asarray(dd)
    hb, tb, ib = brute_force_intersect(scene, o, dd)
    accel = build_cluster_accel(scene, width=plan[0])
    hc, tc, ic = cluster_intersect(accel, o, dd, tile=16, mega=2,
                                   group=plan[1], interpret=True)
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hc))
    ok = np.asarray(hb)
    np.testing.assert_allclose(np.asarray(tb)[ok], np.asarray(tc)[ok],
                               rtol=1e-4, atol=1e-5)


def test_builtin_large_scene_renders():
    """The procedural bedroom-class generator (scene/builtin.py) builds and
    renders through the normal pipeline (small instance for CPU CI; the TPU
    chunked-cluster path over it is benchmarked in bench.py).

    The default instance must exercise the workload envelope of the
    reference's bedroom artifact (result/bedroom-SPP256.png, README.md:20-21):
    >64 materials (the gather branch of wavefront._material_rows — the
    one-hot-matmul fast path cuts off at 64) and a multi-texture atlas."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.integrator.wavefront import render_pixels
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_large

    scene, meta = load_builtin_large(30_000, width=48, height=32)
    assert meta.num_faces > 25_000
    assert scene.num_lights == 1
    assert scene.num_materials > 64          # gather material path
    assert int(np.asarray(scene.has_texture).sum()) >= 8  # multi-texture atlas
    assert len(set(np.asarray(scene.tex_offset)[
        np.asarray(scene.has_texture)].tolist())) >= 8    # distinct blocks
    bvh = jax.jit(build_lbvh)(scene)
    ids = jnp.arange(48 * 32, dtype=jnp.int32)
    rad, _ = render_pixels(scene, bvh, RenderOptions(spp=2, max_depth=6), ids)
    rad = np.asarray(rad)
    assert np.isfinite(rad).all()
    assert rad.mean() > 0.01  # lit scene, non-black


def test_material_rows_gather_matches_matmul():
    """wavefront._material_rows: the >64-material gather branch must return
    exactly what the <=64 one-hot-matmul branch returns (the matmul runs at
    Precision.HIGHEST specifically so the two agree bitwise)."""
    import jax.numpy as jnp
    import numpy as np

    from montecarlopathtracing_tpu.integrator.wavefront import (
        _material_rows, _shading_tables)
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_large

    scene, _ = load_builtin_large(2_000, width=8, height=8, n_materials=96)
    assert scene.num_materials > 64
    _, mtab = _shading_tables(scene)
    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.integers(0, scene.num_materials, 257).astype(np.int32))
    via_gather = _material_rows(scene, mtab, mat)  # m > 64: gather branch

    class _Small:  # force the one-hot branch on the same table
        num_materials = 64
    sel = mat % 64
    via_matmul = _material_rows(_Small, mtab[:64], sel)
    np.testing.assert_array_equal(
        np.asarray(mtab[sel]), np.asarray(via_matmul))
    np.testing.assert_array_equal(
        np.asarray(via_gather), np.asarray(mtab[mat]))
