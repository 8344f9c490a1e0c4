"""Multi-device rendering and distributed training demo.

Shards a render over a (tile, spp) ``jax.sharding.Mesh`` — pixel tiles on one
axis, samples-per-pixel on the other, film psum-reduced over the spp axis —
then runs one distributed training step (forward render, loss, backward,
gradient all-reduce, SGD update).  See parallel/mesh.py and
diff/gradients.make_distributed_train_step.

Runs anywhere: with fewer than ``--devices`` real devices it creates virtual
CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count), which is also
how the test suite validates the multi-chip path without multi-chip hardware.
On a real pod slice the same Mesh spans real chips and the collectives ride
ICI; multi-host adds jax.distributed.initialize (parallel/mesh.py docs).

    python examples/distributed_render.py [--devices 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    # Virtual CPU devices must be configured before jax initializes.
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from montecarlopathtracing_tpu.accel.lbvh import build_lbvh_host
    from montecarlopathtracing_tpu.config import RenderOptions
    from montecarlopathtracing_tpu.diff.gradients import (
        SceneParams, make_distributed_train_step,
    )
    from montecarlopathtracing_tpu.parallel.mesh import (
        _padded_ids, make_mesh, render_image_sharded_jit,
    )
    from montecarlopathtracing_tpu.scene.builtin import load_builtin_box

    n = min(args.devices, len(jax.devices()))
    spp_axis = 2 if n % 2 == 0 else 1
    mesh = make_mesh(tile=n // spp_axis, spp=spp_axis,
                     devices=jax.devices()[:n])
    print(f"mesh: {dict(mesh.shape)} over {n} {jax.devices()[0].platform} "
          "devices")

    scene, meta = load_builtin_box(width=32, height=32)
    bvh = build_lbvh_host(scene)
    opts = RenderOptions(spp=2 * spp_axis, max_depth=5, chunk_size=1024)

    t0 = time.perf_counter()
    img = render_image_sharded_jit(scene, bvh, opts, mesh)
    jax.block_until_ready(img)
    print(f"sharded render: {img.shape}, mean {float(img.mean()):.4f} "
          f"({time.perf_counter() - t0:.1f} s incl. compile)")

    # One distributed training step: per-device forward+backward, gradients
    # psum-reduced across the mesh, SGD update applied replicated.
    n_tiles = mesh.shape["tile"]
    ids, per = _padded_ids(32 * 32, n_tiles)
    ids = jax.device_put(ids, NamedSharding(mesh, P("tile", None)))
    target = jax.device_put(jnp.zeros((n_tiles, per, 3), jnp.float32) + 0.4,
                            NamedSharding(mesh, P("tile", None)))
    params = SceneParams.from_scene(scene)
    step = make_distributed_train_step(scene, bvh, opts, mesh, lr=0.1)
    t0 = time.perf_counter()
    params2, loss = step(params, target, ids)
    jax.block_until_ready(loss)
    print(f"distributed train step: loss {float(loss):.5f} "
          f"({time.perf_counter() - t0:.1f} s incl. compile)")
    moved = float(jnp.abs(params2.kd - params.kd).max())
    print(f"max |kd update| = {moved:.5f}")
    return 0 if np.isfinite(float(loss)) and moved > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
