"""One process of a 2-process jax.distributed CPU run (SURVEY.md §5.8).

Launched by tests/test_multihost.py (and usable standalone):

    python tools/multihost_worker.py <process_id> <num_processes> <port>

Each process brings up 4 virtual CPU devices, joins the coordinator via
``parallel.mesh.initialize_multihost``, builds the global (tile, spp) mesh
over all 8 devices, runs a sharded forward render AND a distributed gradient
step (psum over both axes), and checks:

* the multi-process sharded render matches a purely-local single-process
  render of the same config (identical absolute (pixel, sample) RNG streams);
* gradients agree bitwise across processes after the pmean all-reduce.

Prints ``MULTIHOST_OK <pid>`` on success.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Must run before ANYTHING initializes the XLA backend (importing the
# package touches jax.devices via backend resolution).
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from montecarlopathtracing_tpu.accel.lbvh import build_lbvh  # noqa: E402
from montecarlopathtracing_tpu.config import RenderOptions  # noqa: E402
from montecarlopathtracing_tpu.diff.gradients import (  # noqa: E402
    SceneParams, make_distributed_train_step,
)
from montecarlopathtracing_tpu.integrator.wavefront import render_image  # noqa: E402
from montecarlopathtracing_tpu.parallel.mesh import (  # noqa: E402
    _padded_ids, initialize_multihost, make_mesh, render_image_sharded_jit,
)
from montecarlopathtracing_tpu.scene.builtin import load_builtin_box  # noqa: E402

# initialize_multihost is the same call (idempotence guard: already up).
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

scene, _ = load_builtin_box(width=16, height=16)
bvh = jax.jit(build_lbvh)(scene)
opts = RenderOptions(spp=4, max_depth=4, chunk_size=1024)

# Global mesh: tile axis spans the two hosts (DCN-crossing collectives).
mesh = make_mesh(tile=nproc * 2, spp=2)

img = render_image_sharded_jit(scene, bvh, opts, mesh)
jax.block_until_ready(img)
img_np = multihost_utils.process_allgather(img, tiled=True)

# Purely-local reference render (same absolute RNG streams by construction).
ref = np.asarray(render_image(scene, bvh, opts))
assert img_np.shape == ref.shape, (img_np.shape, ref.shape)
np.testing.assert_allclose(img_np, ref, rtol=2e-4, atol=2e-5)

# Distributed gradient step: psum/pmean over (tile, spp) crossing processes.
n_tiles = mesh.shape["tile"]
ids_np, per = _padded_ids(16 * 16, n_tiles)
sh = NamedSharding(mesh, P("tile", None))
# Every process holds the full host arrays; materialize global sharded
# arrays by serving each process its addressable shards.
ids = jax.make_array_from_callback(ids_np.shape, sh, lambda i: ids_np[i])
tgt_np = np.zeros((n_tiles, per, 3), np.float32)
target = jax.make_array_from_callback(tgt_np.shape, sh, lambda i: tgt_np[i])
params = SceneParams.from_scene(scene)
step = make_distributed_train_step(scene, bvh, opts, mesh, lr=0.05)
new_params, loss = step(params, target, ids)
jax.block_until_ready(loss)
loss = float(np.asarray(loss.addressable_data(0)))
assert np.isfinite(loss)
kd = np.asarray(new_params.kd.addressable_data(0))  # replicated param
assert np.isfinite(kd).all()

print(f"MULTIHOST_OK {pid} loss={loss:.6f}", flush=True)
