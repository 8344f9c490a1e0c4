"""Routing selectivity on the 400k-tri scene: for a renderer-like sorted
bounce wavefront, measure chunks-touched per ray, all-parked (chunk, step)
and (chunk, subtile) fractions, and candidate density per ACTIVE row —
the quantities that decide the chunked intersector's cost.

Usage: python tools/probe_routing.py [tris]
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from montecarlopathtracing_tpu.scene.builtin import load_builtin_large
from montecarlopathtracing_tpu.kernels.cluster import (
    build_cluster_accel_chunked, cluster_intersect_chunked, _candidate_keys,
    BIG)
from montecarlopathtracing_tpu.integrator.wavefront import resolve_plan
from montecarlopathtracing_tpu.integrator.camera import primary_rays
from montecarlopathtracing_tpu.integrator.wavefront import (_tile_swizzled_ids,
                                                            swizzle_tile)
from montecarlopathtracing_tpu.config import RenderOptions

tris = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
tile, mega = 64, 16
scene, meta = load_builtin_large(tris)
opts = RenderOptions()
kind, width, group, n_chunks = resolve_plan(opts, scene.num_tris_padded)
print("plan:", kind, width, group, n_chunks, flush=True)
accel, offs = build_cluster_accel_chunked(scene, width=width,
                                          n_chunks=n_chunks)
K, C = accel.num_chunks, accel.clusters_per_chunk

h, w = scene.camera.height, scene.camera.width
ids = _tile_swizzled_ids(h, w, swizzle_tile(opts, scene.num_tris_padded))
r = 65536
tiles = ids.reshape(-1, tile)
step_ = max(1, tiles.shape[0] // (r // tile))
ids = jnp.asarray(tiles[::step_][: r // tile].reshape(-1))
r = int(ids.shape[0])
o, d = primary_rays(scene.camera, ids)

# One real bounce: intersect primaries, cosine-sample about the normals,
# sort by (hit cluster, 6-bit direction bin) like the renderer.
hit, t, tri = cluster_intersect_chunked(accel, offs, o, d, tile=tile,
                                        mega=mega, group=group)
p = np.asarray(o + d * jnp.where(hit, t, 1.0)[:, None])
gn = np.asarray(scene.geom_n)[np.maximum(np.asarray(tri), 0)]
rng_ = np.random.default_rng(0)
u = rng_.uniform(size=(r, 2))
phi, ct = 2 * np.pi * u[:, 0], np.sqrt(u[:, 1])
st = np.sqrt(1 - ct * ct)
a = np.where(np.abs(gn[:, :1]) > 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
tx = np.cross(gn, a)
tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-9)
ty = np.cross(gn, tx)
bd = (tx * (st * np.cos(phi))[:, None] + ty * (st * np.sin(phi))[:, None]
      + gn * ct[:, None]).astype(np.float32)
db = ((bd[:, 0] > 0) * 32 + (bd[:, 1] > 0) * 16 + (bd[:, 2] > 0) * 8
      + (np.abs(bd[:, 0]) > 0.5) * 4 + (np.abs(bd[:, 1]) > 0.5) * 2
      + (np.abs(bd[:, 2]) > 0.5)).astype(int)
key = np.maximum(np.asarray(tri), 0) // width * 64 + db
perm = np.argsort(key, kind="stable")
ob = jnp.asarray(p[perm] + bd[perm] * 0.01)
db_ = jnp.asarray(bd[perm])

# Routing quantities (mirror cluster_intersect_chunked).
inv = 1.0 / db_
lo = (accel.kmin[None] - ob[:, None]) * inv[:, None]
hi = (accel.kmax[None] - ob[:, None]) * inv[:, None]
tn = jnp.where(jnp.isnan(jnp.minimum(lo, hi)), -jnp.inf, jnp.minimum(lo, hi))
tf = jnp.where(jnp.isnan(jnp.maximum(lo, hi)), jnp.inf, jnp.maximum(lo, hi))
enter = jnp.max(tn, axis=2)
exit_ = jnp.min(tf, axis=2)
touch = np.asarray((enter <= exit_) & (exit_ >= 0))  # (R, K)
print(f"chunks touched/ray: mean {touch.sum(1).mean():.2f}  "
      f"dist {[int((touch.sum(1)==k).sum()) for k in range(min(K,6)+1)]}",
      flush=True)

# Per (k, subtile)/(k, step) parked fractions.
sub_t = touch.reshape(-1, tile, K).any(axis=1)       # (nSub, K) active
step_t = sub_t.reshape(-1, mega, K).any(axis=1)      # (nStep, K)
print(f"(k,subtile) active: {sub_t.mean():.3f}  (k,step) active: "
      f"{step_t.mean():.3f}", flush=True)

# Candidate density per active row: run the key kernel per chunk.
o_k = jnp.where(jnp.asarray(touch).T[:, :, None], ob[None], 1e9)
dens = []
for k in range(K):
    rays = jnp.concatenate([o_k[k], db_, jnp.zeros((r, 2))], axis=1)
    caabb = jnp.concatenate([accel.cmin[k].T, accel.cmax[k].T,
                             jnp.zeros((2, C))], axis=0)
    keyk = np.asarray(_candidate_keys(rays, caabb, tile, mega,
                                      jax.default_backend() != "tpu"))
    cnt = (keyk < float(BIG)).sum(axis=1)  # per subtile
    act = sub_t[:, k]
    dens.append((cnt.sum(), cnt[act].mean() if act.any() else 0.0,
                 act.sum()))
tot = sum(d[0] for d in dens)
print(f"total candidates/iter: {tot}  per-ray {tot/ (r/tile):.2f} "
      f"(subtile-level)", flush=True)
for k, (s, m, na) in enumerate(dens):
    print(f"  chunk {k}: active subtiles {na:5d}  mean cand/active {m:.2f}",
          flush=True)

# Aligned supergroup spanning: candidate counts at s-cluster granularity
# (the candidate-phase cost scales ~1/s; the test kernel would test every
# cluster of a hit supergroup, so spanning factor = extra test work).
for k in range(min(K, 3)):
    rays = jnp.concatenate([o_k[k], db_, jnp.zeros((r, 2))], axis=1)
    caabb = jnp.concatenate([accel.cmin[k].T, accel.cmax[k].T,
                             jnp.zeros((2, C))], axis=0)
    keyk = np.asarray(_candidate_keys(rays, caabb, tile, mega,
                                      jax.default_backend() != "tpu"))
    hitm = keyk < float(BIG)  # (nSub, C)
    act = sub_t[:, k]
    base = hitm[act].sum(1).mean()
    for s in (2, 4, 8):
        sup = hitm.reshape(hitm.shape[0], -1, s).any(axis=2)
        cnt = (sup.sum(1) * s)[act].mean()
        print(f"  chunk {k}: s={s} tested-clusters/active {cnt:.1f} "
              f"(vs {base:.1f}; spanning x{cnt/max(base,1e-9):.2f}, "
              f"sort-cols /{s})", flush=True)
