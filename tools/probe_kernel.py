"""Round-4 kernel attribution: where do the test kernel's 3.81 ms/iter go?

Times cluster_intersect's two Pallas phases separately on a combined-call-
sized wavefront (131072 rays = 2048 subtiles of 64) under controlled
occupancy scenarios, chaining value-dependent inputs inside one jit so the
tunnel's dispatch memoization can't fake the numbers (CLAUDE.md).

    python tools/probe_kernel.py [scenario ...]
Scenarios: parked, emptycand, realmix, full, candonly, testonly
"""
import sys, time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator.camera import primary_rays
from montecarlopathtracing_tpu.integrator.wavefront import (
    _tile_swizzled_ids, swizzle_tile)
from montecarlopathtracing_tpu.kernels.cluster import (
    build_cluster_accel, cluster_intersect, _candidates,
    _cluster_intersect_padded)

R = 131072
TILE, MEGA, GROUP = 64, 16, 8
N_ITER = 50

scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
opts = RenderOptions(spp=16, max_depth=32, chunk_size=65536)
accel = build_cluster_accel(scene, width=opts.cluster_width)
print(f"tris_padded={scene.num_tris_padded} clusters={accel.num_clusters}",
      flush=True)


def timed(name, body, state0, n=N_ITER):
    def loop(state0, salt):
        def cond(c):
            return c[0] < n

        def wbody(c):
            i, st = c
            return i + 1, body(st, i + salt)

        return jax.lax.while_loop(cond, wbody, (jnp.int32(0), state0))[1]

    f = jax.jit(loop)
    out = jax.block_until_ready(f(state0, jnp.int32(0)))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(state0, jnp.int32(1)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:24s} {dt:7.3f} ms/iter", flush=True)
    return dt


def make_realmix():
    """~Renderer-shaped combined wavefront: first half = arrivals (60% fresh
    sorted bounce rays, 40% parked at the tail), second half = shadow rays
    toward the light from the live lanes' hit points (parked elsewhere)."""
    half = R // 2
    ids = _tile_swizzled_ids(1024, 1024, swizzle_tile(opts, scene.num_tris_padded))
    pix = jnp.asarray(ids[:half])
    o, d = primary_rays(scene.camera, pix)
    hit, t, tri = cluster_intersect(accel, o, d, tile=TILE, mega=MEGA,
                                    group=GROUP)
    p = o + d * jnp.where(hit, t, 1.0)[:, None]
    gn = np.asarray(scene.geom_n)[np.maximum(np.asarray(tri), 0)]
    rng_ = np.random.default_rng(0)
    u = rng_.uniform(size=(half, 2))
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
    width = accel.width
    key = np.maximum(np.asarray(tri), 0) // width * 64 + db
    # Park the last 40% of lanes (post-sort tail, like the renderer).
    n_live = int(half * 0.6)
    perm = np.argsort(key, kind="stable")[:n_live]
    po = np.full((half, 3), 1e9, np.float32)
    pd = np.tile(np.array([[1.0, 0, 0]], np.float32), (half, 1))
    po[:n_live] = np.asarray(p)[perm] + bd[perm] * 0.01
    pd[:n_live] = bd[perm]
    # Shadow half: from the live hit points toward the light centroid.
    lt = np.asarray(scene.v0[np.asarray(scene.light_face_tri[0, 0])])
    so = np.full((half, 3), 1e9, np.float32)
    sd = np.tile(np.array([[1.0, 0, 0]], np.float32), (half, 1))
    delta = lt[None, :] - np.asarray(p)[perm]
    dist = np.maximum(np.linalg.norm(delta, axis=1, keepdims=True), 1e-9)
    so[:n_live] = np.asarray(p)[perm] + delta / dist * 0.01
    sd[:n_live] = delta / dist
    o_all = jnp.asarray(np.concatenate([po, so]))
    d_all = jnp.asarray(np.concatenate([pd, sd]))
    return o_all, d_all


def isect_body(st, i):
    o, d = st
    hit, t, tri = cluster_intersect(accel, o, d, tile=TILE, mega=MEGA,
                                    group=GROUP)
    live = o[:, 0] < 5e8
    o = o + jnp.where(live, 1e-9 * t, 0.0)[:, None]
    return o, d


which = set(sys.argv[1:]) or {"parked", "emptycand", "realmix", "candonly",
                              "testonly"}

if "megasweep" in which:
    o = jnp.full((R, 3), 1e9, jnp.float32)
    d = jnp.tile(jnp.array([[1.0, 0, 0]], jnp.float32), (R, 1))
    o_mix, d_mix = make_realmix()
    for mg in (16, 32, 64, 128):
        def body(st, i, mg=mg):
            o, d = st
            hit, t, tri = cluster_intersect(accel, o, d, tile=TILE, mega=mg,
                                            group=GROUP)
            live = o[:, 0] < 5e8
            o = o + jnp.where(live, 1e-9 * t, 0.0)[:, None]
            return o, d
        timed(f"parked mega={mg}", body, (o, d))
        timed(f"realmix mega={mg}", body, (o_mix, d_mix))

if "parked" in which:
    o = jnp.full((R, 3), 1e9, jnp.float32)
    d = jnp.tile(jnp.array([[1.0, 0, 0]], jnp.float32), (R, 1))
    timed("all-parked", isect_body, (o, d))

if "emptycand" in which:
    # Active (x=1e6 < 5e8 threshold) but pointing away: slab phase runs
    # full-price, candidate lists all empty, test loop n==0 path.
    o = jnp.full((R, 3), 1e6, jnp.float32)
    d = jnp.tile(jnp.array([[1.0, 0, 0]], jnp.float32), (R, 1))
    timed("active-emptycand", isect_body, (o, d))

if "realmix" in which or "candonly" in which or "testonly" in which:
    o_mix, d_mix = make_realmix()

if "realmix" in which:
    timed("realmix-full", isect_body, (o_mix, d_mix))

if "candonly" in which:
    def body(st, i):
        o, d = st
        rays = jnp.concatenate([o, d, jnp.zeros((R, 2))], axis=1)
        cand = _candidates(rays, accel.cmin, accel.cmax, TILE, MEGA, False)[0]
        o = o + 1e-12 * jnp.sum(cand[..., 0]).astype(jnp.float32)
        return o, d
    timed("realmix-candphase", body, (o_mix, d_mix))

    from montecarlopathtracing_tpu.kernels.cluster import _candidate_keys
    caabb = jnp.concatenate(
        [accel.cmin.T, accel.cmax.T,
         jnp.zeros((2, accel.num_clusters), jnp.float32)], axis=0)

    def body_keys(st, i):
        o, d = st
        rays = jnp.concatenate([o, d, jnp.zeros((R, 2))], axis=1)
        key = _candidate_keys(rays, caabb, TILE, MEGA, False)
        o = o + 1e-12 * jnp.sum(key).astype(jnp.float32)
        return o, d
    timed("realmix-keysonly", body_keys, (o_mix, d_mix))

    op = jnp.full((R, 3), 1e9, jnp.float32)
    dp = jnp.tile(jnp.array([[1.0, 0, 0]], jnp.float32), (R, 1))
    timed("parked-candphase", body, (op, dp))
    timed("parked-keysonly", body_keys, (op, dp))

if "testonly" in which:
    rays0 = jnp.concatenate([o_mix, d_mix, jnp.zeros((R, 2))], axis=1)
    cand0 = _candidates(rays0, accel.cmin, accel.cmax, TILE, MEGA, False)[0]

    def body(st, i):
        rays, cand = st
        bt, bi = _cluster_intersect_padded(accel, rays, cand, None, TILE,
                                           MEGA, GROUP, False)
        live = rays[:, 0] < 5e8
        rays = rays.at[:, 0].add(jnp.where(live, 1e-9 * bt, 0.0))
        return rays, cand
    timed("realmix-testkernel", body, (rays0, cand0))
