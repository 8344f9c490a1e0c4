"""Dev harness: time stripped-down variants of the refill step in a
lax.while_loop on the real TPU, to attribute per-iteration cost.

Usage: python tools/bench_step.py [variant ...]
Variants: intersect, intersect2, gather, nee, next, refill, sort, scatter, full
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import montecarlopathtracing_tpu as m
from montecarlopathtracing_tpu.accel.lbvh import build_lbvh
from montecarlopathtracing_tpu.config import RenderOptions
from montecarlopathtracing_tpu.integrator import rng
from montecarlopathtracing_tpu.integrator.camera import primary_rays
from montecarlopathtracing_tpu.integrator.wavefront import (
    _gather_hit, _gather_i32, _nee_direct, _next_ray, _permute_rows,
    _tile_swizzled_ids, intersect_any, swizzle_tile,
)

R = 65536
N_ITER = 40

scene, meta = m.load_scene("/root/reference/scene", "cornell-box")
bvh = jax.jit(build_lbvh)(scene)
opts = RenderOptions(spp=4, chunk_size=R)
ids = jnp.asarray(_tile_swizzled_ids(1024, 1024, swizzle_tile(opts, scene.num_tris_padded)))
n_slots = rng.n_bounce_slots(scene.num_lights)

pix0 = ids[:R]
keys0 = rng.lane_keys(0, pix0, 0)
o0, d0 = primary_rays(scene.camera, pix0)
n_items = 1024 * 1024 * 4


def run(name, body, state0, n=N_ITER):
    def loop(state0, salt):
        def cond(c):
            return c[0] < n

        def wbody(c):
            i, st = c
            return i + 1, body(st, i + salt)

        return jax.lax.while_loop(cond, wbody, (jnp.int32(0), state0))[1]

    f = jax.jit(loop)
    out = f(state0, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(state0, jnp.int32(1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:12s} {dt:7.3f} ms/iter")
    return dt


which = set(sys.argv[1:]) or {"intersect", "intersect2", "gather", "nee",
                              "next", "refill", "sort", "scatter", "full"}

if "intersect" in which:
    def body(st, i):
        o, d = st
        hit, t, tri = intersect_any(scene, bvh, o, d, opts)
        # value-dependence so iterations can't be memoized away
        o = o + jnp.float32(1e-9) * t[:, None]
        return o, d
    run("intersect", body, (o0, d0))

if "intersect2" in which:
    def body(st, i):
        o, d = st
        hit, t, tri = intersect_any(scene, bvh, o, d, opts)
        hit2, t2, tri2 = intersect_any(scene, bvh, o + 0.001, d, opts)
        o = o + jnp.float32(1e-9) * (t + t2)[:, None]
        return o, d
    run("intersect2", body, (o0, d0))

if "gather" in which:
    def body(st, i):
        o, d, tri = st
        t = jnp.ones((R,), jnp.float32)
        p, pn, matf, kd = _gather_hit(scene, opts, o, d, t, tri)
        tri = (tri + 1) % scene.num_tris_padded
        return o + 1e-9 * kd, d, tri
    run("gather", body, (o0, d0, jnp.arange(R, dtype=jnp.int32) % scene.num_tris_padded))

if "nee" in which:
    def body(st, i):
        o, d, keys = st
        u = rng.bounce_uniforms(keys, i, n_slots)
        pn = d
        kd = jnp.abs(d)
        l = _nee_direct(scene, bvh, opts, o, pn, kd, u, jnp.ones((R,), bool))
        return o + 1e-9 * l, d, keys
    run("nee", body, (o0, d0, keys0))

if "next" in which:
    tri0 = jnp.arange(R, dtype=jnp.int32) % scene.num_tris_padded
    def body(st, i):
        o, d, keys = st
        u = rng.bounce_uniforms(keys, i, n_slots)
        t = jnp.ones((R,), jnp.float32)
        p, pn, matf, kd = _gather_hit(scene, opts, o, d, t, tri0)
        no, nd, rt, w = _next_ray(scene, opts, p, pn, matf, kd, d, u)
        return o + 1e-9 * (no + w), nd, keys
    run("next(+gath)", body, (o0, d0, keys0))

if "refill" in which:
    def body(st, i):
        q, o, d, keys, item = st
        dead = (item & 3) == (i & 3)
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        it = q + rank
        refill = dead & (it < n_items)
        slot_new = q % (1024 * 1024) + rank
        wrap = slot_new >= 1024 * 1024
        slot_new = jnp.where(wrap, slot_new - 1024 * 1024, slot_new)
        samp_new = q // (1024 * 1024) + wrap.astype(jnp.int32)
        pix_new = _gather_i32(ids, slot_new)
        keys_new = rng.lane_keys(0, pix_new, samp_new)
        o_new, d_new = primary_rays(scene.camera, pix_new)
        o = jnp.where(refill[:, None], o_new, o)
        d = jnp.where(refill[:, None], d_new, d)
        keys = jnp.where(refill[:, None], keys_new, keys)
        item = jnp.where(refill, it, item)
        q = q + jnp.sum(refill)
        return q, o, d, keys, item
    run("refill", body, (jnp.int32(R), o0, d0, keys0, jnp.arange(R, dtype=jnp.int32)))

if "sort" in which:
    tri0 = jnp.arange(R, dtype=jnp.int32)
    def body(st, i):
        o, d, beta, rad, keys, item, kind, alive = st
        octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
                  + (d[:, 1] > 0).astype(jnp.int32) * 2
                  + (d[:, 2] > 0).astype(jnp.int32))
        key = jnp.where(alive, (item & 1023) * 8 + octant, jnp.int32(2 ** 30))
        perm = jnp.argsort(key)
        (o, d, beta, rad), (item, keys, kind, alive) = _permute_rows(
            perm, (o, d, beta, rad), (item, keys, kind, alive))
        return o, d, beta, rad, keys, item + 1, kind, alive
    run("sort", body, (o0, d0, jnp.ones((R, 3)), jnp.zeros((R, 3)), keys0,
                       tri0, jnp.zeros((R,), jnp.int32), jnp.ones((R,), bool)))

if "scatter" in which:
    def body(st, i):
        film, rad, idx = st
        film = film.at[idx].add(rad, unique_indices=True)
        return film, rad + 1e-9, (idx + R) % n_items
    run("scatter", body, (jnp.zeros((n_items, 3)), jnp.ones((R, 3)),
                          jnp.arange(R, dtype=jnp.int32)))

if "full" in which:
    from montecarlopathtracing_tpu.integrator.wavefront import _render_refill_jit
    r, nr = _render_refill_jit(scene, bvh, opts, ids, sample_offset=0, lanes=R)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r, nr = _render_refill_jit(scene, bvh, opts, ids, sample_offset=7, lanes=R)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{'full frame':12s} {dt*1e3:7.1f} ms  ({float(nr)/dt:.3e} rays/s)")
