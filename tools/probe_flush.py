"""Probe: flush-strategy costs in a while loop at 64k lanes, 1M-pixel film.
 a) baseline: no film op
 b) unconditional scatter, ALL rows out-of-bounds dummies (mode=drop)
 c) unconditional scatter, ~1/16 real rows
 d) lax.cond fired every 16 iters (film branch copy) with full pend scatter
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R = 65536
NPIX = 1024 * 1024
N = 200

def run(name, body, state0):
    def loop(state0, salt):
        def cond(c): return c[0] < N
        def wbody(c):
            i, st = c
            return i + 1, body(st, i + salt)
        return jax.lax.while_loop(cond, wbody, (jnp.int32(0), state0))[1]
    f = jax.jit(loop)
    out = f(state0, jnp.int32(0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(state0, jnp.int32(1)); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:28s} {dt:7.3f} ms/iter", flush=True)

film0 = jnp.zeros((NPIX, 3), jnp.float32)
rad0 = jnp.ones((R, 3), jnp.float32)
lane = jnp.arange(R, dtype=jnp.int32)

def base(st, i):
    film, rad = st
    return film, rad + 1e-9 * i
run("baseline", base, (film0, rad0))

def all_dummy(st, i):
    film, rad = st
    idx = NPIX + lane
    film = film.at[idx].add(rad, unique_indices=True, mode="drop")
    return film, rad + 1e-9 * i
run("scatter all-dummy", all_dummy, (film0, rad0))

def sparse_real(st, i):
    film, rad = st
    real = (lane & 15) == (i & 15)
    idx = jnp.where(real, (lane * 17 + i) % NPIX, NPIX + lane)
    film = film.at[idx].add(rad, unique_indices=True, mode="drop")
    return film, rad + 1e-9 * i
run("scatter 1/16 real", sparse_real, (film0, rad0))

def cond_flush(st, i):
    film, rad = st
    def fire(f, r):
        return f.at[(lane * 17 + i) % NPIX].add(r, unique_indices=True, mode="drop")
    film = jax.lax.cond((i & 15) == 0, fire, lambda f, r: f, film, rad)
    return film, rad + 1e-9 * i
run("cond every16 full scatter", cond_flush, (film0, rad0))

def cond_flush_alias(st, i):
    film, rad = st
    def fire(f, r):
        return f.at[(lane * 17 + i) % NPIX].add(r, unique_indices=True, mode="drop")
    def idle(f, r):
        # a 1-row dummy scatter instead of identity: both branches are then
        # scatters into the same operand, which XLA can alias in place
        return f.at[jnp.full((1,), NPIX + 7, jnp.int32)].add(
            jnp.zeros((1, 3), f.dtype), unique_indices=True, mode="drop")
    film = jax.lax.cond((i & 15) == 0, fire, idle, film, rad)
    return film, rad + 1e-9 * i
run("cond alias-idle scatter", cond_flush_alias, (film0, rad0))

film0_t = jnp.zeros((3, NPIX), jnp.float32)
def cond_flush_chmajor(st, i):
    film, rad = st
    def fire(f, r):
        # channel-major film: scatter along the TRAILING axis via 3 1-D adds
        idx = (lane * 17 + i) % NPIX
        return jnp.stack([f[c].at[idx].add(r[:, c], mode="drop")
                          for c in range(3)])
    film = jax.lax.cond((i & 15) == 0, fire, lambda f, r: f, film, rad)
    return film, rad + 1e-9 * i
run("cond every16 channel-major film", cond_flush_chmajor, (film0_t, rad0))
