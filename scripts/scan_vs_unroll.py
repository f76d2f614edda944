"""Does `lax.scan` over stacked weights cost decode bandwidth vs an unrolled
layer loop? (the ~50%-of-roofline question, isolated)

Three forms of the same 28-layer x 7-GEMV decode chain at 7B dims, S4 weights:
  scan    — weights stacked (L, K, N), lax.scan slices per layer (the model's
            current form)
  unroll  — 28 separate weight pytrees, Python-unrolled inside one jit
  single  — ONE layer's GEMVs run 28x (upper bound: perfect weight reuse —
            measures non-bandwidth overhead only)

Also: attention-free vs with a mock attention read, to size that segment.
env: DEPTH (28), TOKENS (32), DTYPE (s4|int8|packed)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_cfg

DEPTH = int(os.environ.get("DEPTH", "28"))
TOKENS = int(os.environ.get("TOKENS", "32"))
DTYPE = os.environ.get("DTYPE", "s4")


def dims(cfg):
    Hd, I = cfg.hidden, cfg.inter_eff
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    return [(Hd, H * hd), (Hd, KV * hd), (Hd, KV * hd), (H * hd, Hd),
            (Hd, I), (Hd, I), (I, Hd)]


def make_sites(cfg, stacked: bool, key):
    ws = []
    for i, (k, n) in enumerate(dims(cfg)):
        shape = (DEPTH, k, n) if stacked else (k, n)
        w = jax.random.randint(jax.random.fold_in(key, i), shape, -7, 8,
                               jnp.int8)
        ws.append(w)
    return ws


def to_store(w):
    if DTYPE == "s4":
        return jax.lax.optimization_barrier(w.astype(jnp.int4))
    if DTYPE == "packed":
        half = w.shape[-2] // 2
        lo = w[..., :half, :].astype(jnp.uint8) & 0xF
        hi = w[..., half:, :].astype(jnp.uint8) & 0xF
        return jax.lax.optimization_barrier((lo | (hi << 4)).astype(jnp.int8))
    return w


def gemv(x, w):
    if DTYPE == "packed":
        u = w.astype(jnp.int32) & 0xFF
        lo = jnp.where((u & 0xF) >= 8, (u & 0xF) - 16, u & 0xF)
        hi = jnp.where((u // 16) >= 8, (u // 16) - 16, u // 16)
        wf = jnp.concatenate([lo, hi], axis=-2).astype(jnp.bfloat16)
    else:
        wf = w.astype(jnp.bfloat16)
    return jnp.dot(x, wf, preferred_element_type=jnp.float32)


def layer(h, ws):
    Hd = h.shape[-1]
    xq = h.astype(jnp.bfloat16)
    q = gemv(xq, ws[0])
    k = gemv(xq, ws[1])
    v = gemv(xq, ws[2])
    o = gemv(q.astype(jnp.bfloat16), ws[3])
    g = gemv(xq, ws[4])
    u = gemv(xq, ws[5])
    d = gemv((g * u).astype(jnp.bfloat16), ws[6])
    return (h + o[..., :Hd] + d + k.sum() * 0 + v.sum() * 0).astype(h.dtype)


def timeit(f, *args):
    r = f(*args)
    _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best / TOKENS


def main():
    cfg = make_cfg(DEPTH)
    key = jax.random.key(0)
    x0 = jax.random.normal(jax.random.key(1), (1, cfg.hidden), jnp.bfloat16)

    # scan form
    stacked = jax.jit(lambda k: [to_store(w) for w in make_sites(
        cfg, True, k)])(key)

    @jax.jit
    def f_scan(ws, x0):
        def tok(i, h):
            def body(h, lw):
                return layer(h, lw), None
            h, _ = jax.lax.scan(body, h, ws)
            return h + i * 0.0
        return jax.lax.fori_loop(0, TOKENS, tok, x0)

    dt = timeit(f_scan, stacked, x0)
    print(f"[scan]   {dt*1e3:.3f} ms/step ({1/dt:.1f} tok/s-equiv)", flush=True)

    del stacked
    # unrolled form: DEPTH separate pytrees
    per_layer = [jax.jit(lambda k: [to_store(w) for w in make_sites(
        cfg, False, k)])(jax.random.fold_in(key, l)) for l in range(DEPTH)]

    @jax.jit
    def f_unroll(layers, x0):
        def tok(i, h):
            for lw in layers:
                h = layer(h, lw)
            return h + i * 0.0
        return jax.lax.fori_loop(0, TOKENS, tok, x0)

    dt = timeit(f_unroll, per_layer, x0)
    print(f"[unroll] {dt*1e3:.3f} ms/step ({1/dt:.1f} tok/s-equiv)", flush=True)

    # single-layer reuse upper bound
    one = per_layer[0]
    del per_layer

    @jax.jit
    def f_single(lw, x0):
        def tok(i, h):
            h2 = jax.lax.fori_loop(
                0, DEPTH, lambda j, hh: layer(hh, lw), h)
            return h2 + i * 0.0
        return jax.lax.fori_loop(0, TOKENS, tok, x0)

    dt = timeit(f_single, one, x0)
    print(f"[single] {dt*1e3:.3f} ms/step ({1/dt:.1f} tok/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
