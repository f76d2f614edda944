"""Decompose one 7B decoder layer's prefill cost at T=1024 into components:
GEMMs (attn/mlp), attention core, norms+rope, act-quant, hadamard.
Chained fori_loop + fetch-forced timing (axon tunnel rules)."""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.core.quant import QuantParams
from mquant_tpu.models import layers as L
from mquant_tpu.models.llm import DecoderConfig, rope_tables

cfg = DecoderConfig(vocab=152064, hidden=3584, n_layers=1, n_heads=28,
                    n_kv_heads=4, intermediate=18944, intermediate_pad=19968,
                    dtype=jnp.bfloat16)
B, T = 1, int(os.environ.get("BENCH_T", "1024"))
CHAIN = int(os.environ.get("BENCH_CHAIN", "16"))
key = jax.random.key(0)
Hd, I = cfg.hidden, cfg.inter_eff
H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim


def w(k, i, o, dt=jnp.bfloat16):
    return jax.random.normal(jax.random.fold_in(key, k), (i, o), dt) * 0.02


WQ = w(1, Hd, H * hd)
WK = w(2, Hd, KV * hd)
WV = w(3, Hd, KV * hd)
WO = w(4, H * hd, Hd)
WG = w(5, Hd, I)
WU = w(6, Hd, I)
WD = w(7, I, Hd)
LN = jnp.ones((Hd,), jnp.bfloat16)
pos = jnp.arange(T)[None]
cos, sin = rope_tables(cfg, pos, jnp.float32)
mask = L.causal_mask(T, T)


WS = dict(q=WQ, k=WK, v=WV, o=WO, g=WG, u=WU, d=WD)


def bench(label, step, shape=(B, T, Hd)):
    # weights passed as ARGS (closure constants would be serialized into the
    # remote-compile request body — HTTP 413 on the tunnel backend)
    @jax.jit
    def f(h, ws):
        def body(i, h):
            return step(h, ws).astype(h.dtype)

        out = jax.lax.fori_loop(0, CHAIN, body, h)
        return out.ravel()[:8]  # fetch only 8 values over the tunnel

    hs = [jax.random.normal(jax.random.fold_in(key, 50 + i), shape, jnp.bfloat16)
          for i in range(4)]
    r = f(hs[0], WS)
    _ = np.asarray(r).ravel()[0]
    ts = []
    for h in hs[1:]:
        t0 = time.perf_counter()
        r = f(h, WS)
        _ = np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / CHAIN
    print(f"{label}: {dt*1e3:.3f} ms", flush=True)
    return dt


def attn_proj(h, ws):
    """q/k/v/o GEMMs only (o fed from reshaped q to keep shapes)."""
    q = h @ ws["q"]
    k = h @ ws["k"]
    v = h @ ws["v"]
    o = q @ ws["o"]
    return o + k.sum() * 0 + v.sum() * 0


def mlp_gemms(h, ws):
    g = h @ ws["g"]
    u = h @ ws["u"]
    return (g * u) @ ws["d"]


def attn_core(h, ws):
    q = (h @ ws["q"]).reshape(B, T, H, hd)
    k = (h @ ws["k"]).reshape(B, T, KV, hd)
    v = (h @ ws["v"]).reshape(B, T, KV, hd)
    a = L.attention(q, k, v, mask)
    return a.reshape(B, T, H * hd) @ ws["o"]


def attn_core_flash(h, ws):
    q = (h @ ws["q"]).reshape(B, T, H, hd)
    k = (h @ ws["k"]).reshape(B, T, KV, hd)
    v = (h @ ws["v"]).reshape(B, T, KV, hd)
    a = L.attention(q, k, v, None, causal=True)
    return a.reshape(B, T, H * hd) @ ws["o"]


def norms_rope(h, ws):
    x = L.rms_norm(h, LN)
    q = (x @ ws["q"]).reshape(B, T, H, hd)
    k = (x @ ws["k"]).reshape(B, T, KV, hd)
    q, k = L.apply_rope(q, k, cos, sin)
    return q.reshape(B, T, H * hd) + jnp.pad(k.reshape(B, T, KV * hd),
                                             ((0, 0), (0, 0), (0, (H - KV) * hd)))


def quantize_only(h, ws):
    from mquant_tpu.core.quant import quantize
    qp = QuantParams(scale=jnp.float32(0.05))
    from mquant_tpu.core.formats import INT8
    q = quantize(h, qp, INT8)
    return q.astype(jnp.bfloat16)


def hadamard_only(h, ws):
    from mquant_tpu.kernels.fwht import online_hadamard
    return online_hadamard(h)


if __name__ == "__main__":
    print(f"T={T} chain={CHAIN}", flush=True)
    bench("attn qkvo GEMMs            ", attn_proj)
    bench("mlp GEMMs (padded 19968)   ", mlp_gemms)
    bench("attn core einsum (qkvo+att)", attn_core)
    if os.environ.get("MQUANT_FLASH_MIN_T", "2048") <= str(T):
        bench("attn core flash (qkvo+att) ", attn_core_flash)
    bench("norm+qk+rope               ", norms_rope)
    bench("int8 quantize (T,3584)     ", quantize_only)
    bench("int8 quantize (T,19968)    ", quantize_only, shape=(B, T, I))
    bench("online hadamard (T,19968)  ", hadamard_only, shape=(B, T, I))
