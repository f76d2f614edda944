"""Prefill (T=1024) segment probe for the W4A8 real path at 7B dims:
where do the 3.77 ms/layer go, and which levers close the gap to the
~1.7 ms int8-GEMM floor? Chained fori_loop + fetch-forced timing
(axon tunnel rules). Run on the TPU."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.core.formats import INT8
from mquant_tpu.core.quant import QuantParams, quantize
from mquant_tpu.models import layers as L

B, T = 1, int(os.environ.get("BENCH_T", "1024"))
CHAIN = int(os.environ.get("BENCH_CHAIN", "16"))
Hd, I = 3584, 18944
H, KV, hd = 28, 4, 128
key = jax.random.key(0)


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def _mk(k, i, o):
    # int8 weights directly (no transient f32 giants over the tunnel)
    q = jax.random.randint(jax.random.fold_in(key, k), (i, o), -127, 128,
                           jnp.int8)
    return {"w_q": q, "w_scale": jnp.full((o,), 2e-4, jnp.float32)}


def mkw(k, i, o):
    return _mk(k, i, o)


WS = {
    "q": mkw(1, Hd, H * hd), "k": mkw(2, Hd, KV * hd), "v": mkw(3, Hd, KV * hd),
    "o": mkw(4, H * hd, Hd), "g": mkw(5, Hd, I), "u": mkw(6, Hd, I),
    "d": mkw(7, I, Hd),
    "qkv": mkw(8, Hd, H * hd + 2 * KV * hd), "gu": mkw(9, Hd, 2 * I),
}
from mquant_tpu.models.llm import rope_tables, DecoderConfig  # noqa: E402
import dataclasses  # noqa: E402

cfg = DecoderConfig(vocab=152064, hidden=Hd, n_layers=1, n_heads=H,
                    n_kv_heads=KV, intermediate=I, dtype=jnp.bfloat16)
pos = jnp.arange(T)[None]
COS, SIN = rope_tables(cfg, pos, jnp.float32)
MASK = L.causal_mask(T, T)
QP = QuantParams(scale=jnp.float32(0.05))


def s8mm(x_q, w, out_dt=jnp.bfloat16):
    acc = jax.lax.dot_general(x_q, w["w_q"], (((x_q.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * 0.05 * w["w_scale"]).astype(out_dt)


def bench(label, step, shape=(B, T, Hd), dtype=jnp.bfloat16):
    @jax.jit
    def f(h, ws):
        def body(i, h):
            return step(h, ws).astype(h.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, h).ravel()[:8]

    hs = [jax.random.normal(jax.random.fold_in(key, 50 + i), shape, dtype)
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


def quant(x):
    return quantize(x, QP, INT8)


# -- segments ----------------------------------------------------------------

def seg_qkv_sep(h, ws):
    xq = quant(h)
    q = s8mm(xq, ws["q"]); k = s8mm(xq, ws["k"]); v = s8mm(xq, ws["v"])
    return q + jnp.pad(k, ((0, 0), (0, 0), (0, (H - KV) * hd))) + \
        jnp.pad(v, ((0, 0), (0, 0), (0, (H - KV) * hd)))


def seg_qkv_fused(h, ws):
    xq = quant(h)
    qkv = s8mm(xq, ws["qkv"])
    return qkv[..., :H * hd]


def seg_mlp_sep(h, ws):
    xq = quant(h)
    g = s8mm(xq, ws["g"]); u = s8mm(xq, ws["u"])
    a = L.swiglu(g, u)
    return s8mm(quant(a), ws["d"])


def seg_mlp_fused(h, ws):
    xq = quant(h)
    gu = s8mm(xq, ws["gu"])
    a = L.swiglu(gu[..., :I], gu[..., I:])
    return s8mm(quant(a), ws["d"])


def seg_attn_einsum(h, ws):
    q = h.reshape(B, T, H, hd)
    k = h[..., :KV * hd].reshape(B, T, KV, hd)
    v = h[..., :KV * hd].reshape(B, T, KV, hd)
    q, k = L.apply_rope(q, k, COS, SIN)
    return L.attention(q, k, v, MASK).reshape(B, T, H * hd)


def seg_attn_flash(h, ws):
    q = h.reshape(B, T, H, hd)
    k = h[..., :KV * hd].reshape(B, T, KV, hd)
    v = h[..., :KV * hd].reshape(B, T, KV, hd)
    q, k = L.apply_rope(q, k, COS, SIN)
    os.environ["MQUANT_FLASH_MIN_T"] = "256"
    out = L.attention(q, k, v, None, causal=True)
    os.environ["MQUANT_FLASH_MIN_T"] = "2048"
    return out.reshape(B, T, H * hd)


def seg_norms(h, ws):
    ln = jnp.ones((Hd,), jnp.bfloat16)
    return L.rms_norm(h, ln)


def seg_quant_only(h, ws):
    return quant(h).astype(jnp.bfloat16)


def seg_hadamard(h, ws):
    from mquant_tpu.kernels.fwht import online_hadamard

    return online_hadamard(h)


def seg_full_layer_real(h, ws):
    """The actual _layer_step real path for reference."""
    from mquant_tpu.models import llm as M
    global LP, LSTATE
    out, _ = M._layer_step(cfg, SPECS, "real", h, LP, LSTATE, None,
                           None, COS, SIN, None, None, prefill_fresh=False)
    return out


def seg_identity(h, ws):
    return h + 1.0


def seg_tail_unfused(h, ws):
    """swiglu → online hadamard → quantize → down GEMM (current real path)."""
    from mquant_tpu.kernels.fwht import online_hadamard

    g, u = h, h * 0.5
    a = L.swiglu(g, u)
    a = online_hadamard(a)
    y = s8mm(quant(a), ws["d"], jnp.bfloat16)
    return jnp.pad(y, ((0, 0), (0, 0), (0, I - Hd)))


def seg_tail_hadquant(h, ws):
    """swiglu (XLA) → fused had+quant Pallas → down GEMM."""
    from mquant_tpu.kernels.fwht import had_quant

    g, u = h, h * 0.5
    a = L.swiglu(g, u)
    q8 = had_quant(a, jnp.float32(0.05), tile_t=int(os.environ.get("HQ_TILE", "128")))
    y = s8mm(q8, ws["d"], jnp.bfloat16)
    return jnp.pad(y, ((0, 0), (0, 0), (0, I - Hd)))


def seg_tail_fullfused(h, ws):
    """fused swiglu+had+quant Pallas → down GEMM (round-2 kernel)."""
    from mquant_tpu.kernels.fwht import fused_swiglu_had_quant

    g, u = h, h * 0.5
    q8 = fused_swiglu_had_quant(g, u, jnp.float32(0.05), tile_t=256)
    y = s8mm(q8, ws["d"], jnp.bfloat16)
    return jnp.pad(y, ((0, 0), (0, 0), (0, I - Hd)))


def seg_norm_quant_unfused(h, ws):
    ln = jnp.ones((Hd,), jnp.bfloat16)
    x = L.rms_norm(h, ln)
    return quant(x).astype(jnp.bfloat16)


def seg_norm_quant_fused(h, ws):
    from mquant_tpu.kernels.fwht import rms_norm_quant

    ln = jnp.ones((Hd,), jnp.bfloat16)
    return rms_norm_quant(h, ln, jnp.float32(0.05)).astype(jnp.bfloat16)


def main():
    print(f"T={T} chain={CHAIN}", flush=True)
    bench("identity (fixed overhead)   ", seg_identity)
    bench("tail unfused (sw+had+q+down)", seg_tail_unfused, shape=(B, T, I))
    bench("tail had_quant pallas       ", seg_tail_hadquant, shape=(B, T, I))
    bench("norm+quant unfused          ", seg_norm_quant_unfused)
    bench("norm+quant fused pallas     ", seg_norm_quant_fused)
    bench("quantize (T,3584)           ", seg_quant_only)
    bench("rmsnorm (T,3584)            ", seg_norms)
    bench("hadamard (T,18944)          ", seg_hadamard, shape=(B, T, I))
    bench("qkv separate (s8)           ", seg_qkv_sep)
    bench("qkv fused    (s8)           ", seg_qkv_fused)
    bench("mlp separate (s8)           ", seg_mlp_sep)
    bench("mlp fused gu (s8)           ", seg_mlp_fused)
    bench("attn core einsum (bf16)     ", seg_attn_einsum,
          shape=(B, T, H * hd))
    bench("attn core flash  (bf16)     ", seg_attn_flash,
          shape=(B, T, H * hd))


if __name__ == "__main__":
    main()
