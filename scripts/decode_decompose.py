"""Decode-step decomposition at 7B dims (the ~50%-of-roofline question):
where do the non-GEMV milliseconds of one fused decode step go?

Measurements (all on-device fused loops, tunnel RTT amortized):
  1. decode tok/s at DEPTH and DEPTH/2          → per-layer slope + fixed intercept
  2. decode tok/s at prefill 128 vs 1024        → attention-length cost
  3. pure GEMV chain (7 sites × depth, packed)   → weight-streaming floor
  4. lm_head GEMV alone                          → head share of the intercept

env: DEPTH (28), GEMV (xla|pallas|pallas_w4), PREF (1024), TOKENS (64)
"""

import gc
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import init_w4a8_on_device, llm_specs, make_cfg
from mquant_tpu.serve.generate import Generator, measure_decode_tps

DEPTH = int(os.environ.get("DEPTH", "28"))
PREF = int(os.environ.get("PREF", "1024"))
TOKENS = int(os.environ.get("TOKENS", "64"))


def tps_at(depth, pref, label):
    cfg = make_cfg(depth)
    params, state = init_w4a8_on_device(cfg, jax.random.key(0))
    gen = Generator(cfg, params, specs=llm_specs(), state=state, mode="real",
                    max_len=pref + TOKENS + 8)
    toks = jnp.ones((1, pref), jnp.int32)
    tps = measure_decode_tps(gen, toks, n_tokens=TOKENS, on_device=True)
    print(f"[{label}] depth={depth} pref={pref}: {tps:.1f} tok/s "
          f"({1e3/tps:.3f} ms/step)", flush=True)
    del gen, params
    gc.collect()
    return 1.0 / tps


def gemv_chain(depth):
    """Pure weight-stream floor: the 7 per-layer GEMVs (packed storage,
    pallas_w4 path when enabled) + int8 lm_head, chained depth× in one jit —
    no attention, norms, rope, cache or loop bookkeeping."""
    from mquant_tpu.kernels.qmm import quantized_matmul_pre

    cfg = make_cfg(depth)
    Hd, I = cfg.hidden, cfg.inter_eff
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    key = jax.random.key(1)
    use_packed = os.environ.get("MQUANT_GEMV") == "pallas_w4"

    def site(k, din, dout, bits=4):
        w = jax.random.randint(k, (din, dout), -7 if bits == 4 else -127,
                               8 if bits == 4 else 128, jnp.int8)
        if bits == 4 and use_packed and din % 2 == 0:
            half = din // 2
            w = ((w[:half].astype(jnp.uint8) & 0xF)
                 | (w[half:].astype(jnp.uint8) << 4)).astype(jnp.int8)
        return {"w_q": w, "w_scale": jnp.full((dout,), 0.01, jnp.float32)}

    ks = iter(jax.random.split(key, 16))
    sites = [site(next(ks), Hd, H * hd), site(next(ks), Hd, KV * hd),
             site(next(ks), Hd, KV * hd), site(next(ks), H * hd, Hd),
             site(next(ks), Hd, I), site(next(ks), Hd, I),
             site(next(ks), I, Hd)]
    head = site(next(ks), Hd, cfg.vocab, bits=8)
    sites_j = jax.jit(lambda s: s)(sites)  # materialize on device
    head_j = jax.jit(lambda s: s)(head)

    @jax.jit
    def f(sites, head, x0):
        def layer(h, _):
            xq = jnp.clip(jnp.round(h / 0.05), -127, 127).astype(jnp.int8)
            q = quantized_matmul_pre(xq, jnp.float32(0.05), sites[0], jnp.bfloat16)
            k = quantized_matmul_pre(xq, jnp.float32(0.05), sites[1], jnp.bfloat16)
            v = quantized_matmul_pre(xq, jnp.float32(0.05), sites[2], jnp.bfloat16)
            o = quantized_matmul_pre(
                jnp.clip(jnp.round(q / 0.05), -127, 127).astype(jnp.int8),
                jnp.float32(0.05), sites[3], jnp.bfloat16)
            g = quantized_matmul_pre(xq, jnp.float32(0.05), sites[4], jnp.bfloat16)
            u = quantized_matmul_pre(xq, jnp.float32(0.05), sites[5], jnp.bfloat16)
            gu = (g * u)
            xq2 = jnp.clip(jnp.round(gu / 0.05), -127, 127).astype(jnp.int8)
            d = quantized_matmul_pre(xq2, jnp.float32(0.05), sites[6], jnp.bfloat16)
            hn = (h + o + d + k.sum() * 0 + v.sum() * 0).astype(h.dtype)
            return hn, None

        # chain TOKENS steps of (depth sequential layers + head)
        def tok_step(i, carry):
            h = carry
            h = jax.lax.fori_loop(0, depth, lambda j, hh: layer(hh, None)[0], h)
            xq = jnp.clip(jnp.round(h / 0.05), -127, 127).astype(jnp.int8)
            logits = quantized_matmul_pre(xq, jnp.float32(0.05), head,
                                          jnp.bfloat16)
            return h + logits[:, :Hd] * 0 + i * 0.0

        return jax.lax.fori_loop(0, TOKENS, tok_step, x0)[0, :8]

    # NOTE: fori_loop over layers re-traces layer once (weights closed over
    # as args via sites list) — all sites same shapes per call type
    x0 = jax.random.normal(jax.random.key(2), (1, Hd), jnp.bfloat16)
    r = f(sites_j, head_j, x0)
    _ = np.asarray(r)[0]
    ts = []
    for i in range(3):
        x = x0 + jnp.bfloat16(i + 1)
        t0 = time.perf_counter()
        r = f(sites_j, head_j, x)
        _ = np.asarray(r)[0]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / TOKENS
    print(f"[gemv-chain] depth={depth}: {dt*1e3:.3f} ms/step "
          f"({1.0/dt:.1f} tok/s equivalent)", flush=True)
    return dt


def main():
    stage = os.environ.get("STAGE", "all")
    print(f"GEMV mode: {os.environ.get('MQUANT_GEMV', 'xla')} "
          f"stage: {stage}", flush=True)
    if stage in ("all", "full"):
        tps_at(DEPTH, PREF, "full")
    if stage in ("all", "half"):
        tps_at(DEPTH // 2, PREF, "half-depth")
    if stage in ("all", "short"):
        tps_at(DEPTH, 128, "short-prefill")
    if stage in ("all", "gemv"):
        gemv_chain(DEPTH)


if __name__ == "__main__":
    main()
