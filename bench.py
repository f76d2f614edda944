#!/usr/bin/env python
"""Benchmark: Qwen2-VL-7B-dims W4A8 (static scales, real int GEMMs, online
Hadamard) vs bf16 prefill TTFT + decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
value = TTFT reduction (%) of W4A8 vs bf16; vs_baseline = value / 30 (the
reference's "up to 30% latency reduction" headline, ref README.md:28-29).

Random weights (no checkpoints in this environment) — kernel timing only.
The bf16 model may not fit the 16 GB chip at full depth; in that case both
variants are measured at the largest common depth (ratio is what matters —
per-layer cost dominates) while W4A8 absolute numbers come from full depth.
"""

import dataclasses
import gc
import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


PREFILL = 1024
MAX_LEN = PREFILL + 128
DECODE_TOKENS = 32


def make_cfg(n_layers, intermediate_pad=0):
    from mquant_tpu.models.qwen2vl import Qwen2VLConfig

    base = Qwen2VLConfig.qwen2vl_7b().llm
    return dataclasses.replace(base, n_layers=n_layers,
                               intermediate_pad=intermediate_pad)


def llm_specs(static=True, online_had=True, lm_head_bits=8):
    from mquant_tpu.models.layers import SiteSpec
    from mquant_tpu.models.llm import LLM_SITES

    s = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8, a_static=static) for n in LLM_SITES}
    if online_had:
        s["llm.down"] = dataclasses.replace(s["llm.down"], online_had="full")
    if lm_head_bits:
        # int8 lm_head: beyond the reference (which rotates but never
        # quantizes the head) — halves the 1.09 GB/step bf16 head stream
        s["llm.lm_head"] = SiteSpec(w_bits=lm_head_bits, a_bits=8,
                                    a_static=static)
    return s


def init_bf16_on_device(cfg, key):
    from mquant_tpu.models.llm import init_decoder_params

    return jax.jit(lambda k: init_decoder_params(cfg, k, dtype=jnp.bfloat16))(key)


def init_w4a8_on_device(cfg, key):
    """Random packed-int4 weights + scales + static act scales, built on device."""

    def build(key):
        ks = iter(jax.random.split(key, 16))
        L, Hd, I = cfg.n_layers, cfg.hidden, cfg.inter_eff
        H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

        def qsite(k, din, dout, bias=False):
            # W4-grid values in int8 storage (the default serving layout —
            # v5e has no native int4 MXU operand; see realize_decoder_weights)
            w_q = jax.random.randint(k, (L, din, dout), -7, 8, jnp.int8)
            w_scale = jnp.full((L, dout), 0.01, jnp.float32)
            d = {"w_q": w_q, "w_scale": w_scale}
            d["b"] = jnp.zeros((L, dout), jnp.bfloat16) if bias else None
            return d

        params = {
            "embed": {"w": (jax.random.normal(next(ks), (cfg.vocab, Hd), jnp.float32)
                            * 0.02).astype(jnp.bfloat16)},
            "layers": {
                "ln1": {"w": jnp.ones((L, Hd), jnp.bfloat16)},
                "q": qsite(next(ks), Hd, H * hd, True),
                "k": qsite(next(ks), Hd, KV * hd, True),
                "v": qsite(next(ks), Hd, KV * hd, True),
                "o": qsite(next(ks), H * hd, Hd),
                "ln2": {"w": jnp.ones((L, Hd), jnp.bfloat16)},
                "gate": qsite(next(ks), Hd, I),
                "up": qsite(next(ks), Hd, I),
                "down": qsite(next(ks), I, Hd),
            },
            "ln_f": {"w": jnp.ones((Hd,), jnp.bfloat16)},
            "lm_head": {
                "w_q": jax.random.randint(next(ks), (Hd, cfg.vocab), -127, 128,
                                          jnp.int8),
                "w_scale": jnp.full((cfg.vocab,), 2e-4, jnp.float32),
            },
        }
        return params

    params = jax.jit(build)(key)
    # static per-tensor activation scales, stacked per layer (lm_head is a
    # global site outside the layer scan → scalar scale)
    from mquant_tpu.core.quant import QuantParams
    from mquant_tpu.models.llm import LLM_SITES

    state = {f"llm.{n}": {"act": QuantParams(scale=jnp.full((cfg.n_layers,), 0.05,
                                                            jnp.float32))}
             for n in LLM_SITES}
    state["llm.lm_head"] = {"act": QuantParams(scale=jnp.full((), 0.05,
                                                              jnp.float32))}
    return params, state


def measure(cfg, params, specs, state, mode, label):
    from mquant_tpu.serve.generate import (
        Generator, measure_decode_tps, measure_request, measure_ttft_chained)

    gen = Generator(cfg, params, specs=specs, state=state, mode=mode,
                    max_len=MAX_LEN, batch=1)
    toks = jnp.ones((1, PREFILL), jnp.int32)
    t0 = time.time()
    # model-latency TTFT: full prefills (incl. KV write) chained in one jit —
    # excludes the tunnel's ~30ms/dispatch HTTP RTT, an artifact of this dev
    # setup that a real deployment (host adjacent to the chip) does not pay
    ttft = measure_ttft_chained(gen, toks, chain=8)
    log(f"[{label}] TTFT {ttft*1e3:.1f} ms model-latency "
        f"(setup+compile {time.time()-t0:.0f}s)")
    tps = measure_decode_tps(gen, toks, n_tokens=DECODE_TOKENS, on_device=True)
    log(f"[{label}] decode {tps:.1f} tok/s (on-device loop)")
    # MEASURED request (not ttft + N/tps arithmetic): one wall-clock span over
    # prefill + GEN_TOKENS fused decode; carries 2 dispatches (~60ms tunnel
    # RTT, identical for both variants)
    req = measure_request(gen, toks, gen_tokens=GEN_TOKENS)
    log(f"[{label}] measured request (prefill {PREFILL} + {GEN_TOKENS} tok): "
        f"{req:.3f} s")
    return ttft, tps, req


def try_measure(n_layers, variant):
    """variant: 'bf16' | 'w4a8'. Returns (ttft, tps) or raises."""
    key = jax.random.key(0)
    if variant == "bf16":
        cfg = make_cfg(n_layers)
        params = init_bf16_on_device(cfg, key)
        try:
            return measure(cfg, params, None, None, "fp", f"bf16 L={n_layers}")
        finally:
            del params
            gc.collect()
    else:
        from mquant_tpu.transform.hadamard import auto_pad_size

        pad = auto_pad_size(make_cfg(n_layers).intermediate)
        cfg = make_cfg(n_layers, intermediate_pad=pad)
        params, state = init_w4a8_on_device(cfg, key)
        try:
            return measure(cfg, params, llm_specs(), state, "real",
                           f"w4a8 L={n_layers}")
        finally:
            del params
            gc.collect()


def robust(variant, depths):
    for n in depths:
        try:
            ttft, tps, req = try_measure(n, variant)
            return n, ttft, tps, req
        except Exception as e:  # OOM or backend failure → shallower model
            log(f"[{variant} L={n}] failed: {type(e).__name__}: {str(e)[:300]}")
            gc.collect()
    raise RuntimeError(f"all depths failed for {variant}")


GEN_TOKENS = 128  # serving request: prefill 1024 + generate 128


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    full_depth = 28
    n_q, ttft_q, tps_q, req_q = robust("w4a8", [full_depth, 14, 7])
    n_b, ttft_b, tps_b, req_b = robust("bf16", [full_depth, 20, 14, 7])

    if n_q != n_b:
        # compare at the common depth: rerun w4a8 at bf16's depth for the ratio
        log(f"re-measuring w4a8 at depth {n_b} for an equal-depth ratio")
        try:
            _, ttft_q_cmp, tps_q_cmp, req_q_cmp = robust("w4a8", [n_b])
        except Exception:
            ttft_q_cmp, tps_q_cmp, req_q_cmp = ttft_q, tps_q, req_q
    else:
        ttft_q_cmp, tps_q_cmp, req_q_cmp = ttft_q, tps_q, req_q

    ttft_red = (1.0 - ttft_q_cmp / ttft_b) * 100.0
    # end-to-end serving latency: one MEASURED request = prefill + GEN_TOKENS
    # fused decode in one wall-clock span (not derived arithmetic)
    e2e_red = (1.0 - req_q_cmp / req_b) * 100.0
    log(f"TTFT: bf16 {ttft_b*1e3:.1f} ms vs w4a8 {ttft_q_cmp*1e3:.1f} ms "
        f"→ {ttft_red:.1f}% reduction; decode {tps_b:.1f} → {tps_q_cmp:.1f} tok/s "
        f"({tps_q_cmp/tps_b:.2f}x); MEASURED e2e request (prefill {PREFILL} + "
        f"{GEN_TOKENS} tokens): {req_b:.3f}s → {req_q_cmp:.3f}s "
        f"= {e2e_red:.1f}% latency reduction (depth {n_b})")

    print(json.dumps({
        "metric": "qwen2vl7b_w4a8_e2e_latency_reduction_vs_bf16",
        "value": round(e2e_red, 2),
        "unit": "%",
        "vs_baseline": round(e2e_red / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
