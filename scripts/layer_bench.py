"""Per-layer A/B benchmark: bf16 vs W8A8/W4A8 variants of one Qwen2-VL-7B
decoder layer at prefill shapes, chained inside one jit (the axon tunnel
memoizes repeat calls and block_until_ready does not block — only value
fetches do, so each timed call uses fresh data + a scalar fetch).

Run on the TPU:  python scripts/layer_bench.py
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

from mquant_tpu.core.quant import QuantParams
from mquant_tpu.models import layers as L
from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.models.llm import DecoderConfig, _layer_step, rope_tables

cfg = DecoderConfig(vocab=152064, hidden=3584, n_layers=1, n_heads=28,
                    n_kv_heads=4, intermediate=18944, intermediate_pad=19968,
                    dtype=jnp.bfloat16)
B, T = 1, int(os.environ.get("BENCH_T", "1024"))
CHAIN = int(os.environ.get("BENCH_CHAIN", "8"))
key = jax.random.key(0)
SITES = ("q", "k", "v", "o", "gate", "up", "down")


def mk_layer_bf16():
    Hd, I = cfg.hidden, cfg.inter_eff
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def w(k, i, o):
        return jax.random.normal(jax.random.fold_in(key, k), (i, o), jnp.bfloat16) * 0.02

    return {
        "ln1": {"w": jnp.ones((Hd,), jnp.bfloat16)},
        "q": {"w": w(1, Hd, H * hd), "b": jnp.zeros((H * hd,), jnp.bfloat16)},
        "k": {"w": w(2, Hd, KV * hd), "b": jnp.zeros((KV * hd,), jnp.bfloat16)},
        "v": {"w": w(3, Hd, KV * hd), "b": jnp.zeros((KV * hd,), jnp.bfloat16)},
        "o": {"w": w(4, H * hd, Hd), "b": None},
        "ln2": {"w": jnp.ones((Hd,), jnp.bfloat16)},
        "gate": {"w": w(5, Hd, I), "b": None},
        "up": {"w": w(6, Hd, I), "b": None},
        "down": {"w": w(7, I, Hd), "b": None},
    }


def quantify(lp, bits):
    out = {}
    for k, v in lp.items():
        if k.startswith("ln"):
            out[k] = v
            continue
        win, wout = v["w"].shape
        rows = win // 2 if bits == 4 else win
        wq = jax.random.randint(jax.random.fold_in(key, hash(k) % 97),
                                (rows, wout), -127, 127, jnp.int8)
        out[k] = {"w_q": wq, "w_scale": jnp.full((wout,), 0.01, jnp.float32),
                  "b": v.get("b")}
    return out


def specs_of(had=True):
    s = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8, a_static=True) for n in SITES}
    if had:
        s["llm.down"] = dataclasses.replace(s["llm.down"], online_had="full")
    return s


state = {f"llm.{n}": {"act": QuantParams(scale=jnp.float32(0.05))} for n in SITES}

pos = jnp.arange(T)[None]
cos, sin = rope_tables(cfg, pos, jnp.float32)
mask = L.causal_mask(T, T)

hs = [jax.random.normal(jax.random.fold_in(key, 100 + i), (B, T, cfg.hidden),
                        jnp.bfloat16) for i in range(4)]


def run(label, lp, specs, mode, st=None, flash=False):
    @jax.jit
    def f(lp, h):
        def body(i, h):
            out, _ = _layer_step(cfg, specs or {}, mode, h, lp, st, None, None,
                                 cos, sin, None if flash else mask, None)
            return out.astype(h.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, h)

    r = f(lp, hs[0])
    _ = np.asarray(r[0, :1, :1])
    times = []
    for h in hs[1:]:
        t0 = time.perf_counter()
        r = f(lp, h)
        _ = np.asarray(r[0, :1, :1])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(f"{label}: {dt / CHAIN * 1e3:.2f} ms/layer (total {dt*1e3:.0f}ms, chain {CHAIN})",
          flush=True)


import dataclasses as _dc


def specs_noact(had=True):
    s = specs_of(had)
    return {k: _dc.replace(v, a_bits=None) for k, v in s.items()}


if __name__ == "__main__":
    lp_bf = mk_layer_bf16()
    run("bf16 einsum-attn", lp_bf, None, "fp")
    run("bf16 flash-attn", lp_bf, None, "fp", flash=True)
    lq8 = quantify(lp_bf, 8)
    run("w8a8 flash nohad", lq8, specs_of(had=False), "real", state, flash=True)
    run("w8a8 flash +had", lq8, specs_of(had=True), "real", state, flash=True)

