"""Decode-step LAYER ablation at 7B dims: where do the non-GEMV microseconds
of one layer's decode step go? Chains CHAIN copies of a single-layer decode
step (T=1, bf16 KV at S positions) in one jit, toggling segments:

  full      — the real _layer_step body (GEMVs + norms + rope + cache + attn)
  no_attn   — attention replaced by a reshape of q (keeps GEMV shapes)
  no_cache  — no KV-cache update (attend to a frozen cache)
  no_norms  — rms_norms replaced by identity
  no_rope   — rope application skipped
  gemv_only — all of the above off: just the 7 quantized GEMVs + residuals

Differences between rows attribute per-layer cost; multiply by depth for the
per-step total. Honors MQUANT_GEMV. env: S (1152), CHAIN (64), ITERS (3)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.models import layers as L  # noqa: E402
from mquant_tpu.models import llm as M  # noqa: E402
from mquant_tpu.models.layers import qlinear  # noqa: E402

S = int(os.environ.get("S", "1152"))
CHAIN = int(os.environ.get("CHAIN", "64"))
ITERS = int(os.environ.get("ITERS", "3"))

cfg = B.make_cfg(1, intermediate_pad=0)
key = jax.random.key(0)


def layer_step(specs, h, lp, lstate, cache, pos, cos, sin, mask,
               attn_on=True, cache_on=True, norms_on=True, rope_on=True,
               fused_attn=False):
    Bb, T, Hd = h.shape
    hd, H, KV = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    x = L.rms_norm(h, lp["ln1"]["w"], cfg.norm_eps) if norms_on else h
    q, k, v = L.qlinear_group(x, [lp["q"], lp["k"], lp["v"]],
                              ["llm.q", "llm.k", "llm.v"], specs, lstate,
                              "real", None)
    q = q.reshape(Bb, T, H, hd)
    k = k.reshape(Bb, T, KV, hd)
    v = v.reshape(Bb, T, KV, hd)
    if rope_on:
        q, k = M._apply_rope(cfg, q, k, cos, sin)
    if fused_attn:
        from mquant_tpu.kernels.attn_decode import attn_decode_fused

        attn, nk, nv = attn_decode_fused(
            q, k, v, cache["k"], cache["v"], pos, hd**-0.5,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        cache = {"k": nk, "v": nv}
        attn = attn.reshape(Bb, T, H * hd)
        h = h + qlinear(attn, lp["o"], "llm.o", specs.get("llm.o"), lstate,
                        "real", None)
        x = L.rms_norm(h, lp["ln2"]["w"], cfg.norm_eps)
        g, u = L.qlinear_group(x, [lp["gate"], lp["up"]],
                               ["llm.gate", "llm.up"], specs, lstate, "real",
                               None)
        d = M._mlp_tail(cfg, specs.get("llm.down"), "real", g, u, lp["down"],
                        lstate, None)
        return h + d, cache
    if cache_on:
        z = jnp.zeros((), jnp.int32)
        upd = lambda buf, val: jax.lax.dynamic_update_slice(  # noqa: E731
            buf, val.astype(buf.dtype), (z, pos) + (z,) * (buf.ndim - 2))
        cache = {"k": upd(cache["k"], k), "v": upd(cache["v"], v)}
    k_all, v_all = cache["k"], cache["v"]
    if attn_on:
        attn = L.attention(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                           mask)
        attn = attn.reshape(Bb, T, H * hd)
    else:
        attn = q.reshape(Bb, T, H * hd)
    h = h + qlinear(attn, lp["o"], "llm.o", specs.get("llm.o"), lstate,
                    "real", None)
    x = L.rms_norm(h, lp["ln2"]["w"], cfg.norm_eps) if norms_on else h
    g, u = L.qlinear_group(x, [lp["gate"], lp["up"]],
                           ["llm.gate", "llm.up"], specs, lstate, "real", None)
    d = M._mlp_tail(cfg, specs.get("llm.down"), "real", g, u, lp["down"],
                    lstate, None)
    return h + d, cache


def main():
    from mquant_tpu.serve.generate import prepare_w4_resident, w4_resident_mode

    specs = B.llm_specs()
    params, state = B.init_w4a8_on_device(cfg, key)
    params = prepare_w4_resident(cfg, params, specs, w4_resident_mode())
    lp = jax.tree.map(lambda x: x[0], params["layers"])
    lstate = {k: jax.tree.map(lambda x: x[0], v) for k, v in state.items()
              if k.startswith("llm.") and not k.endswith("lm_head")}
    pos0 = jnp.asarray(S - 8, jnp.int32)
    cos, sin = M.rope_tables(cfg, jnp.full((1, 1), S - 8, jnp.int32),
                             jnp.float32)
    cache0 = {
        "k": jax.random.normal(jax.random.fold_in(key, 1),
                               (1, S, cfg.n_kv_heads, cfg.head_dim),
                               jnp.bfloat16),
        "v": jax.random.normal(jax.random.fold_in(key, 2),
                               (1, S, cfg.n_kv_heads, cfg.head_dim),
                               jnp.bfloat16),
    }
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
    mask = cols <= pos0

    variants = {
        "full": {},
        "fused_attn": {"fused_attn": True},  # kernels/attn_decode.py
        "no_attn": {"attn_on": False},
        "no_cache": {"cache_on": False},
        "no_norms": {"norms_on": False},
        "no_rope": {"rope_on": False},
        "gemv_only": {"attn_on": False, "cache_on": False,
                      "norms_on": False, "rope_on": False},
    }
    base = None
    for name, kw in variants.items():
        @jax.jit
        def f(lp, lstate, h, cache):
            def body(i, carry):
                h, cache = carry
                out, cache = layer_step(specs, h, lp, lstate, cache, pos0,
                                        cos, sin, mask, **kw)
                return (out.astype(h.dtype), cache)

            h, cache = jax.lax.fori_loop(0, CHAIN, body, (h, cache))
            return h.ravel()[:8]

        hs = [jax.random.normal(jax.random.fold_in(key, 50 + i),
                                (1, 1, cfg.hidden), jnp.bfloat16)
              for i in range(ITERS + 1)]
        _ = np.asarray(f(lp, lstate, hs[0], cache0))  # compile
        ts = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            _ = np.asarray(f(lp, lstate, hs[i + 1], cache0))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / CHAIN
        if base is None:
            base = dt
        print(f"  {name:10s}: {dt*1e6:8.1f} us/layer-step "
              f"(delta vs full {-(base - dt)*1e6:+7.1f} us)", flush=True)


if __name__ == "__main__":
    main()
