"""Vision-tower TTFT contribution at Qwen2-VL-7B dims: bf16 vs W8A8 ViT+merger.

The LLM bench (bench.py) covers the decoder; a real VLM request's TTFT also
pays the vision tower + merger once per image. This measures that component
for a 448x448 image (32x32 patch grid -> 1024 ViT tokens -> 256 merged) with
both variants, chained in one jit (tunnel-RTT-free).

Measured on v5e (2026-08-16): bf16 16.44 ms vs w8a8 12.73 ms (-22.6%) —
the same reduction band as the LLM prefill, so a full VLM request (vision +
prefill + 128-token decode) keeps bench.py's measured -55% e2e story:
(16.4 + 2619) ms bf16 vs (12.7 + 1174) ms quantized = -55.0%.

Run on the TPU: python scripts/vlm_vision_bench.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.core.quant import QuantParams
from mquant_tpu.kernels.qmm import quantize_weights_real
from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.models.qwen2vl import Qwen2VLConfig
from mquant_tpu.models.vision import (VIT_SITES, init_merger_params,
                                      init_vit_params, merger_forward,
                                      vit_forward)

N_TOK = 1024  # 32x32 grid at patch 14, merge 2
CHAIN = 8


def _realize_site(p, bits=8):
    if not isinstance(p, dict) or p.get("w") is None:
        return p
    w = p["w"]
    qd = (jax.vmap(lambda x: quantize_weights_real(x, bits))(w)
          if w.ndim == 3 else quantize_weights_real(w, bits))
    out = {k: v for k, v in p.items() if k != "w"}
    out.update(qd)
    return out


def bench(label, fn, *args):
    @jax.jit
    def f(*a):
        def body(i, x):
            r = fn(x, *a[1:])
            return (x + r.ravel()[0].astype(x.dtype) * 1e-9).astype(x.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, a[0]).ravel()[:8]

    r = f(*args)
    np.asarray(r).ravel()[0]
    ts = []
    for i in range(3):
        a0 = args[0] + jnp.asarray(i * 1e-6, args[0].dtype)
        t0 = time.perf_counter()
        r = f(a0, *args[1:])
        np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / CHAIN
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    cfg = Qwen2VLConfig.qwen2vl_7b()
    key = jax.random.key(0)
    vp = jax.jit(lambda k: init_vit_params(cfg.vit, k, dtype=jnp.bfloat16))(key)
    mp = jax.jit(lambda k: init_merger_params(cfg.merger, k,
                                              dtype=jnp.bfloat16))(key)
    patches = jax.random.normal(key, (1, N_TOK, cfg.vit.patch_dim), jnp.bfloat16)
    gh = gw = 32
    grid = jnp.broadcast_to(
        jnp.stack(jnp.meshgrid(jnp.arange(gh), jnp.arange(gw),
                               indexing="ij"), -1).reshape(1, -1, 2),
        (1, N_TOK, 2)).astype(jnp.int32)

    def make_fwd(specs, mode):
        # specs (dataclasses) + mode (str) are jit-static → closure; arrays
        # (params/state pytrees) stay jit ARGS (closure constants would be
        # serialized into the remote-compile request body)
        def fwd(patches, vparams, mparams, state):
            feats, _ = vit_forward(cfg.vit, vparams, patches, grid_hw=grid,
                                   specs=specs, state=state, mode=mode)
            img, _ = merger_forward(cfg.merger, mparams, feats, specs=specs,
                                    state=state, mode=mode)
            return img

        return fwd

    t_bf = bench("vision bf16 (448x448 -> 256 tok)", make_fwd(None, "fp"),
                 patches, vp, mp, None)

    specs = {f"vis.{n}": SiteSpec(w_bits=8, a_bits=8, a_static=True)
             for n in VIT_SITES}
    specs.update({f"merger.{n}": SiteSpec(w_bits=8, a_bits=8, a_static=True)
                  for n in ("mlp0", "mlp2")})

    def realize_all(vp, mp):
        vq = dict(vp)
        vq["blocks"] = {k: (_realize_site(v) if k in VIT_SITES else v)
                        for k, v in vp["blocks"].items()}
        mq = {k: (_realize_site(v) if k in ("mlp0", "mlp2") else v)
              for k, v in mp.items()}
        return vq, mq

    vq, mq = jax.jit(realize_all)(vp, mp)
    L = cfg.vit.n_layers
    state = {f"vis.{n}": {"act": QuantParams(scale=jnp.full((L,), 0.05,
                                                            jnp.float32))}
             for n in VIT_SITES}
    state.update({f"merger.{n}": {"act": QuantParams(
        scale=jnp.full((), 0.05, jnp.float32))} for n in ("mlp0", "mlp2")})
    t_q = bench("vision w8a8 (448x448 -> 256 tok)", make_fwd(specs, "real"),
                patches, vq, mq, state)
    print(f"vision TTFT contribution: bf16 {t_bf*1e3:.2f} ms vs w8a8 "
          f"{t_q*1e3:.2f} ms ({(1-t_q/t_bf)*100:.1f}% reduction)", flush=True)


if __name__ == "__main__":
    main()
