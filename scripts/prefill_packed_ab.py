"""Prefill A/B at 7B dims: W4A8 from int8 storage (serving default) vs
split-half PACKED storage, the latter through (a) the XLA path (materialized
unpack + s8 GEMM) and (b) the Pallas SWAR kernel (nibble decode in VMEM,
MQUANT_FORCE_PALLAS_QMM=1).

Decides whether a SINGLE packed weight copy can serve both prefill and
decode: if packed prefill ≈ int8 prefill, the serving path can store W4
packed at rest (halving weight memory vs int8 storage, 3.25 GB at 7B) and
run decode through the pallas_w4 GEMV without the +1.5x prepack copy that
OOMs next to the full-VLM bench span.

env: DEPTH (28), PREF (1024), CHAIN (8)
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
from mquant_tpu.models.llm import decoder_forward
from mquant_tpu.transform.hadamard import auto_pad_size

DEPTH = int(os.environ.get("DEPTH", "28"))
T = int(os.environ.get("PREF", "1024"))
CHAIN = int(os.environ.get("CHAIN", "8"))


def chain_prefill(cfg, params, specs, state):
    @jax.jit
    def f(params, toks):
        def body(i, carry):
            acc, toks = carry
            logits, _, _ = decoder_forward(
                cfg, params, toks, specs=specs, state=state, mode="real",
                last_index=jnp.asarray(T - 1, jnp.int32))
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            toks = toks.at[:, 0].set(nxt[0] % 100)
            return acc + nxt, toks

        acc, _ = jax.lax.fori_loop(0, CHAIN, body,
                                   (jnp.zeros((1,), jnp.int32), toks))
        return acc

    toks_l = [jnp.full((1, T), 7 + i, jnp.int32) for i in range(4)]
    r = f(params, toks_l[0])
    _ = np.asarray(r).ravel()[0]
    ts = []
    for tk in toks_l[1:]:
        t0 = time.perf_counter()
        r = f(params, tk)
        _ = np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / CHAIN


def pack_layers(layers, in_dims):
    def pack_site(name, d):
        w = d.get("w_q")
        if w is None or w.shape[-2] != in_dims.get(name):
            return d
        K = w.shape[-2]
        lo = w[..., : K // 2, :].astype(jnp.uint8) & 0x0F
        hi = w[..., K // 2:, :].astype(jnp.uint8) & 0x0F
        return {**d, "w_q": (lo | (hi << 4)).astype(jnp.int8)}

    return {k: (pack_site(k, v) if isinstance(v, dict) and "w_q" in v else v)
            for k, v in layers.items()}


def main():
    key = jax.random.key(0)
    pad = auto_pad_size(make_cfg(DEPTH).intermediate)
    cfg = make_cfg(DEPTH, intermediate_pad=pad)
    params, state = init_w4a8_on_device(cfg, key)
    specs = llm_specs()
    in_dims = {"q": cfg.hidden, "k": cfg.hidden, "v": cfg.hidden,
               "gate": cfg.hidden, "up": cfg.hidden,
               "o": cfg.n_heads * cfg.head_dim, "down": cfg.inter_eff}

    t = chain_prefill(cfg, params, specs, state)
    print(f"[int8 storage, XLA]      prefill {t*1e3:.2f} ms", flush=True)

    packed = jax.jit(lambda l: pack_layers(l, in_dims))(params["layers"])
    pparams = {**params, "layers": packed}
    del params
    gc.collect()

    t = chain_prefill(cfg, pparams, specs, state)
    print(f"[packed storage, XLA unpack] prefill {t*1e3:.2f} ms", flush=True)

    os.environ["MQUANT_FORCE_PALLAS_QMM"] = "1"
    t = chain_prefill(cfg, pparams, specs, state)
    print(f"[packed storage, Pallas SWAR] prefill {t*1e3:.2f} ms", flush=True)
    del os.environ["MQUANT_FORCE_PALLAS_QMM"]


if __name__ == "__main__":
    main()
