"""Full-model (depth-28, 7B dims) prefill A/B: bf16 vs W4A8, chained inside
one jit to exclude the ~30ms tunnel dispatch RTT that a single-dispatch TTFT
measurement carries. This is the model-latency component of TTFT.

env: DEPTH, PREF (prefill len), CHAIN
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import init_bf16_on_device, init_w4a8_on_device, llm_specs, make_cfg
from mquant_tpu.models.llm import decoder_forward
from mquant_tpu.transform.hadamard import auto_pad_size

DEPTH = int(os.environ.get("DEPTH", "28"))
T = int(os.environ.get("PREF", "1024"))
CHAIN = int(os.environ.get("CHAIN", "8"))
key = jax.random.key(0)


def chain_prefill(cfg, params, specs, state, mode):
    @jax.jit
    def f(params, toks):
        def body(i, carry):
            acc, toks = carry
            logits, _, _ = decoder_forward(
                cfg, params, toks, specs=specs, state=state, mode=mode,
                last_index=jnp.asarray(T - 1, jnp.int32))
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            toks = toks.at[:, 0].set(nxt[0] % 100)  # data-dependent chain
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


def main():
    import gc

    res = {}
    if os.environ.get("SKIP_W4A8") != "1":
        pad = auto_pad_size(make_cfg(DEPTH).intermediate)
        cfg = make_cfg(DEPTH, intermediate_pad=pad)
        print(f"w4a8 inter_eff={cfg.inter_eff}", flush=True)
        params, state = init_w4a8_on_device(cfg, key)
        dt = chain_prefill(cfg, params, llm_specs(), state, "real")
        print(f"w4a8 prefill model-latency: {dt*1e3:.1f} ms", flush=True)
        res["w4a8"] = dt
        if os.environ.get("PACKED") == "1":
            # packed-at-rest weights: (a) XLA unpack-materialize + s8 dot,
            # (b) forced Pallas SWAR W4 kernel
            def pack_site(d):
                w = d["w_q"]
                K = w.shape[-2]
                lo = w[..., : K // 2, :].astype(jnp.uint8) & 0x0F
                hi = w[..., K // 2 :, :].astype(jnp.uint8) & 0x0F
                return {**d, "w_q": (lo | (hi << 4)).astype(jnp.int8)}

            layers = dict(params["layers"])
            for name in ("q", "k", "v", "o", "gate", "up", "down"):
                layers[name] = jax.jit(pack_site)(layers[name])
            pparams = {**params, "layers": layers}
            dt = chain_prefill(cfg, pparams, llm_specs(), state, "real")
            print(f"w4a8 packed prefill (XLA unpack): {dt*1e3:.1f} ms",
                  flush=True)
            os.environ["MQUANT_FORCE_PALLAS_QMM"] = "1"
            dt = chain_prefill(cfg, pparams, llm_specs(), state, "real")
            del os.environ["MQUANT_FORCE_PALLAS_QMM"]
            print(f"w4a8 packed prefill (Pallas SWAR): {dt*1e3:.1f} ms",
                  flush=True)
            del pparams, layers
        del params
        gc.collect()
    if os.environ.get("SKIP_BF16") != "1":
        cfg = make_cfg(DEPTH)
        params = init_bf16_on_device(cfg, key)
        dt = chain_prefill(cfg, params, None, None, "fp")
        print(f"bf16 prefill model-latency: {dt*1e3:.1f} ms", flush=True)
        res["bf16"] = dt
        del params
        gc.collect()
    if len(res) == 2:
        print(f"reduction: {(1 - res['w4a8']/res['bf16'])*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
