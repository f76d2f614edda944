"""Full-model decode A/B: bf16 vs w4a8(int8-storage) with the GEMV variants.
Measures the on-device fused decode loop (the production serving path)."""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import init_bf16_on_device, init_w4a8_on_device, llm_specs, make_cfg
from mquant_tpu.serve.generate import Generator, measure_decode_tps, measure_ttft
from mquant_tpu.transform.hadamard import auto_pad_size

DEPTH = int(os.environ.get("DEPTH", "28"))
MAXLEN = int(os.environ.get("MAXLEN", "256"))
PREFILL = int(os.environ.get("PREF", "128"))


def main():
    key = jax.random.key(0)
    toks = jnp.ones((1, PREFILL), jnp.int32)

    if os.environ.get("SKIP_BF16") != "1":
        cfg = make_cfg(DEPTH)
        params = init_bf16_on_device(cfg, key)
        gen = Generator(cfg, params, mode="fp", max_len=MAXLEN)
        tps = measure_decode_tps(gen, toks, n_tokens=32)
        print(f"bf16 decode: {tps:.1f} tok/s", flush=True)
        del params, gen

    pad = auto_pad_size(make_cfg(DEPTH).intermediate)
    cfgq = make_cfg(DEPTH, intermediate_pad=pad)
    params, state = init_w4a8_on_device(cfgq, key)
    for variant in ("pallas_w4", "pallas", "xla"):
        # pallas_w4: int8 at rest; decode_n packs to split-half bytes IN-JIT
        # and fuses the q/k/v + gate/up groups (pack_w4_sites), then the
        # SWAR Pallas GEMV streams half the bytes per step
        os.environ["MQUANT_GEMV"] = variant
        gen = Generator(cfgq, params, specs=llm_specs(), state=state,
                        mode="real", max_len=MAXLEN)
        tps = measure_decode_tps(gen, toks, n_tokens=32)
        print(f"w4a8 decode ({variant} gemv): {tps:.1f} tok/s", flush=True)
        del gen

    # packed-byte storage: half the weight bytes at rest AND per decode step
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
    del params
    for variant in ("pallas_w4", "xla"):
        os.environ["MQUANT_GEMV"] = variant
        gen = Generator(cfgq, pparams, specs=llm_specs(), state=state,
                        mode="real", max_len=MAXLEN)
        tps = measure_decode_tps(gen, toks, n_tokens=32)
        print(f"w4a8 packed decode ({variant} gemv): {tps:.1f} tok/s",
              flush=True)
        del gen


if __name__ == "__main__":
    main()
