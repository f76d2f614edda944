"""Sweep (MQUANT_W4_TK, MQUANT_W4_TN) for the packed-W4 SWAR decode GEMV at
full-model decode, vs the int8+XLA default. Run on the TPU."""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import init_w4a8_on_device, llm_specs, make_cfg
from mquant_tpu.serve.generate import Generator, measure_decode_tps
from mquant_tpu.transform.hadamard import auto_pad_size

DEPTH = int(os.environ.get("DEPTH", "28"))
MAXLEN = 256
PREFILL = 128


def main():
    key = jax.random.key(0)
    toks = jnp.ones((1, PREFILL), jnp.int32)
    pad = auto_pad_size(make_cfg(DEPTH).intermediate)
    cfgq = make_cfg(DEPTH, intermediate_pad=pad)
    params, state = init_w4a8_on_device(cfgq, key)

    def pack_site(d):
        w = d["w_q"]
        K = w.shape[-2]
        lo = w[..., : K // 2, :].astype(jnp.uint8) & 0x0F
        hi = w[..., K // 2 :, :].astype(jnp.uint8) & 0x0F
        return {**d, "w_q": (lo | (hi << 4)).astype(jnp.int8)}

    os.environ["MQUANT_GEMV"] = "pallas_w4"
    ALL = ("q", "k", "v", "o", "gate", "up", "down")
    BIG = ("gate", "up", "down")
    for sites, tk, tn in ((ALL, 128, 18944), (ALL, 256, 18944),
                          (ALL, 512, 18944), (ALL, 4736, 512)):
        layers = dict(params["layers"])
        for name in sites:
            layers[name] = jax.jit(pack_site)(layers[name])
        pparams = {**params, "layers": layers}
        os.environ["MQUANT_W4_TK"] = str(tk)
        os.environ["MQUANT_W4_TN"] = str(tn)
        try:
            gen = Generator(cfgq, pparams, specs=llm_specs(), state=state,
                            mode="real", max_len=MAXLEN)
            tps = measure_decode_tps(gen, toks, n_tokens=32)
            print(f"packed={'+'.join(sites)} tk={tk} tn={tn}: "
                  f"{tps:.1f} tok/s", flush=True)
            del gen
        except Exception as e:
            print(f"packed={'+'.join(sites)} tk={tk} tn={tn}: FAILED "
                  f"{type(e).__name__} {str(e)[:160]}", flush=True)
        del pparams


if __name__ == "__main__":
    main()
