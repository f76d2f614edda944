"""Model-level A/B of decode-scan unrolling (MQUANT_SCAN_UNROLL) at the
flagship serving config: depth-28 w4a8, packed-W4 resident (pallas_w4 GEMV),
prefill 1024, on-device 128-step fused decode loop — the exact path bench.py
measures. Unrolling the layer scan gives XLA's latency-hiding scheduler a
2/4-layer window to overlap the attention/norm small-op tail of layer i with
layer i+1's weight-streaming DMA.

env: DEPTH (28), PREF (1024), NTOK (128), GEMV (pallas_w4), UNROLLS (1,2,4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MQUANT_GEMV", os.environ.get("GEMV", "pallas_w4"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.argv = ["x"]
from bench import init_w4a8_on_device, llm_specs, make_cfg  # noqa: E402
from mquant_tpu.serve.generate import (  # noqa: E402
    Generator, measure_decode_tps)
from mquant_tpu.transform.hadamard import auto_pad_size  # noqa: E402

DEPTH = int(os.environ.get("DEPTH", "28"))
PREF = int(os.environ.get("PREF", "1024"))
NTOK = int(os.environ.get("NTOK", "128"))
UNROLLS = [int(x) for x in os.environ.get("UNROLLS", "1,2,4").split(",")]


def main():
    key = jax.random.key(0)
    pad = auto_pad_size(make_cfg(DEPTH).intermediate)
    cfg = make_cfg(DEPTH, intermediate_pad=pad)
    params, state = init_w4a8_on_device(cfg, key)
    toks = jnp.ones((1, PREF), jnp.int32)
    print(f"backend={jax.default_backend()} gemv={os.environ['MQUANT_GEMV']}"
          f" depth={DEPTH} prefill={PREF} ntok={NTOK}", flush=True)
    for u in UNROLLS:
        os.environ["MQUANT_SCAN_UNROLL"] = str(u)
        gen = Generator(cfg, params, specs=llm_specs(), state=state,
                        mode="real", max_len=PREF + NTOK, batch=1)
        tps = measure_decode_tps(gen, toks, n_tokens=NTOK, on_device=True)
        print(f"  MQUANT_SCAN_UNROLL={u}: {tps:.1f} tok/s", flush=True)
        del gen


if __name__ == "__main__":
    main()
