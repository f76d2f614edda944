"""A/B the W4 residency designs on the real chip at 7B dims:

  int8   — int8 resident, decode converts to S4 in-loop (round-3 default)
  packed — ONE packed resident copy (pallas_w4 GEMV), prefill unpacks per-GEMM
  dual   — int8 + persistent packed copy (round-3 pallas_w4 design, 1.5× mem)

For each: model-latency TTFT (chained prefills) + fused-loop decode tok/s.
env: DEPTH (28), CONFIGS (comma list), TOKENS (32)
"""

import gc
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PREFILL, init_w4a8_on_device, llm_specs, make_cfg

DEPTH = int(os.environ.get("DEPTH", "28"))
TOKENS = int(os.environ.get("TOKENS", "32"))

CONFIGS = {
    "int8": {"MQUANT_GEMV": "xla", "MQUANT_W4_RESIDENT": "int8"},
    "packed": {"MQUANT_GEMV": "pallas_w4", "MQUANT_W4_RESIDENT": "packed"},
    "packed_xla": {"MQUANT_GEMV": "xla", "MQUANT_W4_RESIDENT": "packed"},
    "dual": {"MQUANT_GEMV": "pallas_w4", "MQUANT_W4_RESIDENT": "dual"},
    # packed resident + Pallas W4 GEMM for PREFILL too (no XLA unpack)
    "packed_pq": {"MQUANT_GEMV": "pallas_w4", "MQUANT_W4_RESIDENT": "packed",
                  "MQUANT_FORCE_PALLAS_QMM": "1"},
}


def run(name):
    env = CONFIGS[name]
    for k in ("MQUANT_GEMV", "MQUANT_W4_RESIDENT", "MQUANT_FORCE_PALLAS_QMM"):
        os.environ.pop(k, None)
    os.environ.update(env)
    from mquant_tpu.serve.generate import (Generator, measure_decode_tps,
                                           measure_ttft_chained)

    cfg = make_cfg(DEPTH)
    params, state = init_w4a8_on_device(cfg, jax.random.key(0))
    gen = Generator(cfg, params, specs=llm_specs(), state=state, mode="real",
                    max_len=PREFILL + TOKENS + 8)
    del params
    gc.collect()
    toks = jnp.ones((1, PREFILL), jnp.int32)
    ttft = measure_ttft_chained(gen, toks, chain=16)
    tps = measure_decode_tps(gen, toks, n_tokens=TOKENS, on_device=True)
    print(f"[{name}] depth={DEPTH}: TTFT {ttft*1e3:.2f} ms, "
          f"decode {tps:.1f} tok/s ({1e3/tps:.3f} ms/step)", flush=True)
    del gen
    gc.collect()


def main():
    names = os.environ.get("CONFIGS", "int8,packed").split(",")
    for n in names:
        run(n)


if __name__ == "__main__":
    main()
