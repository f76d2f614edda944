"""Long-context prefill at 7B dims: chunked prefill + flash attention.

Measures wall-clock TTFT (prefill to last-token logits) for long prompts via
``prefill_chunked`` (fixed-size pieces against the KV cache — O(chunk·T)
attention memory, one compiled step reused), bf16 vs W4A8 real-int.
Dispatch RTT rides along equally (T/chunk dispatches each).

Run: python scripts/longctx_bench.py [T] [chunk]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import init_bf16_on_device, init_w4a8_on_device, llm_specs, make_cfg
from mquant_tpu.serve.generate import Generator, _force
from mquant_tpu.transform.hadamard import auto_pad_size

DEPTH = int(os.environ.get("DEPTH", "28"))


def time_chunked(gen, T, chunk, iters=2):
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 1000, (1, T)))
    logits, _ = gen.prefill_chunked(toks, chunk=chunk, max_new_tokens=8)
    _force(logits)  # compile
    best = float("inf")
    for i in range(iters):
        t = (toks + i + 1) % 1000 + 1
        t0 = time.perf_counter()
        logits, _ = gen.prefill_chunked(t, chunk=chunk, max_new_tokens=8)
        _force(logits)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    key = jax.random.key(0)

    # bf16 7B at long context does not fit one 16G chip (params ~15.1G +
    # 16k KV ~0.94G + activations → measured 18.67G requested). Report the
    # capacity fact rather than a latency bf16 can't produce.
    tb = None
    if os.environ.get("TRY_BF16", "1") == "1":
        params = gen = None
        try:
            cfg = make_cfg(DEPTH)
            params = init_bf16_on_device(cfg, key)
            gen = Generator(cfg, params, mode="fp", max_len=T + 16)
            tb = time_chunked(gen, T, chunk)
            print(f"bf16  chunked prefill T={T} chunk={chunk}: "
                  f"{tb * 1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — report OOM as the datapoint
            print(f"bf16  chunked prefill T={T}: DOES NOT FIT one 16G chip "
                  f"({type(e).__name__}: {str(e)[:100]})", flush=True)
            tb = None
        finally:
            # free the bf16 weights even on the OOM path, or they poison
            # the quantized run below
            del params, gen
            import gc

            gc.collect()

    pad = auto_pad_size(make_cfg(DEPTH).intermediate)
    cfgq = make_cfg(DEPTH, intermediate_pad=pad)
    params, state = init_w4a8_on_device(cfgq, key)
    for Tq in (T, 2 * T):
        gen = Generator(cfgq, params, specs=llm_specs(), state=state,
                        mode="real", max_len=Tq + 16)
        tq = time_chunked(gen, Tq, chunk)
        extra = (f" (-{(1 - tq / tb) * 100:.1f}% vs bf16)"
                 if tb is not None and Tq == T else "")
        print(f"w4a8  chunked prefill T={Tq} chunk={chunk}: "
              f"{tq * 1e3:.1f} ms{extra}", flush=True)


if __name__ == "__main__":
    main()
