"""Decompose the TTFT: depth slope vs intercept, dispatch-RTT share (via
chain length), and the int8 lm_head share — for both w4a8 and bf16.
Run on the TPU. Watchdog dumps stacks if the tunnel hangs."""

import faulthandler
import gc
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mquant")

import jax
import jax.numpy as jnp

faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.serve.generate import Generator, measure_ttft_chained  # noqa: E402

key = jax.random.key(0)


def run(variant, L, chain=8, lm_head_bits=8):
    t0 = time.time()
    cfg = B.make_cfg(L)
    if variant == "bf16":
        params, state, specs, mode = B.init_bf16_on_device(cfg, key), None, None, "fp"
    else:
        params, state = B.init_w4a8_on_device(cfg, key)
        specs, mode = B.llm_specs(lm_head_bits=lm_head_bits), "real"
        if lm_head_bits is None:
            p = dict(params)
            p["lm_head"] = {"w": (params["lm_head"]["w_q"].astype(jnp.float32)
                                  * params["lm_head"]["w_scale"][None]
                                  ).astype(jnp.bfloat16)}
            params = p
    print(f"[{variant} L={L} chain={chain} head={lm_head_bits}] init "
          f"{time.time()-t0:.0f}s", flush=True)
    gen = Generator(cfg, params, specs=specs, state=state, mode=mode,
                    max_len=B.MAX_LEN, batch=1)
    toks = jnp.ones((1, B.PREFILL), jnp.int32)
    t0 = time.time()
    t = measure_ttft_chained(gen, toks, chain=chain)
    print(f"[{variant} L={L} chain={chain} head={lm_head_bits}] "
          f"TTFT {t*1e3:.2f} ms  (measure {time.time()-t0:.0f}s)", flush=True)
    del params, gen
    gc.collect()
    return t


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "w4a8"):
        q28 = run("w4a8", 28, chain=8)
        q28c32 = run("w4a8", 28, chain=32)
        q14 = run("w4a8", 14, chain=8)
        rtt = (q28 - q28c32) * 32 * 8 / (32 - 8) * 1e3
        slope = (q28 - q14) / 14 * 1e3
        print(f"w4a8: slope {slope:.3f} ms/layer, "
              f"intercept(chain8) {(q28*1e3 - 28*slope):.2f} ms, "
              f"RTT est {rtt:.1f} ms/dispatch", flush=True)
    if which in ("all", "head"):
        run("w4a8", 28, chain=8, lm_head_bits=None)
    if which in ("all", "bf16"):
        b28 = run("bf16", 28, chain=8)
        b28c32 = run("bf16", 28, chain=32)
        b14 = run("bf16", 14, chain=8)
        rtt = (b28 - b28c32) * 32 * 8 / (32 - 8) * 1e3
        slope = (b28 - b14) / 14 * 1e3
        print(f"bf16: slope {slope:.3f} ms/layer, "
              f"intercept(chain8) {(b28*1e3 - 28*slope):.2f} ms, "
              f"RTT est {rtt:.1f} ms/dispatch", flush=True)
