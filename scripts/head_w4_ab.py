"""Model-level A/B of the packed-W4 lm_head (MQUANT_BENCH_HEAD) at the
flagship serving config: depth-28 w4a8, packed-W4 resident (pallas_w4 GEMV),
prefill 1024, on-device 128-step fused decode loop. The int8 head streams
545 MB/step (14% of decode traffic at 7B dims); split-half packing halves it.

env: DEPTH (28), PREF (1024), NTOK (128), GEMV (pallas_w4), HEADS (8,4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MQUANT_GEMV", os.environ.get("GEMV", "pallas_w4"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.serve.generate import (  # noqa: E402
    Generator, measure_decode_tps)
from mquant_tpu.transform.hadamard import auto_pad_size  # noqa: E402

DEPTH = int(os.environ.get("DEPTH", "28"))
PREF = int(os.environ.get("PREF", "1024"))
NTOK = int(os.environ.get("NTOK", "128"))
HEADS = [int(x) for x in os.environ.get("HEADS", "8,4").split(",")]


def main():
    key = jax.random.key(0)
    pad = auto_pad_size(B.make_cfg(DEPTH).intermediate)
    cfg = B.make_cfg(DEPTH, intermediate_pad=pad)
    toks = jnp.ones((1, PREF), jnp.int32)
    print(f"backend={jax.default_backend()} gemv={os.environ['MQUANT_GEMV']}"
          f" depth={DEPTH} prefill={PREF} ntok={NTOK}", flush=True)
    for hb in HEADS:
        os.environ["MQUANT_BENCH_HEAD"] = str(hb)
        params, state = B.init_w4a8_on_device(cfg, key)
        gen = Generator(cfg, params, specs=B.llm_specs(lm_head_bits=hb),
                        state=state, mode="real", max_len=PREF + NTOK, batch=1)
        tps = measure_decode_tps(gen, toks, n_tokens=NTOK, on_device=True)
        print(f"  head_bits={hb}: {tps:.1f} tok/s", flush=True)
        del gen, params, state


if __name__ == "__main__":
    main()
