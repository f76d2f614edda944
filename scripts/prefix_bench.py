"""Prefix-caching admission latency at 7B dims (W4A8 real path).

Measures ServingEngine admission (prefill + slot insert) for a request of
PREFIX+SUFFIX tokens, with and without the prefix registered: registered,
only the suffix's weight streams run. Wall-clock includes the tunnel RTT
(~30 ms/dispatch artifact of this dev setup — both variants pay it)."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import init_w4a8_on_device, llm_specs, make_cfg
from mquant_tpu.serve.engine import ServingEngine
from mquant_tpu.transform.hadamard import auto_pad_size

DEPTH = int(os.environ.get("DEPTH", "28"))
PREFIX = int(os.environ.get("PREFIX", "896"))
SUFFIX = int(os.environ.get("SUFFIX", "128"))


def time_admission(eng, prefix, suffix, iters=3):
    best = float("inf")
    for i in range(iters + 1):  # first iteration = compile
        # vary the suffix (defeats dispatch memoization on the tunnel) but
        # keep the prefix fixed so registration still matches
        suf = [(t + 7 * i) % 997 + 2000 for t in suffix]
        eng.submit(prefix + suf, max_new_tokens=1)
        t0 = time.perf_counter()
        eng.step_block()
        dt = time.perf_counter() - t0
        while any(eng._active) or eng._admitting:  # drain
            eng.step_block()
        if i > 0:
            best = min(best, dt)
    return best


def main():
    key = jax.random.key(0)
    pad = auto_pad_size(make_cfg(DEPTH).intermediate)
    cfg = make_cfg(DEPTH, intermediate_pad=pad)
    params, state = init_w4a8_on_device(cfg, key)
    prefix = list(range(1, PREFIX + 1))
    suffix = list(range(3000, 3000 + SUFFIX))
    # ONE engine for both variants (a second engine's cache+jits OOM a 16G
    # chip next to the 7B int8 weights): cold first, then register + warm
    eng = ServingEngine(cfg, params, specs=llm_specs(), state=state,
                        mode="real", slots=2, max_len=2048)
    cold = time_admission(eng, prefix, suffix)
    print(f"admission w/o prefix cache ({PREFIX}+{SUFFIX} tokens): "
          f"{cold * 1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    eng.register_prefix(prefix)
    reg = time.perf_counter() - t0
    warm = time_admission(eng, prefix, suffix)
    print(f"admission with prefix cache: {warm * 1e3:.1f} ms "
          f"(-{(1 - warm / cold) * 100:.1f}%; one-off register "
          f"{reg * 1e3:.0f} ms incl. compile; hits={eng.prefix_hits})",
          flush=True)


if __name__ == "__main__":
    main()
