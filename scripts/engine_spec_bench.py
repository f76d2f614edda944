#!/usr/bin/env python
"""Batched speculation in the continuous-batching engine, on the real chip.

Same 12-request mixed-length workload as engine_bench.py (7B dims, W4A8):
  * engine plain          — one token per row per step (the 2.18× baseline)
  * engine spec_k=7       — real acceptance (random weights ≈ none → the
                            integration-overhead bound)
  * engine spec ceiling   — force-accept instrument: k+1 tokens per row per
                            verify (mechanical upper bound, NOT output-exact)
Run: python scripts/engine_spec_bench.py [depth] [slots]
"""

import gc
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def serve(eng, prompts, gen_tokens):
    # warm jits (per prompt bucket + block fn) outside the timed span
    for n in sorted({len(p) for p in prompts}):
        eng.submit(next(p for p in prompts if len(p) == n),
                   max_new_tokens=2)
    eng.run()
    t0 = time.perf_counter()
    for p in prompts:
        eng.submit(p, max_new_tokens=gen_tokens)
    outs = eng.run()
    dt = time.perf_counter() - t0
    return sum(len(v) for v in outs.values()) / dt, dt


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import bench

    from mquant_tpu.serve.engine import ServingEngine

    cfg = bench.make_cfg(depth)
    specs = bench.llm_specs()
    log(f"init w4a8 depth={depth} on {jax.devices()}")
    params, state = bench.init_w4a8_on_device(cfg, jax.random.key(0))

    GEN = 96
    lens = [256, 512, 1024] * 4
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 1000, size=n)) for n in lens]

    def mk(**kw):
        return ServingEngine(cfg, params, specs=specs, state=state,
                             mode="real", slots=slots, max_len=2048, **kw)

    eng = mk(steps_per_block=16)
    tps, dt = serve(eng, prompts, GEN)
    log(f"engine plain (slots={slots}): {tps:.1f} tok/s ({dt:.2f} s)")
    base = tps
    del eng
    gc.collect()

    eng = mk(steps_per_block=8, spec_k=7)
    tps, dt = serve(eng, prompts, GEN)
    acc = eng.spec_emitted / max(eng.spec_row_rounds, 1)
    log(f"engine spec k=7 (real acceptance): {tps:.1f} tok/s "
        f"({tps / base:.2f}x), accepted/round {acc:.2f}")
    del eng
    gc.collect()

    eng = mk(steps_per_block=8, spec_k=7)
    eng._force_accept = True  # ceiling instrument — NOT output-exact
    tps, dt = serve(eng, prompts, GEN)
    log(f"engine spec ceiling (force-accept): {tps:.1f} tok/s "
        f"({tps / base:.2f}x)")


if __name__ == "__main__":
    main()
