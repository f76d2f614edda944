#!/usr/bin/env python
"""A/B the engine's fused decode block against the plain batched loop.

Separates two variables behind the engine block's 15.2 ms/step (vs the
plain Generator loop's 8.0 ms/step at B=8):
  * KV buffer size: the engine's pool grew to S=1280 (1024-token prompts);
    the sweep measured at S=640.
  * block machinery: per-row cache positions, logprob (logsumexp over
    vocab), alpha-as-data rope tables, active masking.

Measures, all at B=8 / depth 28 / pallas_w4 / int8 head:
  1. engine bare block at kv buffer 640   (same machinery, small KV)
  2. engine bare block at kv buffer 1280  (the probe's configuration)
  3. plain batched decode at S_total=640  (sweep reproduction)
  4. plain batched decode at S_total=1280 (big KV, no machinery)

Run: python scripts/engine_block_ab.py [depth]
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bare_block_ms(eng, n_blocks=6):
    blk = eng._decode_block_fn(eng.steps_per_block)
    tok = jnp.zeros((eng.slots, 1), jnp.int32)
    active = jnp.ones((eng.slots,), bool)
    extra = ({"alphas": jnp.asarray(eng.alphas)} if eng._dyn else {})
    cache = eng.cache
    out, lps, cache = blk(eng.params, tok, active, cache, **extra)
    np.asarray(out)  # tunnel backend: block_until_ready does not wait
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        out, lps, cache = blk(eng.params, out[:, -1:], active, cache, **extra)
    np.asarray(out)
    dt = time.perf_counter() - t0
    eng.cache = cache
    return dt / n_blocks / eng.steps_per_block * 1e3


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    import os

    os.environ.setdefault("MQUANT_GEMV", "pallas_w4")
    os.environ.setdefault("MQUANT_BENCH_HEAD", "8")
    import bench

    from mquant_tpu.serve.engine import ServingEngine
    from mquant_tpu.serve.generate import Generator, measure_decode_tps

    cfg = bench.make_cfg(depth)
    specs = bench.llm_specs()
    B = 8
    log(f"init w4a8 depth={depth} on {jax.devices()}")
    params, state = bench.init_w4a8_on_device(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    res = {}

    # -- 1/2: engine bare block at two KV buffer sizes ---------------------
    for max_len, prompt_len, label in ((640, 256, "S640"),
                                       (1280, 1024, "S1280")):
        eng = ServingEngine(cfg, params, specs=specs, state=state,
                            mode="real", slots=B, max_len=max_len,
                            steps_per_block=16)
        p = rng.integers(1, 1000, size=prompt_len).astype(np.int64)
        for _ in range(B):  # occupy all slots so pos rows are realistic
            eng.submit(p, max_new_tokens=2)
        eng.run()
        ms = bare_block_ms(eng)
        res[f"engine_block_ms_per_step_{label}"] = round(ms, 2)
        log(f"engine bare block @ kv buffer {eng._cache_S()}: "
            f"{ms:.2f} ms/step ({B/ms*1e3:.0f} tok/s)")
        del eng

    # -- 3/4: plain batched loop at matching total S -----------------------
    for S_total, Tpre, label in ((640, 512, "S640"), (1280, 1024, "S1280")):
        gen = Generator(cfg, params, specs=specs, state=state, mode="real",
                        max_len=S_total, batch=B)
        toks = jnp.ones((B, Tpre), jnp.int32)
        tps = measure_decode_tps(gen, toks, n_tokens=64, on_device=True)
        res[f"plain_ms_per_step_{label}"] = round(B / tps * 1e3, 2)
        log(f"plain batched loop @ S {S_total} (prefill {Tpre}): "
            f"{B/tps*1e3:.2f} ms/step ({tps:.0f} tok/s)")
        del gen

    import json
    print(json.dumps({"depth": depth, "batch": B, **res}))


if __name__ == "__main__":
    main()
