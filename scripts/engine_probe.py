#!/usr/bin/env python
"""Isolate ServingEngine costs: fused-block per-step time vs decode_n,
admission cost, and exactness of a solo engine request vs generate_on_device.
Run on the TPU chip: python scripts/engine_probe.py [depth]
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    import bench

    from mquant_tpu.serve.engine import ServingEngine
    from mquant_tpu.serve.generate import Generator, _force

    cfg = bench.make_cfg(depth)
    specs = bench.llm_specs()
    params, state = bench.init_w4a8_on_device(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 1000, size=256).astype(np.int64)

    # -- serial decode_n reference: 16 steps, B=1 ---------------------------
    gen = Generator(cfg, params, specs=specs, state=state, mode="real",
                    max_len=2048)
    logits, cache = gen.prefill(jnp.asarray(prompt)[None])
    tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    dec = gen._decode_n(16)
    out, _ = dec(gen.params, tok, cache)
    _force(out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out, _ = dec(gen.params, (tok + i) % 100 + 1, cache)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    log(f"decode_n(16) B=1: {best*1e3:.1f} ms ({best/16*1e3:.2f} ms/step)")

    # -- engine block: 16 steps, B=4 ----------------------------------------
    eng = ServingEngine(cfg, params, specs=specs, state=state, mode="real",
                        slots=4, max_len=2048, steps_per_block=16)
    for s in range(4):
        eng.submit(prompt + s, max_new_tokens=2)
    eng._admit()
    block = eng._decode_block_fn(16)
    tok4 = jnp.ones((4, 1), jnp.int32)
    act4 = jnp.ones((4,), bool)
    out, _, eng.cache = block(eng.params, tok4, act4, eng.cache)
    _force(out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out, _, eng.cache = block(eng.params, (tok4 + i) % 100 + 1, act4,
                                  eng.cache)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    log(f"block(16)    B=4: {best*1e3:.1f} ms ({best/16*1e3:.2f} ms/step, "
        f"{64/best:.0f} tok/s aggregate)")

    # -- admission cost ------------------------------------------------------
    eng2 = ServingEngine(cfg, params, specs=specs, state=state, mode="real",
                         slots=4, max_len=2048)
    eng2.submit(prompt, max_new_tokens=2)
    t0 = time.perf_counter()
    eng2._admit()  # includes compile
    log(f"admit (256-tok prefill+insert) first: "
        f"{time.perf_counter()-t0:.2f} s")
    best = float("inf")
    for i in range(3):
        eng2._active = [None] * 4
        eng2.submit(prompt + i + 1, max_new_tokens=2)
        t0 = time.perf_counter()
        eng2._admit()
        best = min(best, time.perf_counter() - t0)
    log(f"admit warmed: {best*1e3:.1f} ms")

    # -- exactness: solo engine request vs generate_on_device ---------------
    ref = np.asarray(gen.generate_on_device(jnp.asarray(prompt)[None],
                                            max_new_tokens=48))[0]
    eng3 = ServingEngine(cfg, params, specs=specs, state=state, mode="real",
                         slots=4, max_len=2048, steps_per_block=16)
    rid = eng3.submit(prompt, max_new_tokens=48)
    outs = eng3.run()
    got = outs[rid]
    ref_l = [int(t) for t in ref]
    if got == ref_l:
        log("solo exactness: OK")
    else:
        div = next((i for i, (a, b) in enumerate(zip(got, ref_l))
                    if a != b), min(len(got), len(ref_l)))
        log(f"solo exactness: MISMATCH at token {div} "
            f"(engine {got[max(0,div-1):div+2]} vs serial "
            f"{ref_l[max(0,div-1):div+2]})")


if __name__ == "__main__":
    main()
