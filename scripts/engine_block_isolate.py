#!/usr/bin/env python
"""Isolate the engine decode-block's ~5 ms/step machinery overhead.

engine_block_ab measured the engine's fused block at 12.8 ms/step
(B=8, kv buffer 512) vs the plain batched loop's 8.0 ms/step (S=640).
Same decoder_forward, same weights — so the delta is block machinery.
This probe times a minimal fused 16-step loop with each machinery piece
toggled independently:

  base     — argmax only, scalar alpha, uniform scalar cache pos
  +lse     — emitted-token logprob (logsumexp over vocab) per step
  +alpha   — ntk_alpha as a traced (B,) vector instead of a constant
  +rowpos  — cache["pos"] as a (B,) vector (slot pool) instead of scalar
  full     — all three (the engine block's configuration)

Run: python scripts/engine_block_isolate.py [depth]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    import os

    os.environ.setdefault("MQUANT_GEMV", "pallas_w4")
    os.environ.setdefault("MQUANT_BENCH_HEAD", "8")
    import bench

    from mquant_tpu.models.llm import decoder_forward, init_cache
    from mquant_tpu.serve.generate import prepare_w4_resident

    cfg = bench.make_cfg(depth)
    specs = bench.llm_specs()
    B, S = 8, 512
    log(f"init w4a8 depth={depth} on {jax.devices()}")
    params, state = bench.init_w4a8_on_device(cfg, jax.random.key(0))
    params = prepare_w4_resident(cfg, params, specs, "real")
    n_steps = 16

    def make_block(with_lse, alpha_data, row_pos):
        @functools.partial(jax.jit, donate_argnums=(2,))
        def block(params, tok, cache, alphas=None):
            alpha_eff = alphas if alphas is not None else 10.0

            def body(i, carry):
                tok, cache, out, acc = carry
                logits, cache2, _ = decoder_forward(
                    cfg, params, tok, specs=specs, state=state,
                    mode="real", cache=cache, ntk_alpha=alpha_eff)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                if with_lse:
                    l32 = logits[:, -1].astype(jnp.float32)
                    lp = (jnp.take_along_axis(l32, nxt[:, None], -1)[:, 0]
                          - jax.scipy.special.logsumexp(l32, axis=-1))
                    acc = acc + lp
                out = jax.lax.dynamic_update_slice(
                    out, nxt[:, None], (jnp.int32(0), jnp.asarray(i)))
                return nxt[:, None], cache2, out, acc

            out0 = jnp.zeros((B, n_steps), jnp.int32)
            acc0 = jnp.zeros((B,), jnp.float32)
            _, cache, out, acc = jax.lax.fori_loop(
                0, n_steps, body, (tok, cache, out0, acc0))
            return out, acc, cache

        return block

    results = {}
    variants = [
        ("base", False, False, False),
        ("+lse", True, False, False),
        ("+alpha", False, True, False),
        ("+rowpos", False, False, True),
        ("full", True, True, True),
    ]
    import numpy as np

    for name, with_lse, alpha_data, row_pos in variants:
        cache = init_cache(cfg, B, S)
        if row_pos:
            # slot-pool shape: every row its own position (staggered)
            cache["pos"] = jnp.asarray(
                np.full((B,), 256, np.int32) + np.arange(B, dtype=np.int32))
            if "rope_delta" not in cache:
                cache["rope_delta"] = jnp.zeros((B,), jnp.int32)
        else:
            cache["pos"] = jnp.asarray(256, jnp.int32)
        blk = make_block(with_lse, alpha_data, row_pos)
        tok = jnp.zeros((B, 1), jnp.int32)
        kw = ({"alphas": jnp.full((B,), 10.0, jnp.float32)}
              if alpha_data else {})
        out, acc, cache = blk(params, tok, cache, **kw)
        np.asarray(out)  # tunnel backend: block_until_ready does not wait
        NB = 6
        t0 = time.perf_counter()
        for _ in range(NB):
            out, acc, cache = blk(params, out[:, -1:], cache, **kw)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / NB / n_steps * 1e3
        results[name] = round(ms, 2)
        log(f"{name:8s}: {ms:.2f} ms/step ({B/ms*1e3:.0f} tok/s)")
        del cache, blk

    import json
    print(json.dumps({"depth": depth, "batch": B, "kv_buffer": S,
                      "ms_per_step": results}))


if __name__ == "__main__":
    main()
