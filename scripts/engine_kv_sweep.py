#!/usr/bin/env python
"""Decode block ms/step vs KV buffer size and KV dtype at B=8.

The engine pool's block measured ~16 ms/step at kv buffer 1280 (bf16 KV)
while an equivalent block at buffer 512 runs ~8.4 ms/step — superlinear in
S if real. This probe holds the block machinery constant (the engine's
full configuration: lse + alpha-vector + per-row pos) and sweeps:

  S ∈ {512, 768, 1024, 1280}  ×  KV ∈ {bf16, int8}

A first untimed warm loop absorbs the first-dispatch artifact that skewed
earlier probes (engine_block_ab's 12.8 vs engine_block_isolate's 8.4 for
the same configuration — both first-timed measurements in their process).

Run: python scripts/engine_kv_sweep.py [depth]
"""

import functools
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
    import os

    os.environ.setdefault("MQUANT_GEMV", "pallas_w4")
    os.environ.setdefault("MQUANT_BENCH_HEAD", "8")
    import bench

    from mquant_tpu.models.llm import decoder_forward, init_cache
    from mquant_tpu.serve.generate import prepare_w4_resident

    cfg = bench.make_cfg(depth)
    specs = bench.llm_specs()
    B = 8
    n_steps = 16
    log(f"init w4a8 depth={depth} on {jax.devices()}")
    params, state = bench.init_w4a8_on_device(cfg, jax.random.key(0))
    params = prepare_w4_resident(cfg, params, specs, "real")

    @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=())
    def block(params, tok, cache, alphas):
        def body(i, carry):
            tok, cache, out, acc = carry
            logits, cache2, _ = decoder_forward(
                cfg, params, tok, specs=specs, state=state,
                mode="real", cache=cache, ntk_alpha=alphas)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            l32 = logits[:, -1].astype(jnp.float32)
            lp = (jnp.take_along_axis(l32, nxt[:, None], -1)[:, 0]
                  - jax.scipy.special.logsumexp(l32, axis=-1))
            out = jax.lax.dynamic_update_slice(
                out, nxt[:, None], (jnp.int32(0), jnp.asarray(i)))
            return nxt[:, None], cache2, out, acc + lp

        out0 = jnp.zeros((B, n_steps), jnp.int32)
        acc0 = jnp.zeros((B,), jnp.float32)
        _, cache, out, acc = jax.lax.fori_loop(
            0, n_steps, body, (tok, cache, out0, acc0))
        return out, acc, cache

    alphas = jnp.full((B,), 10.0, jnp.float32)
    results = {}
    # MQUANT_ATTN=fused: A/B the Pallas fused decode-attention kernel at
    # B=8 (rejected at B=1; the batched pool amortizes its launch cost
    # differently). The kernel needs a cfg-dtype cache — skip int8 then.
    kv_variants = (("bf16", False),) if os.environ.get(
        "MQUANT_ATTN") == "fused" else (("bf16", False), ("int8", True))
    for kv_tag, kvq in kv_variants:
        for S in (512, 768, 1024, 1280):
            cache = init_cache(cfg, B, S, quantized=kvq)
            cache["pos"] = jnp.asarray(
                np.full((B,), S - 256, np.int32)
                + np.arange(B, dtype=np.int32))
            cache["rope_delta"] = jnp.zeros((B,), jnp.int32)
            tok = jnp.zeros((B, 1), jnp.int32)
            # warm: compile + absorb the first-dispatch artifact.
            # NB: on the tunnel backend block_until_ready does NOT wait
            # (see verify skill / prefill_decompose.py) — force with a real
            # host transfer of the output instead.
            out, acc, cache = block(params, tok, cache, alphas)
            out, acc, cache = block(params, out[:, -1:], cache, alphas)
            np.asarray(out)
            NB = 6
            t0 = time.perf_counter()
            for _ in range(NB):
                out, acc, cache = block(params, out[:, -1:], cache, alphas)
            np.asarray(out)
            ms = (time.perf_counter() - t0) / NB / n_steps * 1e3
            results[f"{kv_tag}_S{S}"] = round(ms, 2)
            log(f"kv={kv_tag} S={S}: {ms:.2f} ms/step "
                f"({B/ms*1e3:.0f} tok/s)")
            del cache

    import json
    print(json.dumps({"depth": depth, "batch": B,
                      "ms_per_step": results}))


if __name__ == "__main__":
    main()
