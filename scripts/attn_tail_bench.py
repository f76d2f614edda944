"""Prefill hot-spot probes at 7B dims, T=1024: attention variants (einsum vs
flash w/ block tuning) and the MLP tail (swiglu -> hadamard -> int8 quantize).
Chained in one jit; subtract the ~30ms/CHAIN tunnel RTT mentally when
comparing absolute numbers (deltas between rows are clean)."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.models import layers as L

B, T, H, KVH, hd = 1, int(os.environ.get("BENCH_T", "1024")), 28, 4, 128
I = 18944
CHAIN = 16
key = jax.random.key(0)


def bench(label, fn, *args):
    @jax.jit
    def f(*args):
        def body(i, x):
            out = fn(x, *args[1:])
            return (x + out.ravel()[0].astype(x.dtype) * 1e-9).astype(x.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, args[0]).ravel()[:8]

    r = f(*args)
    np.asarray(r).ravel()[0]
    ts = []
    for i in range(3):
        a0 = args[0] + jnp.asarray(i * 1e-6, args[0].dtype)
        t0 = time.perf_counter()
        r = f(a0, *args[1:])
        np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / CHAIN
    print(f"{label}: {dt*1e3:.3f} ms", flush=True)


def attn_einsum(q, k, v):
    return L.attention(q.reshape(B, T, H, hd), k, v, None, causal=True)


def make_flash(block_q, block_kv):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    bs = BlockSizes(block_q=block_q, block_k_major=block_kv, block_k=block_kv,
                    block_b=1)

    def f(q, k, v):
        q = q.reshape(B, T, H, hd)
        rep = H // KVH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        return flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                               v.transpose(0, 2, 1, 3), causal=True,
                               sm_scale=hd**-0.5, block_sizes=bs
                               ).transpose(0, 2, 1, 3)

    return f


def tail_jnp(g, u, had):
    a = L.swiglu(g, u)
    from mquant_tpu.kernels.fwht import online_hadamard

    a = online_hadamard(a)
    s = jnp.float32(0.05)
    q = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q.astype(jnp.bfloat16)


def main():
    print(f"T={T} chain={CHAIN}", flush=True)
    q = jax.random.normal(key, (B, T, H * hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, KVH, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, T, KVH, hd), jnp.bfloat16)
    bench("attn einsum GQA          ", attn_einsum, q, k, v)
    for bq, bkv in ((512, 512), (256, 512), (1024, 512), (512, 1024)):
        try:
            bench(f"attn flash bq={bq:4d} bkv={bkv:4d}", make_flash(bq, bkv), q, k, v)
        except Exception as e:
            print(f"flash {bq}/{bkv} FAILED: {str(e)[:120]}", flush=True)

    g = jax.random.normal(jax.random.fold_in(key, 3), (B, T, I), jnp.bfloat16)
    u = jax.random.normal(jax.random.fold_in(key, 4), (B, T, I), jnp.bfloat16)
    bench("mlp tail jnp (swiglu+had+q)", tail_jnp, g, u, None)


if __name__ == "__main__":
    main()
