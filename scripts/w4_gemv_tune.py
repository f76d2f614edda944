"""Decode-GEMV weight-format shootout at 7B shapes: int8 vs packed-int4.

Decode is HBM-bandwidth-bound: tokens/s scales with bytes of weights streamed
per step. Candidates:
  A. int8 storage, fused int8->bf16 MXU dot (current default, 2x vs bf16)
  B. native jnp.int4 (S4) storage, fused s4->bf16 dot (4x storage)
  D. bf16 storage (baseline)

The whole timing loop runs inside ONE jit (chained fori_loop) because S4
arrays cannot cross the host/jit boundary on this backend (device_put
recursion bug); an optimization_barrier pins the storage format so the
convert cannot be folded back onto the int8 source.

Run on the TPU: python scripts/w4_gemv_tune.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Qwen2-VL-7B GEMV shapes (in, out)
SHAPES = [(3584, 4608), (3584, 18944), (18944, 3584), (3584, 3584)]
M = 1
ITERS = 64


def make_bench(store_dtype):
    @jax.jit
    def bench(x, w8, s):
        w = w8.astype(store_dtype)
        w = jax.lax.optimization_barrier(w)  # pin the storage format

        def body(i, carry):
            y, xx = carry
            acc = jnp.dot(xx, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            y = (acc * s).astype(jnp.bfloat16)
            # feed a hair of the output back into x: serializes iterations
            xx = xx + y[0, :1].astype(xx.dtype) * 1e-9
            return y, xx

        y0 = jnp.zeros((M, w8.shape[1]), jnp.bfloat16)
        y, _ = jax.lax.fori_loop(0, ITERS, body, (y0, x))
        return y

    return bench


def timeit(fn, *args):
    r = fn(*args)
    np.asarray(r).ravel()[:1]
    best = float("inf")
    for i in range(4):
        a0 = args[0] + i * 1e-6
        t0 = time.perf_counter()
        r = fn(a0, *args[1:])
        np.asarray(r).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    for K, N in SHAPES:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
        wq = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
        ws = jnp.asarray(rng.random(N).astype(np.float32) * 0.01)
        w8 = jnp.asarray(wq)

        tb = timeit(make_bench(jnp.bfloat16), x, w8, ws)
        t8 = timeit(make_bench(jnp.int8), x, w8, ws)
        t4 = timeit(make_bench(jnp.int4), x, w8, ws)
        bwb = K * N * 2 / tb / 1e9
        bw8 = K * N / t8 / 1e9
        bw4 = K * N / 2 / t4 / 1e9  # s4 = half a byte
        print(f"K={K:6d} N={N:6d}  bf16 {tb*1e6:7.1f}us ({bwb:5.0f}GB/s)"
              f"  int8 {t8*1e6:7.1f}us ({bw8:5.0f}GB/s)"
              f"  int4 {t4*1e6:7.1f}us ({bw4:5.0f}GB/s)"
              f"  s4/s8 speedup {t8/t4:4.2f}x")


if __name__ == "__main__":
    main()
