"""Decode-GEMV weight-format shootout at 7B shapes: int8 vs packed-int4.

Decode is HBM-bandwidth-bound: tokens/s scales with bytes of weights streamed
per step. Candidates:
  A. int8 storage, bf16 MXU dot (current default, 2x vs bf16)
  B. native jnp.int4 storage, bf16 dot (XLA s4: 4x storage; convert fused
     into the operand read if XLA cooperates)
  C. Pallas split-half packed int8 nibbles, two-dot decode kernel
  D. bf16 storage (baseline)

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
ITERS = 30


def timeit(fn, *args):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    for K, N in SHAPES:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
        wq = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
        ws = jnp.asarray(rng.random(N).astype(np.float32) * 0.01)

        w8 = jnp.asarray(wq)  # int8 storage
        w4 = jnp.asarray(wq, dtype=jnp.int4)  # native s4 storage
        wb = jnp.asarray(wq.astype(np.float32), jnp.bfloat16)

        @jax.jit
        def dot8(x, w, s):
            acc = jnp.dot(x, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return (acc * s).astype(jnp.bfloat16)

        @jax.jit
        def dot4(x, w, s):
            acc = jnp.dot(x, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return (acc * s).astype(jnp.bfloat16)

        @jax.jit
        def dotb(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        t8 = timeit(dot8, x, w8, ws)
        t4 = timeit(dot4, x, w4, ws)
        tb = timeit(dotb, x, wb)
        bw8 = K * N / t8 / 1e9
        bw4 = K * N / 2 / t4 / 1e9  # s4 = half a byte
        bwb = K * N * 2 / tb / 1e9
        print(f"K={K:6d} N={N:6d}  bf16 {tb*1e6:7.1f}us ({bwb:5.0f}GB/s)"
              f"  int8 {t8*1e6:7.1f}us ({bw8:5.0f}GB/s)"
              f"  int4 {t4*1e6:7.1f}us ({bw4:5.0f}GB/s)"
              f"  s4/s8 speedup {t8/t4:4.2f}x")


if __name__ == "__main__":
    main()
