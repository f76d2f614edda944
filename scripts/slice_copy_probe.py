"""Does a dynamic-slice feeding a Pallas custom call materialize a copy?

Hypothesis (from scripts/decode_model_ablate.py): the decode layer scan's
per-iteration dynamic-slice of stacked packed weights cannot fuse into the
Pallas GEMV's operand (custom calls take materialized buffers), so every
decode step re-copies the full weight stack — the gap between the 88%%-of-
streaming no-scan microbench and the 52%% model-level floor.

Measures one packed-W4 GEMV (down-proj dims: K=18944, N=3584) chained inside
a fori_loop, (a) with the weight passed pre-sliced (loop-invariant buffer),
(b) with the weight dynamic-sliced from a stacked (L, K2, N) array by the
loop index. Identical math; the difference is pure slice-materialization.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MQUANT_GEMV", "pallas_w4")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mquant_tpu.kernels.qmm import _qmm_pallas_w4  # noqa: E402

L, K, N = 8, 18944, 3584
K2 = K // 2
ITERS = int(os.environ.get("ITERS", "200"))

key = jax.random.key(0)
w_stack = jax.random.randint(key, (L, K2, N), -128, 128, jnp.int8)
ws = jnp.full((N,), 0.01, jnp.float32)
x = jax.random.randint(jax.random.key(1), (1, K), -127, 128, jnp.int8)
xs = jnp.full((), 0.05, jnp.float32)


def run_once(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def chained_presliced(w0, x):
    def body(i, acc):
        p = {"w_q": w0, "w_scale": ws}
        y = _qmm_pallas_w4((x + i % 2).astype(jnp.int8), xs, p, jnp.bfloat16)
        return acc + y.astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


@jax.jit
def chained_dynslice(w_stack, x):
    def body(i, acc):
        w0 = jax.lax.dynamic_index_in_dim(w_stack, i % L, 0, keepdims=False)
        p = {"w_q": w0, "w_scale": ws}
        y = _qmm_pallas_w4((x + i % 2).astype(jnp.int8), xs, p, jnp.bfloat16)
        return acc + y.astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


def main():
    print(f"backend={jax.default_backend()} K={K} N={N} iters={ITERS}")
    bytes_per = K2 * N  # packed weight bytes one GEMV must stream
    t = run_once(chained_presliced, w_stack[0], x)
    per = t / ITERS
    print(f"  pre-sliced : {per*1e6:8.1f} us/GEMV  "
          f"({bytes_per/per/1e9:6.1f} GB/s)")
    t = run_once(chained_dynslice, w_stack, x)
    per = t / ITERS
    print(f"  dyn-sliced : {per*1e6:8.1f} us/GEMV  "
          f"({bytes_per/per/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
