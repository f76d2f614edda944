"""Probe matrix for the MXU's quantized-operand rates: int8 variants, int4
weights, fp8, different shapes. Fetch-forced fori_loop timing like mxu_rate."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("M", "1024"))
K = int(os.environ.get("K", "3584"))
N = int(os.environ.get("N", "19968"))
ITERS = int(os.environ.get("ITERS", "32"))


def timeit(label, f, xs, w):
    try:
        r = f(xs[0], w)
        _ = np.asarray(r).ravel()[0]
        times = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            r = f(x, w)
            _ = np.asarray(r).ravel()[0]
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        per = dt / ITERS
        tf = 2 * M * K * N / per / 1e12
        print(f"{label}: {per*1e3:.3f} ms/matmul ({tf:.1f} TF/s)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def loop(dot, perturb, acc0=None):
    @jax.jit
    def f(x, w):
        def body(i, carry):
            acc, x = carry
            y = dot(x, w)
            return acc + y[0, :8].astype(acc.dtype), perturb(x)

        a0 = jnp.zeros((8,), jnp.float32) if acc0 is None else acc0
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (a0, x))
        return acc

    return f


dn = (((1,), (0,)), ((), ()))

if __name__ == "__main__":
    key = jax.random.key(0)
    print(f"M={M} K={K} N={N} iters={ITERS}", flush=True)
    xi = [jax.random.randint(jax.random.fold_in(key, i), (M, K), -127, 128, jnp.int8)
          for i in range(4)]
    wi = jax.random.randint(jax.random.fold_in(key, 98), (K, N), -127, 128, jnp.int8)

    # int8 → f32 accumulate (vs int32)
    timeit("s8xs8->f32        ",
           loop(lambda x, w: jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.float32),
                lambda x: x ^ 1), xi, wi)

    # int4 weights (real jnp.int4 dtype)
    try:
        w4 = (wi.astype(jnp.int32) % 8 - 4).astype(jnp.int4)
        timeit("s8xs4->s32        ",
               loop(lambda x, w: jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.int32),
                    lambda x: x ^ 1, jnp.zeros((8,), jnp.int32)), xi, w4)
        x4 = [(x.astype(jnp.int32) % 8 - 4).astype(jnp.int4) for x in xi]
        timeit("s4xs4->s32        ",
               loop(lambda x, w: jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.int32),
                    lambda x: x, jnp.zeros((8,), jnp.int32)), x4, w4)
    except Exception as e:
        print("int4 setup failed:", str(e)[:200])

    # fp8
    try:
        xf8 = [x.astype(jnp.bfloat16).astype(jnp.float8_e4m3fn) for x in xi]
        wf8 = wi.astype(jnp.bfloat16).astype(jnp.float8_e4m3fn)
        timeit("f8e4m3xf8->f32    ",
               loop(lambda x, w: jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.float32),
                    lambda x: x), xf8, wf8)
    except Exception as e:
        print("fp8 setup failed:", str(e)[:200])

    # bf16 x int8 weight (weight-only quant pattern, convert fused by XLA)
    xb = [x.astype(jnp.bfloat16) for x in xi]
    timeit("bf16x(s8->bf16)   ",
           loop(lambda x, w: jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32),
                lambda x: x + jnp.bfloat16(1e-8)), xb, wi)
