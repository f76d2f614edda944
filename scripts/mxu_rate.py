"""Clean MXU rate measurement: pure matmuls in a fori_loop with a negligible
input perturbation per step (prevents CSE/hoisting), fetch-forced timing.

Answers: does s8×s8→s32 run at 2× bf16 on this chip, and does a Pallas
matmul kernel reach the native int8 rate where XLA's HLO path doesn't?
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("M", "1024"))
K = int(os.environ.get("K", "3584"))
N = int(os.environ.get("N", "19968"))
ITERS = int(os.environ.get("ITERS", "32"))


def timeit(label, f, xs, w):
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


@jax.jit
def f_bf16(x, w):
    def body(i, carry):
        acc, x = carry
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return acc + y[0, :8], x + jnp.bfloat16(1e-8)

    acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((8,), jnp.float32), x))
    return acc


@jax.jit
def f_int8(x, w):
    def body(i, carry):
        acc, x = carry
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + y[0, :8], x ^ 1

    acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros((8,), jnp.int32), x))
    return acc


def _mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    k = jax.lax.rem(jax.lax.axis_index("k") if False else 0, 1)  # placeholder
    del k


def make_pallas_i8(tm, tn, tk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_k = K // tk

    def kern(x_ref, w_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(kk == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def mm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            grid=(M // tm, N // tn, n_k),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w)

    @jax.jit
    def f(x, w):
        def body(i, carry):
            acc, x = carry
            y = mm(x, w)
            return acc + y[0, :8], x ^ 1

        acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                   (jnp.zeros((8,), jnp.int32), x))
        return acc

    return f


if __name__ == "__main__":
    key = jax.random.key(0)
    print(f"M={M} K={K} N={N} iters={ITERS}", flush=True)
    xb = [jax.random.normal(jax.random.fold_in(key, i), (M, K), jnp.bfloat16)
          for i in range(4)]
    wb = jax.random.normal(jax.random.fold_in(key, 99), (K, N), jnp.bfloat16)
    timeit("bf16 XLA      ", f_bf16, xb, wb)

    xi = [jax.random.randint(jax.random.fold_in(key, i), (M, K), -127, 128, jnp.int8)
          for i in range(4)]
    wi = jax.random.randint(jax.random.fold_in(key, 98), (K, N), -127, 128, jnp.int8)
    timeit("int8 XLA      ", f_int8, xi, wi)

    for tm, tn, tk in ((256, 512, 512), (512, 1024, 512), (256, 1024, 896),
                       (512, 512, 896)):
        if M % tm or N % tn or K % tk:
            continue
        try:
            timeit(f"int8 pallas {tm}x{tn}x{tk}", make_pallas_i8(tm, tn, tk), xi, wi)
        except Exception as e:
            print(f"int8 pallas {tm}x{tn}x{tk} failed: {str(e)[:200]}", flush=True)
