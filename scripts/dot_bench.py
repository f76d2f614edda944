"""Chained matmul microbenchmark — measures true MXU rates for bf16 / int8 /
int8-carried-in-bf16 dots, amortizing the ~25ms tunnel RTT over many chained
iterations inside ONE jit. Sanity: time must scale with ITERS."""

import os
import sys
import time

import jax
import jax.numpy as jnp

M, K, N = 1024, 3584, 19968
key = jax.random.key(0)


def run(label, f, xs, w, iters_list=(4, 16)):
    """xs: several DISTINCT inputs — the tunnel memoizes identical (fn, args)
    calls, so every timed call must use fresh data."""
    import numpy as np

    for it in iters_list:
        r = f(xs[0], w, it)
        _ = np.asarray(r[:1, :1])  # force completion: block_until_ready is a
        times = []                 # no-op on the axon tunnel; only fetch blocks
        for x in xs[1:]:
            t0 = time.perf_counter()
            r = f(x, w, it)
            _ = np.asarray(r[:1, :1])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        per = dt / (2 * it)  # 2 matmuls per iteration
        tf = 2 * M * K * N / per / 1e12
        print(f"{label} iters={it}: {per*1e3:.3f} ms/matmul ({tf:.1f} TF/s) total {dt*1e3:.0f}ms",
              flush=True)


from functools import partial


@partial(jax.jit, static_argnums=2)
def chain_bf16(x, w, iters):
    def body(i, x):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        z = jnp.dot(y.astype(jnp.bfloat16), w.T, preferred_element_type=jnp.float32)
        return (x + z * 1e-9).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, iters, body, x, unroll=False)


@partial(jax.jit, static_argnums=2)
def chain_int8(x, w, iters):
    def body(i, x):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yb = (y & 0x7F).astype(jnp.int8)
        z = jax.lax.dot_general(yb, w.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return ((x.astype(jnp.int32) + (z & 1)) & 0x7F).astype(jnp.int8)

    return jax.lax.fori_loop(0, iters, body, x, unroll=False)


@partial(jax.jit, static_argnums=2)
def chain_int8_via_bf16(x, w, iters):
    """int8 storage, bf16 MXU: cast int8→bf16 before the dot."""

    def body(i, x):
        xb = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        y = jnp.dot(xb, wb, preferred_element_type=jnp.float32)
        yb = (y.astype(jnp.int32) & 0x7F).astype(jnp.bfloat16)
        z = jnp.dot(yb, wb.T, preferred_element_type=jnp.float32)
        return ((x.astype(jnp.int32) + (z.astype(jnp.int32) & 1)) & 0x7F).astype(jnp.int8)

    return jax.lax.fori_loop(0, iters, body, x, unroll=False)


if __name__ == "__main__":
    xbs = [jax.random.normal(jax.random.fold_in(key, i), (M, K), jnp.bfloat16)
           for i in range(6)]
    wb = jax.random.normal(key, (K, N), jnp.bfloat16)
    run("bf16", chain_bf16, xbs, wb)
    xis = [jax.random.randint(jax.random.fold_in(key, i), (M, K), -127, 127, jnp.int8)
           for i in range(6)]
    wi = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    run("int8", chain_int8, xis, wi)
    run("int8-via-bf16", chain_int8_via_bf16, xis, wi)
