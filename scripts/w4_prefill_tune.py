"""Tile sweep for the packed-W4 SWAR Pallas GEMM at PREFILL shapes (M=1024),
vs the XLA s8 dot from int8 storage. Goal: tie XLA (the GEMM is MXU-bound at
M=1024, so packed can't win — but a tie enables single-copy packed-at-rest
serving). Run on TPU."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.kernels import qmm

M = int(os.environ.get("M", "1024"))
SHAPES = (("qkv/gate/up K=3584", 3584, 18944), ("down K=18944", 18944, 3584),
          ("o K=3584 N=3584", 3584, 3584))


def timeit(f, *args, iters=30):
    r = f(*args)
    r.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        r.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    key = jax.random.key(0)
    for label, K, N in SHAPES:
        k1, k2 = jax.random.split(jax.random.fold_in(key, K))
        xq = jax.random.randint(k1, (M, K), -127, 128, jnp.int8)
        w8 = jax.random.randint(k2, (K, N), -7, 8, jnp.int8)
        half = K // 2
        wp = ((w8[:half].astype(jnp.uint8) & 0xF)
              | (w8[half:].astype(jnp.uint8) << 4)).astype(jnp.int8)
        ws = jnp.full((N,), 0.01, jnp.float32)
        xs = jnp.full((M, 1), 0.05, jnp.float32)

        @jax.jit
        def xla_s8(xq, w8):
            acc = jax.lax.dot_general(xq, w8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

        t_xla = timeit(xla_s8, xq, w8)
        print(f"{label}: XLA s8 (int8 storage) {t_xla*1e6:.0f} us", flush=True)

        p = {"w_q": wp, "w_scale": ws}
        for tm, tn, tk in ((256, 512, 512), (512, 512, 512), (1024, 512, 512),
                           (1024, 1024, 256), (1024, 256, 1024),
                           (1024, 512, 1024), (1024, 1024, 512),
                           (1024, 2048, 256), (512, 1024, 512)):
            if tm > M:
                continue
            f = jax.jit(functools.partial(
                qmm._qmm_pallas_w4, p=p, out_dtype=jnp.bfloat16,
                tm=tm, tn=tn, tk=tk))
            try:
                t = timeit(f, xq, xs)
            except Exception as e:
                print(f"  pallas tm={tm} tn={tn} tk={tk}: FAIL "
                      f"{type(e).__name__} {str(e)[:100]}", flush=True)
                continue
            print(f"  pallas tm={tm} tn={tn} tk={tk}: {t*1e6:.0f} us "
                  f"({t/t_xla:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
