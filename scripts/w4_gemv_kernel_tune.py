"""Per-shape tile sweep for the packed-W4 SWAR decode GEMV, with GB/s vs the
HBM bound. Hypothesis: the current full-N row tiles (~15 MB) fill VMEM
(~16 MB/core) so Mosaic cannot double-buffer the weight stream, serializing
DMA and compute; small-footprint tiles should pipeline and close the ~2x gap
to the DMA bound. Timing: chained fori_loop inside one jit (per-dispatch
overhead would swamp sub-ms GEMVs). Run on TPU."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.kernels import qmm

ITERS = 512
# fused 7B decode GEMV shapes (K, N): qkv, gate|up, down, o, lm_head-ish
SHAPES = (
    ("qkv", 3584, 4608),
    ("gate|up", 3584, 37888),
    ("down", 18944, 3584),
    ("o", 3584, 3584),
)


def bench_fn(f, x, iters=ITERS):
    """Per-call seconds via the SLOPE between two chained-loop lengths: the
    tunnel dispatch RTT (~tens of ms) is a fixed per-dispatch cost that a
    single loop cannot amortize, but it cancels in the difference."""

    def make(n):
        @jax.jit
        def run(x):
            def body(i, xx):
                y = f(xx)
                return xx + (y[0, :1] * 1e-12).astype(xx.dtype)

            return jax.lax.fori_loop(0, n, body, x)

        return run

    lo, hi = make(16), make(16 + iters)

    def t(run):
        # tunnel backend: block_until_ready doesn't wait — fetch a scalar;
        # vary the input per run to defeat result memoization
        np.asarray(run(x)[0, 0])  # compile
        best = float("inf")
        for i in range(3):
            xi = x + np.int8(i + 1)
            np.asarray(xi[0, 0])  # land the input before starting the clock
            t0 = time.perf_counter()
            np.asarray(run(xi)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(hi) - t(lo), 1e-9) / iters


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)
    for label, K, N in SHAPES:
        K2 = K // 2
        xq = jnp.asarray(rng.integers(-127, 128, (1, K)), jnp.int8)
        w8 = rng.integers(-8, 8, (K, N)).astype(np.int8)
        wp = jnp.asarray(
            (w8[:K2].astype(np.uint8) & 0xF) | (w8[K2:].astype(np.uint8) << 4)
        ).astype(jnp.int8)
        w8 = jnp.asarray(w8)
        ws = jnp.full((N,), 0.01, jnp.float32)
        xs = jnp.ones((1, 1), jnp.float32)
        p = {"w_q": wp, "w_scale": ws}
        dma_us = K2 * N / 819e9 * 1e6  # packed bytes at v5e HBM peak

        def xla_int8(xx):
            acc = jnp.dot(xx.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return (acc * ws).astype(jnp.bfloat16)

        t8 = bench_fn(xla_int8, xq)
        print(f"{label}: K={K} N={N}  packed-DMA-bound {dma_us:6.1f}us | "
              f"int8-XLA {t8*1e6:7.1f}us ({K*N/t8/1e9:4.0f} GB/s)", flush=True)

        for tk, tn in ((256, 0), (512, 0), (128, 0),          # full-N rows
                       (K2, 512), (K2, 1024), (K2, 2048),     # full-K cols
                       (256, 4736), (512, 4736), (256, 9472),
                       (512, 2048), (1024, 2048), (256, 2048),
                       (128, 9472), (1024, 512)):
            tn_eff = tn or N
            if (qmm._pick_tile(K2, tk) != tk if tk != K2 else False):
                continue
            if tn_eff != N and qmm._pick_tile(N, tn_eff) != tn_eff:
                continue
            foot = tk * tn_eff * 3 / 2**20  # packed + 2 byte planes
            if foot > 8.0:  # no VMEM room for double-buffering (16 MB/core)
                continue
            f = functools.partial(qmm._qmm_pallas_w4, x_scale=xs, p=p,
                                  out_dtype=jnp.bfloat16)

            def call(xx, tk=tk, tn=tn_eff):
                os.environ["MQUANT_W4_TK"] = str(tk)
                os.environ["MQUANT_W4_TN"] = str(tn)
                return f(xx)

            try:
                t = bench_fn(call, xq)
            except Exception as e:
                print(f"  tk={tk:5d} tn={tn_eff:5d}: FAIL {type(e).__name__} "
                      f"{str(e)[:80]}", flush=True)
                continue
            gbs = K2 * N / t / 1e9
            print(f"  tk={tk:5d} tn={tn_eff:5d} ({foot:5.1f}MB): "
                  f"{t*1e6:7.1f}us  {gbs:4.0f} GB/s  "
                  f"{t/ (dma_us/1e6):4.2f}x bound  {t8/t:4.2f}x vs int8",
                  flush=True)


if __name__ == "__main__":
    main()
