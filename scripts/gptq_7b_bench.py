"""GPTQ compile + wall-clock at real 7B shapes (one layer's worth of sites).

Validates the lax.fori_loop block scan + blocked Hessian factorization in
gptq/core.py: compile time must be O(1) in the input dimension (the old
Python unroll emitted ~in/128 copies of the block body — 148 for the
18944-row down_proj — into one HLO, and XLA's native cholesky/triangular
solve expansion requested >100 GB of HBM temps at 18944²).

Measured on v5e (2026-08-16, steady = run after compile):
  q/o     (3584x3584)  compile ~4s*  steady 0.49s
  gate/up (3584x18944) compile  7.2s steady 0.55s
  down    (18944x3584) compile  3.3s steady 1.94s   (*first compile in a
  process pays ~200s of one-off tunnel/libtpu init in this dev setup)
→ full 28-layer 7B LLM GPTQ ≈ 2.5 min of quantization walks.

Run on the TPU: `python scripts/gptq_7b_bench.py`
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.gptq import core as C

# Qwen2-VL-7B decoder site shapes (in, out)
SITES = {
    "q/o (3584x3584)": (3584, 3584),
    "gate/up (3584x18944)": (3584, 18944),
    "down (18944x3584)": (18944, 3584),
}


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  dev: {jax.devices()[0]}")
    for name, (n, out) in SITES.items():
        W = jnp.asarray(rng.normal(size=(n, out)).astype(np.float32) * 0.02)
        X = jnp.asarray(rng.normal(size=(2048, n)).astype(np.float32))
        H = C.accumulate_hessian(None, X)
        H.block_until_ready()

        t0 = time.perf_counter()
        res = C.gptq_quantize_matrix(W, H, bits=4)
        np.asarray(res.w[0, 0])  # force
        t_first = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = C.gptq_quantize_matrix(W * 1.01, H, bits=4)
        np.asarray(res.w[0, 0])
        t_steady = time.perf_counter() - t0

        blocks = -(-n // 128)
        print(f"{name:24s} blocks={blocks:4d}  first(compile+run)={t_first:7.2f}s"
              f"  steady={t_steady:7.2f}s  compile~={t_first - t_steady:6.2f}s"
              f"  fallback={bool(res.used_fallback)}")


if __name__ == "__main__":
    main()
