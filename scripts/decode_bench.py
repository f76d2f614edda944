"""Decode-shape (GEMV) benchmark for one big site: bf16 vs W4 pallas vs W4 XLA.
Chained in one jit; fetch-forced timing."""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.core.quant import QuantParams
from mquant_tpu.kernels import qmm as KQ
from mquant_tpu.models.layers import SiteSpec

M = int(os.environ.get("BM", "1"))
K, N = 3584, 19968
CHAIN = 16
key = jax.random.key(0)
back = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.01


def bench(label, step_fn, p):
    @jax.jit
    def f(p, x):
        def body(i, x):
            y = step_fn(p, x)
            return jnp.dot(y.astype(jnp.bfloat16), back,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, CHAIN, body, x)

    xs = [jax.random.normal(jax.random.fold_in(key, 7 + i), (M, K), jnp.bfloat16)
          for i in range(4)]
    try:
        r = f(p, xs[0])
        _ = np.asarray(r[:1, :1])
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
        return
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        r = f(p, x)
        _ = np.asarray(r[:1, :1])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / CHAIN
    gbs = (K * N / 2) / dt / 1e9  # packed weight bytes per matmul
    print(f"{label}: {dt*1e3:.3f} ms/step ({gbs:.0f} GB/s weight-stream)", flush=True)


if __name__ == "__main__":
    w_bf = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
    bench("bf16", lambda p, x: x @ p["w"], {"w": w_bf})

    spec4 = SiteSpec(w_bits=4, a_bits=8, a_static=True)
    st = {"act": QuantParams(scale=jnp.float32(0.05))}
    p4 = dict(KQ.quantize_weights_real(w_bf.astype(jnp.float32), 4))
    bench("w4a8 pallas", lambda p, x: KQ.quantized_matmul(x, p, spec4, st), p4)
    os.environ["MQUANT_DISABLE_PALLAS"] = "1"
    bench("w4a8 xla", lambda p, x: KQ.quantized_matmul(x, p, spec4, st), p4)
    os.environ.pop("MQUANT_DISABLE_PALLAS")
    p8 = dict(KQ.quantize_weights_real(w_bf.astype(jnp.float32), 8))
    spec8 = SiteSpec(w_bits=8, a_bits=8, a_static=True)
    bench("w8a8 xla", lambda p, x: KQ.quantized_matmul(x, p, spec8, st), p8)
