"""Isolated per-call cost of one down_proj GEMV: XLA int8 fused-convert dot
vs the Pallas SWAR packed kernel — chained inside one jit with a null-chain
calibration (gemv_bench pattern). Answers: where do the packed savings go?"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.kernels.qmm import _qmm_pallas_w4

K, N = 18944, 3584
CHAIN = 64
key = jax.random.key(0)


def bench(label, step_fn, *weights):
    @jax.jit
    def f(x, *ws):
        def body(i, x):
            y = step_fn(x, *ws)  # (1, N) bf16
            # fold a hair of y back into x (serialize); x stays (1, K) int8
            return (x + (y[:, :1] > 0).astype(jnp.int8))

        return jax.lax.fori_loop(0, CHAIN, body, x)

    xs = [jnp.asarray(np.random.default_rng(7 + i).integers(
        -127, 128, size=(1, K)), jnp.int8) for i in range(5)]
    r = f(xs[0], *weights)
    _ = np.asarray(r[0, 0])  # _force
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        r = f(x, *weights)
        _ = np.asarray(r[0, 0])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / CHAIN
    print(f"{label}: {dt*1e6:7.1f} us/call", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    wq = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    w8 = jnp.asarray(wq)
    lo = (wq[: K // 2].astype(np.uint8)) & 0x0F
    hi = (wq[K // 2 :].astype(np.uint8)) & 0x0F
    packed = jnp.asarray((lo | (hi << 4)).astype(np.int8))
    ws = jnp.asarray(rng.random(N).astype(np.float32) * 0.01)
    print(f"backend: {jax.default_backend()}  down GEMV {K}x{N}  "
          f"int8 {K*N/1e6:.0f} MB  packed {K*N/2/1e6:.0f} MB")

    # null: no weight read — measures chain/feedback overhead
    def null_step(x):
        return (x[:, :N].astype(jnp.bfloat16) * 2.0)

    null = bench("null chain          ", null_step)

    def xla_step(x, w):
        acc = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return (acc * ws).astype(jnp.bfloat16)

    t8 = bench("XLA int8 conv-dot   ", xla_step, w8)

    os.environ["MQUANT_W4_TK"] = "4736"
    os.environ["MQUANT_W4_TN"] = "512"

    def pallas_step(x, wp):
        p = {"w_q": wp, "w_scale": ws}
        return _qmm_pallas_w4(x, jnp.float32(0.02), p, jnp.bfloat16)

    tp = bench("Pallas SWAR packed  ", pallas_step, packed)

    bw8 = K * N / (t8 - null) / 1e9
    bwp = K * N / 2 / (tp - null) / 1e9
    print(f"net-of-null: int8 {1e6*(t8-null):.1f} us ({bw8:.0f} GB/s) | "
          f"packed {1e6*(tp-null):.1f} us ({bwp:.0f} GB/s on packed bytes)")


if __name__ == "__main__":
    main()
