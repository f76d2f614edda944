"""Single-resident W4 prefill A/B at 7B site shapes (M=1024): can a PACKED
(or native-S4) weight at rest serve prefill without losing to the int8-resident
XLA s8 GEMM? Variants:

  int8      — int8 resident, s8×s8 MXU dot (current serving default)
  unpack32  — packed resident, materialized unpack (mask/divide decode) + s8 dot
  unpackSh  — packed resident, materialized unpack (arithmetic-shift decode) + s8 dot
  twoGEMM   — packed resident, NO concat: x_lo@lo + x_hi@hi (two s8 dots on
              nibble planes; XLA may fuse the elementwise decode into each
              operand read since no concatenate blocks it)
  s4        — native-S4 resident, convert→s8 inside the dot operand

Chained fori_loop with weights as args; one scalar fetch per timing so the
tunnel RTT amortizes over CHAIN iterations. env: M (1024), CHAIN (8)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.kernels.qmm import _decode_nibbles_i32, _decode_nibbles_shift

M = int(os.environ.get("M", "1024"))
CHAIN = int(os.environ.get("CHAIN", "8"))
SHAPES = (("gate/up K=3584 N=19968", 3584, 19968),
          ("down K=18944 N=3584", 18944, 3584))


def timeit(f, x, w):
    r = f(x, w)
    _ = np.asarray(r).ravel()[0]
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        r = f(x + jnp.int8(i + 1), w)
        _ = np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / CHAIN


def chain(step):
    @jax.jit
    def f(x, w):
        def body(i, acc):
            y = step(x + i.astype(jnp.int8), w)
            return acc + y[0, :8].astype(jnp.float32)

        return jax.lax.fori_loop(0, CHAIN, body, jnp.zeros((8,), jnp.float32))

    return f


def main():
    key = jax.random.key(0)
    for label, K, N in SHAPES:
        k1, k2 = jax.random.split(jax.random.fold_in(key, K))
        x = jax.random.randint(k1, (M, K), -127, 128, jnp.int8)
        w8 = jax.random.randint(k2, (K, N), -7, 8, jnp.int8)
        half = K // 2
        wp = jax.jit(lambda w: ((w[:half].astype(jnp.uint8) & 0xF)
                                | (w[half:].astype(jnp.uint8) << 4))
                     .astype(jnp.int8))(w8)
        ws4 = jax.jit(lambda w: jax.lax.optimization_barrier(
            w.astype(jnp.int4)))(w8)

        def s8dot(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def v_int8(x, w):
            return s8dot(x, w)

        def v_unpack32(x, w):
            lo, hi = _decode_nibbles_i32(w)
            return s8dot(x, jnp.concatenate([lo, hi], 0).astype(jnp.int8))

        def v_unpacksh(x, w):
            lo, hi = _decode_nibbles_shift(w)
            return s8dot(x, jnp.concatenate([lo, hi], 0))

        def v_twogemm(x, w):
            lo, hi = _decode_nibbles_shift(w)
            return s8dot(x[:, :half], lo) + s8dot(x[:, half:], hi)

        def v_s4(x, w):
            return s8dot(x, w.astype(jnp.int8))

        rows = [("int8    ", v_int8, w8), ("unpack32", v_unpack32, wp),
                ("unpackSh", v_unpacksh, wp), ("twoGEMM ", v_twogemm, wp),
                ("s4      ", v_s4, ws4)]
        print(f"== {label} M={M}", flush=True)
        base = None
        for name, fn, w in rows:
            try:
                dt = timeit(chain(fn), x, w)
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                continue
            if base is None:
                base = dt
            print(f"  {name}: {dt*1e3:8.3f} ms  ({dt/base*100:5.1f}% of int8)",
                  flush=True)


if __name__ == "__main__":
    main()
