"""GEMV (M=1..8) kernel shootout with per-iteration-overhead calibration.
The axon runtime adds ~1.8ms per loop iteration; a null chain measures it so
real kernel costs = measured − null."""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("BM", "8"))
K, N = 3584, 19968
CHAIN = 16
key = jax.random.key(0)
back = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.01


def bench(label, step_fn, p, null=0.0):
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
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
        return None
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        r = f(p, x)
        _ = np.asarray(r[:1, :1])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / CHAIN
    real = dt - null
    print(f"{label}: {dt*1e3:.3f} ms/step (−null: {real*1e3:.3f} ms)", flush=True)
    return dt


def null_step(p, x):
    return jnp.broadcast_to(x[:, :1], (M, N)).astype(jnp.bfloat16)


def w8_bf16_gemv_pallas(x, w_q, w_scale, tn=2048):
    """int8 weights → bf16 convert in VMEM → bf16 dot (full-K per N tile)."""

    def kern(x_ref, w_ref, ws_ref, o_ref):
        wv = w_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(x_ref[:], wv, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (acc * ws_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    Mp = max(8, M)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if Mp != M else x
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xp.astype(jnp.bfloat16), w_q, w_scale)
    return out[:M]


if __name__ == "__main__":
    null = bench("null (overhead)", null_step, {}) or 0.0
    w_bf = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
    bench("bf16 gemv", lambda p, x: x @ p["w"], {"w": w_bf}, null)
    w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    ws = jnp.full((1, N), 0.01, jnp.float32)
    bench("int8 dot_general (int32 acc)",
          lambda p, x: (jax.lax.dot_general(
              jnp.clip(jnp.round(x / 0.05), -127, 127).astype(jnp.int8), p["w"],
              (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
              .astype(jnp.float32) * 0.05 * 0.01).astype(jnp.bfloat16),
          {"w": w8}, null)
    bench("int8→bf16 xla dot",
          lambda p, x: (jnp.dot(x.astype(jnp.bfloat16),
                                p["w"].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) * 0.01
                        ).astype(jnp.bfloat16),
          {"w": w8}, null)
    bench("int8→bf16 pallas gemv",
          lambda p, x: w8_bf16_gemv_pallas(x, p["w"], ws), {"w": w8}, null)
