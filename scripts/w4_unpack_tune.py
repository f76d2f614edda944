"""Packed-W4 decode GEMV: nibble-unpack strategy shootout on the real chip.

Decode streams ~7 GB of int8-stored W4 weights per step at ~92% of HBM peak —
the only remaining decode lever is halving the bytes (split-half nibble
packing). The parked Pallas kernel lost because its unpack
(`_decode_nibbles_i32`: i8->i32, masks, divide, two selects) costs ~10 VPU ops
per byte. Arithmetic shifts cost 3. This measures, at the 7B down_proj GEMV
shape over L distinct stacked layers (the model's actual streaming pattern):

  A   : int8 storage, XLA fused-convert bf16 dot      (current default)
  A4  : native-S4 storage, XLA fused-convert bf16 dot (s4_squeeze path)
  P0  : packed bytes, s8 MXU dot on the PACKED matrix (no unpack — perf bound,
        wrong math; isolates DMA+MXU cost of the packed stream)
  P1  : packed bytes, i32 mask/where unpack + 2 s8 dots (parked kernel)
  P2  : packed bytes, int8 arithmetic-shift unpack   + 2 s8 dots
  P3  : packed bytes, i32 shift unpack               + 2 s8 dots

Timing: R repeats x L layers inside ONE jit; per-layer time from the
difference between two repeat counts (cancels the axon tunnel's per-call
RTT); a fresh x per timed call defeats the tunnel's result memoization.

Run: python scripts/w4_unpack_tune.py  (on the TPU)
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 8          # distinct stacked layers (model streams distinct weights)
K, N = 18944, 3584   # down_proj
M = 8          # GEMV rows (padded batch 1)
TN = 3584      # N tile (full N; K is the streamed grid dim)
TK = 512       # K2 tile: multiple of 128 dividing 9472 (=128*74) -> 128*4
R1, R2 = 36, 68  # both large (small-R calls hit an async-wait artifact)


def unpack_i32(pb):
    """Parked-kernel decode: masks + floor-div + selects."""
    u = pb.astype(jnp.int32) & 0xFF
    lo = u & 0x0F
    hi = (u // 16) & 0x0F
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def unpack_shift8(pb):
    """int8 arithmetic shifts (sign extension for free)."""
    hi = jax.lax.shift_right_arithmetic(pb, jnp.int8(4))
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(pb, jnp.int8(4)), jnp.int8(4))
    return lo, hi


def unpack_shift32(pb):
    p = pb.astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(p, 4).astype(jnp.int8)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, 28), 28).astype(jnp.int8)
    return lo, hi


def make_w4_kernel(unpack):
    def kern(xlo_ref, xhi_ref, wq_ref, o_ref, acc_ref, *, n_k):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lo, hi = unpack(wq_ref[:])
        dn = (((1,), (0,)), ((), ()))
        acc_ref[:] += jax.lax.dot_general(xlo_ref[:], lo, dn,
                                          preferred_element_type=jnp.int32)
        acc_ref[:] += jax.lax.dot_general(xhi_ref[:], hi, dn,
                                          preferred_element_type=jnp.int32)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return kern


def packed_dot_kernel(xlo_ref, xhi_ref, wq_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(xlo_ref[:], wq_ref[:], dn,
                                      preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


def pallas_gemv(kern, xq, wq_packed, tn=TN, tk=TK):
    K2 = wq_packed.shape[0]
    n_k = K2 // tk
    xlo = xq[:, :K2]
    xhi = xq[:, K2:]
    return pl.pallas_call(
        functools.partial(kern, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        grid=(N // tn, n_k),
        in_specs=[
            pl.BlockSpec((M, tk), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, tk), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=2 * M * K2 * 2 * N,
                                      bytes_accessed=K2 * N + M * K2 * 2,
                                      transcendentals=0),
    )(xlo, xhi, wq_packed)


def make_run(fn_one, repeats):
    """repeats x (scan over L layers), serialized via a cheap feedback the
    compiler cannot shrink (pallas internals are opaque; the XLA variants
    consume y through a non-factorable |y| reduce)."""

    @jax.jit
    def run(xq, W):
        def rep(x, _):
            def body(x, w):
                y = fn_one(x, w)  # (M, N) int32
                s = jnp.sum(jnp.abs(y.astype(jnp.float32)))
                x = x + (s.astype(jnp.int32) & 1).astype(jnp.int8)
                return x, None

            x, _ = jax.lax.scan(body, x, W)
            return x, None

        x, _ = jax.lax.scan(rep, xq, None, length=repeats)
        return x

    return run


def measure_per_layer(fn_one, W, seed=0):
    rng = np.random.default_rng(seed)
    runs = {r: make_run(fn_one, r) for r in (R1, R2)}
    best = {}
    for r, jfn in runs.items():
        x0 = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
        jax.block_until_ready(jfn(x0, W))  # compile
        ts = []
        for i in range(5):
            x = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(x, W))
            ts.append(time.perf_counter() - t0)
        best[r] = min(ts)
    return (best[R2] - best[R1]) / ((R2 - R1) * L)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  K={K} N={N} L={L} M={M} "
          f"TK={TK} R={R1}->{R2}")
    wq = rng.integers(-8, 8, size=(L, K, N)).astype(np.int8)
    lo = (wq[:, : K // 2].astype(np.uint8)) & 0x0F
    hi = (wq[:, K // 2 :].astype(np.uint8)) & 0x0F
    packed = jnp.asarray((lo | (hi << 4)).astype(np.int8))
    w8 = jnp.asarray(wq)

    gb_packed = K * N / 2 / 1e9
    gb_int8 = K * N / 1e9

    def xla_bf16_dot(x, w):
        acc = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return acc.astype(jnp.int32)

    t = measure_per_layer(xla_bf16_dot, w8)
    print(f"A  int8+XLA bf16 dot : {t*1e6:7.1f} us/layer "
          f"({gb_int8/t:6.0f} GB/s on its int8 bytes)")

    def xla_s4(x, w):
        w4 = jax.lax.optimization_barrier(w.astype(jnp.int4))
        acc = jnp.dot(x.astype(jnp.bfloat16), w4.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return acc.astype(jnp.int32)

    t = measure_per_layer(xla_s4, w8)
    print(f"A4 s4+XLA bf16 dot   : {t*1e6:7.1f} us/layer "
          f"({gb_packed/t:6.0f} GB/s on its s4 bytes)")

    variants = [
        ("P0 packed-dot bound ", packed_dot_kernel),
        ("P1 i32 mask/where   ", make_w4_kernel(unpack_i32)),
        ("P2 int8 arith shifts", make_w4_kernel(unpack_shift8)),
        ("P3 i32 shifts       ", make_w4_kernel(unpack_shift32)),
    ]
    for name, kern in variants:
        try:
            t = measure_per_layer(
                lambda x, w, kern=kern: pallas_gemv(kern, x, w), packed)
            print(f"{name}: {t*1e6:7.1f} us/layer "
                  f"({gb_packed/t:6.0f} GB/s on packed bytes)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
