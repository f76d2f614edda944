"""Online fast Hadamard transform — the hot rotation on the serving path.

TPU-native replacement for the reference's external CUDA kernel
(``fast_hadamard_transform``, ref: docs/install.md:10-16; call sites
fake_quant/quant_utils.py:334-365 and hadamard_utils.py:115-128). Runs before
every MLP down-projection at inference time.

Design: on TPU the O(n log n) VPU butterfly is the WRONG shape — log2(n)
sequential add/sub passes are layout-hostile (Mosaic rejects the rank-4
reshapes) and leave the MXU idle. Instead we use the Kronecker two-matmul
factorization (the HadaCore/tensor-core formulation): with n = K·m,

    y = (hadK ⊗ H_m) x   ==   hadK @ (X · H_m),  X = x viewed (K, m)

two small dense matmuls that run at MXU throughput and fuse with the
surrounding quantize ops under XLA. For power-of-two n, n = a·b with a,b ≈ √n
(H_n = H_a ⊗ H_b by the Sylvester construction). FLOP count rises from
n·log2(n) adds to n·(K+m) MACs, but MXU int8/bf16 throughput makes it faster
in wall-clock — and it needs no custom kernel to hit peak.

``fwht_pallas`` keeps an explicit VMEM-resident Pallas version of the same
two-matmul form (future base for the fused hadamard→int8-quantize→GEMM
megakernel).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..transform import hadamard as H


def _pow2_split(n: int) -> tuple[int, int]:
    """n = a*b, both pow2, b >= a, b >= 128 when possible (lane-aligned)."""
    p = n.bit_length() - 1
    bp = max(p - p // 2, min(7, p))
    b = 1 << bp
    return n // b, b


@functools.lru_cache(maxsize=None)
def _factors(n: int):
    """numpy (A, B, K) for the two-matmul form: x (…, K, m) → A-over-K, B-over-m.
    A = hadK (orthonormal), B = H_m/√m; for pow2 n, K axis further split a·b."""
    hadK, K = H.get_hadK(n)
    m = n // K
    if K > 1:
        Hm = H.hadamard_matrix(m) / math.sqrt(m)
        return (np.asarray(hadK, np.float32), np.asarray(Hm, np.float32), K)
    a, b = _pow2_split(n)
    Ha = H.hadamard_matrix(a) / math.sqrt(a)
    Hb = H.hadamard_matrix(b) / math.sqrt(b)
    return (np.asarray(Ha, np.float32), np.asarray(Hb, np.float32), a)


def online_hadamard(x: jax.Array) -> jax.Array:
    """Orthonormal Hadamard transform along the last axis (n = K·2^p).

    Matches :func:`mquant_tpu.transform.hadamard.transform_matrix` exactly
    (y = x @ Mᵀ), so offline-folded weights + this online op are
    function-preserving. Implemented as two MXU matmuls (see module docstring).
    """
    n = x.shape[-1]
    A_np, B_np, K = _factors(n)
    m = n // K
    # bf16 inputs run bf16 MXU matmuls with f32 accumulation — the transform
    # feeds an int8 quantizer, so bf16 operand precision is immaterial, and the
    # matmuls run at full MXU rate instead of the f32 (1/4-rate) path.
    dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32, jnp.float64) else jnp.float32
    A = jnp.asarray(A_np, dt)
    B = jnp.asarray(B_np, dt)
    xr = x.astype(dt).reshape(*x.shape[:-1], K, m)
    # over the minor axis: both factor matrices are applied as y_i = Σ_j M[i,j] x_j;
    # B (pow2 Sylvester) is symmetric so xr @ B == B-transform over m.
    t = jnp.einsum("...km,mj->...kj", xr, B,
                   preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum("kl,...lm->...km", A, t,
                     preferred_element_type=jnp.float32)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel (same two-matmul form, VMEM-resident)
# ---------------------------------------------------------------------------


def _fwht_kernel(x_ref, a_ref, b_ref, o_ref, *, K: int, m: int):
    t = x_ref.shape[0]
    xv = x_ref[:].astype(jnp.float32)  # (T, n)
    xv = xv.reshape(t * K, m)
    xv = jax.lax.dot_general(  # over the minor axis (B symmetric)
        xv, b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xv = xv.reshape(t, K, m)
    xv = jax.lax.dot_general(  # over the K axis, batched over T
        a_ref[:], xv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (K, T, m)
    xv = jnp.swapaxes(xv, 0, 1)
    o_ref[:] = xv.reshape(t, K * m).astype(o_ref.dtype)


def fwht_pallas(x: jax.Array, tile_t: int = 128, interpret: bool = False) -> jax.Array:
    """Pallas two-matmul Hadamard over the last axis; x: (..., n)."""
    n = x.shape[-1]
    A_np, B_np, K = _factors(n)
    m = n // K
    lead = x.shape[:-1]
    tokens = int(math.prod(lead)) if lead else 1
    x2 = x.reshape(tokens, n)
    T = min(tile_t, max(8, tokens))
    pad = (-tokens) % T
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fwht_kernel, K=K, m=m),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(x2.shape[0] // T,),
        in_specs=[
            pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, jnp.asarray(A_np), jnp.asarray(B_np))
    if pad:
        out = out[:tokens]
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# fused hadamard → static int8 quantize (one VMEM pass; swiglu left to XLA,
# which fuses it into the gate/up GEMM epilogue — and whose transcendental
# (sigmoid) is exactly what made the fully-fused tail kernel lose)
# ---------------------------------------------------------------------------


def _had_quant_kernel(x_ref, a_ref, b_ref, s_ref, o_ref, *, K: int, m: int,
                      qmin: int, qmax: int):
    t = x_ref.shape[0]
    xv = x_ref[:].astype(jnp.bfloat16).reshape(t * K, m)
    xv = jax.lax.dot_general(  # minor-axis factor (B symmetric)
        xv, b_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    xv = xv.reshape(t, K, m)
    xv = jax.lax.dot_general(  # K-axis factor, batched over T
        a_ref[:].astype(jnp.bfloat16), xv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (K, T, m)
    had = jnp.swapaxes(xv, 0, 1).reshape(t, K * m)
    inv = 1.0 / s_ref[0, 0]
    q = jnp.clip(jnp.round(had * inv), qmin, qmax)
    o_ref[:] = q.astype(jnp.int8)


def had_quant(x: jax.Array, scale: jax.Array, qmin: int = -128,
              qmax: int = 127, tile_t: int = 256,
              interpret: bool = False) -> jax.Array:
    """Orthonormal Hadamard (two-matmul Kronecker form) → static per-tensor
    int8 quantize, in one Pallas VMEM pass: read bf16 once, write int8 once —
    vs ≈4 HBM passes for the composable chain. x: (..., n); scale scalar.

    MEASURED (v5e, T=1024, n=18944, chain-64): swiglu→had_quant→down chain
    1.472 ms vs 1.349 ms for the unfused XLA chain — XLA's own fusion already
    removes the intermediate HBM passes, so this kernel LOSES 0.12 ms and is
    NOT wired into the serving path. Kept as the measured record for the
    megakernel experiment (scripts/prefill_probe.py)."""
    n = x.shape[-1]
    A_np, B_np, K = _factors(n)
    m = n // K
    lead = x.shape[:-1]
    tokens = int(math.prod(lead)) if lead else 1
    x2 = x.reshape(tokens, n)
    T = min(tile_t, max(8, tokens))
    pad = (-tokens) % T
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    s2 = jnp.asarray(scale, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_had_quant_kernel, K=K, m=m, qmin=qmin, qmax=qmax),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int8),
        grid=(x2.shape[0] // T,),
        in_specs=[
            pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(x2, jnp.asarray(A_np), jnp.asarray(B_np), s2)
    if pad:
        out = out[:tokens]
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# fused rmsnorm → static int8 quantize (one VMEM pass)
# ---------------------------------------------------------------------------


def _rms_quant_kernel(x_ref, w_ref, s_ref, o_ref, *, eps: float,
                      qmin: int, qmax: int):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    inv = 1.0 / s_ref[0, 0]
    q = jnp.clip(jnp.round(y * inv), qmin, qmax)
    o_ref[:] = q.astype(jnp.int8)


def rms_norm_quant(x: jax.Array, w: jax.Array, scale: jax.Array,
                   eps: float = 1e-6, qmin: int = -128, qmax: int = 127,
                   tile_t: int = 256, interpret: bool = False) -> jax.Array:
    """RMSNorm → static per-tensor int8 quantize in one Pallas VMEM pass
    (read bf16 once, write int8 once). Same math as
    quantize(rms_norm(x, w), scale): f32 mean/rsqrt accumulation.

    MEASURED (v5e, T=1024, n=3584, chain-64): fused 0.489 ms vs 0.467 ms
    unfused — the XLA chain is already fusion-optimal here (int8 output write
    is the only HBM traffic), so this kernel LOSES 0.02 ms and is NOT wired
    into the serving path. Kept as the measured record."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    tokens = int(math.prod(lead)) if lead else 1
    x2 = x.reshape(tokens, n)
    T = min(tile_t, max(8, tokens))
    pad = (-tokens) % T
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    s2 = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    w2 = w.reshape(1, n)

    out = pl.pallas_call(
        functools.partial(_rms_quant_kernel, eps=eps, qmin=qmin, qmax=qmax),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int8),
        grid=(x2.shape[0] // T,),
        in_specs=[
            pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, w2, s2)
    if pad:
        out = out[:tokens]
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# fused MLP tail: swiglu → hadamard → static int8 quantize (one VMEM pass)
# ---------------------------------------------------------------------------


def _tail_kernel(g_ref, u_ref, a_ref, b_ref, s_ref, o_ref, *, K: int, m: int,
                 qmin: int, qmax: int):
    # intermediates kept bf16 (same as the unfused online_hadamard chain) to
    # stay inside the Mosaic scoped-VMEM budget; accumulation is f32
    t = g_ref.shape[0]
    g = g_ref[:].astype(jnp.float32)
    x = ((g * jax.nn.sigmoid(g)) * u_ref[:].astype(jnp.float32)
         ).astype(jnp.bfloat16)  # swiglu (layers.swiglu)
    xv = x.reshape(t * K, m)
    xv = jax.lax.dot_general(  # minor-axis factor (B symmetric)
        xv, b_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    xv = xv.reshape(t, K, m)
    xv = jax.lax.dot_general(  # K-axis factor, batched over T
        a_ref[:].astype(jnp.bfloat16), xv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (K, T, m)
    had = jnp.swapaxes(xv, 0, 1).reshape(t, K * m)
    inv = 1.0 / s_ref[0, 0]
    q = jnp.clip(jnp.round(had * inv), qmin, qmax)
    o_ref[:] = q.astype(jnp.int8)


def fused_swiglu_had_quant(g: jax.Array, u: jax.Array, scale: jax.Array,
                           qmin: int = -128, qmax: int = 127,
                           tile_t: int = 128,
                           interpret: bool = False) -> jax.Array:
    """silu(g)·u → orthonormal Hadamard → static per-tensor int8, fused in one
    Pallas pass (g, u: (..., n); scale: scalar).

    The unfused chain materializes ≈8 HBM passes over the (T, 18944) tail
    (swiglu read×2/write, two Hadamard matmuls, quantize read/write) — ≈0.66
    ms/layer of the 7B W4A8 prefill. Fused: read g,u + write int8, with both
    Kronecker factors as VMEM-resident MXU dots. Bit-exact with
    quantize(online_hadamard(swiglu(g,u))) up to bf16 operand rounding that
    both paths share (same matmul precisions, same 1/scale rounding)."""
    n = g.shape[-1]
    A_np, B_np, K = _factors(n)
    m = n // K
    lead = g.shape[:-1]
    tokens = int(math.prod(lead)) if lead else 1
    g2 = g.reshape(tokens, n)
    u2 = u.reshape(tokens, n)
    T = min(tile_t, max(8, tokens))
    pad = (-tokens) % T
    if pad:
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
        u2 = jnp.pad(u2, ((0, pad), (0, 0)))
    s2 = jnp.asarray(scale, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_tail_kernel, K=K, m=m, qmin=qmin, qmax=qmax),
        out_shape=jax.ShapeDtypeStruct(g2.shape, jnp.int8),
        grid=(g2.shape[0] // T,),
        in_specs=[
            pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g2, u2, jnp.asarray(A_np), jnp.asarray(B_np), s2)
    if pad:
        out = out[:tokens]
    return out.reshape(*lead, n)
