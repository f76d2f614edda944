"""Real integer quantized matmul for the serving path (W8A8 / W4A8).

The reference only fake-quantizes (quant→dequant in fp; real int GEMMs never
execute — ref: SURVEY §3.4; the int4 pack/unpack primitives at
fake_quant/quant_utils.py:61-94 are unused by its pipelines). This module is
where the TPU rebuild goes beyond the reference: actual INT8×INT8 MXU GEMMs with
int32 accumulation and a fused dequant epilogue.

Weight storage in the params pytree (produced by ``quantize_weights_real``):
  * ``w_q``      int8 (in, out) — W8, or int4 values packed 2-per-byte along the
                 *input* axis for W4 (shape (in/2, out)) with ``w_packed=True``
  * ``w_scale``  f32 (out,) per-output-channel symmetric scale
  * ``b``        fp bias (added by the caller)

Activation quantization (int8 symmetric) happens here so the whole
quantize→GEMM→dequant chain stays one fused XLA/Pallas computation:
  * static scale from calibrated QuantParams (per-tensor scalar), or
  * dynamic per-token scales.

Two implementations:
  * XLA path — ``lax.dot_general`` on int8 inputs hits the MXU natively and XLA
    fuses the quantize/dequant elementwise ops around it. Default.
  * Pallas path — unpacks int4 in VMEM (halving weight HBM traffic, the whole
    point of W4) and fuses the epilogue; used on TPU for packed weights.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import quant as Q
from ..core.formats import INT8


def _pallas_enabled() -> bool:
    import os

    return os.environ.get("MQUANT_DISABLE_PALLAS", "0") != "1"


def _act_int8(x: jax.Array, spec, site_state) -> tuple[jax.Array, jax.Array]:
    """Quantize activation to int8; returns (q: int8, scale broadcastable)."""
    if spec.a_static and site_state is not None and site_state.get("act") is not None:
        qp = site_state["act"]
        q = Q.quantize(x, qp, INT8)
        return q, qp.scale
    qp = Q.dynamic_qparams(x, INT8, axis=-1 if spec.a_per_token else None)
    return Q.quantize(x, qp, INT8), qp.scale


def unpack_int4_weights(p: Dict[str, Any]) -> jax.Array:
    """int4-packed (in/2, out) → int8 (in, out). Packing is along the INPUT axis
    (row i holds rows 2i, 2i+1) so unpacking interleaves rows."""
    packed = p["w_q"]
    pin, out = packed.shape
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8)
    hi = ((u >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    w = jnp.stack([lo, hi], axis=1).reshape(pin * 2, out)
    return w


def quantize_weights_real(w: jax.Array, bits: int, pack: bool = True) -> Dict[str, Any]:
    """Offline: fp weight (in, out) → real-int storage dict (per-out-channel sym
    scales). For W4, values are packed two-per-byte along the input axis."""
    wf = w.astype(jnp.float32)
    fmt = Q.get_format(bits, signed=True)
    amax = jnp.max(jnp.abs(wf), axis=0)  # per-out-channel
    scale = jnp.maximum(amax / fmt.qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[None, :]), fmt.qmin, fmt.qmax).astype(jnp.int8)
    out: Dict[str, Any] = {"w_scale": scale}
    if bits == 4 and pack:
        assert q.shape[0] % 2 == 0
        pin = q.shape[0] // 2
        pairs = q.reshape(pin, 2, q.shape[1])
        lo = pairs[:, 0].astype(jnp.uint8) & 0x0F
        hi = pairs[:, 1].astype(jnp.uint8) & 0x0F
        out["w_q"] = (lo | (hi << 4)).astype(jnp.int8)
    else:
        out["w_q"] = q
    return out  # caller records packing via the static "w_packed" entry


def quantized_matmul(
    x: jax.Array,
    p: Dict[str, Any],
    spec,
    site_state: Optional[Dict[str, Any]] = None,
    out_dtype=None,
) -> jax.Array:
    """y = dequant(int8(x) @ int_w) with fused scales. Bias NOT added here."""
    out_dtype = out_dtype or x.dtype
    xq, x_scale = _act_int8(x, spec, site_state)
    # packedness is inferred from static shapes: packed int4 stores in/2 rows
    packed = p["w_q"].shape[-2] * 2 == x.shape[-1]
    if packed and _pallas_enabled() and jax.default_backend() in ("tpu", "axon"):
        return _qmm_pallas_w4(xq, x_scale, p, out_dtype)
    w = unpack_int4_weights(p) if packed else p["w_q"]
    acc = jax.lax.dot_general(
        xq, w,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * p["w_scale"]
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas W4A8 kernel: unpack int4 in VMEM + int8 MXU GEMM + fused epilogue
# ---------------------------------------------------------------------------


def _qmm_w4_kernel(x_ref, wq_ref, xs_ref, ws_ref, o_ref, acc_ref, *, n_k: int):
    """Grid (M/TM, N/TN, K/TK). x: int8 (TM, TK); wq packed int8 (TK/2, TN).

    Unpacks the weight tile in VMEM (two int4 rows per byte row), runs the int8
    MXU GEMM with int32 accumulation in scratch, applies the per-token ×
    per-channel scale epilogue on the last K step.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # nibble unpack with int32 mask/div ops (Mosaic has no uint8 shrui)
    u = wq_ref[:].astype(jnp.int32) & 0xFF  # (TK/2, TN) in 0..255
    lo = u & 0x0F
    hi = (u // 16) & 0x0F
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    w = jnp.stack([lo, hi], axis=1).reshape(u.shape[0] * 2, u.shape[1])
    w = w.astype(jnp.int8)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        xs = xs_ref[:].astype(jnp.float32)  # (TM, 1) per-token scale
        ws = ws_ref[:].astype(jnp.float32)  # (1, TN) per-channel scale
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * xs * ws).astype(o_ref.dtype)


def _qmm_pallas_w4(xq: jax.Array, x_scale: jax.Array, p: Dict[str, Any], out_dtype,
                   tm: int = 256, tn: int = 256, tk: int = 512,
                   interpret: bool = False) -> jax.Array:
    lead = xq.shape[:-1]
    Kin = xq.shape[-1]
    x2 = xq.reshape(-1, Kin)
    M = x2.shape[0]
    N = p["w_q"].shape[1]
    # per-token scale column vector (M, 1)
    xs = jnp.broadcast_to(jnp.asarray(x_scale, jnp.float32), (*lead, 1) if lead else (1,))
    xs = xs.reshape(-1, 1)
    if xs.shape[0] != M:
        xs = jnp.broadcast_to(xs, (M, 1))
    ws = p["w_scale"].reshape(1, N).astype(jnp.float32)

    tm = min(tm, max(8, M))
    tn = min(tn, N)
    tk = min(tk, Kin)
    padm = (-M) % tm
    if padm:
        x2 = jnp.pad(x2, ((0, padm), (0, 0)))
        xs = jnp.pad(xs, ((0, padm), (0, 0)))
    Mp = x2.shape[0]
    assert Kin % tk == 0 and N % tn == 0, (Kin, tk, N, tn)
    n_k = Kin // tk

    out = pl.pallas_call(
        functools.partial(_qmm_w4_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(Mp // tm, N // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
    )(x2, p["w_q"], xs, ws)
    if padm:
        out = out[:M]
    return out.reshape(*lead, N)
