"""Pure, jittable quantization primitives.

TPU-native rebuild of the reference primitives (ref: fake_quant/quant_utils.py:16-94:
``get_minq_maxq``, ``sym_quant``/``sym_dequant``, ``asym_quant``/``asym_dequant``,
``pack_i4``/``unpack_i4``). Everything here is a pure function of arrays — no modules,
no hooks — so the whole quantization pipeline composes under ``jax.jit``/``pjit``.

Conventions:
  * ``scale``/``zero_point`` are arrays broadcastable against the tensor being
    quantized (scalar for per-tensor, shape (C, 1) for per-out-channel weights,
    shape (..., T, 1) for per-token activations).
  * Quantized values are stored in the format's narrowest storage dtype; int4 is
    stored 2-nibbles-per-int8 via :func:`pack_int4`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .formats import IntFormat, get_format


class QuantParams(NamedTuple):
    """Static quantization parameters for one tensor site.

    A NamedTuple so it is automatically a pytree (scale / zero_point are leaves)
    and can be carried in checkpointable state. ``zero_point`` is ``None`` for
    symmetric quantization.
    """

    scale: jax.Array
    zero_point: Optional[jax.Array] = None


# ---------------------------------------------------------------------------
# scale computation from ranges
# ---------------------------------------------------------------------------


def scales_from_minmax(
    xmin: jax.Array,
    xmax: jax.Array,
    fmt: IntFormat,
    symmetric: bool = True,
    eps: float = 1e-8,
) -> QuantParams:
    """Turn (min, max) statistics into (scale, zero_point).

    Equivalent role to the reference observers' ``get_quantization_params``
    (ref: fake_quant/observer/minmax.py:30-52): symmetric uses max(|min|,|max|)
    against the signed bound; asymmetric spans [min, max] with a zero point.
    Ranges are clamped to include 0 so that zero is exactly representable.
    """
    xmin = jnp.minimum(xmin, 0.0).astype(jnp.float32)
    xmax = jnp.maximum(xmax, 0.0).astype(jnp.float32)
    if symmetric:
        amax = jnp.maximum(jnp.abs(xmin), jnp.abs(xmax))
        scale = jnp.maximum(amax / fmt.qmax, eps)
        return QuantParams(scale=scale, zero_point=None)
    scale = jnp.maximum((xmax - xmin) / (fmt.qmax - fmt.qmin), eps)
    zero_point = jnp.clip(jnp.round(fmt.qmin - xmin / scale), fmt.qmin, fmt.qmax)
    return QuantParams(scale=scale, zero_point=zero_point)


# ---------------------------------------------------------------------------
# quantize / dequantize
# ---------------------------------------------------------------------------


def quantize(x: jax.Array, qp: QuantParams, fmt: IntFormat) -> jax.Array:
    """Quantize to integers in the format's storage dtype (no dequant)."""
    inv = 1.0 / qp.scale
    q = jnp.round(x.astype(jnp.float32) * inv)
    if qp.zero_point is not None:
        q = q + qp.zero_point
    q = jnp.clip(q, fmt.qmin, fmt.qmax)
    return q.astype(fmt.storage_dtype)


def dequantize(q: jax.Array, qp: QuantParams, out_dtype=jnp.float32) -> jax.Array:
    qf = q.astype(jnp.float32)
    if qp.zero_point is not None:
        qf = qf - qp.zero_point
    return (qf * qp.scale).astype(out_dtype)


def fake_quantize(x: jax.Array, qp: QuantParams, fmt: IntFormat) -> jax.Array:
    """quantize → dequantize, preserving input dtype (the reference's fake-quant
    forward, ref: fake_quant/quantizer/base.py:44-50)."""
    return dequantize(quantize(x, qp, fmt), qp, out_dtype=x.dtype)


# ---------------------------------------------------------------------------
# dynamic (find-params-per-call) quantization
# ---------------------------------------------------------------------------


def dynamic_qparams(
    x: jax.Array,
    fmt: IntFormat,
    axis=None,
    symmetric: bool = True,
    clip_ratio: float = 1.0,
) -> QuantParams:
    """Compute per-call quantization params.

    ``axis=None`` → per-tensor; ``axis=-1`` with keepdims → per-token for
    activations shaped (..., T, C); the caller chooses the reduction axes.
    Mirrors the reference's dynamic ``ActQuantizer.find_params``
    (ref: fake_quant/quant_utils.py:205-268) incl. the ``clip_ratio`` shrink.
    """
    xf = x.astype(jnp.float32)
    if axis is None:
        xmin = jnp.min(xf)
        xmax = jnp.max(xf)
    else:
        xmin = jnp.min(xf, axis=axis, keepdims=True)
        xmax = jnp.max(xf, axis=axis, keepdims=True)
    return scales_from_minmax(xmin * clip_ratio, xmax * clip_ratio, fmt, symmetric)


def dynamic_fake_quant(
    x: jax.Array,
    bits: int = 8,
    per_token: bool = True,
    symmetric: bool = True,
    clip_ratio: float = 1.0,
    groupsize: Optional[int] = None,
) -> jax.Array:
    """One-shot dynamic fake quantization of an activation tensor (..., T, C).

    ``groupsize`` quantizes per token AND per ``groupsize``-channel group
    (ref: fake_quant/quant_utils.py:181-203
    ``find_params_per_token_groupwise`` via --a_groupsize): the channel axis
    is viewed as (C/g, g) and each (token, group) gets its own scale."""
    fmt = get_format(bits, signed=symmetric)
    if groupsize is not None and groupsize > 0:
        C = x.shape[-1]
        assert C % groupsize == 0, (C, groupsize)
        xg = x.reshape(*x.shape[:-1], C // groupsize, groupsize)
        qp = dynamic_qparams(xg, fmt, axis=-1, symmetric=symmetric,
                             clip_ratio=clip_ratio)
        return fake_quantize(xg, qp, fmt).reshape(x.shape)
    axis = -1 if per_token else None
    qp = dynamic_qparams(x, fmt, axis=axis, symmetric=symmetric, clip_ratio=clip_ratio)
    return fake_quantize(x, qp, fmt)


def log2_fake_quant(x: jax.Array, bits: int = 4) -> jax.Array:
    """Log2 fake quantization for softmax outputs.

    Rounds ``-log2(x)`` to an integer exponent, clips to ``[0, 2^bits - 1]`` and
    zeroes values that underflow the representable range
    (ref: fake_quant/quantizer/log2.py:17-26). Library capability kept for
    parity; the shipped reference pipelines never select it either.
    """
    xf = x.astype(jnp.float32)
    rounds = jnp.round(-jnp.log2(jnp.maximum(xf, 1e-38)))
    mask = rounds >= 2**bits
    rounds = jnp.clip(rounds, 0, 2**bits - 1)
    out = jnp.where(mask, 0.0, 2.0 ** (-rounds))
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# groupwise helpers
# ---------------------------------------------------------------------------


def groupwise_fake_quant(
    x: jax.Array, bits: int, group_size: int, symmetric: bool = True
) -> jax.Array:
    """Fake-quantize with scales per contiguous group along the last axis.

    Capability parity with the reference's groupwise path
    (ref: fake_quant/quant_utils.py:181-203 ``find_params_weight_groupwise``).
    """
    fmt = get_format(bits, signed=symmetric)
    *lead, C = x.shape
    assert C % group_size == 0, f"dim {C} not divisible by group {group_size}"
    xg = x.reshape(*lead, C // group_size, group_size)
    qp = dynamic_qparams(xg, fmt, axis=-1, symmetric=symmetric)
    return fake_quantize(xg, qp, fmt).reshape(x.shape)


# ---------------------------------------------------------------------------
# int4 packing (2 nibbles per int8 byte)
# ---------------------------------------------------------------------------


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack signed int4 values (int8 storage, range [-8, 7]) into int8 bytes.

    Adjacent pairs along the last axis share a byte: low nibble = even index,
    high nibble = odd index. Capability parity with ``pack_i4``
    (ref: fake_quant/quant_utils.py:61-69) but vectorized along the last axis —
    the layout the W4A8 Pallas kernel unpacks in VMEM.
    """
    assert q.shape[-1] % 2 == 0, "last dim must be even to pack int4 pairs"
    lo = q[..., 0::2].astype(jnp.uint8) & 0x0F
    hi = q[..., 1::2].astype(jnp.uint8) & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4`; returns sign-extended int8 values."""
    p = packed.astype(jnp.uint8)
    lo = (p & 0x0F).astype(jnp.int8)
    hi = ((p >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend nibbles: values >= 8 represent negatives
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


# ---------------------------------------------------------------------------
# weight quantization with optional MSE clip search
# ---------------------------------------------------------------------------


def weight_qparams(
    w: jax.Array,
    fmt: IntFormat,
    per_channel: bool = True,
    symmetric: bool = True,
    mse_clip: bool = False,
    clip_grid: int = 80,
    max_shrink: float = 0.8,
    norm: float = 2.4,
    reduce_axes=None,
) -> QuantParams:
    """Quantization params for a weight laid out (..., in_features, out_features).

    ``per_channel`` = one scale per OUTPUT channel: reduces every axis except the
    last (pass ``reduce_axes=(-2,)`` for stacked-layer weights (L, in, out) so
    each layer keeps its own scales). With ``mse_clip`` this runs the reference
    ``WeightQuantizer.find_params`` MSE grid search over shrink ratios
    (ref: fake_quant/quant_utils.py:446-509: grid 100, maxshrink 0.8, p-norm 2.4
    → 80 candidate shrinks {1 - i/100, i < 80}; our (clip_grid=80, max_shrink=0.8)
    samples exactly the same points: 1 - i·max_shrink/clip_grid)
    — vectorized over the whole grid with ``vmap`` instead of a Python loop so it
    stays one fused XLA computation.
    """
    wf = w.astype(jnp.float32)
    if reduce_axes is not None:
        axis = tuple(reduce_axes)
    else:
        axis = tuple(range(wf.ndim - 1)) if per_channel else None
    if axis is None:
        xmin = jnp.min(wf)
        xmax = jnp.max(wf)
    else:
        xmin = jnp.min(wf, axis=axis, keepdims=True)
        xmax = jnp.max(wf, axis=axis, keepdims=True)

    if not mse_clip:
        return scales_from_minmax(xmin, xmax, fmt, symmetric)

    shrinks = 1.0 - jnp.arange(clip_grid, dtype=jnp.float32) / clip_grid * max_shrink

    def err_for(shrink):
        qp = scales_from_minmax(xmin * shrink, xmax * shrink, fmt, symmetric)
        wq = fake_quantize(wf, qp, fmt)
        e = jnp.abs(wq - wf) ** norm
        if axis is None:
            return jnp.sum(e)
        return jnp.sum(e, axis=axis, keepdims=True)

    errs = jax.vmap(err_for)(shrinks)  # (grid, ...) per-channel errors
    best = jnp.argmin(errs, axis=0)  # (...,) best shrink index per channel
    best_shrink = shrinks[best]
    return scales_from_minmax(xmin * best_shrink, xmax * best_shrink, fmt, symmetric)


def rtn_quantize_weight(
    w: jax.Array,
    bits: int,
    per_channel: bool = True,
    symmetric: bool = True,
    mse_clip: bool = False,
    reduce_axes=None,
) -> tuple[jax.Array, QuantParams]:
    """Round-to-nearest weight quantization → (int values, params)."""
    fmt = get_format(bits, signed=symmetric)
    qp = weight_qparams(w, fmt, per_channel=per_channel, symmetric=symmetric,
                        mse_clip=mse_clip, reduce_axes=reduce_axes)
    return quantize(w, qp, fmt), qp


def rtn_fake_quant_weight(
    w: jax.Array,
    bits: int,
    per_channel: bool = True,
    symmetric: bool = True,
    mse_clip: bool = False,
    reduce_axes=None,
) -> jax.Array:
    """Offline fake-quantize a weight in place (the "fake" serving mode)."""
    fmt = get_format(bits, signed=symmetric)
    qp = weight_qparams(w, fmt, per_channel=per_channel, symmetric=symmetric,
                        mse_clip=mse_clip, reduce_axes=reduce_axes)
    return fake_quantize(w, qp, fmt)
