"""Observers as functional reductions.

TPU-native rebuild of the reference observer stack (ref: fake_quant/observer/
{base,minmax,ema,percentile,omse,ptf}.py). The reference implements observers as
stateful hook objects mutated during forward passes; here an observer is a triple of
pure functions over a small stats pytree:

    stats  = init_stats(spec, channels)
    stats  = update(spec, stats, activation)      # folded over calibration batches
    qp     = finalize(spec, stats, fmt, sample)   # → QuantParams

``update`` composes under ``jax.jit`` (it is just min/max/EMA/quantile reductions),
so a whole-model calibration step is ONE compiled function returning a stats pytree —
the functional equivalent of the reference's ``calibrate`` phase, with ``finalize``
playing the role of ``last_calibrate`` (which in the reference receives the final
batch — hence the optional ``sample`` argument used by omse/ptf,
ref: fake_quant/observer/omse.py:31 / ptf.py:31).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.formats import IntFormat
from ..core.quant import QuantParams, scales_from_minmax

OBSERVER_KINDS = ("minmax", "ema", "percentile", "omse", "ptf")


@dataclasses.dataclass(frozen=True)
class ObserverSpec:
    """Static description of one observer site (jit-static, hashable)."""

    kind: str = "minmax"  # one of OBSERVER_KINDS
    per_channel: bool = False  # False → per-tensor ("layer_wise" in the reference)
    symmetric: bool = True
    ema_sigma: float = 0.01  # ref: observer/ema.py:10, percentile.py:16
    percentile_alpha: float = 0.99999  # ref: observer/percentile.py:17

    def __post_init__(self):
        if self.kind not in OBSERVER_KINDS:
            raise ValueError(f"unknown observer kind {self.kind!r}")
        if self.kind == "percentile" and self.per_channel:
            # ref: observer/percentile.py:30 "channel-wise needs too much time"
            raise ValueError("percentile observer is per-tensor only")


class ObserverStats(NamedTuple):
    """Running statistics — a pytree leaf bundle of fixed shape."""

    min: jax.Array  # scalar or (C,)
    max: jax.Array
    n: jax.Array  # int32 update counter (for first-update EMA semantics)


def init_stats(spec: ObserverSpec, channels: Optional[int] = None) -> ObserverStats:
    shape = (channels,) if (spec.per_channel and channels is not None) else ()
    return ObserverStats(
        min=jnp.zeros(shape, jnp.float32),
        max=jnp.zeros(shape, jnp.float32),
        n=jnp.zeros((), jnp.int32),
    )


def _reduce_minmax(spec: ObserverSpec, x: jax.Array, mask: Optional[jax.Array]):
    """Per-update (min, max) over all axes except the channel (last) axis.

    ``mask`` (broadcastable to x's leading axes, 1 = valid token) lets padded
    tokens from shape bucketing be excluded so padding never pollutes the
    calibration range — a TPU-specific need the reference does not have.
    """
    xf = x.astype(jnp.float32)
    if mask is not None:
        m = jnp.broadcast_to(mask[..., None], xf.shape).astype(bool)
        big = jnp.float32(jnp.finfo(jnp.float32).max)
        xmin_src = jnp.where(m, xf, big)
        xmax_src = jnp.where(m, xf, -big)
    else:
        xmin_src = xmax_src = xf
    if spec.per_channel:
        axes = tuple(range(xf.ndim - 1))
        return jnp.min(xmin_src, axis=axes), jnp.max(xmax_src, axis=axes)
    return jnp.min(xmin_src), jnp.max(xmax_src)


def update(
    spec: ObserverSpec,
    stats: ObserverStats,
    x: jax.Array,
    mask: Optional[jax.Array] = None,
) -> ObserverStats:
    """Fold one activation batch into the running stats (pure)."""
    if spec.kind == "percentile":
        xf = x.astype(jnp.float32).reshape(-1)
        if mask is not None:
            m = jnp.broadcast_to(mask[..., None], x.shape).reshape(-1).astype(bool)
            # replace padded entries with the batch median so quantiles are ~unbiased
            med = jnp.median(jnp.where(m, xf, 0.0))
            xf = jnp.where(m, xf, med)
        cur_max = jnp.quantile(xf, spec.percentile_alpha)
        cur_min = jnp.quantile(xf, 1.0 - spec.percentile_alpha)
    else:
        cur_min, cur_max = _reduce_minmax(spec, x, mask)

    first = stats.n == 0
    if hasattr(first, "ndim"):  # layer-stacked n (L,) vs per-channel (L, C)
        while first.ndim < jnp.ndim(cur_min):
            first = first[..., None]
    # First-update semantics follow the reference per kind: minmax/percentile
    # clamp the first range to include 0 (ref: observer/minmax.py:17-24,
    # percentile.py:44-48); ema/omse/ptf take the raw first batch
    # (ref: observer/ema.py:17, omse.py:17, ptf.py:17).
    clamp0 = spec.kind in ("minmax", "percentile")
    first_min = jnp.minimum(cur_min, 0.0) if clamp0 else cur_min
    first_max = jnp.maximum(cur_max, 0.0) if clamp0 else cur_max
    if spec.kind in ("ema", "percentile"):
        sigma = spec.ema_sigma
        new_min = jnp.where(first, first_min, stats.min + sigma * (cur_min - stats.min))
        new_max = jnp.where(first, first_max, stats.max + sigma * (cur_max - stats.max))
    else:  # minmax / omse / ptf accumulate running extrema
        new_min = jnp.where(first, first_min, jnp.minimum(cur_min, stats.min))
        new_max = jnp.where(first, first_max, jnp.maximum(cur_max, stats.max))
    return ObserverStats(min=new_min, max=new_max, n=stats.n + 1)


def merge(spec: ObserverSpec, a: ObserverStats, b: ObserverStats) -> ObserverStats:
    """Merge batch-local stats ``b`` into running stats ``a`` (pure, jittable).

    Used when stats are computed as scan outputs (layer-stacked) and folded into
    running stats outside the scan. EMA/percentile treat ``b`` as one update;
    extrema-based observers take elementwise min/max.
    """
    a_empty = a.n == 0
    b_empty = b.n == 0
    # layer-stacked stats carry n per layer (L,) while per-channel extrema
    # are (L, C) — align ranks so the emptiness masks broadcast
    while jnp.ndim(a_empty) < jnp.ndim(a.min):
        a_empty = a_empty[..., None]
    while jnp.ndim(b_empty) < jnp.ndim(b.min):
        b_empty = b_empty[..., None]
    if spec.kind in ("ema", "percentile"):
        sigma = spec.ema_sigma
        new_min = jnp.where(a_empty, b.min, a.min + sigma * (b.min - a.min))
        new_max = jnp.where(a_empty, b.max, a.max + sigma * (b.max - a.max))
    else:
        new_min = jnp.where(a_empty, b.min, jnp.minimum(a.min, b.min))
        new_max = jnp.where(a_empty, b.max, jnp.maximum(a.max, b.max))
    new_min = jnp.where(b_empty, a.min, new_min)
    new_max = jnp.where(b_empty, a.max, new_max)
    return ObserverStats(min=new_min, max=new_max, n=a.n + b.n)


# ---------------------------------------------------------------------------
# finalize
# ---------------------------------------------------------------------------


def _lp_loss(pred, tgt, p=2.0):
    return jnp.mean(jnp.abs(pred - tgt) ** p)


def _fake_quant_affine(x, scale, zero_point, fmt: IntFormat):
    q = jnp.clip(jnp.round(x / scale) + zero_point, fmt.qmin, fmt.qmax)
    return (q - zero_point) * scale


# The reference observers clamp scales at float32 eps (ref: observer/base.py:13
# ``self.eps = torch.finfo(torch.float32).eps``) — replicated exactly so the
# reference-oracle suite can assert scale equality.
_REF_EPS = float(jnp.finfo(jnp.float32).eps)


def _affine_params(xmin, xmax, fmt: IntFormat) -> QuantParams:
    """The reference observers' shared asymmetric formula
    (ref: observer/minmax.py:46-51, ema.py:46-50, percentile.py:72-77):
    scale spans [min, max] over the full integer range; zero_point is rounded
    and clamped into the representable range."""
    scale = jnp.maximum((xmax - xmin) / float(fmt.qmax - fmt.qmin), _REF_EPS)
    zp = jnp.clip(fmt.qmin - jnp.round(xmin / scale), fmt.qmin, fmt.qmax)
    return QuantParams(scale=scale, zero_point=zp)


def _symmetric_scale(spec: ObserverSpec, stats: ObserverStats,
                     fmt: IntFormat) -> QuantParams:
    """The reference observers' symmetric conventions, per kind (they differ!):

    * minmax / percentile: scale = max(|min/qmin|, |max/qmax|) — asymmetric
      denominators, using the extra negative slot (ref: observer/minmax.py:40-45,
      percentile.py:66-71).
    * ema: scale = max(-min, max) / ((qmax - qmin) / 2)
      (ref: observer/ema.py:42-45).
    """
    if spec.kind == "ema":
        amax = jnp.maximum(-stats.min, stats.max)
        scale = amax / (float(fmt.qmax - fmt.qmin) / 2.0)
    else:
        scale = jnp.maximum(jnp.abs(stats.min / fmt.qmin),
                            jnp.abs(stats.max / fmt.qmax))
    return QuantParams(scale=jnp.maximum(scale, _REF_EPS), zero_point=None)


def _finalize_omse(spec, stats, fmt, sample):
    """LAPQ-style 90-step shrink search minimizing L2 reconstruction loss,
    vectorized over the whole grid (ref: fake_quant/observer/omse.py:31-57).

    The reference's omse always searches the affine (scale, zero_point) form
    regardless of bit-type signedness — replicated exactly when
    ``spec.symmetric`` is False. ``symmetric=True`` is a framework extension
    (zero_point-free scales for the symmetric serving epilogues)."""
    x = sample.astype(jnp.float32)
    shrinks = 1.0 - jnp.arange(90, dtype=jnp.float32) * 0.01

    def params_for(shrink):
        if spec.symmetric:
            return scales_from_minmax(stats.min * shrink, stats.max * shrink,
                                      fmt, True)
        return _affine_params(stats.min * shrink, stats.max * shrink, fmt)

    def score(shrink):
        qp = params_for(shrink)
        zp = qp.zero_point if qp.zero_point is not None else jnp.zeros_like(qp.scale)
        xq = _fake_quant_affine(x, qp.scale, zp, fmt)
        return _lp_loss(x, xq)

    scores = jax.vmap(score)(shrinks)
    best = shrinks[jnp.argmin(scores)]
    return params_for(best)


def _finalize_ptf(spec, stats, fmt, sample):
    """Power-of-Two-Factor per-channel scales (FQ-ViT): one per-tensor base scale,
    per-channel multiplier in {1,2,4,8} by L2 loss — vectorized over the 4
    candidates and all channels at once (ref: fake_quant/observer/ptf.py:31-69)."""
    x = sample.astype(jnp.float32)  # (..., C)
    min_t = jnp.min(stats.min)
    max_t = jnp.max(stats.max)
    qp8 = _affine_params(min_t, max_t, fmt)
    scale8, zp = qp8.scale, qp8.zero_point
    scale1 = scale8 / 8.0
    cand = scale1 * jnp.asarray([1.0, 2.0, 4.0, 8.0])  # (4,)

    def score(scale):
        xq = _fake_quant_affine(x, scale, zp, fmt)
        axes = tuple(range(x.ndim - 1))
        return jnp.mean(jnp.abs(xq - x) ** 2.0, axis=axes)  # (C,)

    scores = jax.vmap(score)(cand)  # (4, C)
    mask = jnp.asarray([1.0, 2.0, 4.0, 8.0])[jnp.argmin(scores, axis=0)]  # (C,)
    scale = scale1 * mask
    return QuantParams(scale=scale, zero_point=jnp.broadcast_to(zp, scale.shape))


def finalize(
    spec: ObserverSpec,
    stats: ObserverStats,
    fmt: IntFormat,
    sample: Optional[jax.Array] = None,
) -> QuantParams:
    """Stats → static (scale, zero_point).

    ``sample`` — a representative final batch — is required for omse/ptf (the
    reference passes the last-calibration-batch activation to their
    ``get_quantization_params``).
    """
    if spec.kind in ("minmax", "ema", "percentile"):
        if spec.symmetric:
            return _symmetric_scale(spec, stats, fmt)
        return _affine_params(stats.min, stats.max, fmt)
    if sample is None:
        raise ValueError(f"{spec.kind} observer requires a `sample` batch to finalize")
    if spec.kind == "omse":
        return _finalize_omse(spec, stats, fmt, sample)
    if spec.kind == "ptf":
        return _finalize_ptf(spec, stats, fmt, sample)
    raise ValueError(spec.kind)
