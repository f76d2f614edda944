"""Functional model-layer library + the quantized-linear dispatch.

This replaces the reference's universal ``ActQuantWrapper`` insertion point
(ref: fake_quant/quant_utils.py:271-391). The reference wraps every nn.Linear in a
stateful module with calibrate/quant flags; here each linear *site* is a pure
function parameterized by:

  * ``params``   — weight pytree entry {"w", optional "b", "w_col0" (RMS split),
                   or "w_q"+"w_scale" for real-int serving}
  * ``SiteSpec`` — static per-site quantization config (hashable, jit-static)
  * ``state``    — dynamic per-site quant state (static activation QuantParams)
  * ``mode``     — "fp" | "calib" | "fake" | "real" (jit-static string)
  * ``tape``     — stats collector threaded through the forward (calib mode)

Weight quantization happens OFFLINE (RTN/GPTQ write fake-quantized fp weights, or
int values + scales); the runtime path only quantizes ACTIVATIONS — which is what
makes static-scale inference one fused XLA graph with no host sync (the "MSQ →
30% TTFT" claim of the reference, ref: README.md:28-29).

Forward order inside a site (matches ref: quant_utils.py:330-391):
  online Hadamard (full-dim or per-head) → RMS first-column split →
  activation quantize (static or dynamic per-token) → GEMM → + fp col0 GEMM.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core.formats import get_format
from ..core import quant as Q
from ..observe import observers as O


# ---------------------------------------------------------------------------
# site configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SiteSpec:
    """Static quantization config for one linear/conv site (jit-static).

    Field parity with ``ActQuantizer.configure`` + ``ActQuantWrapper`` flags
    (ref: fake_quant/quant_utils.py:142-179, :288-295).
    """

    w_bits: Optional[int] = None  # None → fp weights
    a_bits: Optional[int] = None  # None → fp activations
    a_static: bool = False  # static (calibrated) vs dynamic per-token scales
    a_symmetric: bool = True
    a_per_channel: bool = False  # static granularity (per-tensor default)
    a_per_token: bool = True  # dynamic granularity
    a_groupsize: Optional[int] = None  # dynamic per-token-per-group scales
    a_clip_ratio: float = 1.0
    observer: str = "minmax"  # calibration observer kind
    online_had: Optional[str] = None  # None | "full" | "head" | "block"
    head_dim: int = 0  # block width for online_had == "head" / "block"
    split: bool = False  # RMS first-column split
    out_bits: Optional[int] = None  # optional output quantizer (ref :386-388)

    def observer_spec(self) -> O.ObserverSpec:
        return O.ObserverSpec(
            kind=self.observer,
            per_channel=self.a_per_channel,
            symmetric=self.a_symmetric,
        )


class Tape:
    """Collects per-site activation stats during a calibration forward.

    The dict insertion pattern is static per model config, so a forward that
    threads a Tape is still one jittable function returning (out, tape.stats).
    """

    def __init__(self, prev: Optional[Dict[str, O.ObserverStats]] = None,
                 specs: Optional[Dict[str, SiteSpec]] = None,
                 collect_samples: bool = False):
        self.prev = prev or {}
        self.specs = specs or {}
        self.stats: Dict[str, O.ObserverStats] = {}
        self.samples: Dict[str, jax.Array] = {}
        self.collect_samples = collect_samples
        self.mask: Optional[jax.Array] = None  # token-validity mask for padding

    def record(self, name: str, x: jax.Array, spec: SiteSpec):
        ospec = spec.observer_spec()
        if name in self.prev:
            st = self.prev[name]
        else:
            st = O.init_stats(ospec, x.shape[-1] if ospec.per_channel else None)
        self.stats[name] = O.update(ospec, st, x, mask=self.mask)
        if self.collect_samples:
            self.samples[name] = x.reshape(-1, x.shape[-1])


# ---------------------------------------------------------------------------
# online transforms
# ---------------------------------------------------------------------------


def _online_hadamard(x: jax.Array, spec: SiteSpec) -> jax.Array:
    """Runtime Hadamard on the activation (before quantization).

    full: orthonormal transform over the whole feature dim (down_proj input,
    ref: quant_utils.py:334-348). head: per-head_dim blocks (o_proj input,
    ref: quant_utils.py:349-365). block: fixed-width blocks on the MLP
    intermediate (I_{n/b} ⊗ H_b) — a TPU-side variant of full: one
    MXU-perfect (…,b)@(b,b) matmul instead of the Kronecker K-axis
    contraction (measured −0.2 ms/layer at Qwen2-VL-7B dims), trading
    spreading width n → b (√b outlier suppression; quality-gated by
    tests/test_outlier_stress.py).
    """
    from ..kernels.fwht import online_hadamard

    if spec.online_had == "full":
        return online_hadamard(x)
    assert spec.online_had in ("head", "block") and spec.head_dim > 0
    *lead, n = x.shape
    h = n // spec.head_dim
    xr = x.reshape(*lead, h, spec.head_dim)
    return online_hadamard(xr).reshape(*lead, n)


def _quantize_act(x, spec: SiteSpec, site_state, mode: str):
    """Activation fake-quant (calib/fake) path."""
    fmt = get_format(spec.a_bits, signed=spec.a_symmetric)
    if spec.a_static:
        if site_state is None or site_state.get("act") is None:
            return x  # calibration not finalized yet → fp passthrough
        return Q.fake_quantize(x, site_state["act"], fmt)
    return Q.dynamic_fake_quant(
        x, bits=spec.a_bits, per_token=spec.a_per_token,
        symmetric=spec.a_symmetric, clip_ratio=spec.a_clip_ratio,
        groupsize=spec.a_groupsize,
    )


# ---------------------------------------------------------------------------
# the quantized linear
# ---------------------------------------------------------------------------


def qlinear(
    x: jax.Array,
    p: Dict[str, Any],
    name: str,
    spec: Optional[SiteSpec] = None,
    state: Optional[Dict[str, Any]] = None,
    mode: str = "fp",
    tape: Optional[Tape] = None,
) -> jax.Array:
    """The universal quantized linear site. y = x @ w + b with the configured
    transform/quant pipeline. ``mode``/``spec`` are jit-static."""
    site_state = None if state is None else state.get(name)
    if spec is None or mode == "fp":
        w = p["w"]
        if "w_col0" in p:  # split storage but fp mode → recombine
            w = jnp.concatenate([p["w_col0"], p["w"]], axis=-2)
        y = x @ w.astype(x.dtype)
        return y + p["b"].astype(x.dtype) if p.get("b") is not None else y

    if spec.online_had is not None:
        x = _online_hadamard(x, spec)

    # RMS split: channel 0 stays fp (ref: quant_utils.py:367-376)
    x0 = None
    if "w_col0" in p:
        if spec.split:
            x0 = x[..., :1]
            x = x[..., 1:]
        else:  # split storage but spec toggled off → recombine
            p = dict(p)
            p["w"] = jnp.concatenate([p["w_col0"], p["w"]], axis=-2)

    if tape is not None and spec.a_bits is not None and spec.a_static:
        tape.record(name, x, spec)

    if mode == "real" and ("w_q" in p or "w_q_all" in p):
        # real-int path: activation int-quantization + MXU int GEMM + fused
        # dequant epilogue all happen inside the kernel wrapper ("w_q_all" =
        # stacked storage + runtime layer index, see decoder_forward's
        # stacked-GEMV decode path)
        from ..kernels.qmm import quantized_matmul

        y = quantized_matmul(x, p, spec, site_state)
    else:
        xq = x
        if spec.a_bits is not None and mode in ("fake", "calib", "real"):
            xq = _quantize_act(x, spec, site_state, mode)
        y = xq @ p["w"].astype(xq.dtype)

    if x0 is not None:
        # fp rank-1 correction for the split first column, computed in fp32
        y = y + (x0.astype(jnp.float32) @ p["w_col0"].astype(jnp.float32)).astype(y.dtype)

    if p.get("b") is not None:
        y = y + p["b"].astype(y.dtype)

    if spec.out_bits is not None and site_state is not None and site_state.get("out") is not None:
        fmt = get_format(spec.out_bits, signed=spec.a_symmetric)
        y = Q.fake_quantize(y, site_state["out"], fmt)
    elif tape is not None and spec.out_bits is not None:
        tape.record(name + "#out", y, spec)
    return y


def qlinear_group(
    x: jax.Array,
    ps: list,
    names: list,
    specs: Dict[str, Optional[SiteSpec]],
    state: Optional[Dict[str, Any]] = None,
    mode: str = "fp",
    tape: Optional[Tape] = None,
) -> list:
    """Several linear sites sharing ONE input tensor (q/k/v on the ln1 output,
    gate/up on the ln2 output).

    On the real-int path the input is quantized ONCE for the whole group: the
    per-site static scales were calibrated on the identical tensor (same
    minmax ⇒ same scale), and dynamic per-token scales are a pure function of
    x — so sharing is mathematically exact and saves len(group)-1 full
    activation quantize passes per layer. Falls back to independent qlinear
    calls whenever the fused conditions don't hold."""
    sp = [specs.get(n) for n in names]
    s0 = sp[0]
    base_ok = (
        mode == "real"
        and s0 is not None
        and all(s == s0 for s in sp)
        and s0.a_bits == 8
        and s0.online_had is None
        and not s0.split
        and s0.out_bits is None
    )
    # fully-fused group: pack_w4_sites concatenated the members' packed
    # weights into ONE matrix (every member carries the same fused array) —
    # one GEMM call for the whole group, outputs sliced apart by each
    # member's own w_scale width in group order (decode hot path: fewer
    # Pallas launches per layer)
    fused0 = ps[0].get("w_q_fused")
    if fused0 is None:
        fused0 = ps[0].get("w_q_fused_all")  # stacked + runtime layer index
    one_gemm = (
        base_ok
        and all((p.get("w_q_fused") is not None
                 or p.get("w_q_fused_all") is not None) for p in ps)
        and fused0 is not None
        and sum(p["w_scale"].shape[-1] for p in ps) == fused0.shape[-1]
    )
    fusable = base_ok and all(("w_q" in p or "w_q_all" in p)
                              and "w_col0" not in p for p in ps)
    if not (one_gemm or fusable):
        return [qlinear(x, p, n, specs.get(n), state, mode, tape)
                for p, n in zip(ps, names)]

    from ..kernels.qmm import _act_int8, quantized_matmul_pre

    site_state = None if state is None else state.get(names[0])
    aq = _act_int8(x, s0, site_state, ps[0])
    if one_gemm:
        if "w_q_fused_all" in ps[0]:
            pf = {"w_q_all": ps[0]["w_q_fused_all"],
                  "layer_idx": ps[0]["layer_idx"],
                  "w_scale": ps[0]["w_scale_fused"]}
        else:
            pf = {"w_q": ps[0]["w_q_fused"], "w_scale": ps[0]["w_scale_fused"]}
        y = quantized_matmul_pre(aq.q, aq.scale, pf, x.dtype,
                                 x_zp=aq.zp, a_groupsize=aq.groupsize)
        outs = []
        lo = 0
        for p in ps:
            hi = lo + p["w_scale"].shape[-1]
            yi = y[..., lo:hi]
            if "a_corr" in p:  # per-channel-asym static fold epilogue row
                yi = yi + p["a_corr"].astype(yi.dtype)
            if p.get("b") is not None:
                yi = yi + p["b"].astype(yi.dtype)
            outs.append(yi)
            lo = hi
        return outs
    outs = []
    for p, n in zip(ps, names):
        y = quantized_matmul_pre(aq.q, aq.scale, p, x.dtype,
                                 x_zp=aq.zp, a_groupsize=aq.groupsize)
        if "a_corr" in p:  # per-channel-asym static fold epilogue row
            y = y + p["a_corr"].astype(y.dtype)
        if p.get("b") is not None:
            y = y + p["b"].astype(y.dtype)
        outs.append(y)
    return outs


# ---------------------------------------------------------------------------
# norms / activations / rope
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, w: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in fp32 accumulate (the reference's RMSN equivalent,
    ref: fake_quant/module_util.py:42-61)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x, w, b, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out * w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def rotary_embedding(positions: jax.Array, head_dim: int, theta: float = 10000.0,
                     dtype=jnp.float32):
    """Standard RoPE cos/sin tables for integer positions (..., T)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """Rotate-half RoPE application; q/k: (..., T, H, hd), cos/sin (..., T, hd)."""

    def rot(v):
        v1, v2 = jnp.split(v, 2, axis=-1)
        return jnp.concatenate([-v2, v1], axis=-1)

    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (q * c + rot(q) * s).astype(q.dtype), (k * c + rot(k) * s).astype(k.dtype)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def attention(
    q: jax.Array,  # (B, T, H, hd)
    k: jax.Array,  # (B, S, KVH, hd)
    v: jax.Array,  # (B, S, KVH, hd)
    mask: Optional[jax.Array] = None,  # (B, 1, T, S) additive or bool
    scale: Optional[float] = None,
    causal: bool = False,  # static: causal self-attention (enables flash)
) -> jax.Array:
    """Grouped-query attention. Long causal prefill (T == S ≥ 512, no extra
    mask) routes to the Pallas flash-attention kernel on TPU — O(T) memory,
    no materialized (T, S) logits; otherwise an fp32-softmax einsum that XLA
    fuses well at moderate lengths."""
    B, T, H, hd = q.shape
    KVH = k.shape[2]
    S = k.shape[1]
    scale = scale if scale is not None else hd**-0.5

    import os

    flash_min_t = int(os.environ.get("MQUANT_FLASH_MIN_T", "2048"))
    if (causal and mask is None and T == S and T >= flash_min_t
            and hd % 128 == 0 and T % 128 == 0
            and jax.default_backend() in ("tpu", "axon")):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        if H != KVH:  # the kernel needs equal head counts
            rep = H // KVH
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), causal=True, sm_scale=scale)
        return out.transpose(0, 2, 1, 3).astype(q.dtype)

    # grouped-query einsum: contract against the KV heads directly instead of
    # materializing repeated k/v (saves (G−1)/G of the kv read/expand traffic —
    # the dominant decode-attention cost at GQA ratios like 28/4)
    G = H // KVH
    qg = q.reshape(B, T, KVH, G, hd)
    logits = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        m = mask[:, :, None] if mask.ndim == 4 else mask  # (B,1,1,T,S)
        if mask.dtype == jnp.bool_:
            logits = jnp.where(m, logits, jnp.float32(-1e30))
        else:
            logits = logits + m
    if causal and mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        logits = jnp.where((cols <= rows)[None, None, None], logits,
                           jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, v)
    return out.reshape(B, T, H, hd)


def causal_mask(T: int, S: int, offset: int = 0) -> jax.Array:
    """Boolean (1, 1, T, S) causal mask; offset = number of cached tokens."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0) + offset
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    return (cols <= rows)[None, None]
