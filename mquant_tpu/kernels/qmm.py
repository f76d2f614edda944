"""Real integer quantized matmul for the serving path (W8A8 / W4A8).

The reference only fake-quantizes (quant→dequant in fp; real int GEMMs never
execute — ref: SURVEY §3.4; the int4 pack/unpack primitives at
fake_quant/quant_utils.py:61-94 are unused by its pipelines). This module is
where the TPU rebuild goes beyond the reference: actual INT8×INT8 MXU GEMMs
with int32 accumulation and a fused dequant epilogue. (Measured on the v5e
runtime in use: the s8 dot reaches ~300 TF/s in-model vs bf16's ~190 — XLA
exposes no full 2× int8 path here; see scripts/mxu_rate*.py — so the int8
win is compute ~1.5× plus halved weight streaming.)

Weight storage in the params pytree (produced by ``quantize_weights_real``):
  * ``w_q``      int8 (in, out) for W8; for W4, **split-half packed**
                 (in/2, out): byte row r holds nibble rows r (low) and
                 r + in/2 (high). Split-half (not adjacent-pair) packing makes
                 the in-kernel unpack relayout-free: the two nibble planes are
                 contiguous row blocks, so the kernel runs two MXU dots
                 (x_lo·lo + x_hi·hi) with no interleave/stack.
  * ``w_scale``  f32 (out,) per-output-channel symmetric scale

Two implementations:
  * XLA path — ``lax.dot_general`` on int8 hits the MXU natively; used for W8
    (and as W4 fallback, where XLA must materialize the unpacked weights).
  * Pallas path (W4) — unpacks nibbles in VMEM, halving weight HBM traffic
    (the whole point of W4 at decode time), fusing the per-token × per-channel
    dequant epilogue.
"""

from __future__ import annotations

import functools
import math
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


class ActQ:
    """Quantized activation bundle for the real-int GEMM.

    ``q``        int8 values, shape (..., C)
    ``scale``    broadcastable against the GEMM output (scalar, or per-token
                 (..., 1)); for ``groupsize`` acts, shape (..., G) with one
                 scale per (token, channel-group)
    ``zp``       optional integer zero point (same broadcast shape as scale,
                 stored f32): x ≈ scale · (q − zp)
    ``groupsize``  channel-group width of the scales (None → whole axis)
    """

    __slots__ = ("q", "scale", "zp", "groupsize")

    def __init__(self, q, scale, zp=None, groupsize=None):
        self.q = q
        self.scale = scale
        self.zp = zp
        self.groupsize = groupsize


def _act_int8(x: jax.Array, spec, site_state, p=None) -> ActQ:
    """Quantize an activation to int8 per the site spec. Every configuration
    the fake/calib path supports is realized here (parity target: the
    reference fake-quants all of these via quant_utils.py:181-268):

      * static per-tensor (sym or asym) scales
      * static per-CHANNEL scales — only when the scales were folded into the
        weights at realize time (``a_fold`` marker in the weight storage):
        the channel scale spans the contracted axis, so the activation is
        integer-quantized per channel and the magnitude lives in the weights
      * dynamic per-token / per-tensor (sym or asym)
      * dynamic per-token-per-group (``a_groupsize``) — grouped scales handled
        by the group-blocked epilogue in ``quantized_matmul_pre``
    """
    if spec.a_static and site_state is not None and site_state.get("act") is not None:
        qp = site_state["act"]
        s = jnp.asarray(qp.scale)

        def codes(qp):
            """int8 codes + epilogue zero point. Static asym state follows the
            unsigned-code convention (codes/zp in [0, 255], matching the fake
            path's get_format(bits, signed=False)) — shift both by 128 so
            storage is int8 and x = s·(q − z) is unchanged."""
            if qp.zero_point is None:
                return Q.quantize(x, qp, INT8), None
            q = jnp.round(x.astype(jnp.float32) / qp.scale) + qp.zero_point
            q = (jnp.clip(q, 0, 255) - 128.0).astype(jnp.int8)
            return q, qp.zero_point - 128.0

        if s.ndim >= 1 and s.shape and s.shape[-1] == x.shape[-1] and x.shape[-1] > 1:
            if p is not None and "a_fold" in p:
                # per-channel static scales folded into the weights at realize
                # time (see realize docstrings): integer codes are per-channel
                # round(x / s_ch); the dequant magnitude rides w_scale, so the
                # activation contributes scale 1. ASYM per-channel zp is a
                # per-output constant Σ_ch (s_ch·w_chn)(128 − z_ch) — it was
                # precomputed at realize time into the site's ``a_corr`` row
                # and is added by the GEMM epilogue, so the codes carry no
                # runtime zero point.
                q, zp = codes(qp)
                if zp is not None and "a_corr" not in p:
                    raise NotImplementedError(
                        "per-channel asymmetric static act scales require "
                        "the realize-time a_corr row (realize with the "
                        "calibrated state)")
                return ActQ(q, jnp.ones((), jnp.float32), None)
            raise NotImplementedError(
                "per-channel static activation scales require realize-time "
                "folding into the weights (realize with the calibrated state "
                "so the a_fold marker is stored)")
        q, zp = codes(qp)
        return ActQ(q, qp.scale, zp)
    gs = getattr(spec, "a_groupsize", None)
    if gs:
        C = x.shape[-1]
        assert C % gs == 0, (C, gs)
        xg = x.reshape(*x.shape[:-1], C // gs, gs)
        qp = Q.dynamic_qparams(xg, INT8, axis=-1, symmetric=spec.a_symmetric,
                               clip_ratio=spec.a_clip_ratio)
        q = Q.quantize(xg, qp, INT8).reshape(x.shape)
        scale = qp.scale[..., 0]  # (..., G)
        zp = None if qp.zero_point is None else qp.zero_point[..., 0]
        return ActQ(q, scale, zp, groupsize=gs)
    qp = Q.dynamic_qparams(x, INT8, axis=-1 if spec.a_per_token else None,
                           symmetric=spec.a_symmetric,
                           clip_ratio=spec.a_clip_ratio)
    return ActQ(Q.quantize(x, qp, INT8), qp.scale, qp.zero_point)


def quantize_weights_real(w: jax.Array, bits: int, pack: bool = True,
                          scale: Optional[jax.Array] = None,
                          zero: Optional[jax.Array] = None) -> Dict[str, Any]:
    """Offline: fp weight (in, out) → real-int storage.

    With ``scale``/``zero`` given — the EXACT grid the fake-quantized weight
    already lies on (carried from GPTQ/RTN, shapes (G_or_1, out)) — the codes
    are recovered losslessly: q = round(w/s) + z. Re-deriving a grid here
    would be a second lossy quantization (the silent w_asym/w_groupsize
    degradation flagged in round 2); passing the real qparams avoids it.

    Without qparams, derives a per-out-channel symmetric minmax grid — exact
    for weights fake-quantized on that same grid (the sym non-grouped
    default), a fresh quantization for raw fp weights.

    Storage: ``w_scale`` (out,) per-channel sym, or (G, out) grouped;
    ``w_zp`` (G_or_1, out) integer zero points when asymmetric. W4 sym
    non-grouped values may be split-half packed (see module docstring);
    grouped/asym storage is never packed (the group epilogue indexes rows).
    """
    wf = w.astype(jnp.float32)
    fmt = Q.get_format(bits, signed=zero is None)
    out: Dict[str, Any] = {}
    if scale is not None:
        s = jnp.asarray(scale, jnp.float32)
        s2 = s if s.ndim == 2 else s.reshape(1, -1)
        G = s2.shape[0]
        n = wf.shape[0]
        srows = jnp.repeat(s2, n // G, axis=0)  # (in, out) per-row scale
        q = jnp.round(wf / srows)
        if zero is not None:
            # asym codes live in [0, 2^b−1] (unsigned) which overflows int8 at
            # b=8 — shift codes AND zero point by 2^(b−1) so storage is int8
            # and the epilogue identity w = s·(q − z) is unchanged
            off = float(2 ** (bits - 1))
            z2 = jnp.asarray(zero, jnp.float32)
            z2 = z2 if z2.ndim == 2 else z2.reshape(1, -1)
            q = q + jnp.repeat(z2, n // G, axis=0)
            q = jnp.clip(q, fmt.qmin, fmt.qmax) - off
            out["w_zp"] = z2 - off
            q = q.astype(jnp.int8)
        else:
            q = jnp.clip(q, fmt.qmin, fmt.qmax).astype(jnp.int8)
        out["w_scale"] = s2[0] if G == 1 and zero is None else s2
        grouped = G > 1 or zero is not None
    else:
        amax = jnp.max(jnp.abs(wf), axis=0)  # per-out-channel
        s1 = jnp.maximum(amax / fmt.qmax, 1e-8)
        q = jnp.clip(jnp.round(wf / s1[None, :]), fmt.qmin, fmt.qmax).astype(jnp.int8)
        out["w_scale"] = s1
        grouped = False
    if bits == 4 and pack and not grouped:
        n = q.shape[0]
        assert n % 2 == 0
        lo = q[: n // 2].astype(jnp.uint8) & 0x0F
        hi = q[n // 2 :].astype(jnp.uint8) & 0x0F
        out["w_q"] = (lo | (hi << 4)).astype(jnp.int8)
    else:
        out["w_q"] = q
    return out


def s4_squeeze_sites(layer_params: Dict[str, Any], specs,
                     in_dims: Dict[str, int],
                     prefix: str = "llm.") -> Dict[str, Any]:
    """Re-store every 4-bit site's int8 ``w_q`` as native S4 *inside a jit*.

    Decode is HBM-bandwidth-bound: the fused-convert bf16 GEMV streams w_q
    from HBM each step, so halving its bytes (int8 → XLA-native s4, hardware
    (8,1)-packed) halves decode weight traffic. The conversion runs ONCE at
    the top of the fused decode_n jit (amortized over the token loop) behind
    an optimization_barrier so XLA cannot fold the convert back onto the int8
    source; S4 never crosses the jit/host boundary (device_put of S4 arrays
    recurses on the current runtime). Not applied to per-step decode or
    prefill, where the one-off conversion pass would not amortize.

    ``in_dims``: expected input dim per site name. Split-half PACKED storage
    (w_q holds in/2 byte rows — the single-resident packed layout) is
    unpacked first, so a packed-resident model still decodes through the
    native-S4 XLA path when the Pallas GEMV is off."""
    out = dict(layer_params)
    for name, site in layer_params.items():
        spec = specs.get(prefix + name) if specs else None
        if (spec is None or getattr(spec, "w_bits", None) != 4
                or not isinstance(site, dict)):
            continue
        wq = site.get("w_q")
        if wq is None or wq.dtype != jnp.int8:
            continue
        expected = in_dims.get(name)
        if expected is None:
            continue
        # RMS-split storage drops one fp row (w_col0), hence expected - 1
        if wq.shape[-2] in (expected, expected - 1):
            pass  # native int8 rows
        elif wq.shape[-2] * 2 == expected:
            wq = unpack_int4_weights({"w_q": wq})  # packed-resident bytes
        else:
            continue
        s = dict(site)
        s["w_q"] = jax.lax.optimization_barrier(wq.astype(jnp.int4))
        out[name] = s
    return out


# shared-input site groups that fuse into ONE decode GEMM call (q/k/v on the
# ln1 output, gate/up on the ln2 output) — fewer Pallas launches per layer
_FUSE_GROUPS = (("q", "k", "v"), ("gate", "up"))


def pack_w4_sites(layer_params: Dict[str, Any], specs,
                  in_dims: Dict[str, int],
                  prefix: str = "llm.",
                  fuse_groups: bool = True) -> Dict[str, Any]:
    """Re-store 4-bit sites' int8 ``w_q`` as split-half PACKED bytes *inside
    a jit* — the packed analog of :func:`s4_squeeze_sites`, for the Pallas
    SWAR GEMV (``MQUANT_GEMV=pallas_w4``). One cheap VPU pass per fused
    decode loop (amortized over the token loop), pinned behind an
    optimization_barrier so XLA cannot fold the pack back onto the int8
    source. Split storage (in−1 rows, odd) and already-packed sites are
    left untouched.

    ``fuse_groups``: additionally concatenate the shared-input groups
    (q/k/v, gate/up) along the output axis into ONE packed matrix per group
    — each member site gets ``w_q_fused``/``w_scale_fused`` (the SAME traced
    array) plus its ``fused_span``, and drops its per-site ``w_q`` so the
    fused copy is the only storage held live. ``qlinear_group`` then issues
    one GEMM per group instead of one per site (fewer kernel launches on
    the decode hot path)."""

    def packable(name, site):
        spec = specs.get(prefix + name) if specs else None
        if (spec is None or getattr(spec, "w_bits", None) != 4
                or not isinstance(site, dict)):
            return False
        wq = site.get("w_q")
        if wq is None or wq.dtype != jnp.int8:
            return False
        expected = in_dims.get(name)
        return (expected is not None and wq.shape[-2] == expected
                and expected % 2 == 0)

    def pack(wq):
        half = wq.shape[-2] // 2
        lo = wq[..., :half, :].astype(jnp.uint8) & 0x0F
        hi = wq[..., half:, :].astype(jnp.uint8) & 0x0F
        return (lo | (hi << 4)).astype(jnp.int8)

    def group_servable(group):
        """The fused members must satisfy qlinear_group's one-GEMM contract
        (it has no per-site fallback once w_q is dropped): identical specs,
        8-bit acts, no online transform / split / out-quant."""
        sps = [specs.get(prefix + n) for n in group]
        s0 = sps[0]
        return (s0 is not None and all(s == s0 for s in sps)
                and s0.a_bits == 8 and s0.online_had is None
                and not s0.split and s0.out_bits is None)

    import os

    out = dict(layer_params)
    fused_names = set()
    if os.environ.get("MQUANT_W4_FUSE", "1") != "1":
        fuse_groups = False
    if fuse_groups:
        for group in _FUSE_GROUPS:
            if not all(n in layer_params and packable(n, layer_params[n])
                       for n in group):
                continue
            if not group_servable(group):
                continue
            sites = [layer_params[n] for n in group]
            # per-channel symmetric scales only (grouped/asym never packs)
            if any(s["w_scale"].ndim != sites[0]["w_scale"].ndim
                   for s in sites):
                continue
            if any(s.get("w_zp") is not None for s in sites):
                continue
            # act_order × group_size sites store rows in permuted layout with
            # a per-site activation gather (a_perm); concatenating them would
            # need one shared perm, which can't be value-checked under trace —
            # keep them on the per-site path (shared act quant, exact).
            if any("a_perm" in s for s in sites):
                continue
            fused = jax.lax.optimization_barrier(
                jnp.concatenate([pack(s["w_q"]) for s in sites], axis=-1))
            fscale = jnp.concatenate([s["w_scale"] for s in sites], axis=-1)
            for n, s in zip(group, sites):
                # member keeps its own w_scale: its width defines the
                # member's slice of the fused output (spans are derived in
                # qlinear_group from the group order — no non-array
                # metadata, so the dict stays lax.scan-sliceable)
                d = {k: v for k, v in s.items() if k != "w_q"}
                d["w_q_fused"] = fused
                d["w_scale_fused"] = fscale
                out[n] = d
            fused_names.update(group)
    for name, site in layer_params.items():
        if name in fused_names or not packable(name, site):
            continue
        s = dict(site)
        s["w_q"] = jax.lax.optimization_barrier(pack(site["w_q"]))
        out[name] = s
    return out


def _decode_nibbles_i32(u_i8: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int8 packed bytes → (lo, hi) sign-extended int32 planes (Mosaic-safe:
    no uint shifts, mask/divide only)."""
    u = u_i8.astype(jnp.int32) & 0xFF
    lo = u & 0x0F
    hi = (u // 16) & 0x0F
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return lo, hi


def _decode_nibbles_shift(u_i8: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int8 packed bytes → (lo, hi) int8 planes via ARITHMETIC shifts — the
    sign extension comes free from the shift, so the whole decode is 3 VPU
    ops per byte instead of _decode_nibbles_i32's ~8 (masks + divide + two
    selects). i32 width: Mosaic rejects sub-word shift ops on int8."""
    p = u_i8.astype(jnp.int32)
    four = jnp.int32(4)
    tw8 = jnp.int32(28)
    hi = jax.lax.shift_right_arithmetic(p, four).astype(jnp.int8)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, tw8), tw8).astype(jnp.int8)
    return lo, hi


def _decode_nibbles_i8(u_i8: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int8 packed bytes → (lo, hi) int8 planes via native-int8 ARITHMETIC
    shifts — for the XLA path (Mosaic rejects sub-word shifts, XLA:TPU does
    not). 2 VPU ops per plane, no i32 intermediates (¼ the scratch traffic of
    :func:`_decode_nibbles_i32`'s mask/divide/select chain)."""
    four = jnp.int8(4)
    hi = jax.lax.shift_right_arithmetic(u_i8, four)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(u_i8, four), four)
    return lo, hi


def unpack_int4_weights(p: Dict[str, Any]) -> jax.Array:
    """Split-half packed (..., in/2, out) → int8 (..., in, out)."""
    lo, hi = _decode_nibbles_i8(p["w_q"])
    return jnp.concatenate([lo, hi], axis=-2)


def quantized_matmul(
    x: jax.Array,
    p: Dict[str, Any],
    spec,
    site_state: Optional[Dict[str, Any]] = None,
    out_dtype=None,
) -> jax.Array:
    """y = dequant(int8(x) @ int_w) with fused scales. Bias NOT added here."""
    out_dtype = out_dtype or x.dtype
    aq = _act_int8(x, spec, site_state, p)
    y = quantized_matmul_pre(aq.q, aq.scale, p, out_dtype,
                             x_zp=aq.zp, a_groupsize=aq.groupsize)
    if "a_corr" in p:
        # per-channel-asym static fold epilogue (per-output row, see
        # realize_decoder_weights)
        y = y + p["a_corr"].astype(y.dtype)
    return y


def _grouped_epilogue(xq2, x_scale, x_zp, a_gs, w, ws, wz, out_dtype):
    """General group-blocked int GEMM + dequant for the configurations the
    fast path can't fold (grouped weight scales, weight zero points, act
    zero points, per-token-per-group act scales).

    Math, per output n, over contraction groups g of unified width u:
      y_n = Σ_g s_x[t,g]·s_w[g,n]·( acc_gn − z_w[g,n]·Σxq_g
                                    − z_x[t,g]·Σwq_gn + z_x·z_w·u )
    A ``lax.scan`` over groups keeps compile O(1) in group count and memory
    O(M·N) f32 for the accumulator (a (G,M,N) batched dot would not fit at
    prefill sizes). Pays extra accumulator traffic vs the fused fast path —
    acceptable: these are capability configs, the serving defaults
    (per-token/tensor sym acts × per-channel sym weights) never come here.
    """
    M, K = xq2.shape
    N = w.shape[1]
    Gw = ws.shape[0] if ws.ndim == 2 else 1
    Ga = (K // a_gs) if a_gs else 1
    # unified group width: both scale tables must be constant within a block
    G = math.lcm(Gw, Ga)
    assert K % G == 0, (K, Gw, Ga)
    u = K // G
    ws2 = ws if ws.ndim == 2 else ws.reshape(1, N)
    xs = jnp.asarray(x_scale, jnp.float32)
    if a_gs:
        xs2 = xs.reshape(M, Ga)  # per-token-per-group
    else:
        xs2 = jnp.broadcast_to(xs.reshape(-1, 1) if xs.ndim else xs.reshape(1, 1),
                               (M if xs.ndim else 1, 1))
    xzp = None if x_zp is None else jnp.asarray(x_zp, jnp.float32)
    if xzp is not None:
        xzp = (xzp.reshape(M, Ga) if a_gs
               else jnp.broadcast_to(xzp.reshape(-1, 1) if xzp.ndim else
                                     xzp.reshape(1, 1), (M if xzp.ndim else 1, 1)))

    xg = xq2.reshape(M, G, u).transpose(1, 0, 2)  # (G, M, u)
    wg = w.reshape(G, u, N)

    def body(acc, inp):
        (xb, wb, g) = inp
        a = jax.lax.dot_general(xb, wb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32)  # (M, N)
        swg = ws2[g * Gw // G]  # (N,) weight scale row for this block
        corr = a
        if wz is not None:
            zw = wz[g * Gw // G]  # (N,)
            xsum = jnp.sum(xb.astype(jnp.int32), axis=1,
                           dtype=jnp.int32).astype(jnp.float32)  # (M,)
            corr = corr - xsum[:, None] * zw[None, :]
        if xzp is not None:
            wsum = jnp.sum(wb.astype(jnp.int32), axis=0,
                           dtype=jnp.int32).astype(jnp.float32)  # (N,)
            zx = xzp[:, (g * Ga // G) if a_gs else 0]  # (M,) or (1,)
            corr = corr - zx[:, None] * wsum[None, :]
            if wz is not None:
                corr = corr + (zx[:, None] * wz[g * Gw // G][None, :]) * u
        sx = xs2[:, (g * Ga // G) if a_gs else 0]  # (M,) or (1,)
        return acc + corr * sx[:, None] * swg[None, :], None

    acc0 = jnp.zeros((M, N), jnp.float32)
    gids = jnp.arange(G)
    acc, _ = jax.lax.scan(body, acc0, (xg, wg, gids))
    return acc.astype(out_dtype)


def quantized_matmul_pre(
    xq: jax.Array,
    x_scale: jax.Array,
    p: Dict[str, Any],
    out_dtype,
    x_zp: Optional[jax.Array] = None,
    a_groupsize: Optional[int] = None,
) -> jax.Array:
    """GEMM + dequant for an ALREADY int8-quantized activation.

    Split out so sites sharing one input (q/k/v on the ln1 output, gate/up on
    the ln2 output) quantize it ONCE — with static (or dynamic per-token)
    scales the per-site quantizers see the identical tensor and produce the
    identical int8 activation, so sharing is mathematically exact and saves
    two full activation passes per site group."""
    ap = p.get("a_perm")
    if ap is not None:
        # act_order × group_size realization stores the weight rows in
        # PERMUTED layout (so the grouped scale table maps contiguous row
        # blocks again); gather the already-int8 activation to match. Exact —
        # int8 quantization is elementwise per channel, so reordering after
        # quantization changes nothing. One cheap (..., in) gather per call.
        xq = jnp.take(xq, ap, axis=-1)
    if "w_q_all" in p:
        # stacked packed-W4 storage + runtime layer index (decode layer
        # loop): the kernel indexes the layer inside its block specs so the
        # scan never materializes a per-layer weight slice. Off-TPU, slice
        # here instead (same numerics as the per-layer path — CPU tests pin
        # exact cross-route equality); the kernel itself is parity-tested in
        # interpret mode by tests/test_kernels.py.
        if (_pallas_enabled() and p.get("w_zp") is None and x_zp is None
                and a_groupsize is None and p["w_scale"].ndim == 1
                and jax.default_backend() in ("tpu", "axon")):
            return _qmm_pallas_w4_stacked(
                xq, x_scale, p["w_q_all"], p["w_scale"], p["layer_idx"],
                out_dtype)
        p = dict(p)
        p["w_q"] = jax.lax.dynamic_index_in_dim(
            p.pop("w_q_all"), p.pop("layer_idx")[0], 0, keepdims=False)
    ws = p["w_scale"]
    if (ws.ndim == 2 or p.get("w_zp") is not None or x_zp is not None
            or a_groupsize is not None):
        lead = xq.shape[:-1]
        K = xq.shape[-1]
        w = (unpack_int4_weights(p) if p["w_q"].shape[-2] * 2 == K
             else p["w_q"])
        y = _grouped_epilogue(
            xq.reshape(-1, K), x_scale, x_zp, a_groupsize,
            w, ws, p.get("w_zp"), out_dtype)
        return y.reshape(*lead, y.shape[-1])

    # packedness inferred from static shapes: packed int4 stores in/2 rows
    packed = p["w_q"].shape[-2] * 2 == xq.shape[-1]
    # Measured on v5e: at PREFILL shapes the XLA path (materialized unpack +
    # native s8 MXU dot) beats the VMEM-unpack Pallas kernel — the unpack
    # amortizes over many tokens, so halved HBM traffic buys nothing. At
    # DECODE/GEMV shapes the Pallas kernel with the shift-based nibble
    # decode streams half the bytes per step (see the tokens<=32 branch).
    # MQUANT_FORCE_PALLAS_QMM=1 forces the Pallas kernel everywhere.
    import os

    if (packed and os.environ.get("MQUANT_FORCE_PALLAS_QMM") == "1"
            and _pallas_enabled() and jax.default_backend() in ("tpu", "axon")):
        return _qmm_pallas_w4(xq, x_scale, p, out_dtype)
    tokens = 1
    for d in xq.shape[:-1]:
        tokens *= d
    if (packed and tokens <= 32
            and os.environ.get("MQUANT_GEMV", "xla") == "pallas_w4"
            and _pallas_enabled() and jax.default_backend() in ("tpu", "axon")):
        # packed-byte GEMV: half the HBM stream of the int8 path; exact
        # (integer dots, same grid values) — A/B via decode_model_bench
        return _qmm_pallas_w4(xq, x_scale, p, out_dtype)
    if (packed and tokens > 32
            and os.environ.get("MQUANT_W4_PREFILL", "two_gemm") == "two_gemm"):
        acc = _two_gemm_packed(xq, p)
        y = acc * x_scale * p["w_scale"]
        return y.astype(out_dtype)
    w = unpack_int4_weights(p) if packed else p["w_q"]
    if tokens <= 32:
        # decode/GEMV: XLA's s8×s8 GEMV streams weights far below HBM peak.
        # Default: bf16 MXU dot with the int8→bf16 weight convert fused into
        # the operand read (measured fastest full-model decode: 81 tok/s vs
        # 59 pallas-GEMV vs 26 s8-dot at 7B dims). Both operands are exact
        # ≤8-bit grids, so products are exact. Accumulation: MEASURED
        # bit-exact vs the s8→s32 path on the v5e MXU even on adversarial
        # all-max same-sign inputs at down_proj K=18944 (partial sums reach
        # 3.05e8 ≫ 2^24; drift 0.0 — the MXU accumulator carries more than
        # f32's 24-bit mantissa through the pass). CPU emulation of the same
        # dot DOES drift adversarially (~1.8e4 int units ≈ 5.9e-5 relative),
        # which tests/test_kernels.py::TestGemvAccumulation pins per backend.
        if (_pallas_enabled() and os.environ.get("MQUANT_GEMV", "xla") == "pallas"
                and jax.default_backend() in ("tpu", "axon")
                and w.shape[0] % 128 == 0 and w.shape[1] % 128 == 0):
            y = _qmm_pallas_gemv(xq, x_scale, w, p["w_scale"], out_dtype)
            return y
        acc = jnp.dot(xq.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    else:
        acc = jax.lax.dot_general(
            xq, w,
            dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    y = acc * x_scale * p["w_scale"]
    return y.astype(out_dtype)


def _two_gemm_packed(xq: jax.Array, p: Dict[str, Any]) -> jax.Array:
    """Prefill GEMM straight off split-half PACKED bytes, NO materialized
    unpack: y = x_lo·lo + x_hi·hi on the nibble planes. The concatenate in
    :func:`unpack_int4_weights` forces XLA to write the full int8 weight to
    HBM and read it back (~+10 GB per 7B prefill ⇒ the +14 ms TTFT tax the
    round-3 packed-resident design paid); two dots on shift-decoded planes
    keep the decode fusable into each operand read. Exact: integer dots on
    the same nibble values."""
    half = p["w_q"].shape[-2]
    lo, hi = _decode_nibbles_i8(p["w_q"])
    dn = (((xq.ndim - 1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(xq[..., :half], lo, dn,
                              preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot_general(xq[..., half:], hi, dn,
                                    preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas int8 GEMV: weight tile int8→bf16 in VMEM + bf16 MXU dot
# ---------------------------------------------------------------------------


def _gemv_kernel(x_ref, w_ref, ws_ref, xs_ref, o_ref):
    wv = w_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), wv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc * ws_ref[:].astype(jnp.float32)
                * xs_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _qmm_pallas_gemv(xq, x_scale, w, w_scale, out_dtype,
                     budget: int = 8 * 2**20, interpret: bool = False):
    """Skinny-M quantized matmul: full-K weight columns stream through VMEM as
    int8 (halving HBM traffic vs bf16), one MXU dot per N tile."""
    lead = xq.shape[:-1]
    K = xq.shape[-1]
    N = w.shape[1]
    x2 = xq.reshape(-1, K)
    M = x2.shape[0]
    Mp = max(8, M)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    xs = jnp.broadcast_to(jnp.asarray(x_scale, jnp.float32),
                          (*lead, 1) if lead else (1,)).reshape(-1, 1)
    if xs.shape[0] != M:
        xs = jnp.broadcast_to(xs, (M, 1))
    xs = jnp.pad(xs, ((0, Mp - M), (0, 0))) if Mp != M else xs
    tn = _pick_tile(N, max(128, budget // K // 128 * 128))
    if tn is None:
        acc = jnp.dot(x2.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out = (acc * w_scale.reshape(1, N) * xs).astype(out_dtype)
        return out[:M].reshape(*lead, N)
    ws = w_scale.reshape(1, N).astype(jnp.float32)
    out = pl.pallas_call(
        _gemv_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(flops=2 * Mp * K * N,
                                      bytes_accessed=K * N, transcendentals=0),
        interpret=interpret,
    )(x2, w, ws, xs)
    return out[:M].reshape(*lead, N)


# ---------------------------------------------------------------------------
# Pallas W4A8 kernel: split-half nibble decode in VMEM + two int8 MXU dots
# ---------------------------------------------------------------------------


def _pick_tile(dim: int, maxt: int) -> Optional[int]:
    """Largest lane-aligned (multiple of 128) divisor of dim, at most maxt."""
    for t in range(min(maxt, dim) // 128 * 128, 0, -128):
        if dim % t == 0:
            return t
    return None


_SWAR_BIAS = 0x88888888 - (1 << 32)  # per-byte 0x88 (int32 two's complement)
_SWAR_LOW = 0x0F0F0F0F


def _qmm_w4_kernel(xlo_ref, xhi_ref, wq_ref, xs_ref, ws_ref, c_ref, o_ref,
                   acc_ref, *, n_k: int, decode: str = "swar"):
    """Grid (M/TM, N/TN, K2/TK) where K2 = in/2. Per step:
    x_lo (TM, TK) from rows [k·TK, ...), x_hi (TM, TK) from rows in/2 + k·TK;
    wq (TK, TN) packed bytes → nibble planes; acc += x_lo·lo + x_hi·hi.

    decode="swar" (production): word-parallel nibble extraction — bitcast the
    packed int8 tile to int32, xor 0x88 per byte (signed→biased nibbles, so
    no per-nibble sign extension is needed), mask/shift whole words, bitcast
    back to int8 → ~1.5 VPU word-ops per BYTE instead of ~10 per-element ops.
    The dots then run on UNSIGNED planes u = w + 8 ∈ [0,15]; the identity
    x·w = x·u − 8·Σx is restored by the precomputed per-row correction c_ref
    at the final k step. The integer accumulator is bit-equal to the
    unpacked s8 dot (verified on v5e). The final f32 dequant multiply
    ``(acc·xs)·ws`` may round differently from the XLA path's fused form by
    ≤1 output ulp — each path is individually deterministic (replay-stable),
    but cross-path outputs are equal only to within that final rounding,
    i.e. well inside the int8 quantization noise.

    decode="shift" (interpret/CPU fallback): per-element arithmetic-shift
    sign-extended planes, no correction term used."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    if decode == "swar":
        bias = jnp.int32(_SWAR_BIAS)
        low = jnp.int32(_SWAR_LOW)
        w = pltpu.bitcast(wq_ref[:], jnp.int32) ^ bias  # (TK/4, TN)
        lo = pltpu.bitcast(w & low, jnp.int8)
        hi = pltpu.bitcast(
            jax.lax.shift_right_arithmetic(w, jnp.int32(4)) & low,
            jnp.int8)
    else:
        lo, hi = _decode_nibbles_shift(wq_ref[:])
    acc_ref[:] += jax.lax.dot_general(
        xlo_ref[:], lo, dn, preferred_element_type=jnp.int32)
    acc_ref[:] += jax.lax.dot_general(
        xhi_ref[:], hi, dn, preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        xs = xs_ref[:].astype(jnp.float32)  # (TM, 1) per-token scale
        ws = ws_ref[:].astype(jnp.float32)  # (1, TN) per-channel scale
        acc = acc_ref[:]
        if decode == "swar":
            acc = acc - c_ref[:]  # undo the +8 nibble bias: c = 8·Σ_k x
        o_ref[:] = (acc.astype(jnp.float32) * xs * ws).astype(o_ref.dtype)


def _qmm_w4_kernel_nok(xlo_ref, xhi_ref, wq_ref, xs_ref, ws_ref, c_ref,
                       o_ref, *, decode: str = "swar"):
    """Whole-K2 (n_k=1) variant of :func:`_qmm_w4_kernel`: no accumulator
    scratch, so every grid step is independent and Mosaic pipelines the
    (i, j) tiles freely — the k-accumulating kernel's shared scratch
    serializes steps, which costs ~45%% of the GEMV's DMA bound at 7B
    decode shapes."""
    dn = (((1,), (0,)), ((), ()))
    if decode == "swar":
        bias = jnp.int32(_SWAR_BIAS)
        low = jnp.int32(_SWAR_LOW)
        w = pltpu.bitcast(wq_ref[:], jnp.int32) ^ bias
        lo = pltpu.bitcast(w & low, jnp.int8)
        hi = pltpu.bitcast(
            jax.lax.shift_right_arithmetic(w, jnp.int32(4)) & low, jnp.int8)
    else:
        lo, hi = _decode_nibbles_shift(wq_ref[:])
    acc = jax.lax.dot_general(xlo_ref[:], lo, dn,
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(xhi_ref[:], hi, dn,
                               preferred_element_type=jnp.int32)
    if decode == "swar":
        acc = acc - c_ref[:]
    xs = xs_ref[:].astype(jnp.float32)
    ws = ws_ref[:].astype(jnp.float32)
    o_ref[:] = (acc.astype(jnp.float32) * xs * ws).astype(o_ref.dtype)


def _qmm_pallas_w4(xq: jax.Array, x_scale: jax.Array, p: Dict[str, Any], out_dtype,
                   tm: int = 256, tn: int = 512, tk: int = 512,
                   interpret: bool = False) -> jax.Array:
    lead = xq.shape[:-1]
    Kin = xq.shape[-1]
    K2 = Kin // 2
    x2 = xq.reshape(-1, Kin)
    M = x2.shape[0]
    N = p["w_q"].shape[1]
    xs = jnp.broadcast_to(jnp.asarray(x_scale, jnp.float32),
                          (*lead, 1) if lead else (1,)).reshape(-1, 1)
    if xs.shape[0] != M:
        xs = jnp.broadcast_to(xs, (M, 1))
    ws = p["w_scale"].reshape(1, N).astype(jnp.float32)

    if M <= 32:
        # decode/GEMV shapes: x is tiny; the stream is the packed weight.
        # Tile choice is about DMA CONTIGUITY, not step count: narrow-N
        # tiles read the row-major weight in sub-kB strided chunks and lose
        # ~40% of HBM bandwidth (measured 109 vs 118 tok/s at 7B decode),
        # so keep tn as wide as the VMEM budget allows (a row tile of the
        # full N is one contiguous memcpy) and walk K in small steps. With
        # the SWAR decode the nibble planes are byte-sized, so a tile costs
        # ~3× its packed bytes in VMEM. Override via MQUANT_W4_TK/TN.
        import os

        tm = -(-M // 8) * 8  # sublane tiles must be multiples of 8
        # 15 MB: tile + two byte-sized nibble planes (3×) must fit VMEM;
        # (256, 18944) tiles (gate/up at full N) measured fastest and fit
        budget = 15 * 2**20
        tk = (int(os.environ.get("MQUANT_W4_TK", "0"))
              or _pick_tile(K2, 512) or K2)
        tn_env = int(os.environ.get("MQUANT_W4_TN", "0"))
        tn = tn_env or max(128, budget // (3 * tk) // 128 * 128)
    tm = min(tm, max(8, -(-M // 8) * 8))
    tn = _pick_tile(N, tn)
    tk = _pick_tile(K2, tk)
    if tn is None or tk is None:  # dims not 128-tileable → XLA fallback
        w = unpack_int4_weights(p)
        acc = jax.lax.dot_general(
            x2, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws).astype(out_dtype).reshape(*lead, N)
    padm = (-M) % tm
    if padm:
        x2 = jnp.pad(x2, ((0, padm), (0, 0)))
        xs = jnp.pad(xs, ((0, padm), (0, 0)))
    Mp = x2.shape[0]
    n_k = K2 // tk
    decode = "shift" if interpret else "swar"
    # biased-nibble correction: x·w = x·(w+8) − 8·Σx (exact integer identity)
    csum = (8 * jnp.sum(x2.astype(jnp.int32), axis=-1, keepdims=True)
            if decode == "swar" else jnp.zeros((Mp, 1), jnp.int32))

    flops = 2 * Mp * Kin * N
    if n_k == 1:
        out = pl.pallas_call(
            functools.partial(_qmm_w4_kernel_nok, decode=decode),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            grid=(Mp // tm, N // tn),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, tk), lambda i, j: (i, 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=Mp * Kin + K2 * N + Mp * N * 2,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(x2, x2, p["w_q"], xs, ws, csum)
        if padm:
            out = out[:M]
        return out.reshape(*lead, N)
    out = pl.pallas_call(
        functools.partial(_qmm_w4_kernel, n_k=n_k, decode=decode),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(Mp // tm, N // tn, n_k),
        in_specs=[
            # low-half rows of x
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            # high-half rows of x (offset K2, expressed in block units)
            pl.BlockSpec((tm, tk), lambda i, j, k, _nk=n_k: (i, k + _nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=Mp * Kin + K2 * N + Mp * N * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x2, x2, p["w_q"], xs, ws, csum)
    if padm:
        out = out[:M]
    return out.reshape(*lead, N)


def _qmm_pallas_w4_stacked(xq: jax.Array, x_scale: jax.Array,
                           wq_all: jax.Array, w_scale: jax.Array,
                           layer_idx: jax.Array, out_dtype,
                           interpret: bool = False) -> jax.Array:
    """Packed-W4 GEMV reading its weight tiles DIRECTLY from the stacked
    (L, in/2, out) array at a runtime layer index (scalar-prefetch block
    indexing, the megablox-gmm pattern).

    Why this exists: the decode layer loop is a ``lax.scan`` over stacked
    weights, and a dynamic-slice feeding a Pallas custom call cannot fuse
    into the operand read — XLA materializes the full per-layer slice
    (verified in the compiled HLO: s8[1,1792,37888]-sized dynamic-slice
    fusions inside the loop body), re-writing + re-reading every streamed
    weight byte each step. Indexing inside the kernel makes the stacked
    array a loop-invariant operand: the only HBM traffic is the tile DMA
    itself. (The lm_head GEMV, whose operand is never sliced, already ran
    at its streaming bound — the model-level confirmation of the slice
    tax; scripts/decode_model_ablate.py + scripts/decode_hlo_dump.py.)

    ``layer_idx``: int32 array shape (1,); ``w_scale``: (out,) this layer's
    per-channel scales (small — sliced outside the kernel).
    """
    import os

    lead = xq.shape[:-1]
    Kin = xq.shape[-1]
    K2 = wq_all.shape[-2]
    N = wq_all.shape[-1]
    assert K2 * 2 == Kin, (wq_all.shape, xq.shape)
    x2 = xq.reshape(-1, Kin)
    M = x2.shape[0]
    xs = jnp.broadcast_to(jnp.asarray(x_scale, jnp.float32),
                          (*lead, 1) if lead else (1,)).reshape(-1, 1)
    if xs.shape[0] != M:
        xs = jnp.broadcast_to(xs, (M, 1))
    ws = w_scale.reshape(1, N).astype(jnp.float32)

    tm = -(-M // 8) * 8  # sublane tiles must be multiples of 8
    budget = 15 * 2**20
    tk = (int(os.environ.get("MQUANT_W4_TK", "0"))
          or _pick_tile(K2, 512) or K2)
    tn_env = int(os.environ.get("MQUANT_W4_TN", "0"))
    tn = tn_env or max(128, budget // (3 * tk) // 128 * 128)
    tn = _pick_tile(N, tn)
    tk2 = _pick_tile(K2, tk)
    if tn is None or tk2 is None:
        # dims not 128-tileable → slice + fall back (materializes — none of
        # the supported model dims hit this)
        p1 = {"w_q": jax.lax.dynamic_index_in_dim(wq_all, layer_idx[0], 0,
                                                  keepdims=False),
              "w_scale": w_scale}
        return _qmm_pallas_w4(xq, x_scale, p1, out_dtype, interpret=interpret)
    tk = tk2
    padm = (-M) % tm
    if padm:
        x2 = jnp.pad(x2, ((0, padm), (0, 0)))
        xs = jnp.pad(xs, ((0, padm), (0, 0)))
    Mp = x2.shape[0]
    n_k = K2 // tk
    decode = "shift" if interpret else "swar"
    csum = (8 * jnp.sum(x2.astype(jnp.int32), axis=-1, keepdims=True)
            if decode == "swar" else jnp.zeros((Mp, 1), jnp.int32))
    idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    flops = 2 * Mp * Kin * N
    cost = pl.CostEstimate(flops=flops,
                           bytes_accessed=Mp * Kin + K2 * N + Mp * N * 2,
                           transcendentals=0)
    if n_k == 1:
        def kern(idx_ref, *refs):
            _qmm_w4_kernel_nok(*refs, decode=decode)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // tm, N // tn),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, idx: (i, 0)),
                pl.BlockSpec((tm, tk), lambda i, j, idx: (i, 1)),
                pl.BlockSpec((None, tk, tn), lambda i, j, idx: (idx[0], 0, j)),
                pl.BlockSpec((tm, 1), lambda i, j, idx: (i, 0)),
                pl.BlockSpec((1, tn), lambda i, j, idx: (0, j)),
                pl.BlockSpec((tm, 1), lambda i, j, idx: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, idx: (i, j)),
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            grid_spec=grid_spec,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(idx, x2, x2, wq_all, xs, ws, csum)
    else:
        def kern(idx_ref, *refs):
            _qmm_w4_kernel(*refs, n_k=n_k, decode=decode)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // tm, N // tn, n_k),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, k, idx: (i, k)),
                pl.BlockSpec((tm, tk), lambda i, j, k, idx, _nk=n_k:
                             (i, k + _nk)),
                pl.BlockSpec((None, tk, tn),
                             lambda i, j, k, idx: (idx[0], k, j)),
                pl.BlockSpec((tm, 1), lambda i, j, k, idx: (i, 0)),
                pl.BlockSpec((1, tn), lambda i, j, k, idx: (0, j)),
                pl.BlockSpec((tm, 1), lambda i, j, k, idx: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, idx: (i, j)),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            grid_spec=grid_spec,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(idx, x2, x2, wq_all, xs, ws, csum)
    if padm:
        out = out[:M]
    return out.reshape(*lead, N)
