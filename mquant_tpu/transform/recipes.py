"""Whole-model transform recipes: fuse → rotate → (pad + fold online Hadamard).

The reference implements one rotation driver per model
(ref: fake_quant/rotation_utils.py:519-641 ``rotate_model``,
qwen2vl_rotation.py:233, internvl_rotation.py:224, minicpmv_rotation.py:117).
Here the decoder recipe is generic over the stacked-layer layout of
``mquant_tpu.models.llm`` — one einsum folds a transform over all layers at once —
and the model-specific recipes (vision towers, projectors) compose the same ops.

All math in float64 numpy on host (exactness), cast back to the param dtype.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llm import DecoderConfig
from . import fuse as F
from . import hadamard as H
from . import rotate as R


def _to_np64(tree):
    return jax.tree.map(lambda x: np.asarray(x, np.float64), tree)


def _cast_like(new, old):
    """Cast transformed fp64 arrays back to the original leaves' dtypes.

    Structure-tolerant: transforms may DROP keys (e.g. a fused norm loses its
    bias) or add them; missing counterparts fall back to the first dtype found
    in the original subtree."""
    def first_dtype(t):
        for leaf in jax.tree.leaves(t):
            return leaf.dtype
        return jnp.float32

    default = first_dtype(old)

    def walk(n, o):
        if n is None:
            return None
        if isinstance(n, dict):
            o = o if isinstance(o, dict) else {}
            return {k: walk(v, o.get(k)) for k, v in n.items()}
        dt = getattr(o, "dtype", None) or default
        return jnp.asarray(n, dt)

    return walk(new, old)


@dataclasses.dataclass
class RotationInfo:
    """What the offline transform did — needed by runtime spec construction and
    checkpointing (the serializable artifact the reference lacks, SURVEY §5)."""

    hidden_rotated: bool = False
    ov_rotated: bool = False
    online_had_down: bool = False
    online_had_mode: str = "full"  # "full" | "block" (I ⊗ H_128, TPU fast path)
    down_pad: int = 0  # padded intermediate size (0 = unpadded)
    mode: str = "hadamard"
    seed: int = 0


# ---------------------------------------------------------------------------
# decoder fuse
# ---------------------------------------------------------------------------


def fuse_decoder(cfg: DecoderConfig, params: Dict) -> Dict:
    """Fold every norm affine into its consumers; norms become unit-weight RMSNorm.

    For RMSNorm-native decoders (Qwen/Qwen2/InternLM2/ChatGLM) this is exact with
    no mean-baking (RMSNorm has no mean subtraction). Equivalent role to
    ``fuse_*_layer_norms`` (ref: fake_quant/rotation_utils.py:137-230)."""
    p = _to_np64(params)
    lay = p["layers"]

    g1, _, qkv = F.fold_norm_into_linears(lay["ln1"]["w"], None,
                                          [lay["q"], lay["k"], lay["v"]])
    lay["q"], lay["k"], lay["v"] = qkv
    lay["ln1"]["w"] = g1
    g2, _, gu = F.fold_norm_into_linears(lay["ln2"]["w"], None,
                                         [lay["gate"], lay["up"]])
    lay["gate"], lay["up"] = gu
    lay["ln2"]["w"] = g2

    if "lm_head" in p:
        gf, _, heads = F.fold_norm_into_linears(p["ln_f"]["w"], None, [p["lm_head"]])
        p["lm_head"] = heads[0]
        p["ln_f"]["w"] = gf
    # tied embeddings: ln_f must stay (folding into the tied matrix would also
    # perturb the input embeddings) — loaders untie first (as the reference does
    # for Qwen2-VL-2B, ref: exam/quant_qwen2vl.py:35-48).
    return _cast_like(p, params)


# ---------------------------------------------------------------------------
# decoder rotate
# ---------------------------------------------------------------------------


def rotate_decoder(
    cfg: DecoderConfig,
    params: Dict,
    key: jax.Array,
    mode: str = "hadamard",
    rotate_ov: bool = True,
    online_had_down: bool = False,
    online_had_mode: str = "full",  # "block": I ⊗ H_128 (one MXU matmul at
    # serve time; √128 outlier spreading — gated by the outlier-stress test)
    Q: Optional[np.ndarray] = None,
) -> tuple[Dict, RotationInfo]:
    """QuaRot-style offline rotation of the decoder's hidden stream (+ per-head
    OV channel, + optional online-Hadamard fold into down_proj).

    Equivalent of the LLM section of ``rotate_model``
    (ref: fake_quant/rotation_utils.py:588-641). Assumes :func:`fuse_decoder`
    has run (norm weights are 1). Returns (new_params, RotationInfo).
    """
    assert_fused(params)
    p = _to_np64(params)
    lay = p["layers"]
    info = RotationInfo(mode=mode)

    if Q is None:
        Q = H.get_orthogonal_matrix(cfg.hidden, mode, key)
    info.hidden_rotated = True

    p["embed"]["w"] = R.rotate_embedding(p["embed"]["w"], Q)
    for s in ("q", "k", "v"):
        lay[s] = R.rotate_linear_input(lay[s], Q)
    lay["o"] = R.rotate_linear_output(lay["o"], Q)
    lay["gate"] = R.rotate_linear_input(lay["gate"], Q)
    lay["up"] = R.rotate_linear_input(lay["up"], Q)
    lay["down"] = R.rotate_linear_output(lay["down"], Q)
    if "lm_head" in p:
        p["lm_head"] = R.rotate_linear_input(p["lm_head"], Q)

    if rotate_ov:
        Qh = H.transform_matrix(cfg.head_dim)
        lay["v"], lay["o"] = R.rotate_ov_per_head(
            lay["v"], lay["o"], cfg.head_dim, Qh,
            n_kv_heads=cfg.n_kv_heads, n_heads=cfg.n_heads,
        )
        info.ov_rotated = True

    if online_had_down:
        inter = lay["down"]["w"].shape[-2]
        if online_had_mode == "block":
            # I_{n/128} ⊗ H_128: MXU-perfect runtime transform; pad the
            # intermediate to a multiple of 128 if needed (Qwen2-VL 18944 =
            # 148·128 needs none)
            blk = 128
            target = -(-inter // blk) * blk
            if target != inter:
                lay["gate"] = R.pad_linear_output(lay["gate"], target)
                lay["up"] = R.pad_linear_output(lay["up"], target)
                lay["down"] = R.pad_linear_input(lay["down"], target)
                info.down_pad = target
            lay["down"] = R.fold_exact_hadamard_input_block(lay["down"], blk)
            info.online_had_mode = "block"
        else:
            target = H.auto_pad_size(inter)
            if target != inter:
                lay["gate"] = R.pad_linear_output(lay["gate"], target)
                lay["up"] = R.pad_linear_output(lay["up"], target)
                lay["down"] = R.pad_linear_input(lay["down"], target)
                info.down_pad = target
            Hd = H.transform_matrix(target)
            lay["down"] = R.fold_exact_hadamard_input(lay["down"], Hd)
        info.online_had_down = True

    return _cast_like(p, params), info


def assert_fused(params: Dict):
    ln = np.asarray(params["layers"]["ln1"]["w"])
    if not np.allclose(ln, 1.0):
        raise ValueError("rotate_decoder requires fuse_decoder to run first "
                         "(norm weights must be folded to 1)")


def rtn_quantize_decoder(
    cfg: DecoderConfig,
    params: Dict,
    specs: Dict,
    mse_clip: bool = False,
    symmetric: bool = True,
    return_qparams: bool = False,
):
    """Offline RTN weight fake-quantization of every spec'd decoder site.

    Per-layer, per-out-channel scales (stacked weights (L, in, out) reduce
    over the input axis only). The RMS-split fp column ``w_col0`` is left
    untouched (ref: gptq drivers target ``down_proj.L2`` and leave L1 in fp,
    ref: fake_quant/gptq/qwenvl_gptq_plus.py:542-545).

    ``return_qparams=True`` → (params, {site: (scale (L,1,out), zero|None)}),
    the exact grids for lossless realization (see realize_decoder_weights).
    """
    from ..core import quant as Q
    from ..core.formats import get_format
    from ..models.llm import LLM_SITES

    p = dict(params)
    lay = dict(p["layers"])
    qps: Dict = {}

    def fq(w, bits, reduce_axes):
        fmt = get_format(bits, signed=symmetric)
        qp = Q.weight_qparams(w, fmt, per_channel=True, symmetric=symmetric,
                              mse_clip=mse_clip, reduce_axes=reduce_axes)
        return Q.fake_quantize(w, qp, fmt), qp

    for s in LLM_SITES:
        spec = specs.get("llm." + s)
        if spec is None or spec.w_bits is None:
            continue
        site = dict(lay[s])
        site["w"], qp = fq(site["w"], spec.w_bits, (-2,))
        lay[s] = site
        L_, _, out = site["w"].shape
        qps[s] = (qp.scale.reshape(L_, 1, out),
                  None if qp.zero_point is None
                  else qp.zero_point.reshape(L_, 1, out))
    p["layers"] = lay
    head_spec = specs.get("llm.lm_head")
    if head_spec is not None and head_spec.w_bits is not None and "lm_head" in p:
        head = dict(p["lm_head"])
        head["w"], qp = fq(head["w"], head_spec.w_bits, None)
        p["lm_head"] = head
        out = head["w"].shape[-1]
        qps["lm_head"] = (qp.scale.reshape(1, out),
                          None if qp.zero_point is None
                          else qp.zero_point.reshape(1, out))
    return (p, qps) if return_qparams else p


def realize_decoder_weights(params: Dict, specs: Dict,
                            pack_int4: bool = False,
                            qps: Optional[Dict] = None,
                            state: Optional[Dict] = None) -> Dict:
    """Convert spec'd sites to real-int storage (w_q/w_scale[/w_zp]) for the
    serving path — the capability the reference's fake-quant stack never ships
    (ref: SURVEY §3.4). Stacked layers are converted with vmap.

    ``qps``: {site: (scale (L,G,out), zero (L,G,out)|None[, perm (L,in)|None])}
    — the EXACT grids the fake-quantized weights lie on (from GPTQ's
    report["qparams"] or ``rtn_quantize_decoder(return_qparams=True)``). With
    them the integer codes are recovered losslessly, including asym (--w_asym)
    and grouped (--w_groupsize) grids; without them a per-out-channel
    symmetric minmax grid is re-derived (exact only for weights fake-quantized
    on that same default grid). A ``perm`` entry (act_order × group_size:
    grouped scales index PERMUTED row blocks) realizes the weight in permuted
    layout with an ``a_perm`` leaf; the serving GEMM gathers the activation
    (ref: the recommended --act_order flag set, docs/qwenvl.md:45, combined
    with gptq_utils.py:263-273 groupwise re-find inside the permuted walk).

    ``state``: calibrated activation state. Sites whose static act scales are
    per-CHANNEL get those scales FOLDED into the weights here (the channel
    scale spans the contracted axis, so it cannot ride the GEMM epilogue);
    the site stores an ``a_fold`` marker and the runtime quantizes the
    activation per-channel with unit dequant scale. Folding re-quantizes the
    folded weight (a second, small quantization — logged); exact qparams for
    the site are superseded by the folded grid.

    ``pack_int4=False`` (default) stores W4-GRID values in int8 — v5e's MXU has
    no native int4 operand, so int8 storage gives W4 accuracy at full native
    s8-matmul speed with 2× (not 4×) weight-memory savings; ``pack_int4=True``
    packs two nibbles per byte for 4× memory at extra unpack cost."""
    from ..kernels.qmm import quantize_weights_real
    from ..models.llm import LLM_SITES

    p = dict(params)
    lay = dict(p["layers"])
    for s in LLM_SITES:
        spec = specs.get("llm." + s)
        if spec is None or spec.w_bits is None:
            continue
        site = dict(lay[s])
        bits = spec.w_bits
        w = site["w"]
        sqp = (qps or {}).get(s)
        fold_qp = None
        fold_zp = None
        if (state is not None and spec.a_bits is not None and spec.a_static):
            aqp = (state.get("llm." + s) or {}).get("act")
            if aqp is not None:
                sc = jnp.asarray(aqp.scale)
                if sc.ndim >= 1 and sc.shape and sc.shape[-1] == w.shape[-2]:
                    # stacked per-layer per-channel scales (L, in)
                    fold_qp = sc.reshape(w.shape[0], w.shape[-2])
                    if aqp.zero_point is not None:
                        # per-channel ASYM: the zp correction is a
                        # precomputable per-output row (see a_corr below)
                        fold_zp = jnp.asarray(aqp.zero_point).reshape(
                            w.shape[0], w.shape[-2])
        if fold_qp is not None:
            import logging

            logging.getLogger("mquant").info(
                f"llm.{s}: folding per-channel static act scales into the "
                "weight (second weight quantization on the folded grid)")
            w = w * fold_qp[:, :, None].astype(w.dtype)
            sqp = None  # original grid no longer applies to the folded weight
        perm = None
        if sqp is not None:
            scale, zero = sqp[0], sqp[1]
            perm = sqp[2] if len(sqp) > 2 else None  # (L, in) act_order perms
            if perm is not None:
                # act_order × group_size: store rows in PERMUTED layout so
                # the grouped scale table maps contiguous row blocks; the
                # serving GEMM gathers the activation through a_perm
                w = jnp.take_along_axis(w, perm[:, :, None], axis=1)
            qd = jax.vmap(
                lambda wl, sl, zl: quantize_weights_real(
                    wl, bits, pack=pack_int4, scale=sl, zero=zl)
            )(w, scale, zero) if zero is not None else jax.vmap(
                lambda wl, sl: quantize_weights_real(
                    wl, bits, pack=pack_int4, scale=sl))(w, scale)
        else:
            qd = jax.vmap(lambda wl: quantize_weights_real(
                wl, bits, pack=pack_int4))(w)
        site.pop("w")
        site.update(qd)
        if perm is not None:
            site["a_perm"] = perm.astype(jnp.int32)  # (L, in), scan-sliceable
        if fold_qp is not None:
            # marker leaf; leading (L,) axis so the decoder's layer-scan can
            # slice it like every other stacked site leaf
            site["a_fold"] = jnp.ones((w.shape[0],), jnp.float32)
            if fold_zp is not None:
                # per-channel asym static acts: the runtime codes follow the
                # shifted-int8 convention x = s_ch·(q + 128 − z_ch), so
                # y_n picks up a constant Σ_ch (s_ch·w_chn)·(128 − z_ch).
                # Precompute it over the DEQUANTIZED folded weight so the
                # integer identity is exact against the stored grid
                # (ref parity: the fake asym path quant_utils.py:181-268).
                wq = qd["w_q"].astype(jnp.float32)
                ws2 = qd["w_scale"]
                if wq.shape[-2] == w.shape[-2]:  # unpacked int8 storage
                    wdq = wq * ws2[:, None, :]
                else:  # packed storage: fp-grid correction (≤ quant noise)
                    wdq = w.astype(jnp.float32)
                site["a_corr"] = jnp.einsum(
                    "li,lio->lo", 128.0 - fold_zp.astype(jnp.float32), wdq)
        lay[s] = site
    p["layers"] = lay
    head_qp = (qps or {}).get("lm_head")
    head_spec = specs.get("llm.lm_head")
    if (head_spec is not None and head_spec.w_bits is not None
            and "lm_head" in p and "w" in p["lm_head"]):
        head = dict(p["lm_head"])
        if head_qp is not None:
            head.update(quantize_weights_real(
                head["w"], head_spec.w_bits, pack=False,
                scale=head_qp[0], zero=head_qp[1]))
            head.pop("w")
            p["lm_head"] = head
    return p


def split_decoder_down(params: Dict) -> Dict:
    """Apply the RMS first-column split to every layer's down_proj
    (ref: quant_utils.py:316-328 via exam flag --llm_split). Pure slicing — exact
    in any dtype."""
    p = dict(params)
    lay = dict(p["layers"])
    down = dict(lay["down"])
    w = down["w"]
    down["w_col0"] = w[..., :1, :]
    down["w"] = w[..., 1:, :]
    lay["down"] = down
    p["layers"] = lay
    return p
