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
) -> Dict:
    """Offline RTN weight fake-quantization of every spec'd decoder site.

    Per-layer, per-out-channel symmetric scales (stacked weights (L, in, out)
    reduce over the input axis only). The RMS-split fp column ``w_col0`` is left
    untouched (ref: gptq drivers target ``down_proj.L2`` and leave L1 in fp,
    ref: fake_quant/gptq/qwenvl_gptq_plus.py:542-545).
    """
    from ..core import quant as Q
    from ..models.llm import LLM_SITES

    p = dict(params)
    lay = dict(p["layers"])
    for s in LLM_SITES:
        spec = specs.get("llm." + s)
        if spec is None or spec.w_bits is None:
            continue
        site = dict(lay[s])
        site["w"] = Q.rtn_fake_quant_weight(
            site["w"], spec.w_bits, mse_clip=mse_clip, symmetric=symmetric,
            reduce_axes=(-2,))
        lay[s] = site
    p["layers"] = lay
    head_spec = specs.get("llm.lm_head")
    if head_spec is not None and head_spec.w_bits is not None and "lm_head" in p:
        head = dict(p["lm_head"])
        head["w"] = Q.rtn_fake_quant_weight(
            head["w"], head_spec.w_bits, mse_clip=mse_clip, symmetric=symmetric)
        p["lm_head"] = head
    return p


def realize_decoder_weights(params: Dict, specs: Dict,
                            pack_int4: bool = False) -> Dict:
    """Convert spec'd sites to real-int storage (w_q/w_scale) for the serving
    path — the capability the reference's fake-quant stack never ships
    (ref: SURVEY §3.4). Stacked layers are converted with vmap.

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
        qd = jax.vmap(lambda w: quantize_weights_real(w, bits, pack=pack_int4))(
            site["w"])
        site.pop("w")
        site.update({"w_q": qd["w_q"], "w_scale": qd["w_scale"]})
        lay[s] = site
    p["layers"] = lay
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
