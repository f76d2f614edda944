"""Whole-VLM transform recipes: vision towers, projectors, resamplers.

Equivalents of the reference per-model rotation modules:
  * ``fuse_vit`` / ``rotate_vit``      — ref: qwen2vl_rotation.py:50-69 (+ the
    Qwen-VL/InternVL/SigLIP variants rotation_utils.py:137-230,
    internvl_rotation.py:161-207, minicpmv_rotation.py:28-57)
  * ``fuse_merger`` / merger input rotation — ref: qwen2vl_rotation.py:71-83,
    195-223 (block-diagonal over the 2×2-merge groups)
  * ``fuse_mlp1`` / mlp1 rotation      — ref: internvl_rotation.py:126-150
  * ``fuse_resampler`` / ``rotate_resampler`` — ref: rotation_utils.py:309-371,
    488-516 (independent Q_q/Q_kv/Q_o) + minicpmv_rotation.py:59-95 (pos_embed
    divided by ln_kv γ)

Exactness strategy (LN towers): every producer feeding a LayerNorm'd stream is
mean-centered (``bake_mean``), after which LN ≡ affine·RMSNorm; the affine folds
into consumers and the norm keeps only a unit weight (bias dropped — the
forward dispatches LN vs RMSN on bias presence). GLM-4V's vision tower is NOT
fused/rotated: its stream feeds a conv (not an LN), so mean-centering would
change the function — matching the reference, which ships no GLM rotation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from ..models.vision import ViTConfig, MergerConfig
from ..models.resampler import ResamplerConfig
from . import fuse as F
from . import hadamard as H
from . import rotate as R
from .recipes import _cast_like, _to_np64


def _drop_bias(norm: dict) -> dict:
    return {"w": np.ones_like(np.asarray(norm["w"], np.float64))}


# ---------------------------------------------------------------------------
# ViT tower
# ---------------------------------------------------------------------------


def fuse_vit(cfg: ViTConfig, params: Dict) -> Dict:
    """LN→RMSN fusion of a residual ViT tower (exact)."""
    p = _to_np64(params)
    blocks = p["blocks"]

    # 0. LayerScale folds into the producing linears first (InternVL ls1/ls2,
    #    ref: fake_quant/quant_utils.py:527-540)
    if "ls1" in blocks:
        blocks["o"] = _fold_ls(blocks["o"], blocks["ls1"]["w"])
        blocks["fc2"] = _fold_ls(blocks["fc2"], blocks["ls2"]["w"])
        blocks["ls1"] = {"w": np.ones_like(blocks["ls1"]["w"])}
        blocks["ls2"] = {"w": np.ones_like(blocks["ls2"]["w"])}

    # 1. center every producer of the residual stream
    if not cfg.pre_norm:
        p["patch_embed"] = F.center_linear_output(p["patch_embed"])
        if "pos_embed" in p:
            p["pos_embed"]["w"] = F.center_embedding(p["pos_embed"]["w"])
    blocks["o"] = F.center_linear_output(blocks["o"])
    blocks["fc2"] = F.center_linear_output(blocks["fc2"])

    # 2. fold ln1 → q,k,v ; ln2 → fc1 (stacked over layers)
    _, _, qkv = F.fold_norm_into_linears(blocks["ln1"]["w"], blocks["ln1"].get("b"),
                                         [blocks["q"], blocks["k"], blocks["v"]])
    blocks["q"], blocks["k"], blocks["v"] = qkv
    blocks["ln1"] = _drop_bias(blocks["ln1"])
    _, _, fc1 = F.fold_norm_into_linears(blocks["ln2"]["w"], blocks["ln2"].get("b"),
                                         [blocks["fc1"]])
    blocks["fc1"] = fc1[0]
    blocks["ln2"] = _drop_bias(blocks["ln2"])
    # ln_pre (CLIP) stays a full LN: its output IS the stream (fc_sub_mean makes
    # it zero-mean downstream, ref: model/visual_opt.py:492); ln_post folds into
    # the projector's first linear via the family recipe (fold_ln_post_into).
    return _cast_like(p, params)


def _fold_ls(linear: dict, g):
    new = dict(linear)
    new["w"] = np.asarray(linear["w"], np.float64) * np.asarray(g, np.float64)[..., None, :]
    if linear.get("b") is not None:
        new["b"] = np.asarray(linear["b"], np.float64) * np.asarray(g, np.float64)
    return new


def fold_ln_post_into(vit_params: Dict, consumers: list[dict]) -> tuple[Dict, list]:
    """Fold the tower's final LN affine into downstream linear(s) (projector
    first layer / resampler kv_proj). Requires the stream already centered."""
    vp = _to_np64(vit_params)
    ln = vp["ln_post"]
    _, _, new_consumers = F.fold_norm_into_linears(
        ln["w"], ln.get("b"), [_to_np64(c) for c in consumers])
    vp["ln_post"] = _drop_bias(ln)
    out_consumers = [_cast_like(nc, c) for nc, c in zip(new_consumers, consumers)]
    return _cast_like(vp, vit_params), out_consumers


def rotate_vit(cfg: ViTConfig, params: Dict, key: jax.Array, mode: str = "hadamard",
               rotate_ov: bool = True, Q: Optional[np.ndarray] = None,
               online_had_fc2: bool = False,
               ) -> tuple[Dict, np.ndarray, int]:
    """Rotate the ViT residual stream (post-fusion). Returns (params, Q_v,
    fc2_pad) — the caller must also input-rotate the stream's consumer
    (projector/resampler) with the same Q_v.

    ``online_had_fc2`` pads the MLP hidden dim to a Hadamard-constructible size
    and folds the exact Hadamard into fc2's input — the reference's visual
    online-Hadamard path (ref: fake_quant/minicpmv_rotation.py:130-160 visual
    fc2 pad; exam/quant_qwenvl.py:106-178 ``--online_visual_hadamard``)."""
    p = _to_np64(params)
    blocks = p["blocks"]
    if Q is None:
        Q = H.get_orthogonal_matrix(cfg.width, mode, key)

    if cfg.pre_norm:
        # CLIP-style towers: the stream starts at ln_pre's output, which cannot
        # be rotated through the LN — the rotation enters via fc_sub_mean's
        # OUTPUT side (the reference's fc_sub_mean rotation,
        # ref: rotation_utils.py:559-561); patch_embed/pos stay unrotated.
        assert "fc_sub_mean" in p, "pre_norm tower rotation needs fc_sub_mean"
        p["fc_sub_mean"] = R.rotate_linear_output(p["fc_sub_mean"], Q)
    else:
        p["patch_embed"] = R.rotate_linear_output(p["patch_embed"], Q)
        if "pos_embed" in p:
            p["pos_embed"]["w"] = R.rotate_embedding(p["pos_embed"]["w"], Q)
    for s in ("q", "k", "v"):
        blocks[s] = R.rotate_linear_input(blocks[s], Q)
    blocks["o"] = R.rotate_linear_output(blocks["o"], Q)
    blocks["fc1"] = R.rotate_linear_input(blocks["fc1"], Q)
    blocks["fc2"] = R.rotate_linear_output(blocks["fc2"], Q)
    if rotate_ov:
        Qh = H.transform_matrix(cfg.head_dim)
        blocks["v"], blocks["o"] = R.rotate_ov_per_head(
            blocks["v"], blocks["o"], cfg.head_dim, Qh)

    fc2_pad = 0
    if online_had_fc2:
        inter = blocks["fc2"]["w"].shape[-2]
        target = H.auto_pad_size(inter)
        if target != inter:
            # padded fc1-out channels carry zero weight AND zero bias, so the
            # activation of a padded channel is act(0) = 0 (gelu/quick_gelu) and
            # fc2's padded input rows are zero — exact
            blocks["fc1"] = R.pad_linear_output(blocks["fc1"], target)
            blocks["fc2"] = R.pad_linear_input(blocks["fc2"], target)
            fc2_pad = target
        Hm = H.transform_matrix(target)
        blocks["fc2"] = R.fold_exact_hadamard_input(blocks["fc2"], Hm)
    return _cast_like(p, params), Q, fc2_pad


def split_vit_fc2(params: Dict) -> Dict:
    """RMS first-column split of every ViT block's fc2 (the reference's
    ``--visual_split``, ref: exam/quant_qwenvl.py:106-178: GPTQ/quant target
    c_proj.L2, column 0 stays fp). Pure slicing — exact in any dtype."""
    p = dict(params)
    blocks = dict(p["blocks"])
    fc2 = dict(blocks["fc2"])
    w = fc2["w"]
    fc2["w_col0"] = w[..., :1, :]
    fc2["w"] = w[..., 1:, :]
    blocks["fc2"] = fc2
    p["blocks"] = blocks
    return p


def rotate_consumer_blockdiag(linear: dict, Q: np.ndarray, repeats: int) -> dict:
    """Input-rotate a consumer whose input is `repeats` concatenated stream
    vectors (merger mlp0, InternVL mlp1 fc1): fold kron(I_repeats, Qᵀ)
    (ref: qwen2vl_rotation.py:195-209, internvl_rotation.py:126-136)."""
    w = np.asarray(linear["w"], np.float64)
    *lead, fin, fout = w.shape
    n = Q.shape[0]
    assert fin == repeats * n, (fin, repeats, n)
    wr = w.reshape(*lead, repeats, n, fout)
    wr = np.einsum("ij,...rjo->...rio", np.asarray(Q, np.float64).T, wr)
    new = dict(linear)
    new["w"] = wr.reshape(*lead, fin, fout)
    return new


# ---------------------------------------------------------------------------
# Qwen2-VL merger
# ---------------------------------------------------------------------------


def fuse_merger(cfg: MergerConfig, params: Dict) -> Dict:
    """Fold merger ln_q block-diagonally into mlp0 (ref: rotation_utils.py:42-73
    ``fuse_merger_linear``). Exact when the ViT stream is centered."""
    p = _to_np64(params)
    g = cfg.merge * cfg.merge
    _, _, mlp0 = F.fold_norm_into_linears_blockdiag(
        p["ln_q"]["w"], p["ln_q"].get("b"), p["mlp0"], repeats=g)
    p["mlp0"] = mlp0
    p["ln_q"] = _drop_bias(p["ln_q"])
    return _cast_like(p, params)


# ---------------------------------------------------------------------------
# InternVL mlp1
# ---------------------------------------------------------------------------


def fuse_mlp1(params: Dict, repeats: int = 4) -> Dict:
    """Fold mlp1's LN into fc1 (input is `repeats` pixel-shuffled stream copies —
    but mlp1's LN spans the FULL concatenated dim, so a plain fold applies)."""
    p = _to_np64(params)
    _, _, fc1 = F.fold_norm_into_linears(p["ln"]["w"], p["ln"].get("b"), [p["fc1"]])
    p["fc1"] = fc1[0]
    p["ln"] = _drop_bias(p["ln"])
    return _cast_like(p, params)


# ---------------------------------------------------------------------------
# resampler (Qwen-VL attn_pool / MiniCPM-V)
# ---------------------------------------------------------------------------


def fuse_resampler(cfg: ResamplerConfig, params: Dict) -> Dict:
    """Fold resampler norms into their consumers (ref: minicpmv_rotation.py:59-95,
    rotation_utils.py:158-219): ln_q → q_proj, ln_kv → k/v (pos_embed_kv divided
    by ln_kv γ), ln_post → proj_fc; producers centered so LN ≡ RMSN."""
    p = _to_np64(params)

    # center producers of each LN's input
    if cfg.has_kv_proj and "kv_proj" in p:
        p["kv_proj"] = F.center_linear_output(p["kv_proj"])
    p["query"]["w"] = F.center_embedding(p["query"]["w"])
    p["out"] = F.center_linear_output(p["out"])

    g_kv = p["ln_kv"]["w"]
    _, _, kvlin = F.fold_norm_into_linears(g_kv, p["ln_kv"].get("b"),
                                           [p["k"], p["v"]])
    p["k"], p["v"] = kvlin
    if "pos_embed_kv" in p:
        # k's input is (ln_kv(x) + pos); after folding γ into k, pos must be
        # pre-divided by γ (ref: minicpmv_rotation.py:76-83)
        p["pos_embed_kv"]["w"] = p["pos_embed_kv"]["w"] / g_kv
    p["ln_kv"] = _drop_bias(p["ln_kv"])

    _, _, qlin_ = F.fold_norm_into_linears(p["ln_q"]["w"], p["ln_q"].get("b"),
                                           [p["q"]])
    p["q"] = qlin_[0]
    p["ln_q"] = _drop_bias(p["ln_q"])

    if "proj_fc" in p:
        _, _, pf = F.fold_norm_into_linears(p["ln_post"]["w"], p["ln_post"].get("b"),
                                            [p["proj_fc"]])
        p["proj_fc"] = pf[0]
        p["ln_post"] = _drop_bias(p["ln_post"])
    return _cast_like(p, params)


def prepare_vlm(
    family_name: str,
    cfg,
    params: Dict,
    key: jax.Array,
    rotate: bool = True,
    rotate_visual: bool = True,
    rotate_llm: bool = True,
    mode: str = "hadamard",
    online_had_down: bool = True,
    online_had_mode: str = "full",  # "block": I ⊗ H_128 TPU fast path
    split_down: bool = False,
    online_had_visual: bool = False,
    split_visual: bool = False,
) -> tuple[Dict, Dict]:
    """Full offline equivalent-transform pipeline for one VLM family:
    fuse (LN→RMSN everywhere) → rotate (vision stream Q_v, cross-attn Q_q/Q_kv/
    Q_o, LLM stream Q, per-head OV) → pad+fold online Hadamard → RMS split.

    The one-stop equivalent of the reference's fuse_*_layer_norms +
    rotate_*_model drivers (ref: exam/quant_*.py main()). Returns
    (params, info dict)."""
    from .recipes import (RotationInfo, fuse_decoder, rotate_decoder,
                          split_decoder_down)

    p = dict(params)
    info: Dict = {"family": family_name}
    k_v, k_r, k_l = jax.random.split(key, 3)

    # ---- fuse ----
    p["llm"] = fuse_decoder(cfg.llm, p["llm"])
    if family_name == "qwen2vl":
        p["vit"] = fuse_vit(cfg.vit, p["vit"])
        p["merger"] = fuse_merger(cfg.merger, p["merger"])
    elif family_name in ("qwenvl", "minicpmv"):
        p["vit"] = fuse_vit(cfg.vit, p["vit"])
        if cfg.vit.post_norm:
            p["vit"], (kvp,) = fold_ln_post_into(p["vit"], [p["res"]["kv_proj"]])
            p["res"] = dict(p["res"])
            p["res"]["kv_proj"] = kvp
        p["res"] = fuse_resampler(cfg.resampler, p["res"])
    elif family_name == "internvl":
        p["vit"] = fuse_vit(cfg.vit, p["vit"])
        p["proj"] = fuse_mlp1(p["proj"])
    elif family_name == "glm4v":
        # GLM-4V vision stream feeds a conv (not an LN): no vision fusion or
        # rotation (parity: the reference ships no GLM rotation module)
        rotate_visual = False

    if not rotate:
        return p, info

    # ---- rotate: vision stream ----
    Q_v = None
    if rotate_visual and family_name != "glm4v":
        p["vit"], Q_v, fc2_pad = rotate_vit(cfg.vit, p["vit"], k_v, mode,
                                            online_had_fc2=online_had_visual)
        info["vit_rotated"] = True
        if online_had_visual:
            info["vis_online_had"] = True
            info["vis_fc2_pad"] = fc2_pad
        if split_visual:
            p["vit"] = split_vit_fc2(p["vit"])
            info["vis_split"] = True
        if family_name == "qwen2vl":
            p["merger"] = dict(p["merger"])
            p["merger"]["mlp0"] = rotate_consumer_blockdiag(
                _to_np64(p["merger"]["mlp0"]), Q_v, cfg.merger.merge ** 2)
            p["merger"]["mlp0"] = _cast_like(p["merger"]["mlp0"], params["merger"]["mlp0"])
        elif family_name == "internvl":
            p["proj"] = dict(p["proj"])
            fc1 = rotate_consumer_blockdiag(_to_np64(p["proj"]["fc1"]), Q_v,
                                            cfg.mlp1.downsample ** 2)
            p["proj"]["fc1"] = _cast_like(fc1, params["proj"]["fc1"])
        elif family_name in ("qwenvl", "minicpmv"):
            pass  # handled inside rotate_resampler via Q_vit

    # ---- rotate: cross-attention (resampler families) ----
    if rotate_visual and family_name in ("qwenvl", "minicpmv"):
        p["res"] = rotate_resampler(cfg.resampler, p["res"], k_r, mode, Q_vit=Q_v)
        info["resampler_rotated"] = True

    # ---- rotate: LLM stream (+ image-feature producers into rotated space) ----
    if not rotate_llm:  # ref --rotate without --rotate_llm: vision-only
        return p, info
    Q_l = H.get_orthogonal_matrix(cfg.llm.hidden, mode, k_l)
    p["llm"], rinfo = rotate_decoder(cfg.llm, p["llm"], k_l, mode=mode,
                                     online_had_down=online_had_down,
                                     online_had_mode=online_had_mode, Q=Q_l)
    info["llm"] = rinfo
    producer = {"qwen2vl": ("merger", "mlp2"), "qwenvl": ("res", "proj_fc"),
                "minicpmv": ("res", "proj_fc"), "internvl": ("proj", "fc2"),
                "glm4v": ("proj", "4h_to_h")}[family_name]
    grp, site = producer
    p[grp] = dict(p[grp])
    lin = R.rotate_linear_output(_to_np64(p[grp][site]), Q_l)
    p[grp][site] = _cast_like(lin, params[grp][site])
    if family_name == "glm4v":
        for tokn in ("boi", "eoi"):
            v = R.rotate_embedding(_to_np64(p["proj"][tokn]["w"]), Q_l)
            p["proj"][tokn] = {"w": _cast_like(v, params["proj"][tokn]["w"])}

    if split_down:
        p["llm"] = split_decoder_down(p["llm"])
        info["split"] = True
    return p, info


def rotate_resampler(cfg: ResamplerConfig, params: Dict, key: jax.Array,
                     mode: str = "hadamard",
                     Q_vit: Optional[np.ndarray] = None) -> Dict:
    """Independent cross-attention rotations Q_q / Q_kv / Q_o
    (ref: rotation_utils.py:519-585 cross-attn section):
      * Q_vit (the vision tower's stream rotation) folds into kv_proj's input
      * Q_kv: kv_proj output side + k/v input side (and pos_embed_kv rows)
      * Q_q : query embedding output side + q input side
      * Q_o : out_proj output side + proj_fc input side
    """
    p = _to_np64(params)
    k1, k2, k3 = jax.random.split(key, 3)

    if Q_vit is not None and "kv_proj" in p:
        p["kv_proj"] = R.rotate_linear_input(p["kv_proj"], Q_vit)

    Q_kv = H.get_orthogonal_matrix(cfg.width, mode, k1)
    if "kv_proj" in p:
        p["kv_proj"] = R.rotate_linear_output(p["kv_proj"], Q_kv)
        p["k"] = R.rotate_linear_input(p["k"], Q_kv)
        p["v"] = R.rotate_linear_input(p["v"], Q_kv)
        if "pos_embed_kv" in p:
            p["pos_embed_kv"]["w"] = R.rotate_embedding(p["pos_embed_kv"]["w"], Q_kv)

    Q_q = H.get_orthogonal_matrix(cfg.width, mode, k2)
    p["query"]["w"] = R.rotate_embedding(p["query"]["w"], Q_q)
    p["q"] = R.rotate_linear_input(p["q"], Q_q)

    if "proj_fc" in p:
        Q_o = H.get_orthogonal_matrix(cfg.width, mode, k3)
        p["out"] = R.rotate_linear_output(p["out"], Q_o)
        p["proj_fc"] = R.rotate_linear_input(p["proj_fc"], Q_o)
    return _cast_like(p, params)
