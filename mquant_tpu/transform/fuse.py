"""Equivalent transforms: LayerNorm→RMSNorm fusion and mean-baking.

TPU-native rebuild of the reference's weight-space fusion algebra
(ref: fake_quant/rotation_utils.py:14-105 ``fuse_ln_linear`` /
``bake_mean_into_linear`` / ``bake_mean_into_conv``; fake_quant/module_util.py:42
``RMSN``). The reference mutates nn.Module attributes in place; here every op is a
pure function on weight arrays (computed in float64 on host for exactness — the
reference also upcasts to fp64, ref: rotation_utils.py:24) and model recipes apply
them to parameter-pytree paths.

Weight layout convention: linears store ``w`` with shape (in_features, out_features)
and optional ``b`` (out_features,); forward is ``y = x @ w + b``.

The algebra (all exact):
  * LN(x; γ, β) @ W + b  ==  RMSNorm_unit(x) @ (γ[:,None] * W) + (β @ W + b)
    provided x is zero-mean (LN's mean subtraction is a no-op). Zero-mean-ness is
    arranged by centering the *producers* of x: see :func:`center_linear_output`,
    :func:`center_embedding` (the reference's ``bake_mean_into_*``) or by an
    explicit (I - 11ᵀ/n) projection (``fc_sub_mean``,
    ref: model/visual_opt.py:492 + exam/qwen_opt.py:61-76).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _f64(x) -> np.ndarray:
    return np.asarray(x, np.float64)


def fold_norm_into_linears(
    norm_w: np.ndarray,
    norm_b: Optional[np.ndarray],
    linears: list[dict],
) -> tuple[np.ndarray, Optional[np.ndarray], list[dict]]:
    """Fold a LayerNorm/RMSNorm affine (γ, β) into downstream linear(s).

    Returns (new_norm_w=ones, new_norm_b=None, new_linears). Each linear dict has
    keys {"w": (in,out), optional "b": (out,)}; leading stacked-layer axes on w/b
    are supported (w: (..., in, out)).
    Equivalent of ``fuse_ln_linear`` (ref: fake_quant/rotation_utils.py:14-39).
    """
    g = _f64(norm_w)
    out = []
    for lin in linears:
        w = _f64(lin["w"])
        new = dict(lin)
        new["w"] = w * g[..., :, None]  # scale input rows by γ
        if norm_b is not None:
            beta = _f64(norm_b)  # (i,) or layer-stacked (L, i)
            contrib = np.einsum("...i,...io->...o", beta, w)
            b = _f64(lin["b"]) if lin.get("b") is not None else 0.0
            new["b"] = b + contrib
        out.append(new)
    return np.ones_like(g), None, out


def fold_norm_into_linears_blockdiag(
    norm_w: np.ndarray,
    norm_b: Optional[np.ndarray],
    linear: dict,
    repeats: int,
) -> tuple[np.ndarray, Optional[np.ndarray], dict]:
    """Block-diagonal variant for merged-patch projectors whose linear input is
    ``repeats`` concatenated copies of the normed vector (Qwen2-VL merger:
    ln_q output of dim D feeds mlp[0] of input dim repeats*D).
    Equivalent of ``fuse_merger_linear`` (ref: fake_quant/rotation_utils.py:42-73,
    qwen2vl_rotation.py:71-83).
    """
    g = np.tile(_f64(norm_w), repeats)
    w = _f64(linear["w"])
    new = dict(linear)
    new["w"] = w * g[:, None]
    if norm_b is not None:
        beta = np.tile(_f64(norm_b), repeats)
        b = _f64(linear["b"]) if linear.get("b") is not None else 0.0
        new["b"] = b + beta @ w
    return np.ones_like(_f64(norm_w)), None, new


def center_linear_output(linear: dict) -> dict:
    """Make a linear's outputs exactly zero-mean: W -= rowwise-mean over the out
    axis, b -= mean(b). After this, a downstream LayerNorm's mean subtraction is
    a no-op, so LN → RMSNorm is exact.
    Equivalent of ``bake_mean_into_linear`` (ref: fake_quant/rotation_utils.py:92-105).
    """
    w = _f64(linear["w"])
    new = dict(linear)
    new["w"] = w - w.mean(axis=-1, keepdims=True)
    if linear.get("b") is not None:
        b = _f64(linear["b"])
        new["b"] = b - b.mean()
    return new


def center_conv_output(kernel: np.ndarray, bias: Optional[np.ndarray]):
    """Same as :func:`center_linear_output` for a conv kernel laid out
    (..., out_channels) — the out-channel mean is removed.
    Equivalent of ``bake_mean_into_conv`` (ref: fake_quant/rotation_utils.py:76-89).
    """
    k = _f64(kernel)
    k = k - k.mean(axis=-1, keepdims=True)
    if bias is not None:
        b = _f64(bias)
        return k, b - b.mean()
    return k, None


def center_embedding(embed_w: np.ndarray) -> np.ndarray:
    """Center each embedding row so token embeddings are zero-mean (exactness of
    the first decoder block's LN→RMSN fusion)."""
    e = _f64(embed_w)
    return e - e.mean(axis=-1, keepdims=True)


def sub_mean_matrix(n: int) -> np.ndarray:
    """The (I - 11ᵀ/n) projection as an explicit matrix, for sites where
    centering cannot be folded upstream (Qwen-VL's ln_pre → fc_sub_mean,
    ref: exam/qwen_opt.py:61-76, model/visual_opt.py:492)."""
    return np.eye(n) - np.ones((n, n)) / n


def fold_layerscale_into_linear(linear: dict, ls_gamma: np.ndarray) -> dict:
    """Fold a LayerScale (per-channel output multiplier, InternVL ls1/ls2) into
    the producing linear's output columns.
    Equivalent of ``fuse_internvl``'s LayerScale folding
    (ref: fake_quant/quant_utils.py:527-540)."""
    g = _f64(ls_gamma)
    w = _f64(linear["w"])
    new = dict(linear)
    new["w"] = w * g[None, :]
    if linear.get("b") is not None:
        new["b"] = _f64(linear["b"]) * g
    return new
