"""Offline orthogonal rotations folded into weights (QuaRot-style).

TPU-native rebuild of the reference rotation toolkit (ref: fake_quant/
rotation_utils.py:244-641 and the per-model variants qwen2vl_rotation.py /
internvl_rotation.py / minicpmv_rotation.py). The reference walks nn.Module
attributes and mutates ``.weight`` in place; here every op is a pure float64
function on weight arrays. Model recipes in ``mquant_tpu.models`` compose these
over parameter-pytree paths.

Math conventions (w: (in, out), forward y = x @ w + b, Q orthogonal):
  * rotate the *hidden stream* h → h @ Q:
      - producers of h (embeddings, o_proj, down_proj, lm-head input):
        output-side fold  w' = w @ Q, b' = b @ Q
      - consumers of h (q/k/v/gate/up, lm_head):
        input-side fold   w' = Qᵀ @ w
  * per-head rotation of the V/O channel (rotate_ov_proj): V's output and O's
    input are rotated head-block-wise with a head_dim×head_dim Q.
  * online Hadamard before down_proj: fold Hᵀ into down_proj's input side
    offline, apply H to activations at runtime (the Pallas FWHT kernel).

All folds are exact in fp64; tests assert fp-model output invariance.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _f64(x):
    return np.asarray(x, np.float64)


def rotate_linear_input(linear: dict, Q: np.ndarray) -> dict:
    """w' = Qᵀ w  (consumer of a rotated stream). Supports stacked (..., in, out)."""
    new = dict(linear)
    new["w"] = np.einsum("ij,...jo->...io", _f64(Q).T, _f64(linear["w"]))
    return new


def rotate_linear_output(linear: dict, Q: np.ndarray) -> dict:
    """w' = w Q, b' = b Q  (producer of a rotated stream)."""
    new = dict(linear)
    new["w"] = np.einsum("...io,oj->...ij", _f64(linear["w"]), _f64(Q))
    if linear.get("b") is not None:
        new["b"] = np.einsum("...o,oj->...j", _f64(linear["b"]), _f64(Q))
    return new


def rotate_embedding(embed_w: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """E' = E Q (embedding rows live in the rotated stream),
    equivalent of ``rotate_embeddings`` (ref: fake_quant/rotation_utils.py:244-258)."""
    return np.einsum("vh,hj->vj", _f64(embed_w), _f64(Q))


def rotate_conv_output(kernel: np.ndarray, bias: Optional[np.ndarray], Q: np.ndarray):
    """Rotate a conv patch-embed's output channels (kernel (..., out))."""
    k = np.einsum("...o,oj->...j", _f64(kernel), _f64(Q))
    b = None if bias is None else np.einsum("o,oj->j", _f64(bias), _f64(Q))
    return k, b


def rotate_ov_per_head(
    v_proj: dict, o_proj: dict, head_dim: int, Q_head: np.ndarray,
    n_kv_heads: Optional[int] = None, n_heads: Optional[int] = None,
) -> tuple[dict, dict]:
    """Per-head rotation of the V→O channel
    (ref: fake_quant/rotation_utils.py:431-468 ``rotate_ov_proj``).

    v_proj output axis is (n_kv_heads · head_dim): each head's slice gets
    out-rotated by Q_head. o_proj input axis is (n_heads · head_dim): each head's
    slice gets in-rotated. GQA is handled naturally — V has n_kv_heads blocks, O
    has n_heads blocks, and rotation within each head's block commutes with the
    broadcast of KV heads to query groups.
    """
    Qh = _f64(Q_head)
    wv = _f64(v_proj["w"])  # (..., in, kvh*hd)
    *lead, fin, fout = wv.shape
    kvh = (fout // head_dim) if n_kv_heads is None else n_kv_heads
    wv = wv.reshape(*lead, fin, kvh, head_dim) @ Qh
    new_v = dict(v_proj)
    new_v["w"] = wv.reshape(*lead, fin, fout)
    if v_proj.get("b") is not None:
        bv = _f64(v_proj["b"]).reshape(*lead, kvh, head_dim) @ Qh
        new_v["b"] = bv.reshape(*lead, fout)

    wo = _f64(o_proj["w"])  # (..., h*hd, out)
    *lead, fin, fout = wo.shape
    h = (fin // head_dim) if n_heads is None else n_heads
    wo = np.einsum("ij,...hjo->...hio", Qh.T, wo.reshape(*lead, h, head_dim, fout))
    new_o = dict(o_proj)
    new_o["w"] = wo.reshape(*lead, fin, fout)
    return new_v, new_o


def pad_linear_input(linear: dict, new_in: int) -> dict:
    """Zero-pad a linear's input dim (down_proj padding to a Hadamard-friendly
    size, ref: fake_quant/rotation_utils.py:588-621 ``need_pad`` path)."""
    w = _f64(linear["w"])
    *lead, fin, fout = w.shape
    assert new_in >= fin
    pad = np.zeros((*lead, new_in - fin, fout))
    new = dict(linear)
    new["w"] = np.concatenate([w, pad], axis=-2)
    return new


def pad_linear_output(linear: dict, new_out: int) -> dict:
    """Zero-pad a linear's output dim (the matching up/gate-side pad)."""
    w = _f64(linear["w"])
    *lead, fin, fout = w.shape
    assert new_out >= fout
    new = dict(linear)
    new["w"] = np.concatenate([w, np.zeros((*lead, fin, new_out - fout))], axis=-1)
    if linear.get("b") is not None:
        b = _f64(linear["b"])
        new["b"] = np.concatenate([b, np.zeros((*b.shape[:-1], new_out - fout))], axis=-1)
    return new


def fold_exact_hadamard_input(linear: dict, M: np.ndarray) -> dict:
    """Fold the online Hadamard into a linear's input side: w' = M w.

    The runtime op ``online_hadamard(x)`` computes x @ Mᵀ (M =
    ``transform_matrix(n)``; row-vector convention), so the function-preserving
    fold is (x Mᵀ)(M w) = x w — M is orthogonal. Equivalent of
    ``apply_exact_had_to_linear(..., output=False)``
    (ref: fake_quant/hadamard_utils.py:135-191)."""
    return rotate_linear_input(linear, _f64(M).T)  # Qᵀ w with Q = Mᵀ → M w


def fold_exact_hadamard_input_block(linear: dict, block: int) -> dict:
    """Fold a BLOCK-diagonal Hadamard (I_{n/block} ⊗ H_block) into a linear's
    input side: each ``block``-wide slice of the input dim gets w' = H w.

    Function-preserving partner of the runtime ``online_had="block"`` path
    (layers._online_hadamard), which applies x_blk @ Hᵀ per block. One
    MXU-perfect (…,b)@(b,b) matmul at serve time instead of the full
    Kronecker transform — the TPU-side trade of spreading width for speed."""
    from .hadamard import transform_matrix

    Hb = transform_matrix(block)  # symmetric orthonormal for pow2 sizes
    w = _f64(linear["w"])
    *lead, fin, fout = w.shape
    assert fin % block == 0, (fin, block)
    wr = np.einsum("ij,...kjo->...kio", _f64(Hb),
                   w.reshape(*lead, fin // block, block, fout))
    new = dict(linear)
    new["w"] = wr.reshape(*lead, fin, fout)
    return new


def fold_exact_hadamard_output_per_head(linear: dict, head_dim: int) -> dict:
    """Fold an exact (unrandomized) head_dim-Hadamard into a linear's output in
    per-head blocks (the reference applies this to v_proj with ``had_dim=head_dim``,
    ref: hadamard_utils.py:154-167)."""
    from .hadamard import transform_matrix

    Hh = transform_matrix(head_dim)
    w = _f64(linear["w"])
    *lead, fin, fout = w.shape
    h = fout // head_dim
    wr = w.reshape(*lead, fin, h, head_dim) @ Hh
    new = dict(linear)
    new["w"] = wr.reshape(*lead, fin, fout)
    if linear.get("b") is not None:
        b = _f64(linear["b"]).reshape(*lead, h, head_dim) @ Hh
        new["b"] = b.reshape(*lead, fout)
    return new


# ---------------------------------------------------------------------------
# RMS split (Rotation Magnitude Suppression)
# ---------------------------------------------------------------------------


def split_first_column(linear: dict) -> dict:
    """Split a linear into the first input column (kept in fp) and the rest.

    The offline rotation concentrates the hidden-stream mean into channel 0
    (the Hadamard matrix's all-ones first row), creating a large outlier; RMS
    keeps that single channel in floating point and quantizes only channels 1:.
    Equivalent of ``ActQuantWrapper.split_weights``
    (ref: fake_quant/quant_utils.py:316-328); the runtime forward computes
    ``x[..., :1] @ w_col0 + quant(x[..., 1:]) @ w_rest``
    (ref: quant_utils.py:367-376).

    Returns {"w_col0": (..., 1, out), "w": (..., in-1, out), "b": ...}.
    """
    w = _f64(linear["w"])
    out = dict(linear)
    out["w_col0"] = w[..., :1, :]
    out["w"] = w[..., 1:, :]
    return out
