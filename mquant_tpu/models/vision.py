"""Generic quantizable vision transformer tower + cross-modal projectors.

Covers the vision encoders of all five supported VLMs via config flags:
Qwen2-VL's ViT (2D rotary, patch-merger MLP), Qwen-VL's CLIP-style ViT
(learned pos embeds, resampler cross-attention), InternVL2's InternViT
(LayerScale, pixel-shuffle + mlp1), MiniCPM-V's SigLIP, GLM-4V's EVA2CLIP
(GLU projector + conv downsample).

TPU-first design notes:
  * The patch-embed "conv" (kernel == stride) IS a linear over flattened patch
    pixels — implemented as patchify + qlinear, so the MXU sees one big GEMM and
    the quant site is an ordinary linear (the reference wraps Conv2d/Conv3d in
    ActQuantWrapper and needs im2col GPTQ machinery, ref:
    fake_quant/gptq/gptq_utils.py:15-57; here it is just another linear site).
  * Blocks are stacked + scanned like the LLM decoder.
  * Norms are LayerNorm pre-fusion and RMSNorm post-fusion — a config flag flips
    the forward (the fusion recipe bakes means so the flip is exact, ref:
    fake_quant/rotation_utils.py:76-105).
  * Variable-resolution inputs are handled by fixed-size token buckets + a
    validity mask (XLA static shapes; masked attention + masked calibration
    stats, SURVEY §7.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from .layers import SiteSpec, qlinear

VIT_SITES = ("q", "k", "v", "o", "fc1", "fc2")


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    width: int
    n_layers: int
    n_heads: int
    mlp_width: int
    patch_dim: int  # flattened patch pixel count (e.g. 3*14*14 or 3*2*14*14)
    n_pos: int = 0  # learned positional embeddings (0 = none / rotary)
    norm_kind: str = "ln"  # "ln" pre-fusion, "rmsn" post-fusion
    act: str = "gelu"  # gelu | quick_gelu | gelu_tanh
    rotary_2d: bool = False  # Qwen2-VL vision rotary
    layerscale: bool = False  # InternVL ls1/ls2 (folded away by fusion)
    qkv_bias: bool = True
    norm_eps: float = 1e-6
    head_dim: int = 0
    pre_norm: bool = False  # CLIP-style ln_pre before blocks
    post_norm: bool = False  # ln_post after blocks
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(self, "head_dim", self.width // self.n_heads)


def init_vit_params(cfg: ViTConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    k = jax.random.split(key, 10)
    Lx, W, M = cfg.n_layers, cfg.width, cfg.mlp_width
    hd, H = cfg.head_dim, cfg.n_heads

    def w(key, *shape, scale=None):
        scale = scale or (1.0 / (shape[-2] ** 0.5))
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def norm(shape):
        d = {"w": jnp.ones(shape, dtype)}
        if cfg.norm_kind == "ln":
            d["b"] = jnp.zeros(shape, dtype)
        return d

    p: Dict[str, Any] = {
        "patch_embed": {"w": w(k[0], cfg.patch_dim, W), "b": jnp.zeros((W,), dtype)},
        "blocks": {
            "ln1": norm((Lx, W)),
            "q": {"w": w(k[1], Lx, W, H * hd),
                  "b": jnp.zeros((Lx, H * hd), dtype) if cfg.qkv_bias else None},
            "k": {"w": w(k[2], Lx, W, H * hd),
                  "b": jnp.zeros((Lx, H * hd), dtype) if cfg.qkv_bias else None},
            "v": {"w": w(k[3], Lx, W, H * hd),
                  "b": jnp.zeros((Lx, H * hd), dtype) if cfg.qkv_bias else None},
            "o": {"w": w(k[4], Lx, H * hd, W), "b": jnp.zeros((Lx, W), dtype)},
            "ln2": norm((Lx, W)),
            "fc1": {"w": w(k[5], Lx, W, M), "b": jnp.zeros((Lx, M), dtype)},
            "fc2": {"w": w(k[6], Lx, M, W), "b": jnp.zeros((Lx, W), dtype)},
        },
    }
    if cfg.layerscale:
        p["blocks"]["ls1"] = {"w": jnp.full((Lx, W), 0.1, dtype)}
        p["blocks"]["ls2"] = {"w": jnp.full((Lx, W), 0.1, dtype)}
    if cfg.n_pos:
        p["pos_embed"] = {"w": (jax.random.normal(k[7], (cfg.n_pos, W), jnp.float32)
                                * 0.02).astype(dtype)}
    if cfg.pre_norm:
        p["ln_pre"] = norm((W,))
    if cfg.post_norm:
        p["ln_post"] = norm((W,))
    return p


def _norm(cfg: ViTConfig, x, nparams):
    # LN vs RMSN is decided per-norm by bias presence: the fusion recipe folds
    # the affine into consumers and DROPS the bias, leaving a unit RMSNorm
    # (exact once the residual stream is mean-centered — the reference's
    # bake_mean + RMSN replacement, ref: fake_quant/rotation_utils.py:76-105).
    if cfg.norm_kind == "ln" and nparams.get("b") is not None:
        return L.layer_norm(x, nparams["w"], nparams.get("b"), cfg.norm_eps)
    return L.rms_norm(x, nparams["w"], cfg.norm_eps)


def _act(cfg: ViTConfig, x):
    if cfg.act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if cfg.act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if cfg.act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(cfg.act)


def rot2d_tables(grid_hw: jax.Array, head_dim: int, theta: float = 10000.0):
    """Qwen2-VL vision 2D rotary: half the rotary channels encode the row index,
    half the column index. grid_hw: (T, 2) int (row, col) per patch token."""
    quarter = head_dim // 4
    inv = 1.0 / (theta ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    h = grid_hw[..., 0:1].astype(jnp.float32) * inv  # (T, q)
    w_ = grid_hw[..., 1:2].astype(jnp.float32) * inv
    freqs = jnp.concatenate([h, w_], axis=-1)  # (T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, hd)
    return jnp.cos(emb), jnp.sin(emb)


def vit_preamble(cfg: ViTConfig, params: Dict, patches: jax.Array,
                 specs=None, state=None, mode: str = "fp", tape=None,
                 prefix: str = "vis") -> jax.Array:
    """Everything before the transformer blocks: patch-embed linear (+pos,
    +ln_pre, +fc_sub_mean). Factored out so the GPTQ driver can produce
    block-0 inputs."""
    specs = specs or {}
    T = patches.shape[1]
    h = qlinear(patches.astype(cfg.dtype), params["patch_embed"],
                f"{prefix}.patch_embed", specs.get(f"{prefix}.patch_embed"),
                state, mode, tape)
    if cfg.n_pos and "pos_embed" in params:
        h = h + params["pos_embed"]["w"][None, :T].astype(h.dtype)
    if cfg.pre_norm and "ln_pre" in params:
        h = _norm(cfg, h, params["ln_pre"])
        if "fc_sub_mean" in params:  # Qwen-VL explicit centering projection
            h = qlinear(h, params["fc_sub_mean"], f"{prefix}.fc_sub_mean",
                        None, None, "fp", None)
    return h


def vit_forward(
    cfg: ViTConfig,
    params: Dict,
    patches: jax.Array,  # (B, T, patch_dim) pre-extracted patch pixels
    specs: Optional[Dict[str, SiteSpec]] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    token_mask: Optional[jax.Array] = None,  # (B, T) 1=valid
    grid_hw: Optional[jax.Array] = None,  # (B, T, 2) for rotary_2d
    collect_stats: bool = False,
    collect_samples: bool = False,
    prefix: str = "vis",
):
    """Returns (features (B,T,W), stats|None)."""
    specs = specs or {}
    B, T, _ = patches.shape

    def site(nm):
        return specs.get(f"{prefix}.{nm}")

    tape0 = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
    if tape0 is not None and token_mask is not None:
        tape0.mask = token_mask
    h = vit_preamble(cfg, params, patches, specs, state, mode, tape0, prefix)

    cos = sin = None
    if cfg.rotary_2d:
        assert grid_hw is not None
        cos, sin = jax.vmap(lambda g: rot2d_tables(g, cfg.head_dim))(grid_hw)

    attn_mask = None
    if token_mask is not None:
        attn_mask = (token_mask[:, None, None, :] > 0)  # (B,1,1,T) key mask

    def body(carry, xs):
        h = carry
        bp, lst = xs
        tape = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
        if tape is not None and token_mask is not None:
            tape.mask = token_mask
        x = _norm(cfg, h, bp["ln1"])
        q = qlinear(x, bp["q"], f"{prefix}.q", site("q"), lst, mode, tape)
        k = qlinear(x, bp["k"], f"{prefix}.k", site("k"), lst, mode, tape)
        v = qlinear(x, bp["v"], f"{prefix}.v", site("v"), lst, mode, tape)
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_heads, cfg.head_dim)
        if cos is not None:
            q, k = L.apply_rope(q, k, cos, sin)
        a = L.attention(q, k, v, attn_mask)
        a = a.reshape(B, T, cfg.n_heads * cfg.head_dim)
        a = qlinear(a, bp["o"], f"{prefix}.o", site("o"), lst, mode, tape)
        if cfg.layerscale and "ls1" in bp:
            a = a * bp["ls1"]["w"].astype(a.dtype)
        h = h + a
        x = _norm(cfg, h, bp["ln2"])
        x = qlinear(x, bp["fc1"], f"{prefix}.fc1", site("fc1"), lst, mode, tape)
        x = _act(cfg, x)
        x = qlinear(x, bp["fc2"], f"{prefix}.fc2", site("fc2"), lst, mode, tape)
        if cfg.layerscale and "ls2" in bp:
            x = x * bp["ls2"]["w"].astype(x.dtype)
        h = h + x
        ys = {"stats": tape.stats} if tape is not None else {}
        if tape is not None and collect_samples:
            ys["samples"] = tape.samples
        return h, ys

    vit_site_names = {f"{prefix}.{s}" for s in VIT_SITES}
    lstate = None
    if state:
        lstate = {k: v for k, v in state.items() if k in vit_site_names} or None
    h, ys = jax.lax.scan(body, h, (params["blocks"], lstate))

    if cfg.post_norm and "ln_post" in params:
        h = _norm(cfg, h, params["ln_post"])

    stats = None
    if collect_stats:
        stats = dict(ys.get("stats", {}))
        if tape0 is not None:
            stats.update(tape0.stats)
        samples = {}
        if collect_samples:
            samples = dict(ys.get("samples", {}))
            samples.update(tape0.samples if tape0 else {})
        return h, (stats, samples)
    return h, None


# ---------------------------------------------------------------------------
# patch extraction (the TPU-native "conv")
# ---------------------------------------------------------------------------


def patchify_2d(images: jax.Array, patch: int) -> Tuple[jax.Array, jax.Array]:
    """(B, H, W, C) → ((B, T, patch*patch*C), (B, T, 2) grid coords).

    Exactly equivalent to a stride=kernel conv: one reshape/transpose, then the
    patch-embed linear runs as a single MXU GEMM.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch * patch * C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    grid = jnp.stack([rows, cols], -1).reshape(1, gh * gw, 2)
    return x, jnp.broadcast_to(grid, (B, gh * gw, 2))


def patchify_qwen2vl(images: jax.Array, patch: int = 14, temporal: int = 2,
                     merge: int = 2) -> Tuple[jax.Array, jax.Array]:
    """Qwen2-VL patchify: images (B, H, W, C) are duplicated along a temporal
    axis of 2 (stills), cut into 14×14 patches, and ordered so that each 2×2
    spatial-merge group is contiguous (the merger consumes groups of 4).
    Returns ((B, T, 2*14*14*C), (B, T, 2) grid coords)."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    x = jnp.concatenate([x[..., None, :], x[..., None, :]], axis=-2)  # temporal dup
    x = x.reshape(B, gh, gw, patch * patch * temporal * C)
    # group into 2x2 merge blocks: (B, gh/2, 2, gw/2, 2, D) → contiguous groups
    x = x.reshape(B, gh // merge, merge, gw // merge, merge, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, -1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (gh // merge, gw // merge, merge, merge), 0) * merge \
        + jax.lax.broadcasted_iota(jnp.int32, (gh // merge, gw // merge, merge, merge), 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, (gh // merge, gw // merge, merge, merge), 1) * merge \
        + jax.lax.broadcasted_iota(jnp.int32, (gh // merge, gw // merge, merge, merge), 3)
    grid = jnp.stack([rows.reshape(-1), cols.reshape(-1)], -1)[None]
    return x, jnp.broadcast_to(grid, (B, gh * gw, 2))


# ---------------------------------------------------------------------------
# Qwen2-VL merger (cross-modal projector)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MergerConfig:
    context_dim: int  # ViT width
    out_dim: int  # LLM hidden
    merge: int = 2  # spatial merge factor (2 → groups of 4)
    norm_kind: str = "ln"
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def in_dim(self) -> int:
        return self.context_dim * self.merge * self.merge


def init_merger_params(cfg: MergerConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    k1, k2 = jax.random.split(key)

    def w(key, i, o):
        return (jax.random.normal(key, (i, o), jnp.float32) / i**0.5).astype(dtype)

    p = {
        "ln_q": {"w": jnp.ones((cfg.context_dim,), dtype)},
        "mlp0": {"w": w(k1, cfg.in_dim, cfg.in_dim), "b": jnp.zeros((cfg.in_dim,), dtype)},
        "mlp2": {"w": w(k2, cfg.in_dim, cfg.out_dim), "b": jnp.zeros((cfg.out_dim,), dtype)},
    }
    if cfg.norm_kind == "ln":
        p["ln_q"]["b"] = jnp.zeros((cfg.context_dim,), dtype)
    return p


def merger_forward(cfg: MergerConfig, params, x: jax.Array,
                   specs=None, state=None, mode="fp",
                   collect_stats=False, collect_samples=False,
                   token_mask=None):
    """x: (B, T, context_dim) with T divisible by merge² and merge groups
    contiguous → (B, T/merge², out_dim). The Qwen2-VL cross-modal module
    (ref: fake_quant/qwen2vl_rotation.py:71-83 merger fusion; wrap map
    fake_quant/quant_utils.py:559-573)."""
    specs = specs or {}
    tape = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
    g = cfg.merge * cfg.merge
    B, T, D = x.shape
    if cfg.norm_kind == "ln" and params["ln_q"].get("b") is not None:
        x = L.layer_norm(x, params["ln_q"]["w"], params["ln_q"].get("b"), cfg.norm_eps)
    else:
        x = L.rms_norm(x, params["ln_q"]["w"], cfg.norm_eps)
    x = x.reshape(B, T // g, g * D)
    if tape is not None and token_mask is not None:
        tape.mask = token_mask[:, ::g]
    x = qlinear(x, params["mlp0"], "merger.mlp0", specs.get("merger.mlp0"),
                state, mode, tape)
    x = jax.nn.gelu(x, approximate=False)
    x = qlinear(x, params["mlp2"], "merger.mlp2", specs.get("merger.mlp2"),
                state, mode, tape)
    if collect_stats:
        return x, (tape.stats, tape.samples)
    return x, None
