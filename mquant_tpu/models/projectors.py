"""Cross-modal projectors: InternVL pixel-shuffle+mlp1 and GLM-4V GLU.

(The Qwen2-VL merger lives in ``vision.py``; the perceiver resampler of
Qwen-VL/MiniCPM-V in ``resampler.py``.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import layers as L
from .layers import SiteSpec, qlinear


# ---------------------------------------------------------------------------
# InternVL2: pixel shuffle (0.5) + mlp1 = LN → fc1 → GELU → fc2
# (ref: InternVL modeling; quant wrap set mlp1[1]/mlp1[3],
#  fake_quant/quant_utils.py:543-557; rotation internvl_rotation.py:126-150)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Mlp1Config:
    vit_width: int
    out_dim: int
    downsample: int = 2  # pixel-shuffle factor (0.5 ratio → 2)
    norm_kind: str = "ln"
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def in_dim(self) -> int:
        return self.vit_width * self.downsample * self.downsample


def init_mlp1_params(cfg: Mlp1Config, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    k1, k2 = jax.random.split(key)

    def w(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.float32) / i**0.5).astype(dtype)

    p = {
        "ln": {"w": jnp.ones((cfg.in_dim,), dtype)},
        "fc1": {"w": w(k1, cfg.in_dim, cfg.out_dim), "b": jnp.zeros((cfg.out_dim,), dtype)},
        "fc2": {"w": w(k2, cfg.out_dim, cfg.out_dim), "b": jnp.zeros((cfg.out_dim,), dtype)},
    }
    if cfg.norm_kind == "ln":
        p["ln"]["b"] = jnp.zeros((cfg.in_dim,), dtype)
    return p


def pixel_shuffle(x: jax.Array, gh: int, gw: int, factor: int = 2) -> jax.Array:
    """(B, gh*gw, C) → (B, gh*gw/factor², C*factor²): merge factor×factor
    neighborhoods into the channel dim (InternVL's 0.5 pixel shuffle)."""
    B, T, C = x.shape
    x = x.reshape(B, gh, gw, C)
    x = x.reshape(B, gh // factor, factor, gw // factor, factor, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (gh // factor) * (gw // factor), factor * factor * C)


def mlp1_forward(cfg: Mlp1Config, params: Dict, x: jax.Array,
                 specs=None, state=None, mode="fp",
                 collect_stats=False, collect_samples=False,
                 token_mask=None, prefix: str = "proj"):
    """x: (B, T, in_dim) pixel-shuffled features → (B, T, out_dim)."""
    specs = specs or {}
    tape = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
    if tape is not None:
        tape.mask = token_mask
    if cfg.norm_kind == "ln" and params["ln"].get("b") is not None:
        x = L.layer_norm(x, params["ln"]["w"], params["ln"].get("b"), cfg.norm_eps)
    else:
        x = L.rms_norm(x, params["ln"]["w"], cfg.norm_eps)
    x = qlinear(x, params["fc1"], f"{prefix}.fc1", specs.get(f"{prefix}.fc1"),
                state, mode, tape)
    x = jax.nn.gelu(x, approximate=False)
    x = qlinear(x, params["fc2"], f"{prefix}.fc2", specs.get(f"{prefix}.fc2"),
                state, mode, tape)
    if collect_stats:
        return x, (tape.stats, tape.samples)
    return x, None


# ---------------------------------------------------------------------------
# GLM-4V: conv 2×2/2 downsample + GLU projector + boi/eoi tokens
# (ref: plugin/visual.py:155-215)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GluProjectorConfig:
    vit_width: int
    out_dim: int  # ChatGLM hidden
    ffn_dim: int  # ChatGLM ffn_hidden_size
    scaling_factor: float = 8.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16


def init_glu_params(cfg: GluProjectorConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.dtype
    ks = jax.random.split(key, 6)

    def w(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.float32) / i**0.5).astype(dtype)

    return {
        # conv 2x2 stride 2 ≡ linear over 2×2-merged patches (MXU-native)
        "conv": {"w": w(ks[0], cfg.vit_width * 4, cfg.out_dim),
                 "b": jnp.zeros((cfg.out_dim,), dtype)},
        "linear_proj": {"w": w(ks[1], cfg.out_dim, cfg.out_dim), "b": None},
        "norm1": {"w": jnp.ones((cfg.out_dim,), dtype),
                  "b": jnp.zeros((cfg.out_dim,), dtype)},
        "gate": {"w": w(ks[2], cfg.out_dim, cfg.ffn_dim), "b": None},
        "h_to_4h": {"w": w(ks[3], cfg.out_dim, cfg.ffn_dim), "b": None},
        "4h_to_h": {"w": w(ks[4], cfg.ffn_dim, cfg.out_dim), "b": None},
        "boi": {"w": jnp.zeros((1, cfg.out_dim), dtype)},
        "eoi": {"w": jnp.zeros((1, cfg.out_dim), dtype)},
    }


def glu_projector_forward(cfg: GluProjectorConfig, params: Dict, x: jax.Array,
                          gh: int, gw: int, specs=None, state=None, mode="fp",
                          collect_stats=False, collect_samples=False,
                          prefix: str = "proj"):
    """x: (B, gh*gw, vit_width) ViT features (cls dropped) →
    (B, 2 + gh·gw/4, out_dim) with boi/eoi tokens, /scaling_factor
    (ref: plugin/visual.py:197-215). The conv downsample is expressed as a
    linear over 2×2-merged patches."""
    specs = specs or {}
    tape = L.Tape(specs=specs, collect_samples=collect_samples) if collect_stats else None
    B = x.shape[0]
    x = pixel_shuffle(x, gh, gw, 2)  # (B, gh*gw/4, 4*width) — 2×2 merge

    def ql(x, nm):
        return qlinear(x, params[nm], f"{prefix}.{nm}", specs.get(f"{prefix}.{nm}"),
                       state, mode, tape)

    x = ql(x, "conv")
    x = ql(x, "linear_proj")
    x = L.layer_norm(x, params["norm1"]["w"], params["norm1"]["b"], cfg.norm_eps)
    x = jax.nn.gelu(x, approximate=False)
    x = jax.nn.silu(ql(x, "gate")) * ql(x, "h_to_4h")
    x = ql(x, "4h_to_h")
    boi = jnp.broadcast_to(params["boi"]["w"][None], (B, 1, cfg.out_dim)).astype(x.dtype)
    eoi = jnp.broadcast_to(params["eoi"]["w"][None], (B, 1, cfg.out_dim)).astype(x.dtype)
    x = jnp.concatenate([boi, x, eoi], axis=1) / cfg.scaling_factor
    if collect_stats:
        return x, (tape.stats, tape.samples)
    return x, None
