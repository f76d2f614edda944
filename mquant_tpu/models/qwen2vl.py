"""Qwen2-VL — the flagship model family (2B / 7B / 72B).

Functional assembly of the three quantization subsystems with separate
(MSQ) scale sets: ViT encoder (``vis.*`` sites) → patch merger (``merger.*``) →
Qwen2 LLM decoder (``llm.*``). Capability parity with the reference pipeline
``exam/quant_qwen2vl.py`` + ``fake_quant/qwen2vl_rotation.py`` + wrap map
``fake_quant/quant_utils.py:559-573``.

The multimodal splice (image features into the token stream at image-token
slots, ref: HF Qwen2-VL / model/modeling_qwen_opt.py:714-716 for Qwen-VL) is a
masked cumsum-gather — static shapes, no host sync.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .llm import DecoderConfig, decoder_forward
from .vision import (
    MergerConfig,
    ViTConfig,
    init_merger_params,
    init_vit_params,
    merger_forward,
    patchify_qwen2vl,
    vit_forward,
)
from .llm import init_decoder_params


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    name: str
    llm: DecoderConfig
    vit: ViTConfig
    merger: MergerConfig
    image_token_id: int = 151655
    spatial_merge: int = 2
    patch: int = 14

    @staticmethod
    def tiny():
        """CPU-testable miniature with the same structure."""
        return Qwen2VLConfig(
            name="qwen2vl-tiny",
            llm=DecoderConfig(vocab=256, hidden=64, n_layers=2, n_heads=4,
                              n_kv_heads=2, intermediate=96,
                              mrope_sections=(2, 3, 3), dtype=jnp.float32),
            vit=ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=48,
                          patch_dim=2 * 4 * 4 * 3, rotary_2d=True,
                          dtype=jnp.float32),
            merger=MergerConfig(context_dim=32, out_dim=64, dtype=jnp.float32),
            image_token_id=255,
            patch=4,
        )

    @staticmethod
    def qwen2vl_2b():
        return Qwen2VLConfig(
            name="Qwen2-VL-2B-Instruct",
            llm=DecoderConfig(vocab=151936, hidden=1536, n_layers=28, n_heads=12,
                              n_kv_heads=2, intermediate=8960,
                              tie_embeddings=True, mrope_sections=(16, 24, 24)),
            vit=_QWEN2VL_VIT,
            merger=MergerConfig(context_dim=1280, out_dim=1536),
        )

    @staticmethod
    def qwen2vl_7b():
        return Qwen2VLConfig(
            name="Qwen2-VL-7B-Instruct",
            llm=DecoderConfig(vocab=152064, hidden=3584, n_layers=28, n_heads=28,
                              n_kv_heads=4, intermediate=18944,
                              mrope_sections=(16, 24, 24)),
            vit=_QWEN2VL_VIT,
            merger=MergerConfig(context_dim=1280, out_dim=3584),
        )

    @staticmethod
    def qwen2vl_72b():
        return Qwen2VLConfig(
            name="Qwen2-VL-72B-Instruct",
            llm=DecoderConfig(vocab=152064, hidden=8192, n_layers=80, n_heads=64,
                              n_kv_heads=8, intermediate=29568,
                              mrope_sections=(16, 24, 24)),
            vit=_QWEN2VL_VIT,
            merger=MergerConfig(context_dim=1280, out_dim=8192),
        )


_QWEN2VL_VIT = ViTConfig(width=1280, n_layers=32, n_heads=16, mlp_width=5120,
                         patch_dim=2 * 14 * 14 * 3, rotary_2d=True,
                         act="quick_gelu", norm_eps=1e-6)


def init_qwen2vl_params(cfg: Qwen2VLConfig, key: jax.Array) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llm": init_decoder_params(cfg.llm, k1),
        "vit": init_vit_params(cfg.vit, k2),
        "merger": init_merger_params(cfg.merger, k3),
    }


# ---------------------------------------------------------------------------
# multimodal splice
# ---------------------------------------------------------------------------


def splice_image_embeds(
    text_embeds: jax.Array,  # (B, T, H)
    tokens: jax.Array,  # (B, T)
    image_embeds: jax.Array,  # (B, N, H) merged image features, in order
    image_token_id: int,
) -> jax.Array:
    """Replace embeddings at image-token slots with image features, in order.

    Static-shape scatter: the i-th image-token slot in the stream receives the
    i-th image feature row (masked cumsum gather)."""
    mask = tokens == image_token_id  # (B, T)
    idx = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, image_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(image_embeds, idx[..., None], axis=1)
    return jnp.where(mask[..., None], gathered.astype(text_embeds.dtype), text_embeds)


def mrope_positions(tokens: np.ndarray, image_token_id: int,
                    grid_thw=None, merge: int = 2) -> np.ndarray:
    """Host-side M-RoPE position ids (3, B, T) — (temporal, height, width).

    Text tokens advance all three planes together; an image span of a
    (t, h, w) patch grid gets temporal=const, height/width = merged grid coords;
    the text after an image resumes from max(position)+1 (capability parity with
    HF Qwen2-VL ``get_rope_index``).

    ``grid_thw``: one (t, h, w) tuple, or a LIST of tuples for multi-image
    prompts — the i-th contiguous image-token span consumes the i-th grid
    (HF get_rope_index walks image spans the same way)."""
    B, T = tokens.shape
    pos = np.zeros((3, B, T), np.int64)
    grids = None
    if grid_thw is not None:
        grids = list(grid_thw) if isinstance(grid_thw, list) else [grid_thw]
    for b in range(B):
        p = 0
        t_iter = 0
        img_i = 0
        while t_iter < T:
            if tokens[b, t_iter] == image_token_id and grids is not None:
                t, h, w = grids[min(img_i, len(grids) - 1)]
                img_i += 1
                hh, ww = h // merge, w // merge
                n = t * hh * ww
                ti = np.repeat(np.arange(t), hh * ww)
                hi = np.tile(np.repeat(np.arange(hh), ww), t)
                wi = np.tile(np.arange(ww), t * hh)
                pos[0, b, t_iter:t_iter + n] = p + ti
                pos[1, b, t_iter:t_iter + n] = p + hi
                pos[2, b, t_iter:t_iter + n] = p + wi
                p = p + max(t, hh, ww)
                t_iter += n
            else:
                pos[:, b, t_iter] = p
                p += 1
                t_iter += 1
    return pos


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


def qwen2vl_forward(
    cfg: Qwen2VLConfig,
    params: Dict,
    tokens: jax.Array,  # (B, T)
    patches: Optional[jax.Array] = None,  # (B, N*merge², patch_dim)
    grid_hw: Optional[jax.Array] = None,  # (B, N*merge², 2)
    specs: Optional[Dict] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    positions: Optional[jax.Array] = None,  # (3, B, T) M-RoPE ids
    cache: Optional[Dict] = None,
    collect_stats: bool = False,
    collect_samples: bool = False,
    vis_token_mask: Optional[jax.Array] = None,
):
    """End-to-end VLM forward. Returns (logits, cache, stats_by_subsystem)."""
    specs = specs or {}
    stats: Dict[str, Any] = {}
    samples: Dict[str, Any] = {}

    embeds = params["llm"]["embed"]["w"][tokens].astype(cfg.llm.dtype)
    if patches is not None:
        feats, vs = vit_forward(cfg.vit, params["vit"], patches, specs, state,
                                mode, token_mask=vis_token_mask, grid_hw=grid_hw,
                                collect_stats=collect_stats,
                                collect_samples=collect_samples)
        if vs is not None:
            stats.update(vs[0]); samples.update(vs[1])
        merged, ms = merger_forward(cfg.merger, params["merger"], feats, specs,
                                    state, mode, collect_stats=collect_stats,
                                    collect_samples=collect_samples,
                                    token_mask=vis_token_mask)
        if ms is not None:
            stats.update(ms[0]); samples.update(ms[1])
        embeds = splice_image_embeds(embeds, tokens, merged, cfg.image_token_id)

    logits, new_cache, lstats = decoder_forward(
        cfg.llm, params["llm"], embeds, specs=specs, state=state, mode=mode,
        cache=cache, positions=positions, collect_stats=collect_stats,
        collect_samples=collect_samples)
    if lstats is not None:
        stats.update(lstats[0] or {})
        samples.update(lstats[1] or {})
    return logits, new_cache, ((stats, samples) if collect_stats else None)


def default_w4a8_specs(visual_w_bits: int = 8, llm_w_bits: int = 4,
                       a_bits: int = 8, a_static: bool = True,
                       online_had: bool = True, split: bool = True,
                       observer: str = "minmax",
                       online_had_mode: str = "full") -> Dict:
    """The reference's headline config: visual w8a8 (or w4a8) + LLM w4a8, static
    activations, online Hadamard on down_proj, RMS split
    (ref: docs/qwen2vl.md command lines)."""
    from .layers import SiteSpec
    from .llm import LLM_SITES
    from .vision import VIT_SITES

    s: Dict[str, SiteSpec] = {}
    for n in VIT_SITES + ("patch_embed",):
        s[f"vis.{n}"] = SiteSpec(w_bits=visual_w_bits, a_bits=a_bits,
                                 a_static=a_static, observer=observer)
    for n in ("mlp0", "mlp2"):
        s[f"merger.{n}"] = SiteSpec(w_bits=visual_w_bits, a_bits=a_bits,
                                    a_static=a_static, observer=observer)
    for n in LLM_SITES:
        s[f"llm.{n}"] = SiteSpec(w_bits=llm_w_bits, a_bits=a_bits,
                                 a_static=a_static, observer=observer)
    if online_had:
        if online_had_mode == "block":
            s["llm.down"] = dataclasses.replace(
                s["llm.down"], online_had="block", head_dim=128, split=split)
        else:
            s["llm.down"] = dataclasses.replace(
                s["llm.down"], online_had="full", split=split)
    return s
