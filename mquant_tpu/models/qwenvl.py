"""Qwen-VL-Chat: CLIP-style ViT (+fc_sub_mean) → attn_pool resampler → Qwen LLM.

Capability parity with the reference pipeline ``exam/quant_qwenvl.py`` over the
surgically-converted checkpoint (``exam/qwen_opt.py`` splits fused projections;
``model/visual_opt.py`` rewrites the vision tower with separate q/k/v, explicit
resampler linears, precomputed positional embeddings, proj→proj_fc, and the
``fc_sub_mean`` centering projection that makes LN→RMSN fusion exact). Here the
loader performs the same surgery at weight-load time; the architecture below IS
the post-surgery layout.

Quant wrap set parity: ``qwenvl_add_act_qaunt`` (ref: fake_quant/
quant_utils.py:576-594) — visual conv1(=patch_embed linear), visual blocks,
attn_pool {kv_proj,q,k,v,out,proj_fc}, LLM decoder layers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .llm import DecoderConfig, decoder_forward, init_decoder_params
from .resampler import ResamplerConfig, init_resampler_params, resampler_forward
from .vision import ViTConfig, init_vit_params, patchify_2d, vit_forward
from .qwen2vl import splice_image_embeds


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    name: str
    llm: DecoderConfig
    vit: ViTConfig
    resampler: ResamplerConfig
    image_token_id: int = 151857  # <imgpad> in Qwen-VL vocab
    patch: int = 14

    @staticmethod
    def tiny():
        return QwenVLConfig(
            name="qwenvl-tiny",
            llm=DecoderConfig(vocab=256, hidden=64, n_layers=2, n_heads=4,
                              n_kv_heads=4, intermediate=96, rope_theta=10000.0,
                              dtype=jnp.float32),
            vit=ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=64,
                          patch_dim=4 * 4 * 3, n_pos=64, pre_norm=True,
                          post_norm=True, act="gelu", dtype=jnp.float32),
            resampler=ResamplerConfig(n_queries=4, width=64, kv_dim=32,
                                      n_heads=2, out_dim=64, dtype=jnp.float32),
            image_token_id=255,
            patch=4,
        )

    @staticmethod
    def qwenvl_chat():
        """Qwen-VL-Chat (7.7B LLM + 1.9B ViT), dims per the HF config."""
        return QwenVLConfig(
            name="Qwen-VL-Chat",
            llm=DecoderConfig(vocab=151936, hidden=4096, n_layers=32, n_heads=32,
                              n_kv_heads=32, intermediate=11008,
                              rope_theta=10000.0,
                              # Qwen-VL HF config: use_dynamic_ntk + seq_length
                              # 2048 (ref: modeling_qwen_opt.py:696-707)
                              use_dynamic_ntk=True, ntk_seq_length=2048),
            vit=ViTConfig(width=1664, n_layers=48, n_heads=16, mlp_width=8192,
                          patch_dim=14 * 14 * 3, n_pos=1024, pre_norm=True,
                          post_norm=True, act="gelu", norm_eps=1e-6),
            resampler=ResamplerConfig(n_queries=256, width=4096, kv_dim=1664,
                                      n_heads=32, out_dim=4096),
        )


def init_qwenvl_params(cfg: QwenVLConfig, key: jax.Array) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "llm": init_decoder_params(cfg.llm, k1),
        "vit": init_vit_params(cfg.vit, k2),
        "res": init_resampler_params(cfg.resampler, k3,
                                     n_pos=cfg.vit.n_pos or 1024),
    }
    # fc_sub_mean: the explicit (I − 11ᵀ/n) centering after ln_pre
    # (ref: exam/qwen_opt.py:61-76) — initialized exactly, never quantized
    import numpy as np

    from ..transform.fuse import sub_mean_matrix

    p["vit"]["fc_sub_mean"] = {
        "w": jnp.asarray(sub_mean_matrix(cfg.vit.width), cfg.vit.dtype), "b": None}
    return p


def qwenvl_forward(
    cfg: QwenVLConfig,
    params: Dict,
    tokens: jax.Array,
    patches: Optional[jax.Array] = None,  # (B, T_patches, patch_dim)
    specs: Optional[Dict] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    cache: Optional[Dict] = None,
    positions: Optional[jax.Array] = None,
    collect_stats: bool = False,
    collect_samples: bool = False,
):
    """Returns (logits, cache, stats). Image features = resampler queries
    spliced at image-token slots (ref: model/modeling_qwen_opt.py:714-716)."""
    specs = specs or {}
    stats: Dict[str, Any] = {}
    samples: Dict[str, Any] = {}

    embeds = params["llm"]["embed"]["w"][tokens].astype(cfg.llm.dtype)
    if patches is not None:
        feats, vs = vit_forward(cfg.vit, params["vit"], patches, specs, state,
                                mode, collect_stats=collect_stats,
                                collect_samples=collect_samples)
        if vs is not None:
            stats.update(vs[0]); samples.update(vs[1])
        pooled, rs = resampler_forward(cfg.resampler, params["res"], feats,
                                       specs, state, mode,
                                       collect_stats=collect_stats,
                                       collect_samples=collect_samples)
        if rs is not None:
            stats.update(rs[0]); samples.update(rs[1])
        embeds = splice_image_embeds(embeds, tokens, pooled, cfg.image_token_id)

    logits, new_cache, lstats = decoder_forward(
        cfg.llm, params["llm"], embeds, specs=specs, state=state, mode=mode,
        cache=cache, positions=positions, collect_stats=collect_stats,
        collect_samples=collect_samples)
    if lstats is not None:
        stats.update(lstats[0] or {}); samples.update(lstats[1] or {})
    return logits, new_cache, ((stats, samples) if collect_stats else None)
