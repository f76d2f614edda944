"""MiniCPM-V-2.6: SigLIP vision tower → perceiver resampler → Qwen2 LLM.

Capability parity with ``exam/quant_minicpmv.py`` + ``fake_quant/
minicpmv_rotation.py`` + ``plugin/resampler.py`` (the reference's drop-in
resampler with explicit q/k/v/out linears and proj_fc — the layout this model
uses natively). Adaptive-resolution inputs are handled by resolution buckets +
key padding masks (the functional equivalent of plugin/resampler.py's
key_padding_mask path and pos-embed cache :114-129, via
``resampler.sincos_2d_pos_embed`` computed per bucket on host).

Quant wrap set parity: ``minicpmv_add_act_qaunt`` (ref: fake_quant/
quant_utils.py:597-611) — SigLIP patch embed + blocks, resampler
{kv_proj,q,k,v,out,proj_fc}, Qwen2 decoder layers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .llm import DecoderConfig, decoder_forward, init_decoder_params
from .resampler import ResamplerConfig, init_resampler_params, resampler_forward
from .vision import ViTConfig, init_vit_params, vit_forward
from .qwen2vl import splice_image_embeds


@dataclasses.dataclass(frozen=True)
class MiniCPMVConfig:
    name: str
    llm: DecoderConfig
    vit: ViTConfig
    resampler: ResamplerConfig
    image_token_id: int = 128244  # <unk>-adjacent slot id used for image pads
    patch: int = 14

    @staticmethod
    def tiny():
        return MiniCPMVConfig(
            name="minicpmv-tiny",
            llm=DecoderConfig(vocab=256, hidden=64, n_layers=2, n_heads=4,
                              n_kv_heads=2, intermediate=96, dtype=jnp.float32),
            vit=ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=64,
                          patch_dim=4 * 4 * 3, n_pos=64, post_norm=True,
                          act="gelu_tanh", dtype=jnp.float32),
            resampler=ResamplerConfig(n_queries=4, width=64, kv_dim=32,
                                      n_heads=2, out_dim=64, dtype=jnp.float32),
            image_token_id=255,
            patch=4,
        )

    @staticmethod
    def minicpmv_2_6():
        return MiniCPMVConfig(
            name="MiniCPM-V-2_6",
            llm=DecoderConfig(vocab=151666, hidden=3584, n_layers=28, n_heads=28,
                              n_kv_heads=4, intermediate=18944),
            vit=ViTConfig(width=1152, n_layers=27, n_heads=16, mlp_width=4304,
                          patch_dim=14 * 14 * 3, n_pos=4900, post_norm=True,
                          act="gelu_tanh", norm_eps=1e-6),
            resampler=ResamplerConfig(n_queries=64, width=3584, kv_dim=1152,
                                      n_heads=28, out_dim=3584),
        )


def init_minicpmv_params(cfg: MiniCPMVConfig, key: jax.Array) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llm": init_decoder_params(cfg.llm, k1),
        "vit": init_vit_params(cfg.vit, k2),
        "res": init_resampler_params(cfg.resampler, k3,
                                     n_pos=cfg.vit.n_pos or 1024),
    }


def minicpmv_forward(
    cfg: MiniCPMVConfig,
    params: Dict,
    tokens: jax.Array,
    patches: Optional[jax.Array] = None,
    specs: Optional[Dict] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    cache: Optional[Dict] = None,
    positions: Optional[jax.Array] = None,
    vis_token_mask: Optional[jax.Array] = None,  # (B, S) valid patches
    pos_embed_kv: Optional[jax.Array] = None,  # per-bucket sincos table
    collect_stats: bool = False,
    collect_samples: bool = False,
):
    specs = specs or {}
    stats: Dict[str, Any] = {}
    samples: Dict[str, Any] = {}

    embeds = params["llm"]["embed"]["w"][tokens].astype(cfg.llm.dtype)
    if patches is not None:
        feats, vs = vit_forward(cfg.vit, params["vit"], patches, specs, state,
                                mode, token_mask=vis_token_mask,
                                collect_stats=collect_stats,
                                collect_samples=collect_samples)
        if vs is not None:
            stats.update(vs[0]); samples.update(vs[1])
        pooled, rs = resampler_forward(cfg.resampler, params["res"], feats,
                                       specs, state, mode,
                                       key_mask=vis_token_mask,
                                       pos_embed_kv=pos_embed_kv,
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
