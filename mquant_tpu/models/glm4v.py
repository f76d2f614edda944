"""GLM-4V-9B: EVA2CLIP vision tower → conv-downsample + GLU projector → ChatGLM.

Capability parity with the reference's GLM-4V model definition
(ref: plugin/modeling_chatglm.py:1374 ``ChatGLMForConditionalGeneration``,
plugin/visual.py:180 ``EVA2CLIPModel`` — the 5th supported MLLM, which ships as
plugin files only with no exam script in the reference snapshot; this rebuild
provides the full pipeline for it). ChatGLM specifics expressed via
DecoderConfig flags: MQA (2 kv groups), partial (half-dim) interleaved rotary,
fused gate/up split by the loader. Multimodal splice at boi…eoi span
(ref: plugin/modeling_chatglm.py:1203).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .llm import DecoderConfig, decoder_forward, init_decoder_params
from .projectors import (
    GluProjectorConfig,
    glu_projector_forward,
    init_glu_params,
)
from .vision import ViTConfig, init_vit_params, vit_forward
from .qwen2vl import splice_image_embeds


@dataclasses.dataclass(frozen=True)
class GLM4VConfig:
    name: str
    llm: DecoderConfig
    vit: ViTConfig
    proj: GluProjectorConfig
    image_token_id: int = 151339  # boi-span placeholder slot
    patch: int = 14

    @staticmethod
    def tiny():
        return GLM4VConfig(
            name="glm4v-tiny",
            llm=DecoderConfig(vocab=256, hidden=64, n_layers=2, n_heads=4,
                              n_kv_heads=2, intermediate=96,
                              rope_partial=0.5, rope_interleaved=True,
                              rope_theta=10000.0, dtype=jnp.float32),
            vit=ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=64,
                          patch_dim=4 * 4 * 3, n_pos=64, pre_norm=False,
                          dtype=jnp.float32),
            proj=GluProjectorConfig(vit_width=32, out_dim=64, ffn_dim=96,
                                    dtype=jnp.float32),
            image_token_id=255,
            patch=4,
        )

    @staticmethod
    def glm4v_9b():
        return GLM4VConfig(
            name="glm-4v-9b",
            llm=DecoderConfig(vocab=151552, hidden=4096, n_layers=40, n_heads=32,
                              n_kv_heads=2, intermediate=13696,
                              rope_partial=0.5, rope_interleaved=True,
                              rope_theta=10000.0),
            vit=ViTConfig(width=1792, n_layers=63, n_heads=16, mlp_width=15360,
                          patch_dim=14 * 14 * 3, n_pos=6401, norm_eps=1e-6),
            proj=GluProjectorConfig(vit_width=1792, out_dim=4096, ffn_dim=13696),
        )


def init_glm4v_params(cfg: GLM4VConfig, key: jax.Array) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llm": init_decoder_params(cfg.llm, k1),
        "vit": init_vit_params(cfg.vit, k2),
        "proj": init_glu_params(cfg.proj, k3),
    }


def glm4v_forward(
    cfg: GLM4VConfig,
    params: Dict,
    tokens: jax.Array,
    patches: Optional[jax.Array] = None,  # (B, gh*gw, patch_dim)
    grid: Optional[tuple] = None,
    specs: Optional[Dict] = None,
    state: Optional[Dict] = None,
    mode: str = "fp",
    cache: Optional[Dict] = None,
    positions: Optional[jax.Array] = None,
    collect_stats: bool = False,
    collect_samples: bool = False,
):
    specs = specs or {}
    stats: Dict[str, Any] = {}
    samples: Dict[str, Any] = {}

    embeds = params["llm"]["embed"]["w"][tokens].astype(cfg.llm.dtype)
    if patches is not None:
        assert grid is not None
        gh, gw = grid
        feats, vs = vit_forward(cfg.vit, params["vit"], patches, specs, state,
                                mode, collect_stats=collect_stats,
                                collect_samples=collect_samples)
        if vs is not None:
            stats.update(vs[0]); samples.update(vs[1])
        proj, ps = glu_projector_forward(cfg.proj, params["proj"], feats, gh, gw,
                                         specs, state, mode,
                                         collect_stats=collect_stats,
                                         collect_samples=collect_samples)
        if ps is not None:
            stats.update(ps[0]); samples.update(ps[1])
        embeds = splice_image_embeds(embeds, tokens, proj, cfg.image_token_id)

    logits, new_cache, lstats = decoder_forward(
        cfg.llm, params["llm"], embeds, specs=specs, state=state, mode=mode,
        cache=cache, positions=positions, collect_stats=collect_stats,
        collect_samples=collect_samples)
    if lstats is not None:
        stats.update(lstats[0] or {}); samples.update(lstats[1] or {})
    return logits, new_cache, ((stats, samples) if collect_stats else None)
