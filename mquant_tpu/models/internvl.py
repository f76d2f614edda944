"""InternVL2-8B: InternViT (LayerScale) → pixel-shuffle + mlp1 → InternLM2 LLM.

Capability parity with ``exam/quant_internvl.py`` + ``fake_quant/
internvl_rotation.py``. InternLM2's fused interleaved ``wqkv`` is split into
q/k/v by the loader (the GQA-aware reshape the reference performs during
rotation, ref: internvl_rotation.py:99-123, is then a plain per-head rotation);
LayerScale ls1/ls2 are folded into o/fc2 by the fusion recipe
(ref: fake_quant/quant_utils.py:527-540 ``fuse_internvl``).

Quant wrap set parity: ``internvl_add_act_qaunt`` (ref: quant_utils.py:543-557)
— vision patch-embed conv, vision blocks, mlp1[1]/mlp1[3], LLM layers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .llm import DecoderConfig, decoder_forward, init_decoder_params
from .projectors import Mlp1Config, init_mlp1_params, mlp1_forward, pixel_shuffle
from .vision import ViTConfig, init_vit_params, vit_forward
from .qwen2vl import splice_image_embeds


@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    name: str
    llm: DecoderConfig
    vit: ViTConfig
    mlp1: Mlp1Config
    image_token_id: int = 92546  # <IMG_CONTEXT>
    patch: int = 14

    @staticmethod
    def tiny():
        return InternVLConfig(
            name="internvl-tiny",
            llm=DecoderConfig(vocab=256, hidden=64, n_layers=2, n_heads=4,
                              n_kv_heads=2, intermediate=96, qkv_bias=False,
                              dtype=jnp.float32),
            vit=ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=64,
                          patch_dim=4 * 4 * 3, n_pos=64, layerscale=True,
                          dtype=jnp.float32),
            mlp1=Mlp1Config(vit_width=32, out_dim=64, dtype=jnp.float32),
            image_token_id=255,
            patch=4,
        )

    @staticmethod
    def internvl2_8b():
        return InternVLConfig(
            name="InternVL2-8B",
            llm=DecoderConfig(vocab=92553, hidden=4096, n_layers=32, n_heads=32,
                              n_kv_heads=8, intermediate=14336, qkv_bias=False,
                              rope_theta=1_000_000.0),
            vit=ViTConfig(width=1024, n_layers=24, n_heads=16, mlp_width=4096,
                          patch_dim=14 * 14 * 3, n_pos=1025, layerscale=True,
                          norm_eps=1e-6),
            mlp1=Mlp1Config(vit_width=1024, out_dim=4096),
        )


def init_internvl_params(cfg: InternVLConfig, key: jax.Array) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llm": init_decoder_params(cfg.llm, k1),
        "vit": init_vit_params(cfg.vit, k2),
        "proj": init_mlp1_params(cfg.mlp1, k3),
    }


def internvl_forward(
    cfg: InternVLConfig,
    params: Dict,
    tokens: jax.Array,
    patches: Optional[jax.Array] = None,  # (B, gh*gw, patch_dim)
    grid: Optional[tuple] = None,  # (gh, gw) static
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
        shuffled = pixel_shuffle(feats, gh, gw, cfg.mlp1.downsample)
        proj, ps = mlp1_forward(cfg.mlp1, params["proj"], shuffled, specs, state,
                                mode, collect_stats=collect_stats,
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
