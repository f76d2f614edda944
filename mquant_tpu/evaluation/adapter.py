"""Model→eval adapter: quantized VLM + tokenizer → generate(prompt) → text.

Role parity with the reference's pre-built-model VLMEvalKit wrappers
(``QQwenVLChat`` ref: vlmeval/vlm/qwen_vl.py:148-205, ``QMiniCPM_V_2_6``
ref: vlmeval/vlm/minicpm_v.py:507-567): wraps an already-quantized model object
behind a ``generate(message)`` interface the eval loop drives.

The tokenizer is injectable (transformers AutoTokenizer for real checkpoints;
a byte-level toy tokenizer keeps the harness testable without assets).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import ModelFamily, get_family
from ..serve.generate import Generator


class ByteTokenizer:
    """Byte-level toy tokenizer (vocab 256) for asset-free tests."""

    eos_id = 0

    def encode(self, text: str):
        return list(text.encode("utf-8")[:2048])

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids if i != 0).decode("utf-8", "ignore")


class VLMRunner:
    """Drives a (possibly quantized) VLM end-to-end for evaluation."""

    def __init__(self, family_name: str, cfg, params, specs=None, state=None,
                 mode: str = "fp", tokenizer=None, max_len: int = 512,
                 image_size: Optional[int] = None, max_new_tokens: int = 24):
        self.fam: ModelFamily = get_family(family_name)
        self.cfg = cfg
        self.params = params
        self.specs = specs or {}
        self.state = state
        self.mode = mode
        self.tok = tokenizer or ByteTokenizer()
        self.max_new_tokens = max_new_tokens
        self.image_size = image_size or cfg.patch * 4
        self.gen = Generator(cfg.llm, params["llm"], specs=self.specs,
                             state=state, mode=mode, max_len=max_len)

    # -- multimodal input construction ------------------------------------

    def _encode_image(self, image: Optional[np.ndarray]):
        """image (H,W,3 in [0,1]) → (patches, extra, n_img_tokens)."""
        if image is None:
            return None, {}, 0
        from ..models.vision import patchify_2d, patchify_qwen2vl

        s = self.image_size
        import jax.image

        img = jnp.asarray(image, jnp.float32)[None]
        img = jax.image.resize(img, (1, s, s, 3), "bilinear")
        img = (img - 0.5) / 0.5
        patch = self.cfg.patch
        gh = gw = s // patch
        if self.fam.name == "qwen2vl":
            patches, grid = patchify_qwen2vl(img, patch=patch)
            return patches, {"grid_hw": grid}, patches.shape[1] // 4
        patches, _ = patchify_2d(img, patch)
        if self.fam.name in ("qwenvl", "minicpmv"):
            return patches, {}, self.cfg.resampler.n_queries
        if self.fam.name == "internvl":
            return patches, {"grid": (gh, gw)}, (gh // 2) * (gw // 2)
        return patches, {"grid": (gh, gw)}, 2 + (gh // 2) * (gw // 2)  # glm4v

    def build_inputs(self, prompt: Dict):
        text_ids = self.tok.encode(prompt["text"])
        patches, extra, n_img = self._encode_image(prompt.get("image"))
        toks = ([self.cfg.image_token_id] * n_img) + list(text_ids)
        toks = np.asarray(toks, np.int64)[None]
        toks = np.clip(toks, 0, self.cfg.llm.vocab - 1)
        if n_img:
            toks[0, :n_img] = self.cfg.image_token_id
        return jnp.asarray(toks), patches, extra, n_img

    # -- generation ---------------------------------------------------------

    def generate(self, prompt: Dict, max_new_tokens: Optional[int] = None) -> str:
        """prompt: {"text": str, "image": np.ndarray | None} → decoded text."""
        max_new = max_new_tokens or self.max_new_tokens
        toks, patches, extra, n_img = self.build_inputs(prompt)

        # image features through the (quantized) vision path → spliced embeds
        batch = {"tokens": toks, "patches": patches, **extra}
        embeds = _embed_with_quant(self.fam, self.cfg, self.params, batch,
                                   self.specs, self.state, self.mode)

        positions = None
        if self.fam.name == "qwen2vl" and n_img:
            from ..models.qwen2vl import mrope_positions

            g = int(np.sqrt(n_img * 4))
            positions = jnp.asarray(mrope_positions(
                np.asarray(toks), self.cfg.image_token_id, grid_thw=(1, g, g)))

        last, cache = self.gen.prefill(embeds, positions=positions)
        step = self.gen._decode()
        tok = jnp.argmax(last, axis=-1)[:, None].astype(jnp.int32)
        out = [int(tok[0, 0])]
        for _ in range(max_new - 1):
            logits, cache = step(self.params["llm"], tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
            t = int(tok[0, 0])
            if t == getattr(self.tok, "eos_id", -1):
                break
            out.append(t)
        return self.tok.decode(out)


def _embed_with_quant(fam, cfg, params, batch, specs, state, mode):
    """Vision+splice with the quantized vision path active."""
    from ..models.qwen2vl import splice_image_embeds

    toks = batch["tokens"]
    embeds = params["llm"]["embed"]["w"][toks].astype(cfg.llm.dtype)
    patches = batch.get("patches")
    if patches is None:
        return embeds
    extra = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    kw = dict(specs=specs, state=state, mode=mode)
    if fam.name == "qwen2vl":
        from ..models.vision import merger_forward, vit_forward

        feats, _ = vit_forward(cfg.vit, params["vit"], patches,
                               grid_hw=extra.get("grid_hw"), **kw)
        img, _ = merger_forward(cfg.merger, params["merger"], feats, **kw)
    elif fam.name in ("qwenvl", "minicpmv"):
        from ..models.resampler import resampler_forward
        from ..models.vision import vit_forward

        feats, _ = vit_forward(cfg.vit, params["vit"], patches, **kw)
        img, _ = resampler_forward(cfg.resampler, params["res"], feats, **kw)
    elif fam.name == "internvl":
        from ..models.projectors import mlp1_forward, pixel_shuffle
        from ..models.vision import vit_forward

        gh, gw = extra["grid"]
        feats, _ = vit_forward(cfg.vit, params["vit"], patches, **kw)
        img, _ = mlp1_forward(cfg.mlp1, params["proj"],
                              pixel_shuffle(feats, gh, gw), **kw)
    else:
        from ..models.projectors import glu_projector_forward
        from ..models.vision import vit_forward

        gh, gw = extra["grid"]
        feats, _ = vit_forward(cfg.vit, params["vit"], patches, **kw)
        img, _ = glu_projector_forward(cfg.proj, params["proj"], feats, gh, gw, **kw)
    return splice_image_embeds(embeds, toks, img, cfg.image_token_id)
