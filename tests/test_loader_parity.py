"""HF → mquant_tpu loader parity: numerical agreement with the HF torch model.

This is the strongest loader test possible without real checkpoints: build a
tiny random HF Qwen2-VL, save it, load through our surgery loader, and compare
logits of the text path AND the vision+splice path against torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def hf_pair(tmp_path_factory):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    hf_cfg = Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1e6, tie_word_embeddings=False,
        rms_norm_eps=1e-6,
        vision_config=dict(depth=2, embed_dim=32, hidden_size=32, num_heads=2,
                           mlp_ratio=1.5, in_chans=3, patch_size=4,
                           spatial_merge_size=2, temporal_patch_size=2),
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=255, vision_start_token_id=253, vision_end_token_id=254,
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    d = tmp_path_factory.mktemp("hfq2vl")
    hf.save_pretrained(d, safe_serialization=True)

    from mquant_tpu.models.llm import DecoderConfig
    from mquant_tpu.models.loader import load_model
    from mquant_tpu.models.qwen2vl import Qwen2VLConfig as MyCfg
    from mquant_tpu.models.vision import MergerConfig, ViTConfig

    my_cfg = MyCfg(
        name="tiny",
        llm=DecoderConfig(vocab=256, hidden=64, n_layers=2, n_heads=4,
                          n_kv_heads=2, intermediate=96, rope_theta=1e6,
                          mrope_sections=(2, 3, 3), dtype=jnp.float32),
        vit=ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=48,
                      patch_dim=2 * 4 * 4 * 3, rotary_2d=True,
                      act="quick_gelu", norm_eps=1e-6, dtype=jnp.float32),
        merger=MergerConfig(context_dim=32, out_dim=64, dtype=jnp.float32),
        image_token_id=255, patch=4,
    )
    params = load_model("qwen2vl", my_cfg, str(d), dtype=jnp.float32)
    return hf, my_cfg, params


class TestQwen2VLParity:
    def test_text_logits_match(self, hf_pair):
        hf, cfg, params = hf_pair
        ids = torch.arange(10).remainder(250).unsqueeze(0)
        with torch.no_grad():
            ref = hf(input_ids=ids).logits.numpy()
        from mquant_tpu.models.qwen2vl import qwen2vl_forward

        out, _, _ = qwen2vl_forward(cfg, params, jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)

    def test_vision_and_splice_match(self, hf_pair):
        hf, cfg, params = hf_pair
        # one 16x16 image → grid 4x4 patches → 4 merged tokens
        torch.manual_seed(1)
        img = torch.randn(1, 3, 16, 16)
        # HF expects flattened patches (seq, C*T*p*p) + grid_thw
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )

        # build HF pixel input manually: (t, h, w) grid with temporal dup
        patches_t = img.unsqueeze(0).repeat(2, 1, 1, 1, 1)  # (T=2, B, C, H, W)
        t = patches_t.permute(1, 0, 2, 3, 4)  # (B,T,C,H,W)
        B, T, C, Hh, Ww = t.shape
        gh, gw = Hh // 4, Ww // 4
        x = t.reshape(B, T, C, gh, 4, gw, 4)
        # HF layout: grid_t, grid_h, grid_w with merge-group ordering
        x = x.permute(0, 1, 3, 5, 2, 4, 6)  # B,T,gh,gw,C,p,p
        x = x.reshape(B, T, gh // 2, 2, gw // 2, 2, C, 4, 4)
        x = x.permute(0, 1, 2, 4, 3, 5, 6, 7, 8)
        flat = x.reshape(B * T * gh * gw // 1, -1)  # not exactly HF's order...
        # Instead of reimplementing HF's patch order, drive the HF model through
        # its own visual tower with OUR patch layout converted:
        from mquant_tpu.models.vision import patchify_qwen2vl

        patches, grid = patchify_qwen2vl(
            jnp.asarray(img.permute(0, 2, 3, 1).numpy()), patch=4)
        # HF visual expects (seq, C*T*p*p) with channel-first per patch:
        # (c, t, p, p) flatten order; ours is (p, p, t, c) → permute
        pnp = np.asarray(patches)[0].reshape(-1, 4, 4, 2, 3)
        hf_flat = torch.tensor(pnp.transpose(0, 4, 3, 1, 2).reshape(pnp.shape[0], -1))
        grid_thw = torch.tensor([[1, 4, 4]])
        with torch.no_grad():
            hf_feats = hf.model.visual(hf_flat, grid_thw=grid_thw).numpy()

        from mquant_tpu.models.qwen2vl import qwen2vl_forward
        from mquant_tpu.models.vision import merger_forward, vit_forward

        feats, _ = vit_forward(cfg.vit, params["vit"], patches, grid_hw=grid)
        merged, _ = merger_forward(cfg.merger, params["merger"], feats)
        np.testing.assert_allclose(np.asarray(merged[0]), hf_feats,
                                   rtol=5e-3, atol=5e-3)
