"""Chat templating + resolution bucketing tests."""

import jax
import numpy as np
import pytest

from mquant_tpu.models.buckets import (
    BucketSpec,
    max_bucket_tokens,
    prepare_image,
    resampler_pos_table,
)
from mquant_tpu.serve.chat import build_chat_prompt, build_interleaved


class TestChat:
    @pytest.mark.parametrize("fam", ["qwen2vl", "qwenvl", "internvl",
                                     "minicpmv", "glm4v"])
    def test_prompt_pieces(self, fam):
        p = build_chat_prompt(fam, "What is this?", 64)
        assert "What is this?" in p["text_after"]
        assert p["n_image_tokens"] == 64
        assert isinstance(p["text_before"], str)

    def test_qwen2vl_vision_tags(self):
        p = build_chat_prompt("qwen2vl", "Q", 4)
        assert p["text_before"].endswith("<|vision_start|>")
        assert p["text_after"].startswith("<|vision_end|>")

    def test_interleaved(self):
        segs = ["Compare ", "<image>", " with ", "<image>", "."]
        out = build_interleaved("minicpmv", segs, 64)
        assert [o["kind"] for o in out] == ["text", "image", "text", "image", "text"]
        assert out[1]["n_tokens"] == 64


class TestBuckets:
    def test_choose_aspect(self):
        spec = BucketSpec.default(patch=14, base=448)
        assert spec.choose(448, 448) == (448, 448)
        assert spec.choose(500, 1000)[1] > spec.choose(500, 1000)[0]  # wide
        assert spec.choose(1000, 500)[0] > spec.choose(1000, 500)[1]  # tall

    def test_prepare_image_and_mask(self, rng):
        spec = BucketSpec(patch=4, buckets=((16, 16), (16, 32)))
        img = rng.uniform(size=(20, 21, 3)).astype(np.float32)
        maxtok = max_bucket_tokens(spec)
        out, grid, mask = prepare_image(img, spec, max_tokens=maxtok)
        assert out.shape[0] % 4 == 0 and out.shape[1] % 4 == 0
        assert mask.shape == (maxtok,)
        assert mask.sum() == grid[0] * grid[1]

    def test_pos_table_gamma_division(self, rng):
        g = rng.uniform(0.5, 2.0, size=(16,))
        t1 = resampler_pos_table(16, (2, 2), 8)
        t2 = resampler_pos_table(16, (2, 2), 8, ln_kv_gamma=g)
        np.testing.assert_allclose(t2[:4], t1[:4] / g[None, :], rtol=1e-5)
        np.testing.assert_allclose(t2[4:], 0.0)


class TestMaskedVitForward:
    def test_padded_tokens_do_not_change_valid_outputs(self, rng):
        """The whole point of bucketing: masked padding must not leak into valid
        positions' features (attention key mask) nor calibration stats."""
        import jax
        import jax.numpy as jnp

        from mquant_tpu.models.vision import ViTConfig, init_vit_params, vit_forward

        cfg = ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=48,
                        patch_dim=48, dtype=jnp.float32)
        params = init_vit_params(cfg, jax.random.key(0))
        x = jnp.asarray(rng.normal(size=(1, 8, 48)), jnp.float32)
        ref, _ = vit_forward(cfg, params, x)
        xp = jnp.concatenate([x, 99.0 * jnp.ones((1, 4, 48), jnp.float32)], axis=1)
        mask = jnp.asarray([[1] * 8 + [0] * 4], jnp.float32)
        out, _ = vit_forward(cfg, params, xp, token_mask=mask)
        np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestGroupedAttention:
    def test_grouped_matches_repeat(self, rng):
        """The grouped-query einsum must equal the naive repeat formulation."""
        import jax.numpy as jnp

        from mquant_tpu.models import layers as L

        B, T, S, H, KVH, hd = 2, 5, 9, 8, 2, 16
        q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, KVH, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, KVH, hd)), jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, size=(B, 1, T, S)), bool)
        mask = mask.at[..., 0].set(True)  # every row attends somewhere
        out = L.attention(q, k, v, mask)

        kr = jnp.repeat(k, H // KVH, axis=2)
        vr = jnp.repeat(v, H // KVH, axis=2)
        logits = jnp.einsum("bthd,bshd->bhts", q, kr) * hd**-0.5
        logits = jnp.where(mask, logits, -1e30)
        ref = jnp.einsum("bhts,bshd->bthd",
                         jax.nn.softmax(logits, axis=-1), vr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_causal_flag_matches_mask(self, rng):
        import jax.numpy as jnp

        from mquant_tpu.models import layers as L

        B, T, H, hd = 1, 6, 4, 8
        q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        a = L.attention(q, k, v, causal=True)
        b = L.attention(q, k, v, L.causal_mask(T, T))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
