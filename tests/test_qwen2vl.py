"""Tests for the Qwen2-VL end-to-end model (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.qwen2vl import (
    Qwen2VLConfig,
    default_w4a8_specs,
    init_qwen2vl_params,
    mrope_positions,
    qwen2vl_forward,
    splice_image_embeds,
)
from mquant_tpu.models.vision import patchify_qwen2vl


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen2VLConfig.tiny()
    params = init_qwen2vl_params(cfg, jax.random.key(0))
    B, img = 1, 16  # 16x16 image, patch 4 → 4x4=16 patches → 4 merged tokens
    images = jax.random.normal(jax.random.key(1), (B, img, img, 3), jnp.float32)
    patches, grid = patchify_qwen2vl(images, patch=cfg.patch)
    n_merged = patches.shape[1] // 4
    toks = np.full((B, 10), 7, np.int64)
    toks[0, 2:2 + n_merged] = cfg.image_token_id
    toks = jnp.asarray(toks)
    return cfg, params, toks, patches, grid


class TestSplice:
    def test_splice_in_order(self):
        B, T, H, N = 1, 6, 4, 2
        text = jnp.zeros((B, T, H))
        toks = jnp.asarray([[1, 9, 9, 2, 3, 4]])
        img = jnp.stack([jnp.full((H,), 10.0), jnp.full((H,), 20.0)])[None]
        out = splice_image_embeds(text, toks, img, image_token_id=9)
        np.testing.assert_allclose(np.asarray(out[0, 1]), 10.0)
        np.testing.assert_allclose(np.asarray(out[0, 2]), 20.0)
        np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[0, 3]), 0.0)


class TestMrope:
    def test_text_only_positions_match_standard(self):
        toks = np.full((1, 5), 3, np.int64)
        pos = mrope_positions(toks, image_token_id=99)
        for p in range(3):
            np.testing.assert_array_equal(pos[p, 0], np.arange(5))

    def test_image_span_grid(self):
        # 1 temporal, 4x4 patches, merge 2 → 2x2 = 4 image tokens
        toks = np.asarray([[1, 9, 9, 9, 9, 2]])
        pos = mrope_positions(toks, image_token_id=9, grid_thw=(1, 4, 4))
        # text token 0 at 0; image tokens start at 1
        np.testing.assert_array_equal(pos[1, 0, 1:5], [1, 1, 2, 2])  # height ids
        np.testing.assert_array_equal(pos[2, 0, 1:5], [1, 2, 1, 2])  # width ids
        assert pos[0, 0, 5] == 3  # text resumes at 1 + max(1,2,2) = 3


class TestForward:
    def test_fp_forward(self, tiny):
        cfg, params, toks, patches, grid = tiny
        logits, _, _ = qwen2vl_forward(cfg, params, toks, patches, grid)
        assert logits.shape == (1, 10, cfg.llm.vocab)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_images_change_logits(self, tiny):
        cfg, params, toks, patches, grid = tiny
        l1, _, _ = qwen2vl_forward(cfg, params, toks, patches, grid)
        l2, _, _ = qwen2vl_forward(cfg, params, toks, patches * 2.0, grid)
        assert float(jnp.abs(l1 - l2).max()) > 1e-4
        # text-only positions unaffected... (same tokens, different image)
        l3, _, _ = qwen2vl_forward(cfg, params, toks)
        assert l3.shape == l1.shape

    def test_mrope_positions_accepted(self, tiny):
        cfg, params, toks, patches, grid = tiny
        pos = mrope_positions(np.asarray(toks), cfg.image_token_id, grid_thw=(1, 4, 4))
        logits, _, _ = qwen2vl_forward(cfg, params, toks, patches, grid,
                                       positions=jnp.asarray(pos))
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_fake_quant_forward_and_stats(self, tiny):
        cfg, params, toks, patches, grid = tiny
        specs = default_w4a8_specs(online_had=False, split=False)
        logits, _, st = qwen2vl_forward(cfg, params, toks, patches, grid,
                                        specs=specs, mode="calib",
                                        collect_stats=True)
        stats, _ = st
        # all three subsystems produce stats (MSQ: separate scale sets)
        assert any(k.startswith("vis.") for k in stats)
        assert any(k.startswith("merger.") for k in stats)
        assert any(k.startswith("llm.") for k in stats)
        # vit block stats are layer-stacked
        assert stats["vis.q"].min.shape[0] == cfg.vit.n_layers
        assert stats["llm.q"].min.shape[0] == cfg.llm.n_layers
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_whole_forward_jits(self, tiny):
        cfg, params, toks, patches, grid = tiny
        specs = default_w4a8_specs(online_had=False, split=False)

        @jax.jit
        def f(params, toks, patches, grid):
            return qwen2vl_forward(cfg, params, toks, patches, grid,
                                   specs=specs, mode="fake")[0]

        out = f(params, toks, patches, grid)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestGenerate:
    def test_greedy_generate_text(self, tiny):
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        gen = Generator(cfg.llm, params["llm"], max_len=64)
        out = gen.generate(toks[:, :4], max_new_tokens=6)
        assert out.shape[0] == 1 and out.shape[1] <= 6
        assert bool(jnp.all((out >= 0) & (out < cfg.llm.vocab)))

    def test_prefill_decode_consistency(self, tiny):
        """Decoding token-by-token must equal a single full forward (cache math)."""
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        T = 8
        seq = toks[:, :T]
        full_logits, _, _ = qwen2vl_forward(cfg, params, seq)
        gen = Generator(cfg.llm, params["llm"], max_len=32)
        last, cache = gen.prefill(seq[:, :T - 1])
        np.testing.assert_allclose(
            np.asarray(last), np.asarray(full_logits[:, T - 2]), rtol=2e-3, atol=2e-3)
        step = gen._decode()
        step_logits, _ = step(params["llm"], seq[:, T - 1:T], cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, T - 1]),
            rtol=2e-3, atol=2e-3)


class TestOnDeviceDecode:
    def test_generate_on_device_matches_host_loop(self, tiny):
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        gen = Generator(cfg.llm, params["llm"], max_len=64)
        host = gen.generate(toks[:, :4], max_new_tokens=6)
        dev = gen.generate_on_device(toks[:, :4], max_new_tokens=6)
        import numpy as np

        np.testing.assert_array_equal(np.asarray(host), np.asarray(dev[:, :host.shape[1]]))


class TestKVCacheQuant:
    def test_int8_cache_close_to_bf16(self, tiny):
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        seq = toks[:, :8]
        g_fp = Generator(cfg.llm, params["llm"], max_len=32)
        g_q = Generator(cfg.llm, params["llm"], max_len=32, kv_quant=True)
        last_fp, cache_fp = g_fp.prefill(seq)
        last_q, cache_q = g_q.prefill(seq)
        assert cache_q["k"].dtype == jnp.int8
        np.testing.assert_allclose(np.asarray(last_q), np.asarray(last_fp),
                                   rtol=2e-3, atol=2e-3)
        # a decode step reads the quantized cache
        s_fp, _ = g_fp._decode()(params["llm"], seq[:, :1], cache_fp)
        s_q, _ = g_q._decode()(params["llm"], seq[:, :1], cache_q)
        rel = float(jnp.linalg.norm(s_q - s_fp) / (jnp.linalg.norm(s_fp) + 1e-9))
        assert rel < 0.05, rel

    def test_greedy_tokens_match_with_int8_cache(self, tiny):
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        g_fp = Generator(cfg.llm, params["llm"], max_len=64)
        g_q = Generator(cfg.llm, params["llm"], max_len=64, kv_quant=True)
        a = g_fp.generate(toks[:, :4], max_new_tokens=5)
        b = g_q.generate(toks[:, :4], max_new_tokens=5)
        # int8 KV rarely flips greedy tokens on a tiny random model; require
        # at least the first tokens to agree
        assert int(a[0, 0]) == int(b[0, 0])


class TestMRopeDecodeDelta:
    """Generated tokens must continue RoPE at max(prefill position)+1, not at
    the token count (HF get_rope_index/rope_deltas parity): with an image in
    the prompt the M-RoPE position max is far below the sequence length."""

    def test_decode_positions_continue_from_max_plus_one(self, tiny):
        from mquant_tpu.models.llm import decoder_forward
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        T = toks.shape[1]
        pos = mrope_positions(np.asarray(toks), cfg.image_token_id,
                              grid_thw=(1, 4, 4))
        pmax = int(pos.max())
        assert pmax + 1 < T  # the bug is only observable when they differ

        gen = Generator(cfg.llm, params["llm"], max_len=32)
        embeds = params["llm"]["embed"]["w"][toks].astype(cfg.llm.dtype)
        last, cache = gen.prefill(embeds, positions=jnp.asarray(pos))
        nxt = jnp.argmax(last, axis=-1)[:, None].astype(jnp.int32)
        step_logits, cache = gen._decode()(params["llm"], nxt, cache)

        # reference: full uncached forward over T+1 tokens where the appended
        # token's position is pmax+1 on all three planes
        ext = np.concatenate([pos, np.full((3, 1, 1), pmax + 1)], axis=2)
        seq = jnp.concatenate([toks, nxt.astype(toks.dtype)], axis=1)
        full_logits, _, _ = decoder_forward(
            cfg.llm, params["llm"], params["llm"]["embed"]["w"][seq].astype(cfg.llm.dtype),
            positions=jnp.asarray(ext))
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, -1]),
            rtol=2e-3, atol=2e-3)

    def test_wrong_tokcount_positions_would_differ(self, tiny):
        """Sanity: the old behavior (position = token count) gives different
        logits, i.e. the test above actually discriminates."""
        from mquant_tpu.models.llm import decoder_forward
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        T = toks.shape[1]
        pos = mrope_positions(np.asarray(toks), cfg.image_token_id,
                              grid_thw=(1, 4, 4))
        pmax = int(pos.max())
        gen = Generator(cfg.llm, params["llm"], max_len=32)
        embeds = params["llm"]["embed"]["w"][toks].astype(cfg.llm.dtype)
        last, cache = gen.prefill(embeds, positions=jnp.asarray(pos))
        nxt = jnp.argmax(last, axis=-1)[:, None].astype(jnp.int32)
        step_logits, _ = gen._decode()(params["llm"], nxt, cache)

        wrong = np.concatenate([pos, np.full((3, 1, 1), T)], axis=2)
        seq = jnp.concatenate([toks, nxt.astype(toks.dtype)], axis=1)
        wrong_logits, _, _ = decoder_forward(
            cfg.llm, params["llm"], params["llm"]["embed"]["w"][seq].astype(cfg.llm.dtype),
            positions=jnp.asarray(wrong))
        assert not np.allclose(np.asarray(step_logits[:, 0]),
                               np.asarray(wrong_logits[:, -1]), atol=1e-4)


class TestKV4CacheQuant:
    """Nibble-packed uint4 KV (quarter memory, asym per-token-head grid)."""

    def test_pack_unpack_roundtrip_on_grid(self):
        from mquant_tpu.models.llm import _kv_pack4, _kv_unpack4

        # values ON a 4-bit asym grid whose rows span the full 0..15 range
        # (so the minmax grid is recovered exactly) reconstruct exactly
        rng = np.random.default_rng(0)
        scale = 0.37
        q = rng.integers(0, 16, (2, 5, 3, 8))
        q[..., 0], q[..., 1] = 0, 15  # pin the per-row extremes
        vals = jnp.asarray((q - 6) * scale, jnp.float32)
        packed, s, z = _kv_pack4(vals)
        assert packed.dtype == jnp.uint8 and packed.shape == (2, 5, 3, 4)
        rec = _kv_unpack4(packed, s, z, jnp.float32)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(vals),
                                   rtol=1e-5, atol=1e-5)

    def test_int4_cache_shapes_and_closeness(self, tiny):
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        seq = toks[:, :8]
        g_fp = Generator(cfg.llm, params["llm"], max_len=32)
        g_q = Generator(cfg.llm, params["llm"], max_len=32, kv_quant=4)
        last_fp, cache_fp = g_fp.prefill(seq)
        last_q, cache_q = g_q.prefill(seq)
        assert cache_q["k"].dtype == jnp.uint8
        assert cache_q["k"].shape[-1] == cfg.llm.head_dim // 2
        assert "k_zp" in cache_q
        np.testing.assert_allclose(np.asarray(last_q), np.asarray(last_fp),
                                   rtol=2e-3, atol=2e-3)
        # a decode step reads back through the packed cache
        s_fp, _ = g_fp._decode()(params["llm"], seq[:, :1], cache_fp)
        s_q, _ = g_q._decode()(params["llm"], seq[:, :1], cache_q)
        rel = float(jnp.linalg.norm(s_q - s_fp) / (jnp.linalg.norm(s_fp) + 1e-9))
        assert rel < 0.15, rel

    def test_generation_completes_and_first_token_matches(self, tiny):
        from mquant_tpu.serve.generate import Generator

        cfg, params, toks, patches, grid = tiny
        g_fp = Generator(cfg.llm, params["llm"], max_len=64)
        g_q = Generator(cfg.llm, params["llm"], max_len=64, kv_quant=4)
        a = g_fp.generate(toks[:, :4], max_new_tokens=5)
        b = g_q.generate(toks[:, :4], max_new_tokens=5)
        assert int(a[0, 0]) == int(b[0, 0])

    def test_engine_pool_with_int4_cache(self):
        """Continuous-batching pool over a packed-uint4 cache: requests
        retire, slot isolation holds (outputs equal the same engine serving
        each prompt alone)."""
        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.engine import ServingEngine

        cfg = DecoderConfig(vocab=96, hidden=48, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(7))
        prompts = [list(range(1, 6)), list(range(20, 30))]

        def serve(ps):
            eng = ServingEngine(cfg, params, slots=2, max_len=128,
                                steps_per_block=3, kv_quant=4)
            rids = [eng.submit(p, max_new_tokens=6) for p in ps]
            outs = eng.run()
            return [outs[r] for r in rids]

        together = serve(prompts)
        solo = [serve([p])[0] for p in prompts]
        assert together == solo
