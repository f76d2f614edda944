"""End-to-end invariance tests for the equivalent-transform algebra.

These are the tests the reference never had (SURVEY §4): fuse/rotate/pad/split
must leave the floating-point model function EXACTLY invariant (up to fp32
round-trip), or quantized accuracy silently degrades.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.models.llm import (
    LLM_SITES,
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
)
from mquant_tpu.transform import recipes as RZ
from mquant_tpu.transform import fuse as F
from mquant_tpu.transform import hadamard as H


CFG = DecoderConfig(
    vocab=97, hidden=64, n_layers=2, n_heads=4, n_kv_heads=2,
    intermediate=96,  # 96 = 12 * 8 → Hadamard-friendly without padding
    dtype=jnp.float32,
)
CFG_PAD = DecoderConfig(
    vocab=97, hidden=64, n_layers=2, n_heads=4, n_kv_heads=2,
    intermediate=100,  # NOT K*2^p → exercises the padding path (→104? →108)
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def setup():
    params = init_decoder_params(CFG, jax.random.key(0))
    # non-trivial norm weights so fusion is actually tested
    k = jax.random.key(1)
    lay = dict(params["layers"])
    lay["ln1"] = {"w": 1.0 + 0.3 * jax.random.normal(jax.random.fold_in(k, 0), lay["ln1"]["w"].shape)}
    lay["ln2"] = {"w": 1.0 + 0.3 * jax.random.normal(jax.random.fold_in(k, 1), lay["ln2"]["w"].shape)}
    params = dict(params)
    params["layers"] = lay
    params["ln_f"] = {"w": 1.0 + 0.3 * jax.random.normal(jax.random.fold_in(k, 2), params["ln_f"]["w"].shape)}
    # non-zero biases
    for s in ("q", "k", "v"):
        lay[s] = dict(lay[s])
        lay[s]["b"] = 0.1 * jax.random.normal(jax.random.fold_in(k, hash(s) % 100), lay[s]["b"].shape)
    toks = jax.random.randint(jax.random.key(2), (2, 12), 0, CFG.vocab)
    ref_logits, _, _ = decoder_forward(CFG, params, toks)
    return params, toks, ref_logits


def fwd(cfg, params, toks, specs=None, mode="fp", state=None):
    logits, _, _ = decoder_forward(cfg, params, toks, specs=specs, mode=mode, state=state)
    return logits


class TestFuse:
    def test_fuse_invariance(self, setup):
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        out = fwd(CFG, fused, toks)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
        # norms are now unit
        assert np.allclose(np.asarray(fused["layers"]["ln1"]["w"]), 1.0)
        assert np.allclose(np.asarray(fused["ln_f"]["w"]), 1.0)

    def test_fold_norm_with_bias(self, rng):
        # LayerNorm β folding: y = LN(x)@W+b must be preserved for zero-mean x
        import mquant_tpu.models.layers as L

        g = jnp.asarray(rng.normal(size=(16,)) * 0.2 + 1.0, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(16,)) * 0.1, jnp.float32)
        W = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        x = x - x.mean(-1, keepdims=True)  # zero-mean input
        ref = L.layer_norm(x, g, beta) @ W + b
        ng, nb, (lin,) = F.fold_norm_into_linears(g, beta, [{"w": W, "b": b}])
        out = L.rms_norm(x, jnp.asarray(ng, jnp.float32), eps=1e-5) @ jnp.asarray(
            lin["w"], jnp.float32) + jnp.asarray(lin["b"], jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_center_linear_output(self, rng):
        W = rng.normal(size=(16, 8))
        b = rng.normal(size=(8,))
        lin = F.center_linear_output({"w": W, "b": b})
        x = rng.normal(size=(4, 16))
        y = x @ lin["w"] + lin["b"]
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-12)

    def test_sub_mean_matrix(self, rng):
        M = F.sub_mean_matrix(16)
        x = rng.normal(size=(4, 16))
        np.testing.assert_allclose((x @ M).mean(-1), 0.0, atol=1e-12)
        np.testing.assert_allclose(x @ M, x - x.mean(-1, keepdims=True), atol=1e-12)

    def test_layerscale_fold(self, rng):
        g = rng.normal(size=(8,)) * 0.1
        W = rng.normal(size=(16, 8))
        b = rng.normal(size=(8,))
        lin = F.fold_layerscale_into_linear({"w": W, "b": b}, g)
        x = rng.normal(size=(4, 16))
        np.testing.assert_allclose(x @ lin["w"] + lin["b"], (x @ W + b) * g, atol=1e-12)


class TestRotate:
    @pytest.mark.parametrize("mode", ["hadamard", "random"])
    def test_rotate_invariance(self, setup, mode):
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, info = RZ.rotate_decoder(CFG, fused, jax.random.key(7), mode=mode)
        assert info.hidden_rotated and info.ov_rotated
        out = fwd(CFG, rotated, toks)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_rotate_requires_fuse(self, setup):
        params, _, _ = setup
        with pytest.raises(ValueError):
            RZ.rotate_decoder(CFG, params, jax.random.key(0))

    def test_online_hadamard_invariance(self, setup):
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, info = RZ.rotate_decoder(
            CFG, fused, jax.random.key(7), online_had_down=True)
        assert info.online_had_down and info.down_pad == 0
        specs = {"llm.down": SiteSpec(online_had="full")}
        out = fwd(CFG, rotated, toks, specs=specs, mode="fake")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_online_hadamard_with_padding_invariance(self):
        params = init_decoder_params(CFG_PAD, jax.random.key(3))
        toks = jax.random.randint(jax.random.key(4), (1, 8), 0, CFG_PAD.vocab)
        ref = fwd(CFG_PAD, params, toks)
        fused = RZ.fuse_decoder(CFG_PAD, params)
        rotated, info = RZ.rotate_decoder(
            CFG_PAD, fused, jax.random.key(5), online_had_down=True)
        assert info.down_pad == H.auto_pad_size(100) and info.down_pad > 100
        cfg2 = DecoderConfig(**{**CFG_PAD.__dict__, "intermediate_pad": info.down_pad})
        specs = {"llm.down": SiteSpec(online_had="full")}
        out = fwd(cfg2, rotated, toks, specs=specs, mode="fake")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_online_hadamard_block_invariance(self, setup):
        # block mode: I ⊗ H_128 folded offline + per-block runtime transform.
        # intermediate=96 → pads to 128 (one block)
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, info = RZ.rotate_decoder(
            CFG, fused, jax.random.key(7), online_had_down=True,
            online_had_mode="block")
        assert info.online_had_down and info.online_had_mode == "block"
        assert info.down_pad == 128
        cfg2 = DecoderConfig(**{**CFG.__dict__, "intermediate_pad": 128})
        specs = {"llm.down": SiteSpec(online_had="block", head_dim=128)}
        out = fwd(cfg2, rotated, toks, specs=specs, mode="fake")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_online_hadamard_block_no_pad_invariance(self):
        # multiple-of-128 intermediate (the Qwen2-VL-7B 18944 = 148·128 case):
        # no padding, multi-block transform
        cfg = DecoderConfig(vocab=97, hidden=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=256, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(11))
        toks = jax.random.randint(jax.random.key(12), (1, 8), 0, cfg.vocab)
        ref = fwd(cfg, params, toks)
        fused = RZ.fuse_decoder(cfg, params)
        rotated, info = RZ.rotate_decoder(
            cfg, fused, jax.random.key(13), online_had_down=True,
            online_had_mode="block")
        assert info.down_pad == 0 and info.online_had_mode == "block"
        specs = {"llm.down": SiteSpec(online_had="block", head_dim=128)}
        out = fwd(cfg, rotated, toks, specs=specs, mode="fake")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_online_hadamard_block_split_invariance(self, setup):
        # block + RMS split compose (split pulls col 0 of the block-folded w)
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, _ = RZ.rotate_decoder(
            CFG, fused, jax.random.key(7), online_had_down=True,
            online_had_mode="block")
        split = RZ.split_decoder_down(rotated)
        cfg2 = DecoderConfig(**{**CFG.__dict__, "intermediate_pad": 128})
        specs = {"llm.down": SiteSpec(online_had="block", head_dim=128,
                                      split=True)}
        out = fwd(cfg2, split, toks, specs=specs, mode="fake")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_split_invariance(self, setup):
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, _ = RZ.rotate_decoder(CFG, fused, jax.random.key(7), online_had_down=True)
        split = RZ.split_decoder_down(rotated)
        assert split["layers"]["down"]["w_col0"].shape == (CFG.n_layers, 1, CFG.hidden)
        specs = {"llm.down": SiteSpec(online_had="full", split=True)}
        out = fwd(CFG, split, toks, specs=specs, mode="fake")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
        # fp mode must recombine split storage exactly (on a model without the
        # folded online Hadamard, since fp mode skips the online transform)
        split_plain = RZ.split_decoder_down(fused)
        out_fp = fwd(CFG, split_plain, toks)
        np.testing.assert_allclose(np.asarray(out_fp), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestQuantPipeline:
    def _specs(self, w_bits=4, a_bits=8, split=False):
        s = {f"llm.{n}": SiteSpec(w_bits=w_bits, a_bits=a_bits) for n in LLM_SITES}
        s["llm.down"] = SiteSpec(w_bits=w_bits, a_bits=a_bits,
                                 online_had="full", split=split)
        return s

    def test_rotation_improves_w4_quantization(self, rng):
        """The headline MQuant/QuaRot mechanism, tested directly: rotating an
        outlier-channel stream reduces both A8 per-token activation error and W4
        per-out-channel weight error (function-space, Frobenius — fair because Q
        is orthogonal)."""
        from mquant_tpu.core import quant as Q
        from mquant_tpu.core.formats import INT4

        n = 256
        Qm = H.random_hadamard_matrix(n, jax.random.key(12)).astype(np.float32)

        # activations with a massive channel (the post-o_proj hidden stream)
        x = rng.normal(size=(128, n)).astype(np.float32)
        x[:, 3] *= 100.0
        xr = x @ Qm
        e_plain = np.linalg.norm(np.asarray(Q.dynamic_fake_quant(jnp.asarray(x), 8)) - x)
        e_rot = np.linalg.norm(np.asarray(Q.dynamic_fake_quant(jnp.asarray(xr), 8)) - xr)
        assert e_rot < e_plain / 3, (e_rot, e_plain)

        # consumer weight with the matching outlier input row
        w = rng.normal(size=(n, 64)).astype(np.float32)
        w[3, :] *= 100.0
        wr = Qm.T @ w
        werr_plain = np.linalg.norm(
            np.asarray(Q.rtn_fake_quant_weight(jnp.asarray(w), 4)) - w)
        werr_rot = np.linalg.norm(
            np.asarray(Q.rtn_fake_quant_weight(jnp.asarray(wr), 4)) - wr)
        assert werr_rot < werr_plain * 0.6, (werr_rot, werr_plain)

    def test_quantized_pipeline_end_to_end_sane(self, setup):
        """Full rotate+RTN W4A8 pipeline produces finite, loosely-close logits."""
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, _ = RZ.rotate_decoder(CFG, fused, jax.random.key(12), online_had_down=True)
        specs = self._specs(w_bits=4, a_bits=8)
        q_rot = RZ.rtn_quantize_decoder(CFG, rotated, specs)
        out = fwd(CFG, q_rot, toks, specs=specs, mode="fake")
        assert bool(jnp.all(jnp.isfinite(out)))
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.5, rel  # W4 on a tiny random model is noisy; sanity bound

    def test_w8a8_close_to_fp(self, setup):
        params, toks, ref = setup
        fused = RZ.fuse_decoder(CFG, params)
        rotated, _ = RZ.rotate_decoder(CFG, fused, jax.random.key(7), online_had_down=True)
        specs = self._specs(w_bits=8, a_bits=8)
        q = RZ.rtn_quantize_decoder(CFG, rotated, specs)
        out = fwd(CFG, q, toks, specs=specs, mode="fake")
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.05, rel

    def test_real_int_matches_fake(self, setup):
        """real-int W8A8 serving path must match the fake-quant path closely."""
        params, toks, _ = setup
        fused = RZ.fuse_decoder(CFG, params)
        specs = {f"llm.{n}": SiteSpec(w_bits=8, a_bits=8) for n in LLM_SITES}
        qfake = RZ.rtn_quantize_decoder(CFG, fused, specs)
        out_fake = fwd(CFG, qfake, toks, specs=specs, mode="fake")
        qreal = RZ.realize_decoder_weights(fused, specs)
        out_real = fwd(CFG, qreal, toks, specs=specs, mode="real")
        rel = float(jnp.linalg.norm(out_real - out_fake) / jnp.linalg.norm(out_fake))
        assert rel < 0.02, rel

    def test_real_int4_packed_path(self, setup):
        params, toks, _ = setup
        fused = RZ.fuse_decoder(CFG, params)
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8) for n in LLM_SITES}
        qfake = RZ.rtn_quantize_decoder(CFG, fused, specs)
        out_fake = fwd(CFG, qfake, toks, specs=specs, mode="fake")
        qreal = RZ.realize_decoder_weights(fused, specs, pack_int4=True)
        # packed int4: w_q has half the input rows
        assert qreal["layers"]["q"]["w_q"].shape[-2] == CFG.hidden // 2
        out_real = fwd(CFG, qreal, toks, specs=specs, mode="real")
        rel = float(jnp.linalg.norm(out_real - out_fake) / jnp.linalg.norm(out_fake))
        assert rel < 0.05, rel


class TestSiteCapabilities:
    def test_out_quantizer(self, rng):
        """Output quantization (ref ActQuantWrapper output quantizer path)."""
        import jax
        from mquant_tpu.models.layers import SiteSpec, Tape, qlinear
        from mquant_tpu.core.quant import QuantParams

        w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        spec = SiteSpec(a_bits=8, a_static=True, out_bits=8)
        # calib records both input and #out stats
        tape = Tape(specs={"s": spec})
        qlinear(x, {"w": w, "b": None}, "s", spec, None, "calib", tape)
        assert "s" in tape.stats and "s#out" in tape.stats
        # with finalized out-state, output is fake-quantized
        state = {"s": {"act": QuantParams(scale=jnp.float32(0.05)),
                       "out": QuantParams(scale=jnp.float32(0.1))}}
        y = qlinear(x, {"w": w, "b": None}, "s", spec, state, "fake")
        grid = np.asarray(y) / 0.1
        np.testing.assert_allclose(grid, np.round(grid), atol=1e-4)

    def test_online_had_head_mode(self, rng):
        """Per-head online Hadamard (the reference's online_partial_had,
        ref quant_utils.py:349-365): folding the per-head transform into the
        weight's input side must preserve the function."""
        from mquant_tpu.models.layers import SiteSpec, qlinear
        from mquant_tpu.transform.hadamard import transform_matrix

        hd, heads, out = 16, 4, 8
        n = hd * heads
        w = rng.normal(size=(n, out))
        x = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)
        ref = np.asarray(x) @ w
        Hh = transform_matrix(hd)
        # runtime applies x_head @ Hhᵀ per head → fold Hh into w per head block
        w_fold = (w.reshape(heads, hd, out).transpose(0, 2, 1) @ Hh.T
                  ).transpose(0, 2, 1).reshape(n, out)
        spec = SiteSpec(online_had="head", head_dim=hd)
        y = qlinear(x, {"w": jnp.asarray(w_fold, jnp.float32), "b": None},
                    "s", spec, None, "fake")
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
