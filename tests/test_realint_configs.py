"""Real-int serving for the activation/weight configs round 2 rejected.

Parity target: the reference fake-quants all of these via
fake_quant/quant_utils.py:181-268 (per-channel static scales, a_groupsize,
asym acts) and the --w_asym/--w_groupsize weight grids; here each one is
REALIZED on the int GEMM path and must match its fake-quant counterpart
to f32 rounding (the math is algebraically identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.core.quant import QuantParams
from mquant_tpu.kernels import qmm as KQ
from mquant_tpu.models.layers import SiteSpec, qlinear


def _fake_ref(x, w_fake, spec, state=None):
    """Fake-quant forward: act fake-quantize then fp GEMM."""
    p = {"w": w_fake, "b": None}
    return qlinear(x, p, "t.site", spec, {"t.site": state} if state else None,
                   mode="fake")


def _gptq_site(rng, In, Out, sym=True, group_size=None, bits=4):
    from mquant_tpu.gptq.core import accumulate_hessian, gptq_quantize_matrix

    w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32) * 0.1
    xs = jnp.asarray(rng.normal(size=(64, In)), jnp.float32)
    H = accumulate_hessian(None, xs)
    res = gptq_quantize_matrix(w, H, bits=bits, sym=sym, group_size=group_size)
    return res


class TestAsymGroupedWeightRealize:
    """--w_asym / --w_groupsize grids realize losslessly from carried qparams
    (the round-2 silent degradation: a second symmetric re-quantization)."""

    @pytest.mark.parametrize("sym,group", [(False, None), (True, 32),
                                           (False, 32)])
    def test_realize_recovers_exact_fake_values(self, rng, sym, group):
        In, Out = 64, 48
        res = _gptq_site(rng, In, Out, sym=sym, group_size=group)
        p = KQ.quantize_weights_real(res.w, 4, pack=False, scale=res.scale,
                                     zero=res.zero)
        # dequantized storage reproduces the fake-quantized weight EXACTLY
        ws = p["w_scale"]
        ws2 = ws if ws.ndim == 2 else ws.reshape(1, -1)
        G = ws2.shape[0]
        q = p["w_q"].astype(jnp.float32)
        if "w_zp" in p:
            q = q - jnp.repeat(p["w_zp"], In // G, axis=0)
        w_rec = q * jnp.repeat(ws2, In // G, axis=0)
        np.testing.assert_allclose(np.asarray(w_rec), np.asarray(res.w),
                                   rtol=0, atol=1e-5)

    @pytest.mark.parametrize("sym,group", [(False, None), (True, 32),
                                           (False, 32)])
    def test_real_forward_matches_fake(self, rng, sym, group):
        In, Out, M = 64, 48, 8
        res = _gptq_site(rng, In, Out, sym=sym, group_size=group)
        p = {"b": None}
        p.update(KQ.quantize_weights_real(res.w, 4, pack=False,
                                          scale=res.scale, zero=res.zero))
        x = jnp.asarray(rng.normal(size=(M, In)), jnp.float32)
        spec = SiteSpec(w_bits=4, a_bits=8)
        ref = _fake_ref(x, res.w, spec)
        out = qlinear(x, p, "t.site", spec, None, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestActOrderGroupedRealize:
    """act_order × group_size realization: permuted weight layout + a_perm
    activation gather — the reference's recommended GPTQ flag set
    (docs/qwenvl.md:45 --act_order) combined with --w_groupsize serves on
    the real-int path (was the last realize NotImplementedError)."""

    @pytest.mark.parametrize("sym", [True, False])
    def test_matrix_level_real_matches_fake(self, rng, sym):
        In, Out, M = 64, 48, 8
        from mquant_tpu.gptq.core import (accumulate_hessian,
                                          gptq_quantize_matrix)

        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32) * 0.1
        xs = jnp.asarray(rng.normal(size=(64, In)) * rng.uniform(
            0.2, 3.0, size=(1, In)), jnp.float32)  # uneven diag → real perm
        H = accumulate_hessian(None, xs)
        res = gptq_quantize_matrix(w, H, bits=4, sym=sym, group_size=16,
                                   act_order=True)
        assert res.perm is not None
        assert not bool(jnp.all(res.perm == jnp.arange(In)))  # non-trivial
        # realize in PERMUTED layout: grouped scale table maps contiguous rows
        wp = res.w[res.perm]
        p = {"b": None}
        p.update(KQ.quantize_weights_real(wp, 4, pack=False, scale=res.scale,
                                          zero=res.zero))
        p["a_perm"] = res.perm.astype(jnp.int32)
        # storage recovery is EXACT on the permuted rows
        ws2 = p["w_scale"]
        G = ws2.shape[0]
        q = p["w_q"].astype(jnp.float32)
        if "w_zp" in p:
            q = q - jnp.repeat(p["w_zp"], In // G, axis=0)
        w_rec = q * jnp.repeat(ws2, In // G, axis=0)
        np.testing.assert_allclose(np.asarray(w_rec), np.asarray(wp),
                                   rtol=0, atol=1e-5)
        # forward parity: real (permuted storage + act gather) vs fake
        x = jnp.asarray(rng.normal(size=(M, In)), jnp.float32)
        spec = SiteSpec(w_bits=4, a_bits=8)
        ref = _fake_ref(x, res.w, spec)
        out = qlinear(x, p, "t.site", spec, None, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_decoder_level_real_matches_fake(self, rng):
        """Full driver → realize → decoder_forward parity on a 2-layer model
        (stacked (L,in) perms sliced by the layer scan)."""
        from mquant_tpu.gptq.driver import GPTQConfig, gptq_quantize_decoder
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           decoder_forward,
                                           init_decoder_params)
        from mquant_tpu.transform.recipes import realize_decoder_weights

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8) for n in LLM_SITES}
        embeds = [jax.random.normal(jax.random.key(1), (1, 16, 32),
                                    jnp.float32) * 0.1]
        qp, rep = gptq_quantize_decoder(
            cfg, params, embeds, specs,
            gcfg=GPTQConfig(act_order=True, group_size=16))
        for n in LLM_SITES:
            assert rep["qparams"][n][2] is not None, n  # perms carried
        toks = jax.random.randint(jax.random.key(2), (2, 8), 0, cfg.vocab)
        ref, _, _ = decoder_forward(cfg, qp, toks, specs=specs, mode="fake")
        rp = realize_decoder_weights(qp, specs, qps=rep["qparams"])
        for n in LLM_SITES:
            assert "a_perm" in rp["layers"][n], n
            assert rp["layers"][n]["a_perm"].shape == (
                cfg.n_layers, qp["layers"][n]["w"].shape[-2])
        out, _, _ = decoder_forward(cfg, rp, toks, specs=specs, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)


class TestAsymActivations:
    """Asymmetric activations on the real path: zp·Σw epilogue correction
    (ref fake-quant path: quant_utils.py asym_quant_dequant)."""

    @pytest.mark.parametrize("per_token", [True, False])
    def test_dynamic_asym_matches_fake(self, rng, per_token):
        In, Out, M = 64, 48, 8
        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32) * 0.1
        from mquant_tpu.core.quant import rtn_fake_quant_weight

        w_fake = rtn_fake_quant_weight(w, 8)
        p = {"b": None}
        p.update(KQ.quantize_weights_real(w_fake, 8, pack=False))
        # shifted activations so the zero point actually matters
        x = jnp.asarray(rng.normal(size=(M, In)) + 3.0, jnp.float32)
        spec = SiteSpec(w_bits=8, a_bits=8, a_symmetric=False,
                        a_per_token=per_token)
        ref = _fake_ref(x, w_fake, spec)
        out = qlinear(x, p, "t.site", spec, None, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_static_asym_per_tensor_matches_fake(self, rng):
        In, Out, M = 64, 48, 8
        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32) * 0.1
        from mquant_tpu.core.formats import get_format
        from mquant_tpu.core.quant import (rtn_fake_quant_weight,
                                           scales_from_minmax)

        w_fake = rtn_fake_quant_weight(w, 8)
        p = {"b": None}
        p.update(KQ.quantize_weights_real(w_fake, 8, pack=False))
        x = jnp.asarray(rng.normal(size=(M, In)) + 2.0, jnp.float32)
        fmt = get_format(8, signed=False)
        qp = scales_from_minmax(jnp.min(x), jnp.max(x), fmt, symmetric=False)
        spec = SiteSpec(w_bits=8, a_bits=8, a_static=True, a_symmetric=False)
        state = {"act": qp}
        ref = _fake_ref(x, w_fake, spec, state)
        out = qlinear(x, p, "t.site", spec, {"t.site": state}, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestActGroupsize:
    """--a_groupsize on the real path: per-token-per-group scales via the
    group-blocked epilogue."""

    @pytest.mark.parametrize("sym", [True, False])
    def test_a_groupsize_matches_fake(self, rng, sym):
        In, Out, M = 64, 48, 8
        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32) * 0.1
        from mquant_tpu.core.quant import rtn_fake_quant_weight

        w_fake = rtn_fake_quant_weight(w, 8)
        p = {"b": None}
        p.update(KQ.quantize_weights_real(w_fake, 8, pack=False))
        x = jnp.asarray(rng.normal(size=(M, In)) + (0.0 if sym else 1.5),
                        jnp.float32)
        spec = SiteSpec(w_bits=8, a_bits=8, a_groupsize=16, a_symmetric=sym)
        ref = _fake_ref(x, w_fake, spec)
        out = qlinear(x, p, "t.site", spec, None, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_a_groupsize_with_grouped_weights(self, rng):
        """Act groups (16) × weight groups (32) — the lcm block walk."""
        In, Out, M = 64, 48, 8
        res = _gptq_site(rng, In, Out, sym=True, group_size=32, bits=4)
        p = {"b": None}
        p.update(KQ.quantize_weights_real(res.w, 4, pack=False,
                                          scale=res.scale, zero=res.zero))
        x = jnp.asarray(rng.normal(size=(M, In)), jnp.float32)
        spec = SiteSpec(w_bits=4, a_bits=8, a_groupsize=16)
        ref = _fake_ref(x, res.w, spec)
        out = qlinear(x, p, "t.site", spec, None, mode="real")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestPerChannelStaticFold:
    """Per-channel static act scales fold into the weights at realize time;
    the runtime quantizes per-channel with unit dequant scale."""

    def test_fold_matches_fake_within_requant_noise(self, rng):
        from mquant_tpu.core.formats import get_format
        from mquant_tpu.core.quant import scales_from_minmax
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           init_decoder_params)
        from mquant_tpu.transform.recipes import (realize_decoder_weights,
                                                  rtn_quantize_decoder)

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=1, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=8, a_bits=8, a_static=True,
                                      a_per_channel=True)
                 for n in LLM_SITES}
        params, qps = rtn_quantize_decoder(cfg, params, specs,
                                           return_qparams=True)

        # synthetic per-channel static scales per site (as calibration would)
        fmt = get_format(8, signed=True)
        state = {}
        # sites sharing one input tensor calibrate to IDENTICAL scales
        # (q/k/v on ln1 out, gate/up on ln2 out) — mirror that here, else the
        # shared-input group quantize in qlinear_group is (correctly) unsound
        def amax(C):
            return jnp.asarray(rng.uniform(0.5, 2.0, size=(1, C)), jnp.float32)

        shared = {"q": "qkv", "k": "qkv", "v": "qkv", "gate": "gu",
                  "up": "gu", "o": "o", "down": "down"}
        draws = {"qkv": amax(32), "gu": amax(32), "o": amax(32),
                 "down": amax(64)}
        for n in LLM_SITES:
            a = draws[shared[n]]
            state[f"llm.{n}"] = {"act": scales_from_minmax(-a, a, fmt)}

        from mquant_tpu.models.llm import decoder_forward

        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, cfg.vocab)
        ref, _, _ = decoder_forward(cfg, params, toks, specs=specs,
                                    state=state, mode="fake")
        rp = realize_decoder_weights(params, specs, qps=qps, state=state)
        for n in LLM_SITES:
            assert "a_fold" in rp["layers"][n], n
        out, _, _ = decoder_forward(cfg, rp, toks, specs=specs, state=state,
                                    mode="real")
        # folding re-quantizes the weight once → small extra error allowed
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        den = np.abs(np.asarray(ref)).max()
        assert err / den < 0.05, (err, den)

    def test_fold_asym_matches_fake_within_requant_noise(self, rng):
        """Per-channel ASYMMETRIC static act scales: the zp contribution is a
        precomputed per-output a_corr row added by the GEMM epilogue (the last
        act-config NotImplementedError; ref fake path quant_utils.py:181-268)."""
        from mquant_tpu.core.formats import get_format
        from mquant_tpu.core.quant import scales_from_minmax
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           decoder_forward,
                                           init_decoder_params)
        from mquant_tpu.transform.recipes import (realize_decoder_weights,
                                                  rtn_quantize_decoder)

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=8, a_bits=8, a_static=True,
                                      a_per_channel=True, a_symmetric=False)
                 for n in LLM_SITES}
        params, qps = rtn_quantize_decoder(cfg, params, specs,
                                           return_qparams=True)

        fmt = get_format(8, signed=False)
        L = cfg.n_layers

        def mk(C):
            # deliberately skewed per-channel ranges so the zp matters
            lo = jnp.asarray(rng.uniform(-0.4, 0.8, size=(L, C)), jnp.float32)
            hi = lo + jnp.asarray(rng.uniform(0.5, 2.0, size=(L, C)),
                                  jnp.float32)
            return scales_from_minmax(lo, hi, fmt, symmetric=False)

        shared = {"q": "qkv", "k": "qkv", "v": "qkv", "gate": "gu",
                  "up": "gu", "o": "o", "down": "down"}
        draws = {"qkv": mk(32), "gu": mk(32), "o": mk(32), "down": mk(64)}
        state = {f"llm.{n}": {"act": draws[shared[n]]} for n in LLM_SITES}

        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, cfg.vocab)
        ref, _, _ = decoder_forward(cfg, params, toks, specs=specs,
                                    state=state, mode="fake")
        rp = realize_decoder_weights(params, specs, qps=qps, state=state)
        for n in LLM_SITES:
            assert "a_fold" in rp["layers"][n], n
            assert "a_corr" in rp["layers"][n], n
            assert rp["layers"][n]["a_corr"].shape[0] == L
        out, _, _ = decoder_forward(cfg, rp, toks, specs=specs, state=state,
                                    mode="real")
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        den = np.abs(np.asarray(ref)).max()
        assert err / den < 0.05, (err, den)
