"""GPTQ core tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.core import quant as Q
from mquant_tpu.gptq import core as G


def hessian_from(x):
    return G.accumulate_hessian(None, x)


def weighted_err(W, Wq, H):
    """Proxy loss GPTQ minimizes: tr(ΔᵀHΔ)."""
    d = np.asarray(Wq - W, np.float64)
    return float(np.einsum("io,ij,jo->", d, np.asarray(H, np.float64), d))


class TestGptqCore:
    def test_identity_hessian_equals_rtn(self, rng):
        W = jnp.asarray(rng.normal(size=(128, 32)), jnp.float32)
        H = jnp.eye(128) * 2.0
        res = G.gptq_quantize_matrix(W, H, bits=4)
        rtn = Q.rtn_fake_quant_weight(W, 4)
        np.testing.assert_allclose(np.asarray(res.w), np.asarray(rtn), atol=1e-5)
        assert not bool(res.used_fallback)

    def test_beats_rtn_on_correlated_inputs(self, rng):
        # correlated calibration activations → GPTQ's error propagation wins
        n, out, N = 128, 64, 512
        basis = rng.normal(size=(16, n))
        x = rng.normal(size=(N, 16)) @ basis + 0.05 * rng.normal(size=(N, n))
        x = jnp.asarray(x, jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)), jnp.float32)
        H = hessian_from(x)
        res = G.gptq_quantize_matrix(W, H, bits=3)
        rtn = Q.rtn_fake_quant_weight(W, 3)
        e_gptq = weighted_err(W, res.w, H)
        e_rtn = weighted_err(W, rtn, H)
        assert e_gptq < e_rtn * 0.9, (e_gptq, e_rtn)
        # ...and the actual functional error on the calibration data
        f_gptq = float(jnp.linalg.norm(x @ res.w - x @ W))
        f_rtn = float(jnp.linalg.norm(x @ rtn - x @ W))
        assert f_gptq < f_rtn, (f_gptq, f_rtn)

    def test_act_order(self, rng):
        n, out, N = 128, 32, 256
        x = rng.normal(size=(N, n))
        x[:, :8] *= 10.0  # salient inputs
        x = jnp.asarray(x, jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)), jnp.float32)
        H = hessian_from(x)
        res = G.gptq_quantize_matrix(W, H, bits=3, act_order=True)
        rtn = Q.rtn_fake_quant_weight(W, 3)
        assert weighted_err(W, res.w, H) < weighted_err(W, rtn, H)
        assert res.w.shape == W.shape

    def test_group_size(self, rng):
        n, out = 128, 32
        x = jnp.asarray(rng.normal(size=(256, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out))
                        * (10.0 ** rng.uniform(-1, 1, size=(n, 1))), jnp.float32)
        H = hessian_from(x)
        res_g = G.gptq_quantize_matrix(W, H, bits=4, group_size=32)
        res_pc = G.gptq_quantize_matrix(W, H, bits=4)
        assert res_g.scale.shape == (4, out)
        # groupwise scales must beat single per-channel scales on rowwise-varying W
        assert weighted_err(W, res_g.w, H) < weighted_err(W, res_pc.w, H)

    def test_non_block_multiple_input_dim(self, rng):
        n, out = 100, 16  # not a multiple of 128 → padding path
        x = jnp.asarray(rng.normal(size=(300, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)), jnp.float32)
        res = G.gptq_quantize_matrix(W, hessian_from(x), bits=4)
        assert res.w.shape == (n, out)
        assert bool(jnp.all(jnp.isfinite(res.w)))

    def test_singular_hessian_fallback_is_finite(self, rng):
        # rank-1 Hessian: Cholesky of H⁻¹ may fail → must still return finite RTN
        n, out = 64, 16
        x = jnp.asarray(np.ones((4, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)), jnp.float32)
        res = G.gptq_quantize_matrix(W, hessian_from(x), bits=4, percdamp=0.0)
        assert bool(jnp.all(jnp.isfinite(res.w)))

    def test_dead_inputs_zeroed(self, rng):
        n, out = 64, 16
        x = np.asarray(rng.normal(size=(128, n)), np.float32)
        x[:, 5] = 0.0  # input feature 5 never fires
        W = jnp.asarray(rng.normal(size=(n, out)), jnp.float32)
        res = G.gptq_quantize_matrix(W, hessian_from(jnp.asarray(x)), bits=4)
        np.testing.assert_allclose(np.asarray(res.w[5]), 0.0, atol=1e-6)

    def test_vmap_over_layers(self, rng):
        L, n, out = 3, 64, 32
        x = jnp.asarray(rng.normal(size=(L, 256, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(L, n, out)), jnp.float32)
        H = jax.vmap(lambda xx: G.accumulate_hessian(None, xx))(x)
        res = jax.vmap(lambda w, h: G.gptq_quantize_matrix(w, h, bits=4))(W, H)
        assert res.w.shape == (L, n, out)
        # matches per-layer results
        r0 = G.gptq_quantize_matrix(W[0], H[0], bits=4)
        np.testing.assert_allclose(np.asarray(res.w[0]), np.asarray(r0.w), atol=1e-5)

    def test_hessian_accumulation_streams(self, rng):
        x1 = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        x2 = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        h = G.accumulate_hessian(G.accumulate_hessian(None, x1), x2)
        both = G.accumulate_hessian(None, jnp.concatenate([x1, x2]))
        np.testing.assert_allclose(np.asarray(h), np.asarray(both), rtol=1e-4, atol=1e-5)


class TestAsymGptq:
    """Asymmetric (zero-point) GPTQ — ref: fake_quant/quant_utils.py:446-509
    (WeightQuantizer sym=False) used by GPTQ via gptq_utils.py:249-286."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(7)

    def test_asym_beats_sym_on_shifted_weights(self, rng):
        n, out = 96, 32
        x = jnp.asarray(rng.normal(size=(256, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)) * 0.1 + 0.5, jnp.float32)
        H = hessian_from(x)
        e_sym = jnp.mean((G.gptq_quantize_matrix(W, H, bits=4, sym=True).w - W) ** 2)
        e_asym = jnp.mean((G.gptq_quantize_matrix(W, H, bits=4, sym=False).w - W) ** 2)
        assert float(e_asym) < float(e_sym) * 0.5

    def test_asym_grouped(self, rng):
        n, out = 128, 32
        x = jnp.asarray(rng.normal(size=(256, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)) * 0.1 + 0.3, jnp.float32)
        H = hessian_from(x)
        res = G.gptq_quantize_matrix(W, H, bits=4, sym=False, group_size=32)
        assert bool(jnp.all(jnp.isfinite(res.w)))
        e_g = float(jnp.mean((res.w - W) ** 2))
        e_sym = float(jnp.mean(
            (G.gptq_quantize_matrix(W, H, bits=4, group_size=32).w - W) ** 2))
        assert e_g < e_sym

    def test_asym_values_on_grid(self, rng):
        # every output value must sit on the asym grid (q - z) * s, q in [0, 15]
        n, out = 64, 8
        x = jnp.asarray(rng.normal(size=(256, n)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(n, out)) + 1.0, jnp.float32)
        res = G.gptq_quantize_matrix(W, hessian_from(x), bits=4, sym=False)
        # recover integer codes from scale: (w/s + z) must be near-integers in range
        s = np.asarray(res.scale[0])  # (out,)
        w = np.asarray(res.w)
        codes = w / s[None, :]
        assert np.allclose(codes, np.round(codes), atol=1e-3)
        assert np.all(np.round(codes) >= -15.1) and np.all(np.round(codes) <= 15.1)
