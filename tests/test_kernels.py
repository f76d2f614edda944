"""Kernel correctness tests (Pallas in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.kernels import fwht as KF
from mquant_tpu.kernels import qmm as KQ
from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.transform import hadamard as H


class TestOnlineHadamard:
    @pytest.mark.parametrize("n", [128, 256, 96, 108 * 2, 1024])
    def test_matches_reference_transform(self, rng, n):
        """The two-matmul MXU form must equal the butterfly reference exactly —
        this is the invariant that keeps offline weight folds correct."""
        x = jnp.asarray(rng.normal(size=(32, n)), jnp.float32)
        ref = H.hadamard_transform(x)
        out = KF.online_hadamard(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_matches_dense_matrix(self, rng):
        n = 96
        x = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)
        M = H.transform_matrix(n)
        np.testing.assert_allclose(
            np.asarray(KF.online_hadamard(x)),
            np.asarray(x) @ M.T.astype(np.float32), rtol=1e-4, atol=1e-4)

    def test_orthonormal(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
        y = KF.online_hadamard(x)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


class TestFwhtPallas:
    @pytest.mark.parametrize("n", [128, 256, 96])
    def test_matches_pure_jax(self, rng, n):
        x = jnp.asarray(rng.normal(size=(32, n)), jnp.float32)
        ref = H.hadamard_transform(x)
        out = KF.fwht_pallas(x, tile_t=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_3d_input_and_padding(self, rng):
        n = 128
        x = jnp.asarray(rng.normal(size=(3, 5, n)), jnp.float32)  # 15 tokens → pad
        ref = H.hadamard_transform(x)
        out = KF.fwht_pallas(x, tile_t=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestQmmPallas:
    def test_w4_kernel_matches_xla_path(self, rng):
        In, Out, M = 256, 128, 48
        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32)
        p = dict(KQ.quantize_weights_real(w, 4))
        x = jnp.asarray(rng.normal(size=(M, In)), jnp.float32)
        spec = SiteSpec(w_bits=4, a_bits=8)
        ref = KQ.quantized_matmul(x, p, spec, None, out_dtype=jnp.float32)
        xq, xs = KQ._act_int8(x, spec, None)
        out = KQ._qmm_pallas_w4(xq, xs, p, jnp.float32,
                                tm=16, tn=128, tk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_w4_kernel_static_scale(self, rng):
        from mquant_tpu.core.quant import QuantParams

        In, Out, M = 128, 128, 32
        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32)
        p = dict(KQ.quantize_weights_real(w, 4))
        x = jnp.asarray(rng.normal(size=(M, In)), jnp.float32)
        spec = SiteSpec(w_bits=4, a_bits=8, a_static=True)
        state = {"act": QuantParams(scale=jnp.float32(0.05))}
        ref = KQ.quantized_matmul(x, p, spec, state, out_dtype=jnp.float32)
        xq, xs = KQ._act_int8(x, spec, state)
        out = KQ._qmm_pallas_w4(xq, xs, p, jnp.float32,
                                tm=16, tn=128, tk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    def test_w8_quantized_matmul_accuracy(self, rng):
        In, Out, M = 128, 64, 32
        w = jnp.asarray(rng.normal(size=(In, Out)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(M, In)), jnp.float32)
        p = dict(KQ.quantize_weights_real(w, 8))
        spec = SiteSpec(w_bits=8, a_bits=8)
        out = KQ.quantized_matmul(x, p, spec, None, out_dtype=jnp.float32)
        ref = x @ w
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_unpack_matches_pack(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        p = KQ.quantize_weights_real(w, 4)
        unpacked = KQ.unpack_int4_weights(p)
        assert unpacked.shape == (64, 32)
        deq = unpacked.astype(jnp.float32) * p["w_scale"][None, :]
        rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
        assert rel < 0.15  # int4 precision on gaussian weights
