"""Tests for the Hadamard/orthogonal transform machinery."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.transform import hadamard as H


class TestConstruction:
    @pytest.mark.parametrize("n", [1, 2, 4, 8, 64, 12, 20, 28, 36, 40, 52, 60, 108, 140])
    def test_exact_hadamard_orders(self, n):
        h = H.hadamard_matrix(n)
        assert h.shape == (n, n)
        assert set(np.unique(h)) <= {-1.0, 1.0}
        np.testing.assert_allclose(h @ h.T, n * np.eye(n), atol=1e-9)

    def test_unconstructible_raises(self):
        with pytest.raises(ValueError):
            H.hadamard_matrix(6)

    @pytest.mark.parametrize("K", H.SUPPORTED_K)
    def test_block_K_orthonormal(self, K):
        b = H._block_K(K)
        np.testing.assert_allclose(b @ b.T, np.eye(K), atol=1e-9)

    def test_block_K_deterministic(self):
        a = H._block_K(172)
        b = H._block_K.__wrapped__(172)
        np.testing.assert_array_equal(a, b)


class TestPadding:
    def test_exact_sizes_unchanged(self):
        # dims of the actual target models
        assert H.auto_pad_size(11008) == 11008  # Qwen-VL intermediate = 172*64
        assert H.auto_pad_size(4096) == 4096
        assert H.auto_pad_size(13696) == 13824  # GLM-4V ffn → 108*128
        assert H.auto_pad_size(14336) == 14336  # InternLM2 ffn = 28*512

    def test_pad_is_minimal_form(self):
        for n in [100, 1000, 5000, 18944]:
            m = H.auto_pad_size(n)
            assert m >= n
            _, K = H.get_hadK(m)
            assert m % K == 0 and H.is_pow2(m // K)

    def test_get_hadK_dispatch(self):
        _, K = H.get_hadK(11008)
        assert K == 172
        _, K = H.get_hadK(256)
        assert K == 1
        with pytest.raises(ValueError):
            H.get_hadK(100)


class TestTransform:
    def test_fwht_matches_matrix(self, rng):
        n = 64
        x = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
        y = H.fwht(x)
        Hm = H.hadamard_matrix(n)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ Hm.T, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("n", [64, 12 * 8, 20 * 16, 108 * 2])
    def test_transform_orthonormal(self, rng, n):
        x = jnp.asarray(rng.normal(size=(5, n)), jnp.float64)
        y = H.hadamard_transform(x)
        # orthonormal → norms preserved
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-9,
        )

    @pytest.mark.parametrize("n", [64, 12 * 8, 172 * 4])
    def test_transform_matches_dense_matrix(self, rng, n):
        """The online transform and the offline fold matrix must agree exactly —
        this is the invariant that makes weight-folded rotations correct."""
        x = jnp.asarray(rng.normal(size=(2, n)), jnp.float64)
        y = H.hadamard_transform(x)
        M = H.transform_matrix(n)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ M.T, atol=1e-9)

    def test_transform_jittable(self, rng):
        n = 96  # 12 * 8
        f = jax.jit(H.hadamard_transform)
        x = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(f(x)), np.asarray(H.hadamard_transform(x)), rtol=1e-5
        )

    def test_involution_for_pow2(self, rng):
        # symmetric H for pow2 → applying twice gives identity
        x = jnp.asarray(rng.normal(size=(2, 128)), jnp.float64)
        y = H.hadamard_transform(H.hadamard_transform(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-9)


class TestRandomized:
    def test_random_hadamard_orthogonal(self):
        key = jax.random.key(0)
        M = H.random_hadamard_matrix(256, key)
        np.testing.assert_allclose(M @ M.T, np.eye(256), atol=1e-9)

    def test_random_orthogonal(self):
        key = jax.random.key(1)
        M = H.random_orthogonal_matrix(64, key)
        np.testing.assert_allclose(M @ M.T, np.eye(64), atol=1e-9)

    def test_get_orthogonal_matrix_modes(self):
        key = jax.random.key(2)
        for mode in ("hadamard", "random"):
            M = H.get_orthogonal_matrix(128, mode, key)
            np.testing.assert_allclose(M @ M.T, np.eye(128), atol=1e-9)
        with pytest.raises(ValueError):
            H.get_orthogonal_matrix(128, "bogus", key)

    def test_rotation_kills_outliers(self, rng):
        """The point of the whole exercise: rotating an outlier-heavy activation
        spreads energy across channels, shrinking the quantization range."""
        x = rng.normal(size=(128, 256)).astype(np.float64)
        x[:, 7] *= 80.0  # massive channel outlier
        key = jax.random.key(3)
        Q = H.random_hadamard_matrix(256, key)
        xr = x @ Q  # rotate activations
        assert np.abs(xr).max() < np.abs(x).max() / 4
