"""Native (C++) data-path kernels vs numpy/jax references."""

import numpy as np
import pytest

from mquant_tpu import native as N


@pytest.fixture(scope="module")
def have_native():
    return N.available()


class TestNative:
    def test_pack_unpack_roundtrip(self, rng):
        q = rng.integers(-8, 8, size=(64, 32)).astype(np.int8)
        packed = N.pack_int4(q)
        assert packed.shape == (32, 32)
        np.testing.assert_array_equal(N.unpack_int4(packed), q)

    def test_pack_matches_device_layout(self, rng):
        """Native packing must byte-match kernels.qmm.quantize_weights_real's
        packing of the same int values."""
        import jax.numpy as jnp

        from mquant_tpu.kernels.qmm import quantize_weights_real, unpack_int4_weights

        w = rng.normal(size=(64, 16)).astype(np.float32)
        p = quantize_weights_real(jnp.asarray(w), 4)
        dev_int = np.asarray(unpack_int4_weights(p))
        packed_native = N.pack_int4(dev_int)
        np.testing.assert_array_equal(packed_native, np.asarray(p["w_q"]))

    def test_quantize_int8(self, rng):
        x = rng.normal(size=(1000,)).astype(np.float32)
        out = N.quantize_int8(x, 0.05)
        ref = np.clip(np.rint(x / 0.05), -127, 127).astype(np.int8)
        np.testing.assert_array_equal(out, ref)

    def test_patchify_2d_matches_jax(self, rng):
        import jax.numpy as jnp

        from mquant_tpu.models.vision import patchify_2d as jax_patchify

        img = rng.normal(size=(16, 16, 3)).astype(np.float32)
        native = N.patchify_2d(img, 4)
        ref, _ = jax_patchify(jnp.asarray(img)[None], 4)
        np.testing.assert_allclose(native, np.asarray(ref[0]), rtol=1e-6)

    def test_patchify_qwen2vl_matches_jax(self, rng):
        import jax.numpy as jnp

        from mquant_tpu.models.vision import patchify_qwen2vl as jax_patchify

        img = rng.normal(size=(16, 16, 3)).astype(np.float32)
        native = N.patchify_qwen2vl(img, 4)
        ref, _ = jax_patchify(jnp.asarray(img)[None], patch=4)
        np.testing.assert_allclose(native, np.asarray(ref[0]), rtol=1e-6)

    def test_resize_normalize(self, rng):
        img = rng.integers(0, 255, size=(20, 24, 3)).astype(np.uint8)
        out = N.resize_normalize(img, (16, 16))
        assert out.shape == (16, 16, 3)
        assert out.dtype == np.float32
        # identity resize reproduces the normalized source exactly
        same = N.resize_normalize(img, (20, 24))
        np.testing.assert_allclose(
            same, (img.astype(np.float32) / 255 - 0.5) / 0.5, atol=1e-5)

    def test_native_lib_loaded(self, have_native):
        # the .so is committed-buildable; if the build ran, bindings must load
        import os

        so = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "native", "libmquant_native.so")
        if os.path.exists(so):
            assert have_native

    def test_native_and_fallback_agree(self, rng, have_native, monkeypatch):
        if not have_native:
            pytest.skip("native lib not built")
        img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
        a = N.resize_normalize(img, (16, 16))
        monkeypatch.setenv("MQUANT_DISABLE_NATIVE", "1")
        monkeypatch.setattr(N, "_LIB", None)
        monkeypatch.setattr(N, "_TRIED", False)
        b = N.resize_normalize(img, (16, 16))
        np.testing.assert_allclose(a, b, atol=1e-5)
