"""Unit tests for quantization primitives (mquant_tpu.core)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.core import quant as Q
from mquant_tpu.core.formats import FORMATS, INT4, INT8, UINT8, get_format


class TestFormats:
    def test_bounds(self):
        assert INT8.qmin == -128 and INT8.qmax == 127
        assert UINT8.qmin == 0 and UINT8.qmax == 255
        assert INT4.qmin == -8 and INT4.qmax == 7

    def test_registry(self):
        # same registry coverage as the reference BIT_TYPE_DICT
        for name in ("uint4", "int8", "uint8", "int16", "int18", "int20"):
            assert name in FORMATS
        assert get_format(8).name == "int8"
        assert get_format(4, signed=False).name == "uint4"

    def test_storage_dtype(self):
        assert INT8.storage_dtype == jnp.int8
        assert get_format(16).storage_dtype == jnp.int16


class TestQuantDequant:
    def test_sym_roundtrip_exact_grid(self, rng):
        # values exactly on the int8 grid survive quant→dequant untouched
        scale = jnp.float32(0.05)
        qvals = rng.integers(-128, 128, size=(64, 32))
        x = jnp.asarray(qvals, jnp.float32) * scale
        qp = Q.QuantParams(scale=scale)
        xq = Q.fake_quantize(x, qp, INT8)
        np.testing.assert_allclose(np.asarray(xq), np.asarray(x), rtol=1e-6)

    def test_sym_error_bound(self, rng):
        x = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
        qp = Q.dynamic_qparams(x, INT8, axis=None)
        xq = Q.fake_quantize(x, qp, INT8)
        # max error bounded by half a quantization step
        assert float(jnp.max(jnp.abs(xq - x))) <= float(qp.scale) / 2 + 1e-7

    def test_asym_handles_shifted_range(self, rng):
        x = jnp.asarray(rng.uniform(2.0, 6.0, size=(256,)), jnp.float32)
        fmt = get_format(8, signed=False)
        qp = Q.scales_from_minmax(jnp.min(x), jnp.max(x), fmt, symmetric=False)
        xq = Q.fake_quantize(x, qp, fmt)
        # asymmetric error bound: half a step
        assert float(jnp.max(jnp.abs(xq - x))) <= float(qp.scale) / 2 + 1e-6
        # symmetric int8 on the same data would waste half the range; asym must beat it
        qps = Q.dynamic_qparams(x, INT8)
        xqs = Q.fake_quantize(x, qps, INT8)
        assert float(jnp.mean((xq - x) ** 2)) < float(jnp.mean((xqs - x) ** 2))

    def test_zero_always_representable(self):
        x = jnp.asarray([3.0, 4.0, 5.0], jnp.float32)  # strictly positive range
        fmt = get_format(8, signed=False)
        qp = Q.scales_from_minmax(jnp.min(x), jnp.max(x), fmt, symmetric=False)
        z = Q.fake_quantize(jnp.zeros(()), qp, fmt)
        assert float(jnp.abs(z)) <= float(qp.scale) / 2 + 1e-7

    def test_per_channel_beats_per_tensor(self, rng):
        # output channels (last axis, (in, out) layout) with wildly different ranges
        w = jnp.asarray(rng.normal(size=(64, 8)) * (10.0 ** rng.uniform(-2, 2, size=(1, 8))), jnp.float32)
        q_pc, qp_pc = Q.rtn_quantize_weight(w, 8, per_channel=True)
        q_pt, qp_pt = Q.rtn_quantize_weight(w, 8, per_channel=False)
        e_pc = jnp.mean((Q.dequantize(q_pc, qp_pc) - w) ** 2)
        e_pt = jnp.mean((Q.dequantize(q_pt, qp_pt) - w) ** 2)
        assert float(e_pc) < float(e_pt)

    def test_dynamic_per_token(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 16, 32)), jnp.float32)
        out = Q.dynamic_fake_quant(x, bits=8, per_token=True)
        assert out.shape == x.shape
        # each token quantized with its own scale: error within its own amax/127/2
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        assert bool(jnp.all(jnp.abs(out - x) <= amax / 127.0 / 2 + 1e-6))

    def test_groupwise(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
        out = Q.groupwise_fake_quant(x, bits=4, group_size=32)
        assert out.shape == x.shape
        # groupwise int4 must beat per-tensor int4
        qp = Q.dynamic_qparams(x, INT4)
        e_pt = jnp.mean((Q.fake_quantize(x, qp, INT4) - x) ** 2)
        assert float(jnp.mean((out - x) ** 2)) < float(e_pt)


class TestPacking:
    def test_pack_unpack_roundtrip(self, rng):
        q = jnp.asarray(rng.integers(-8, 8, size=(16, 64)), jnp.int8)
        packed = Q.pack_int4(q)
        assert packed.shape == (16, 32)
        assert packed.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(Q.unpack_int4(packed)), np.asarray(q))

    def test_pack_density(self):
        q = jnp.zeros((4, 128), jnp.int8)
        assert Q.pack_int4(q).size == q.size // 2


class TestMseClip:
    def test_mse_clip_helps_outliers(self, rng):
        w = rng.normal(size=(256, 4)).astype(np.float32)
        w[0, :] = 12.0  # a big outlier in one input row, seen by every out channel
        w = jnp.asarray(w)
        fmt = INT4
        qp_plain = Q.weight_qparams(w, fmt, mse_clip=False)
        qp_clip = Q.weight_qparams(w, fmt, mse_clip=True)
        e_plain = jnp.mean((Q.fake_quantize(w, qp_plain, fmt) - w) ** 2)
        e_clip = jnp.mean((Q.fake_quantize(w, qp_clip, fmt) - w) ** 2)
        assert float(e_clip) < float(e_plain)
        # clipped scales never exceed the unclipped ones
        assert float(jnp.max(qp_clip.scale)) <= float(jnp.max(qp_plain.scale)) + 1e-7

    def test_mse_clip_never_worse_in_search_norm(self, rng):
        # The grid includes shrink=1.0 (ref quant_utils.py:487 starts at i=0),
        # so the p=2.4 search objective can never exceed the unclipped loss —
        # an exact invariant regardless of how extreme the outlier is.
        w = rng.normal(size=(256, 4)).astype(np.float32)
        w[0, :] = 50.0
        w = jnp.asarray(w)
        fmt = INT4
        qp_plain = Q.weight_qparams(w, fmt, mse_clip=False)
        qp_clip = Q.weight_qparams(w, fmt, mse_clip=True)
        p_plain = jnp.sum(jnp.abs(Q.fake_quantize(w, qp_plain, fmt) - w) ** 2.4)
        p_clip = jnp.sum(jnp.abs(Q.fake_quantize(w, qp_clip, fmt) - w) ** 2.4)
        assert float(p_clip) <= float(p_plain) + 1e-6


class TestLog2:
    def test_log2_exact_powers(self):
        x = jnp.asarray([1.0, 0.5, 0.25, 0.125], jnp.float32)
        out = Q.log2_fake_quant(x, bits=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_log2_underflow_to_zero(self):
        x = jnp.asarray([2.0 ** (-20)], jnp.float32)
        out = Q.log2_fake_quant(x, bits=4)  # 2^4=16 levels → -20 underflows
        assert float(out[0]) == 0.0


@pytest.mark.parametrize("bits,per_channel", [(8, True), (8, False), (4, True)])
def test_rtn_monotone_in_bits(rng, bits, per_channel):
    w = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    q, qp = Q.rtn_quantize_weight(w, bits, per_channel=per_channel)
    assert q.dtype == get_format(bits).storage_dtype
    err = float(jnp.mean((Q.dequantize(q, qp) - w) ** 2))
    q2, qp2 = Q.rtn_quantize_weight(w, bits * 2 if bits == 4 else 16, per_channel=per_channel)
    err2 = float(jnp.mean((Q.dequantize(q2, qp2) - w) ** 2))
    assert err2 < err


class TestGroupwiseActQuant:
    """Dynamic per-token-per-group activation scales — ref --a_groupsize
    (quant_utils.py:181-203 find_params_per_token_groupwise)."""

    def test_groupwise_beats_per_token_on_heterogeneous_channels(self):
        import jax.numpy as jnp

        from mquant_tpu.core.quant import dynamic_fake_quant

        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, 8, 64)).astype(np.float32)
        x[..., 32:] *= 50.0  # second half has a wildly different range
        xa = jnp.asarray(x)
        # the small-range half is where one coarse per-token scale hurts;
        # per-group scales should recover it almost entirely
        e_tok = float(jnp.mean(
            (dynamic_fake_quant(xa, bits=4) - xa)[..., :32] ** 2))
        e_grp = float(jnp.mean(
            (dynamic_fake_quant(xa, bits=4, groupsize=32) - xa)[..., :32] ** 2))
        assert e_grp < e_tok * 0.1, (e_grp, e_tok)

    def test_groupwise_through_qlinear(self):
        import jax
        import jax.numpy as jnp

        from mquant_tpu.models.layers import SiteSpec, qlinear

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 6, 32)), jnp.float32)
        p = {"w": jnp.asarray(rng.normal(size=(32, 16)), jnp.float32), "b": None}
        spec = SiteSpec(a_bits=8, a_groupsize=8)
        y = qlinear(x, p, "t.s", spec, None, "fake")
        ref = x @ p["w"]
        assert bool(jnp.all(jnp.isfinite(y)))
        # close to fp at 8 bits, not identical
        assert float(jnp.max(jnp.abs(y - ref))) > 0
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=0.2,
                                   atol=0.5)
