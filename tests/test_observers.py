"""Unit tests for functional observers (mquant_tpu.observe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.core.formats import INT8, get_format
from mquant_tpu.core import quant as Q
from mquant_tpu.observe import ObserverSpec, finalize, init_stats, update


def fold(spec, batches, channels=None):
    stats = init_stats(spec, channels)
    for b in batches:
        stats = update(spec, stats, b)
    return stats


class TestMinmax:
    def test_tracks_running_extrema(self, rng):
        spec = ObserverSpec(kind="minmax", per_channel=False)
        b1 = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32) * 3
        stats = fold(spec, [b1, b2])
        allv = jnp.concatenate([b1.ravel(), b2.ravel()])
        assert float(stats.max) == pytest.approx(float(jnp.maximum(jnp.max(allv), 0)))
        assert float(stats.min) == pytest.approx(float(jnp.minimum(jnp.min(allv), 0)))

    def test_per_channel_shapes(self, rng):
        spec = ObserverSpec(kind="minmax", per_channel=True)
        b = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
        stats = fold(spec, [b], channels=16)
        assert stats.max.shape == (16,)
        np.testing.assert_allclose(
            np.asarray(stats.max), np.maximum(np.asarray(b).reshape(-1, 16).max(0), 0), rtol=1e-6
        )

    def test_range_includes_zero(self):
        spec = ObserverSpec(kind="minmax")
        b = jnp.asarray([[1.0, 2.0]], jnp.float32)  # all positive
        stats = fold(spec, [b])
        assert float(stats.min) == 0.0

    def test_finalize_uses_reference_convention(self, rng):
        # ref: observer/minmax.py:40-45 — scale = max(|min/qmin|, |max/qmax|)
        # (asymmetric denominators: the -128 slot is used for the negative range)
        spec = ObserverSpec(kind="minmax", per_channel=False, symmetric=True)
        b = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
        stats = fold(spec, [b])
        qp = finalize(spec, stats, INT8)
        expect = max(abs(float(stats.min)) / abs(INT8.qmin),
                     abs(float(stats.max)) / INT8.qmax)
        assert float(qp.scale) == pytest.approx(expect)

    def test_masked_update_ignores_padding(self, rng):
        spec = ObserverSpec(kind="minmax", per_channel=False)
        x = jnp.asarray(rng.normal(size=(1, 8, 4)), jnp.float32)
        x = x.at[0, 6:].set(1000.0)  # padding region with garbage
        mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0]], jnp.float32)
        stats = init_stats(spec)
        stats = update(spec, stats, x, mask=mask)
        assert float(stats.max) < 100.0

    def test_update_is_jittable(self, rng):
        spec = ObserverSpec(kind="minmax", per_channel=True)
        up = jax.jit(lambda s, x: update(spec, s, x))
        stats = init_stats(spec, 8)
        b = jnp.asarray(rng.normal(size=(3, 8)), jnp.float32)
        stats = up(stats, b)
        assert stats.n == 1


class TestEma:
    def test_first_update_is_identity(self, rng):
        spec = ObserverSpec(kind="ema")
        b = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
        stats = fold(spec, [b])
        assert float(stats.max) == pytest.approx(float(jnp.max(b)), rel=1e-6)

    def test_ema_blend(self):
        spec = ObserverSpec(kind="ema", ema_sigma=0.5)
        b1 = jnp.full((4, 2), 1.0)
        b2 = jnp.full((4, 2), 3.0)
        stats = fold(spec, [b1, b2])
        assert float(stats.max) == pytest.approx(2.0)  # 1 + 0.5*(3-1)


class TestPercentile:
    def test_clips_outlier(self, rng):
        spec = ObserverSpec(kind="percentile", percentile_alpha=0.99)
        x = rng.normal(size=(100, 100)).astype(np.float32)
        x[0, 0] = 1e6
        stats = fold(spec, [jnp.asarray(x)])
        assert float(stats.max) < 100.0

    def test_per_channel_rejected(self):
        with pytest.raises(ValueError):
            ObserverSpec(kind="percentile", per_channel=True)


class TestOmse:
    def test_omse_no_worse_than_minmax(self, rng):
        x = rng.normal(size=(256, 16)).astype(np.float32)
        x[0, 0] = 40.0  # outlier → clipping should win
        x = jnp.asarray(x)
        fmt = get_format(8, signed=False)
        spec_mm = ObserverSpec(kind="minmax", symmetric=False)
        spec_om = ObserverSpec(kind="omse", symmetric=False)
        qp_mm = finalize(spec_mm, fold(spec_mm, [x]), fmt)
        qp_om = finalize(spec_om, fold(spec_om, [x]), fmt, sample=x)

        def err(qp):
            return float(jnp.mean((Q.fake_quantize(x, qp, fmt) - x) ** 2))

        assert err(qp_om) <= err(qp_mm) + 1e-9

    def test_requires_sample(self, rng):
        spec = ObserverSpec(kind="omse")
        stats = fold(spec, [jnp.ones((4, 4))])
        with pytest.raises(ValueError):
            finalize(spec, stats, INT8)


class TestPtf:
    def test_scales_are_pow2_of_base(self, rng):
        spec = ObserverSpec(kind="ptf", symmetric=False)
        x = jnp.asarray(rng.normal(size=(64, 8)) * np.asarray([1, 2, 4, 8, 1, 2, 4, 8]), jnp.float32)
        fmt = get_format(8, signed=False)
        stats = fold(spec, [x], channels=8)
        qp = finalize(spec, stats, fmt, sample=x)
        assert qp.scale.shape == (8,)
        ratios = np.asarray(qp.scale) / float(np.min(np.asarray(qp.scale)))
        for r in ratios:
            assert float(np.log2(r)) == pytest.approx(round(float(np.log2(r))))
