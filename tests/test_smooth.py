"""SmoothQuant-style migration: fp invariance + outlier flattening.

Two claims under test:
  1. The reparametrization is EXACT in fp (same mechanism as LN fusion).
  2. On a model with injected massive activation channels, migration
     measurably reduces static-per-tensor activation quantization error
     (the mechanism, not just the plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.llm import (DecoderConfig, decoder_forward,
                                   init_decoder_params)
from mquant_tpu.transform.smooth import smooth_decoder, smooth_scales


def _cfg(**kw):
    base = dict(vocab=96, hidden=48, n_layers=2, n_heads=4, n_kv_heads=2,
                intermediate=64, dtype=jnp.float32)
    base.update(kw)
    return DecoderConfig(**base)


def _inject_outlier_channels(params, channels=(3, 17), gain=25.0):
    """Massive ln-output channels (the distribution SmoothQuant targets):
    scaling ln1/ln2 weights at a few channels makes those activation
    channels dominate every per-tensor scale."""
    layers = dict(params["layers"])
    for ln in ("ln1", "ln2"):
        w = np.asarray(layers[ln]["w"], np.float64)
        for c in channels:
            w[:, c] *= gain
        layers[ln] = dict(layers[ln], w=jnp.asarray(w, jnp.float32))
    return dict(params, layers=layers)


def _amax_of(cfg, params, toks):
    """Per-channel |max| of ln1/ln2 outputs via the calibration machinery."""
    from mquant_tpu.models.registry import get_family  # noqa: F401
    from mquant_tpu.models.layers import SiteSpec
    from mquant_tpu.calib.calibrate import calibrate, finalize_state

    spec = SiteSpec(a_bits=8, a_static=True, a_per_channel=True)
    tmp = {"llm.q": spec, "llm.gate": spec}

    def fwd(batch):
        _, _, (stats, _) = decoder_forward(
            cfg, params, batch, specs=tmp, mode="calib", collect_stats=True)
        return stats

    stats = fwd(toks)
    state = finalize_state(tmp, stats)
    return {"attn": np.asarray(state["llm.q"]["act"].scale) * 127,
            "mlp": np.asarray(state["llm.gate"]["act"].scale) * 127}


class TestInvariance:
    def test_fp_forward_preserved(self):
        cfg = _cfg()
        params = _inject_outlier_channels(
            init_decoder_params(cfg, jax.random.PRNGKey(0)))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 96)
        ref, _, _ = decoder_forward(cfg, params, toks)
        amax = _amax_of(cfg, params, toks)
        sm = smooth_decoder(params, amax, alpha=0.5)
        out, _, _ = decoder_forward(cfg, sm, toks)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_scales_shape_and_guard(self):
        a = np.zeros((2, 8))  # degenerate channels → s clipped, no nans
        w = [np.ones((2, 8, 4))]
        s = smooth_scales(a, w, alpha=0.5)
        assert s.shape == (2, 8) and np.isfinite(s).all() and (s > 0).all()


class TestMechanism:
    def test_migration_flattens_act_outliers(self):
        """After migration, the ln-output channel spread (amax_max/amax_med)
        collapses — the quantity that bounds per-tensor static act error."""
        cfg = _cfg()
        params = _inject_outlier_channels(
            init_decoder_params(cfg, jax.random.PRNGKey(2)))
        toks = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 96)
        amax = _amax_of(cfg, params, toks)
        spread0 = float(np.max(amax["attn"]) / np.median(amax["attn"]))
        sm = smooth_decoder(params, amax, alpha=0.5)
        amax1 = _amax_of(cfg, sm, toks)
        spread1 = float(np.max(amax1["attn"]) / np.median(amax1["attn"]))
        assert spread0 > 5.0, spread0  # injection actually made outliers
        assert spread1 < spread0 / 2, (spread0, spread1)

    def test_w8a8_error_reduced(self):
        """Static per-tensor W8A8 fake-quant logits error drops after
        migration on the outlier-injected model."""
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import LLM_SITES
        from mquant_tpu.calib.calibrate import finalize_state

        cfg = _cfg()
        params = _inject_outlier_channels(
            init_decoder_params(cfg, jax.random.PRNGKey(4)), gain=40.0)
        toks = jax.random.randint(jax.random.PRNGKey(5), (2, 12), 0, 96)
        specs = {f"llm.{n}": SiteSpec(w_bits=8, a_bits=8, a_static=True)
                 for n in LLM_SITES}

        def err(p):
            ref, _, _ = decoder_forward(cfg, p, toks)
            _, _, (stats, _) = decoder_forward(cfg, p, toks, specs=specs,
                                               mode="calib",
                                               collect_stats=True)
            state = finalize_state(specs, stats)
            qd, _, _ = decoder_forward(cfg, p, toks, specs=specs,
                                       state=state, mode="fake")
            r = np.asarray(ref, np.float64)
            return float(np.linalg.norm(np.asarray(qd, np.float64) - r)
                         / np.linalg.norm(r))

        e0 = err(params)
        amax = _amax_of(cfg, params, toks)
        e1 = err(smooth_decoder(params, amax, alpha=0.5))
        assert e1 < e0 * 0.8, (e0, e1)


class TestPipelineWiring:
    def test_run_pipeline_with_smooth_alpha(self):
        """--smooth_alpha flows through run_pipeline: migration applied before
        rotation, pipeline completes, info records it."""
        from mquant_tpu.pipeline import QuantizeConfig, run_pipeline

        q = QuantizeConfig(llm_w_bits=4, visual_w_bits=8, calib_num=16,
                           nsamples=8, smooth_alpha=0.5, realize_int=False)
        cfg, params, state, specs, info = run_pipeline("qwen2vl", q, tiny=True)
        assert info.get("smooth_alpha") == 0.5
        assert state is not None and len(state) > 0
