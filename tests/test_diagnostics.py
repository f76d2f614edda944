"""Diagnostics module tests."""

import functools

import jax
import numpy as np

from mquant_tpu.models.registry import get_family
from mquant_tpu.pipeline import QuantizeConfig, build_specs, synthetic_calib_batches
from mquant_tpu.utils import diagnostics as D


def setup():
    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(1))[0]
    specs = build_specs(fam, QuantizeConfig(rotate=False))
    return fam, cfg, params, batch, specs


def test_capture_and_summary():
    fam, cfg, params, batch, specs = setup()

    def fwd(b, collect_samples=False):
        kwargs = {k: v for k, v in b.items() if k not in ("tokens", "patches")}
        logits, _, st = fam.forward_fn(cfg, params, b["tokens"], b["patches"],
                                       specs=specs, mode="calib",
                                       collect_stats=True,
                                       collect_samples=collect_samples, **kwargs)
        return logits, st

    samples = D.capture_activations(fwd, batch)
    assert "llm.q" in samples and samples["llm.q"].ndim == 3
    table = D.activation_summary(samples)
    assert "llm.q" in table and "absmax" in table


def test_config_report():
    fam, cfg, params, batch, specs = setup()
    rep = D.quant_config_report(specs)
    assert "llm.down" in rep and "w4" in rep


def test_error_attribution():
    fam, cfg, params, batch, specs = setup()
    from mquant_tpu.pipeline import quantize_weights

    q = QuantizeConfig(rotate=False, llm_w_rtn=True, llm_w_bits=3)
    pq, _ = quantize_weights(fam, cfg, params, specs, q, None)
    rep = D.quant_error_report(fam, cfg, params, pq, batch, specs)
    assert set(rep) == {"visual_only", "llm_only", "all"}
    assert rep["all"] >= rep["llm_only"] - 1e-6
    assert all(np.isfinite(v) for v in rep.values())
