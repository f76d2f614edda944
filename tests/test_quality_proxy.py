"""Checkpoint-free quality gate: perplexity delta of the full PTQ pipeline.

The reference's acceptance test is a full benchmark run on real checkpoints
(ref: evaluation/eval.py:9-58 + docs/*.md, "<1% degradation"). No weights or
datasets exist in this environment, so this is the runnable proxy: the
quantized model's cross-entropy against the FP model's own next-token
distribution, exponentiated to a perplexity RATIO (1.0 = no degradation).
The real-checkpoint recipe itself ships in docs/qwen2vl.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.registry import get_family
from mquant_tpu.pipeline import (QuantizeConfig, run_pipeline,
                                 synthetic_calib_batches)


@pytest.fixture(scope="module")
def setup():
    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    calib = synthetic_calib_batches(fam, cfg, 2, jax.random.key(5))
    held = synthetic_calib_batches(fam, cfg, 2, jax.random.key(77))
    return fam, cfg, params, calib, held


def _fwd(fam, cfg, p, batch, specs=None, state=None, mode="fp"):
    kw = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    logits, _, _ = fam.forward_fn(cfg, p, batch["tokens"], batch["patches"],
                                  specs=specs, state=state, mode=mode, **kw)
    return logits


def _ppl_ratio(fam, cfg, params, held, p_q, specs, state):
    """exp(CE(fp_dist, quantized) − H(fp_dist)) over held-out batches."""
    ds = []
    for b in held:
        lf = _fwd(fam, cfg, params, b)
        lq = _fwd(fam, cfg, p_q, b, specs, state, mode="fake")
        pf = jax.nn.softmax(lf, -1)
        ce_q = -jnp.sum(pf * jax.nn.log_softmax(lq, -1), -1)
        ce_f = -jnp.sum(pf * jax.nn.log_softmax(lf, -1), -1)
        ds.append(float(jnp.mean(ce_q - ce_f)))
    return float(np.exp(np.mean(ds)))


def _quantize(fam, cfg, params, calib, **kw):
    q = QuantizeConfig(calib_num=16, nsamples=8, visual_w_bits=8, **kw)
    _, p, s, sp, _ = run_pipeline(fam.name, q,
                                  params=jax.tree.map(lambda x: x, params),
                                  cfg=cfg, calib_batches=calib)
    return p, sp, s


def test_w4a8_within_one_percent(setup):
    """The paper's gate: MQuant W4A8 stays within ~1% of FP accuracy
    (ref: README.md headline); here as a perplexity ratio ≤ 1.01."""
    fam, cfg, params, calib, held = setup
    p, sp, s = _quantize(fam, cfg, params, calib, llm_w_bits=4)
    r = _ppl_ratio(fam, cfg, params, held, p, sp, s)
    assert r < 1.01, r


def test_w8a8_tighter_than_w4a8(setup):
    fam, cfg, params, calib, held = setup
    p4, sp4, s4 = _quantize(fam, cfg, params, calib, llm_w_bits=4)
    p8, sp8, s8 = _quantize(fam, cfg, params, calib, llm_w_bits=8)
    r4 = _ppl_ratio(fam, cfg, params, held, p4, sp4, s4)
    r8 = _ppl_ratio(fam, cfg, params, held, p8, sp8, s8)
    assert r8 < r4, (r8, r4)
    assert r8 < 1.001, r8


@pytest.mark.parametrize("family", ["qwenvl", "internvl", "minicpmv", "glm4v"])
def test_w4a8_gate_all_families(family):
    """The <1% perplexity gate holds for every supported family (the paper
    reports <1% accuracy degradation across all 5 MLLMs)."""
    fam = get_family(family)
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    calib = synthetic_calib_batches(fam, cfg, 1, jax.random.key(5))
    held = synthetic_calib_batches(fam, cfg, 1, jax.random.key(77))
    q = QuantizeConfig(calib_num=8, nsamples=4, visual_w_bits=8, llm_w_bits=4)
    _, p, s, sp, _ = run_pipeline(family, q,
                                  params=jax.tree.map(lambda x: x, params),
                                  cfg=cfg, calib_batches=calib)
    r = _ppl_ratio(fam, cfg, params, held, p, sp, s)
    assert r < 1.01, (family, r)


def test_w4a8_real_int_serving_within_gate(setup):
    """The gate holds through the REAL-int serving path (int8 MXU GEMMs,
    realized storage), not just the fake-quant evaluation path."""
    fam, cfg, params, calib, held = setup
    q = QuantizeConfig(calib_num=16, nsamples=8, visual_w_bits=8,
                       llm_w_bits=4, realize_int=True)
    _, p, s, sp, _ = run_pipeline(fam.name, q,
                                  params=jax.tree.map(lambda x: x, params),
                                  cfg=cfg, calib_batches=calib)
    ds = []
    for b in held:
        lf = _fwd(fam, cfg, params, b)
        lq = _fwd(fam, cfg, p, b, sp, s, mode="real")
        pf = jax.nn.softmax(lf, -1)
        ce_q = -jnp.sum(pf * jax.nn.log_softmax(lq, -1), -1)
        ce_f = -jnp.sum(pf * jax.nn.log_softmax(lf, -1), -1)
        ds.append(float(jnp.mean(ce_q - ce_f)))
    r = float(np.exp(np.mean(ds)))
    assert r < 1.01, r
