"""Sensitivity-based mixed-precision allocation (utils/autobits.py).

A site whose weight rows carry a massive within-row outlier is ruined by
4-bit per-channel RTN (the minmax scale is blown up by the outlier, zeroing
everything else). The allocator must (a) rank that site most sensitive,
(b) promote it to 8 bit under the average-bits budget, and (c) thereby beat
uniform-4-bit end-to-end error at a fraction of the uniform-8 memory."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.registry import get_family
from mquant_tpu.pipeline import (QuantizeConfig, build_specs, run_pipeline,
                                 synthetic_calib_batches)
from mquant_tpu.utils.autobits import (allocate_bits, autobits_specs,
                                       site_sensitivities, site_weight_elems)


def fwd(fam, cfg, params, batch, specs=None, mode="fp"):
    kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    logits, _, _ = fam.forward_fn(cfg, params, batch["tokens"],
                                  batch["patches"], specs=specs, mode=mode,
                                  **kwargs)
    return logits


@pytest.fixture(scope="module")
def setup():
    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    # inject a within-row outlier into llm.down: one huge input channel per
    # output column blows the per-out-channel minmax scale at 4 bit
    params = jax.tree.map(lambda x: x, params)
    w = params["llm"]["layers"]["down"]["w"]
    params["llm"]["layers"]["down"]["w"] = w.at[:, 0, :].set(
        30.0 * jnp.abs(w[:, 0, :]) + 3.0)
    specs = build_specs(fam, QuantizeConfig(
        rotate=False, llm_split=False, online_llm_hadamard=False,
        llm_static=False, visual_static=False))
    batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(1))[0]
    return fam, cfg, params, specs, batch


class TestSensitivity:
    def test_injected_site_ranks_most_sensitive(self, setup):
        fam, cfg, params, specs, batch = setup
        sens = site_sensitivities(fam, cfg, params, specs, batch, low_bits=4)
        assert set(sens) == {k for k, s in specs.items()
                             if s.w_bits is not None}
        assert max(sens, key=sens.get) == "llm.down"

    def test_elems_counter_matches_tree(self, setup):
        fam, cfg, params, specs, batch = setup
        elems = site_weight_elems(params, specs)
        L, H = cfg.llm.n_layers, cfg.llm.hidden
        assert elems["llm.q"] == L * H * (cfg.llm.n_heads * cfg.llm.head_dim)
        assert elems["llm.down"] == L * cfg.llm.inter_eff * H
        assert elems["merger.mlp0"] == int(
            np.prod(params["merger"]["mlp0"]["w"].shape))


class TestAllocation:
    def test_budget_respected_and_outlier_promoted(self, setup):
        fam, cfg, params, specs, batch = setup
        new_specs, sens, bits = autobits_specs(
            fam, cfg, params, specs, batch, target_avg_bits=5.0)
        elems = site_weight_elems(params, specs)
        total = sum(elems[n] for n in bits)
        avg = sum(elems[n] * b for n, b in bits.items()) / total
        assert avg <= 5.0 + 1e-9
        assert bits["llm.down"] == 8  # the damaged site got the budget
        assert new_specs["llm.down"].w_bits == 8
        # transform wiring survives the override
        assert new_specs["llm.down"].online_had == specs["llm.down"].online_had

    def test_no_budget_means_uniform_low(self, setup):
        fam, cfg, params, specs, batch = setup
        sens = {"a": 1.0, "b": 0.1}
        elems = {"a": 100, "b": 100}
        assert allocate_bits(sens, elems, 4.0) == {"a": 4, "b": 4}
        # full budget → everything promoted
        assert allocate_bits(sens, elems, 8.0) == {"a": 8, "b": 8}

    def test_mixed_precision_beats_uniform_low(self, setup):
        from mquant_tpu.utils.autobits import rtn_apply_bits

        fam, cfg, params, specs, batch = setup
        _, _, bits = autobits_specs(
            fam, cfg, params, specs, batch, target_avg_bits=5.0)
        uniform4 = {n: 4 for n in bits}
        ref = fwd(fam, cfg, params, batch, mode="fp").astype(jnp.float32)
        e4 = float(jnp.linalg.norm(
            fwd(fam, cfg, rtn_apply_bits(params, uniform4), batch)
            .astype(jnp.float32) - ref))
        em = float(jnp.linalg.norm(
            fwd(fam, cfg, rtn_apply_bits(params, bits), batch)
            .astype(jnp.float32) - ref))
        # avg ≤5 bits must cut uniform-4 error substantially (measured ~27%
        # with the per-layer-per-column RTN grid; the old layer-shared grid
        # overstated uniform-4 damage, which showed as ~48%)
        assert em < 0.8 * e4, (em, e4)


class TestRotatedProbe:
    """Round-3 advisor (high): with rotate=True + online_llm_hadamard=True
    (the documented flagship recipe) the probe forwards must APPLY the online
    Hadamard/split transforms — prepare_vlm folds H into the down weight, so
    a mode='fp'/specs=None forward computes x @ Hᵀw with un-rotated x and
    every sensitivity is measured on a mathematically wrong model."""

    @pytest.fixture(scope="class")
    def rotated(self):
        from mquant_tpu.transform.vlm_recipes import prepare_vlm

        fam = get_family("qwen2vl")
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        q = QuantizeConfig(rotate=True, online_llm_hadamard=True,
                           llm_split=True, llm_static=False,
                           visual_static=False)
        specs = build_specs(fam, q)
        batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(1))[0]
        ref = fwd(fam, cfg, params, batch, mode="fp")
        tparams, info = prepare_vlm(fam.name, cfg, params, jax.random.key(2),
                                    online_had_down=True, split_down=True)
        pad = getattr(info.get("llm"), "down_pad", 0)
        if pad:
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, intermediate_pad=pad))
        return fam, cfg, tparams, specs, batch, ref

    def test_probe_reference_matches_pretransform_model(self, rotated):
        from mquant_tpu.utils.autobits import transform_only_specs

        fam, cfg, tparams, specs, batch, ref = rotated
        probe_ref = fwd(fam, cfg, tparams, batch,
                        specs=transform_only_specs(specs), mode="fake")
        # the transforms are EQUIVALENT: the probe's fp-reference forward must
        # reproduce the pre-transform model...
        np.testing.assert_allclose(np.asarray(probe_ref, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=5e-3, atol=5e-3)
        # ...while the old (fp, specs=None) forward does NOT — it skips the
        # activation-side Hadamard the weights were folded against
        wrong = fwd(fam, cfg, tparams, batch, mode="fp")
        e_wrong = float(jnp.linalg.norm((wrong - ref).astype(jnp.float32)))
        e_probe = float(jnp.linalg.norm((probe_ref - ref).astype(jnp.float32)))
        assert e_wrong > 10 * max(e_probe, 1e-9), (e_wrong, e_probe)

    def test_sensitivities_finite_on_rotated_model(self, rotated):
        fam, cfg, tparams, specs, batch, _ = rotated
        sens = site_sensitivities(fam, cfg, tparams, specs, batch, low_bits=4)
        assert sens and all(np.isfinite(v) for v in sens.values())
        # 4-bit damage on a healthy rotated model is bounded noise, not the
        # O(1) error a transform-skipping forward would report for every site
        assert max(sens.values()) < 0.5, sens


class TestPipelineWiring:
    def test_run_pipeline_auto_bits(self):
        q = QuantizeConfig(auto_bits=5.0, llm_w_rtn=True, calib_num=16,
                           nsamples=8, llm_static=False, visual_static=False,
                           rotate=False, llm_split=False,
                           online_llm_hadamard=False)
        cfg, params, state, specs, info = run_pipeline("qwen2vl", q, tiny=True)
        bits = info["autobits"]
        assert set(bits.values()) <= {4, 8}
        # the specs the pipeline used carry the allocation
        for n, b in bits.items():
            assert specs[n].w_bits == b
        out = fwd(get_family("qwen2vl"), cfg, params,
                  synthetic_calib_batches(get_family("qwen2vl"), cfg, 1,
                                          jax.random.key(2))[0],
                  specs, "fake")
        assert bool(jnp.all(jnp.isfinite(out)))


class TestHeadBitsGate:
    """The lm_head quality-proxy gate (utils/autobits.decide_head_bits):
    a measured per-model int8-vs-packed-W4 head decision replacing the
    former always-int8 judgment call."""

    def _setup(self, damage_head=False):
        fam = get_family("qwen2vl")
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        if damage_head:
            # within-row outliers blow the per-out-channel W4 minmax grid
            params = jax.tree.map(lambda x: x, params)
            w = params["llm"]["lm_head"]["w"]
            params["llm"]["lm_head"]["w"] = w.at[0, :].set(
                50.0 * jnp.abs(w[0, :]) + 5.0)
        specs = build_specs(fam, QuantizeConfig(
            rotate=False, llm_split=False, online_llm_hadamard=False,
            llm_static=False, visual_static=False))
        batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(1))[0]
        return fam, cfg, params, specs, batch

    def test_benign_head_passes_w4(self):
        from mquant_tpu.utils.autobits import decide_head_bits

        fam, cfg, params, specs, batch = self._setup()
        pick, ratios = decide_head_bits(fam, cfg, params, specs, batch)
        assert ratios[8] <= ratios[4]
        assert pick == 4, ratios

    def test_damaged_head_forces_int8(self):
        from mquant_tpu.utils.autobits import decide_head_bits

        fam, cfg, params, specs, batch = self._setup(damage_head=True)
        pick, ratios = decide_head_bits(fam, cfg, params, specs, batch)
        assert pick == 8, ratios
        assert ratios[4] > 1.002

    def test_auto_bits_probe_scores_lm_head(self):
        fam, cfg, params, specs, batch = self._setup()
        specs = dict(specs)
        from mquant_tpu.models.layers import SiteSpec

        specs["llm.lm_head"] = SiteSpec(w_bits=4, a_bits=8, a_static=False)
        sens = site_sensitivities(fam, cfg, params, specs, batch)
        assert "llm.lm_head" in sens and np.isfinite(sens["llm.lm_head"])
        elems = site_weight_elems(params, specs)
        assert elems["llm.lm_head"] == int(
            np.prod(params["llm"]["lm_head"]["w"].shape))

    def test_pipeline_auto_decision_flows_to_realized_serving(self):
        fam = get_family("qwen2vl")
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        calib = synthetic_calib_batches(fam, cfg, 1, jax.random.key(5))
        q = QuantizeConfig(calib_num=8, nsamples=4, visual_w_bits=8,
                           llm_w_bits=4, lm_head_bits="auto",
                           realize_int=True)
        _, p, state, sp, info = run_pipeline(
            "qwen2vl", q, params=jax.tree.map(lambda x: x, params), cfg=cfg,
            calib_batches=calib)
        assert info["lm_head_bits"] in (4, 8)
        assert sp["llm.lm_head"].w_bits == info["lm_head_bits"]
        head = p["llm"]["lm_head"]
        assert "w_q" in head and "w_scale" in head  # realized int storage
