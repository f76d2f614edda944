"""End-to-end pipeline tests: load → fuse/rotate → quantize → calibrate →
static-quant inference → artifact round-trip. Tiny configs on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.registry import get_family
from mquant_tpu.pipeline import (
    QuantizeConfig,
    build_specs,
    run_pipeline,
    synthetic_calib_batches,
)


def fwd(fam, cfg, params, batch, specs=None, state=None, mode="fp"):
    kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    logits, _, _ = fam.forward_fn(cfg, params, batch["tokens"], batch["patches"],
                                  specs=specs, state=state, mode=mode, **kwargs)
    return logits


class TestPipelineQwen2VL:
    @pytest.fixture(scope="class")
    def result(self, tmp_path_factory):
        art = str(tmp_path_factory.mktemp("artifact"))
        q = QuantizeConfig(llm_w_bits=4, visual_w_bits=8, calib_num=32,
                           llm_split=True, realize_int=False, nsamples=16)
        cfg, params, state, specs, info = run_pipeline(
            "qwen2vl", q, tiny=True, artifact_dir=art)
        return cfg, params, state, specs, info, art, q

    def test_runs_and_produces_state(self, result):
        cfg, params, state, specs, info, art, q = result
        assert state is not None and len(state) > 10
        # MSQ: all three subsystems calibrated
        prefixes = {k.split(".")[0] for k in state}
        assert {"vis", "merger", "llm"} <= prefixes
        # llm act scales are layer-stacked
        assert state["llm.q"]["act"].scale.shape[0] == cfg.llm.n_layers

    def test_static_quant_inference_close_to_fp(self, result):
        cfg, params, state, specs, info, art, q = result
        fam = get_family("qwen2vl")
        batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(9))[0]
        out = fwd(fam, cfg, params, batch, specs, state, mode="fake")
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_artifact_roundtrip(self, result):
        cfg, params, state, specs, info, art, q = result
        from mquant_tpu.utils.checkpoint import load_artifact

        p2, s2, specs2, meta = load_artifact(art)
        assert jax.tree.structure(p2) == jax.tree.structure(
            jax.tree.map(lambda x: x, params))
        assert specs2["llm.down"].online_had == "full"
        assert specs2["llm.down"].split
        fam = get_family("qwen2vl")
        batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(9))[0]
        a = fwd(fam, cfg, params, batch, specs, state, mode="fake")
        b = fwd(fam, cfg, p2, batch, specs2, s2, mode="fake")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_gptq_beats_rtn_through_pipeline(self):
        fam = get_family("qwen2vl")
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        batches = synthetic_calib_batches(fam, cfg, 2, jax.random.key(5))
        ref = fwd(fam, cfg, params, batches[0])

        base = dict(rotate=False, llm_w_bits=3, visual_w_bits=0,
                    llm_static=False, visual_static=False, calib_num=16)
        _, p_gptq, _, specs, _ = run_pipeline(
            "qwen2vl", QuantizeConfig(**base), params=params, cfg=cfg,
            calib_batches=batches)
        _, p_rtn, _, _, _ = run_pipeline(
            "qwen2vl", QuantizeConfig(**base, llm_w_rtn=True), params=params,
            cfg=cfg, calib_batches=batches)
        nospec = {k: dataclasses.replace(v, a_bits=None) for k, v in specs.items()}
        e_g = float(jnp.linalg.norm(fwd(fam, cfg, p_gptq, batches[0], nospec,
                                        mode="fake") - ref))
        e_r = float(jnp.linalg.norm(fwd(fam, cfg, p_rtn, batches[0], nospec,
                                        mode="fake") - ref))
        assert e_g < e_r, (e_g, e_r)


@pytest.mark.parametrize("name", ["qwenvl", "internvl", "minicpmv", "glm4v"])
def test_pipeline_all_families(name):
    q = QuantizeConfig(calib_num=16, nsamples=8, llm_w_rtn=True)
    cfg, params, state, specs, info = run_pipeline(name, q, tiny=True)
    assert state is not None
    fam = get_family(name)
    batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(3))[0]
    out = fwd(fam, cfg, params, batch, specs, state, mode="fake")
    assert bool(jnp.all(jnp.isfinite(out)))


def test_calibration_with_decode_steps():
    """generate()-style calibration: decode-step activations fold into the
    LLM sites' static scales (ref drives model.generate during calib)."""
    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    batches = synthetic_calib_batches(fam, cfg, 2, jax.random.key(5))
    specs = build_specs(fam, QuantizeConfig(calib_num=8))
    from mquant_tpu.pipeline import calibrate_activations

    s0 = calibrate_activations(fam, cfg, params, specs, batches)
    s2 = calibrate_activations(fam, cfg, params, specs, batches,
                               decode_steps=2)
    a0 = np.asarray(s0["llm.q"]["act"].scale)
    a2 = np.asarray(s2["llm.q"]["act"].scale)
    assert np.all(np.isfinite(a2)) and a2.shape == a0.shape
    # minmax ranges can only widen when more activations are folded in
    assert np.all(a2 >= a0 - 1e-7)
    # vision sites see no decode tokens → identical
    np.testing.assert_allclose(np.asarray(s2["vis.q"]["act"].scale),
                               np.asarray(s0["vis.q"]["act"].scale))


class TestNsamplesBound:
    """--nsamples bounds GPTQ Hessian rows independently of --calib_num
    (ref two-knob contract: exam/quant_qwenvl.py argparse, docs/qwenvl.md)."""

    def test_bound_nsamples_row_count(self):
        import numpy as np

        from mquant_tpu.pipeline import _bound_nsamples

        batches = [{"tokens": np.zeros((4, 8)), "patches": np.zeros((4, 3))}
                   for _ in range(4)]
        out = _bound_nsamples(batches, 10)
        rows = sum(b["tokens"].shape[0] for b in out)
        assert rows == 10
        assert out[-1]["tokens"].shape[0] == 2
        assert out[-1]["patches"].shape[0] == 2  # row-aligned arrays sliced too
        # no bound → untouched
        assert _bound_nsamples(batches, 0) is batches
        assert sum(b["tokens"].shape[0]
                   for b in _bound_nsamples(batches, 99)) == 16

    def test_gptq_sees_exactly_nsamples_rows(self, monkeypatch):
        """Integration: the decoder GPTQ driver receives exactly nsamples
        embed rows even when calib_num provides more."""
        import mquant_tpu.pipeline as PL
        from mquant_tpu.pipeline import QuantizeConfig, get_family, build_specs

        fam = get_family("qwen2vl")
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        q = QuantizeConfig(llm_w_bits=4, llm_a_bits=8, nsamples=2)
        specs = build_specs(fam, q)
        batches = PL.synthetic_calib_batches(fam, cfg, 3, jax.random.key(1))
        assert sum(b["tokens"].shape[0] for b in batches) > 2

        seen = {}
        import mquant_tpu.gptq.driver as D

        real = D.gptq_quantize_decoder

        def spy(cfg_, params_, embeds, *a, **k):
            seen["rows"] = sum(e.shape[0] for e in embeds)
            return real(cfg_, params_, embeds, *a, **k)

        monkeypatch.setattr(D, "gptq_quantize_decoder", spy)
        PL.quantize_weights(fam, cfg, params, specs, q, batches)
        assert seen["rows"] == 2


class TestArtifactServing:
    def test_artifact_into_engine(self, tmp_path):
        """The persisted quantization artifact (params + static scales +
        specs) loads straight into the ServingEngine — the deploy path:
        quantize once, serve from the artifact."""
        import jax
        import numpy as np

        from mquant_tpu.core.quant import QuantParams
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           init_decoder_params)
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.generate import Generator
        from mquant_tpu.utils.checkpoint import load_artifact, save_artifact

        cfg = DecoderConfig(vocab=96, hidden=48, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(40))
        specs = {f"llm.{n}": SiteSpec(w_bits=8, a_bits=8, a_static=True)
                 for n in LLM_SITES}
        state = {f"llm.{n}": {"act": QuantParams(
            scale=jnp.full((2,), 0.05, jnp.float32))} for n in LLM_SITES}
        art = str(tmp_path / "art")
        save_artifact(art, {"llm": params}, state=state, specs=specs,
                      meta={"family": "test"})
        p2, s2, specs2, _ = load_artifact(art)

        prompt = list(range(1, 9))
        ref = Generator(cfg, params, specs=specs, state=state, mode="fake",
                        max_len=128).generate(
            jnp.asarray(prompt)[None], max_new_tokens=6)
        eng = ServingEngine(cfg, p2["llm"], specs=specs2, state=s2,
                            mode="fake", slots=2, max_len=128)
        rid = eng.submit(prompt, max_new_tokens=6)
        outs = eng.run()
        assert outs[rid] == [int(t) for t in np.asarray(ref)[0]]


class TestSafetensorsInterop:
    def test_roundtrip_quantized_params_and_state(self, tmp_path):
        """Realized quantized params + static-scale state survive a
        safetensors round trip (structure incl. QuantParams namedtuples and
        None bias slots restored); forward outputs identical."""
        import numpy as np

        from mquant_tpu.utils.checkpoint import (export_safetensors,
                                                 import_safetensors)

        q = QuantizeConfig(llm_w_bits=4, visual_w_bits=8, calib_num=16,
                           nsamples=8, realize_int=True)
        cfg, params, state, specs, _ = run_pipeline("qwen2vl", q, tiny=True)

        p_path = str(tmp_path / "params.safetensors")
        s_path = str(tmp_path / "state.safetensors")
        export_safetensors(params, p_path, extra_meta={"model": "qwen2vl"})
        export_safetensors(state, s_path)
        p2, md = import_safetensors(p_path)
        s2, _ = import_safetensors(s_path)
        assert md["model"] == "qwen2vl"
        assert jax.tree.structure(p2, is_leaf=lambda x: x is None) == \
            jax.tree.structure(params, is_leaf=lambda x: x is None)

        fam = get_family("qwen2vl")
        batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(4))[0]

        def fwd(p, s):
            kwargs = {k: v for k, v in batch.items()
                      if k not in ("tokens", "patches")}
            logits, _, _ = fam.forward_fn(
                cfg, p, batch["tokens"], batch["patches"], specs=specs,
                state=s, mode="real", **kwargs)
            return np.asarray(logits)

        np.testing.assert_array_equal(fwd(params, state), fwd(p2, s2))
