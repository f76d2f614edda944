"""GPTQ decoder-driver tests (tiny model, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.gptq.driver import GPTQConfig, gptq_quantize_decoder
from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.models.llm import (
    LLM_SITES,
    DecoderConfig,
    decoder_forward,
    init_decoder_params,
)
from mquant_tpu.transform import recipes as RZ

CFG = DecoderConfig(vocab=97, hidden=64, n_layers=2, n_heads=4, n_kv_heads=2,
                    intermediate=96, dtype=jnp.float32)


def specs_for(w_bits=4, split=False, online_had=False):
    s = {f"llm.{n}": SiteSpec(w_bits=w_bits, a_bits=8, a_static=True)
         for n in LLM_SITES}
    if online_had or split:
        s["llm.down"] = dataclasses.replace(
            s["llm.down"], online_had="full" if online_had else None, split=split)
    return s


@pytest.fixture(scope="module")
def setup():
    params = init_decoder_params(CFG, jax.random.key(0))
    fused = RZ.fuse_decoder(CFG, params)
    toks = jax.random.randint(jax.random.key(1), (4, 16), 0, CFG.vocab)
    embeds = fused["embed"]["w"][toks]
    batches = [embeds[:2], embeds[2:]]
    return fused, toks, batches


def fwd_noact(params, toks, specs):
    """Forward with weight quantization baked in but activation quant off."""
    s = {k: dataclasses.replace(v, a_bits=None) for k, v in specs.items()}
    logits, _, _ = decoder_forward(CFG, params, toks, specs=s, mode="fake")
    return logits


class TestGptqDriver:
    def test_runs_and_beats_rtn(self, setup):
        fused, toks, batches = setup
        specs = specs_for(w_bits=3)
        ref = fwd_noact(fused, toks, specs)

        qg, report = gptq_quantize_decoder(CFG, fused, batches, specs)
        assert report["sites"] == 2 * 7
        out_g = fwd_noact(qg, toks, specs)
        assert bool(jnp.all(jnp.isfinite(out_g)))

        qr = RZ.rtn_quantize_decoder(CFG, fused, specs)
        out_r = fwd_noact(qr, toks, specs)

        e_g = float(jnp.linalg.norm(out_g - ref))
        e_r = float(jnp.linalg.norm(out_r - ref))
        assert e_g < e_r, (e_g, e_r)

    def test_structure_preserved(self, setup):
        fused, toks, batches = setup
        specs = specs_for()
        qg, _ = gptq_quantize_decoder(CFG, fused, batches, specs)
        assert jax.tree.structure(qg) == jax.tree.structure(fused)
        for s in LLM_SITES:
            assert qg["layers"][s]["w"].shape == fused["layers"][s]["w"].shape
            assert qg["layers"][s]["w"].dtype == fused["layers"][s]["w"].dtype

    def test_split_preserves_col0(self, setup):
        fused, toks, batches = setup
        rotated, _ = RZ.rotate_decoder(CFG, fused, jax.random.key(3),
                                       online_had_down=True)
        split = RZ.split_decoder_down(rotated)
        specs = specs_for(split=True, online_had=True)
        emb = split["embed"]["w"]
        bat = [emb[jax.random.randint(jax.random.key(4), (2, 16), 0, CFG.vocab)]]
        qg, _ = gptq_quantize_decoder(CFG, split, bat, specs)
        # fp first column untouched
        np.testing.assert_array_equal(
            np.asarray(qg["layers"]["down"]["w_col0"]),
            np.asarray(split["layers"]["down"]["w_col0"]))
        # quantized part has the split shape
        assert qg["layers"]["down"]["w"].shape[-2] == CFG.intermediate - 1

    def test_rtn_mode(self, setup):
        fused, toks, batches = setup
        specs = specs_for()
        q, report = gptq_quantize_decoder(CFG, fused, batches, specs,
                                          gcfg=GPTQConfig(use_rtn=True))
        qr = RZ.rtn_quantize_decoder(CFG, fused, specs)
        np.testing.assert_allclose(np.asarray(q["layers"]["q"]["w"]),
                                   np.asarray(qr["layers"]["q"]["w"]), atol=1e-6)


class TestVitGptq:
    def test_vit_gptq_beats_rtn(self):
        import jax.numpy as jnp

        from mquant_tpu.gptq.driver import GPTQConfig, gptq_quantize_vit
        from mquant_tpu.models.vision import ViTConfig, init_vit_params, vit_forward
        from mquant_tpu.core import quant as Q

        cfg = ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=64,
                        patch_dim=48, dtype=jnp.float32)
        params = init_vit_params(cfg, jax.random.key(0))
        patches = jax.random.normal(jax.random.key(1), (2, 16, 48), jnp.float32)
        ref, _ = vit_forward(cfg, params, patches)

        from mquant_tpu.models.vision import vit_preamble, VIT_SITES

        feats = [vit_preamble(cfg, params, patches)]
        specs = {f"vis.{s}": SiteSpec(w_bits=3, a_bits=8, a_static=True)
                 for s in VIT_SITES}
        qv, rep = gptq_quantize_vit(cfg, params, feats, specs)
        assert rep["sites"] == 2 * 6
        pg = dict(params)
        pg["blocks"] = qv["blocks"]
        nospec = {k: dataclasses.replace(v, a_bits=None) for k, v in specs.items()}
        out_g, _ = vit_forward(cfg, pg, patches, specs=nospec, mode="fake")

        # RTN comparison
        pr = dict(params)
        blocks = dict(pr["blocks"])
        for s in VIT_SITES:
            site = dict(blocks[s])
            site["w"] = Q.rtn_fake_quant_weight(site["w"], 3, reduce_axes=(-2,))
            blocks[s] = site
        pr["blocks"] = blocks
        out_r, _ = vit_forward(cfg, pr, patches, specs=nospec, mode="fake")

        e_g = float(jnp.linalg.norm(out_g - ref))
        e_r = float(jnp.linalg.norm(out_r - ref))
        assert e_g < e_r, (e_g, e_r)


class TestCrossModalGptq:
    """GPTQ for the cross-modal modules (ref: merger qwen2vl_gptq_plus.py:287-380,
    resampler minicpmv_gptq_plus.py:322-331, mlp1 internvl_gptq_plus.py:279-366,
    patch-embed conv qwenvl_gptq_plus.py:65-138)."""

    def _err(self, f, ref):
        import jax.numpy as jnp

        return float(jnp.linalg.norm(f - ref))

    def test_merger_gptq_beats_rtn(self):
        import jax.numpy as jnp

        from mquant_tpu.core import quant as Q
        from mquant_tpu.gptq.modules import gptq_quantize_merger
        from mquant_tpu.models.qwen2vl import Qwen2VLConfig, init_qwen2vl_params
        from mquant_tpu.models.vision import merger_forward

        cfg = Qwen2VLConfig.tiny()
        params = init_qwen2vl_params(cfg, jax.random.key(0))
        feats = [jax.random.normal(jax.random.key(i), (1, 16, cfg.vit.width),
                                   jnp.float32) for i in range(3)]
        ref, _ = merger_forward(cfg.merger, params["merger"], feats[0])

        specs = {"merger.mlp0": SiteSpec(w_bits=3, a_bits=8, a_static=True),
                 "merger.mlp2": SiteSpec(w_bits=3, a_bits=8, a_static=True)}
        qp, rep = gptq_quantize_merger(cfg, dict(params), feats, specs)
        assert rep["sites"] == 2
        nospec = {k: dataclasses.replace(v, a_bits=None) for k, v in specs.items()}
        out_g, _ = merger_forward(cfg.merger, qp["merger"], feats[0],
                                  specs=nospec, mode="fake")

        pr = dict(params["merger"])
        for s in ("mlp0", "mlp2"):
            site = dict(pr[s])
            site["w"] = Q.rtn_fake_quant_weight(site["w"], 3)
            pr[s] = site
        out_r, _ = merger_forward(cfg.merger, pr, feats[0], specs=nospec,
                                  mode="fake")
        assert self._err(out_g, ref) < self._err(out_r, ref)

    def test_resampler_gptq_all_stages(self):
        import jax.numpy as jnp

        from mquant_tpu.gptq.modules import gptq_quantize_resampler
        from mquant_tpu.models.registry import get_family
        from mquant_tpu.models.resampler import resampler_forward

        fam = get_family("minicpmv")
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        feats = [jax.random.normal(jax.random.key(i), (1, 16, cfg.resampler.kv_dim),
                                   jnp.float32) for i in range(2)]
        sites = ("kv_proj", "q", "k", "v", "out", "proj_fc")
        specs = {f"res.{s}": SiteSpec(w_bits=4, a_bits=8, a_static=True)
                 for s in sites}
        qp, rep = gptq_quantize_resampler(cfg, dict(params), feats, specs)
        present = [s for s in sites if s in params["res"]
                   and isinstance(params["res"][s], dict)
                   and params["res"][s].get("w") is not None]
        assert rep["sites"] == len(present)
        out, _ = resampler_forward(cfg.resampler, qp["res"], feats[0])
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_patch_embed_gptq(self):
        import jax.numpy as jnp

        from mquant_tpu.gptq.modules import gptq_quantize_patch_embed
        from mquant_tpu.models.qwen2vl import Qwen2VLConfig, init_qwen2vl_params

        cfg = Qwen2VLConfig.tiny()
        params = init_qwen2vl_params(cfg, jax.random.key(0))
        patches = [jax.random.normal(jax.random.key(i), (1, 16, cfg.vit.patch_dim),
                                     jnp.float32) for i in range(2)]
        specs = {"vis.patch_embed": SiteSpec(w_bits=4, a_bits=8, a_static=True)}
        w0 = np.asarray(params["vit"]["patch_embed"]["w"])
        qp, rep = gptq_quantize_patch_embed(cfg, dict(params), patches, specs)
        assert rep["sites"] == 1
        w1 = np.asarray(qp["vit"]["patch_embed"]["w"])
        assert not np.allclose(w0, w1)  # quantized
        # values lie on a 4-bit per-channel grid: few distinct values per column
        col = w1[:, 0]
        assert len(np.unique(np.round(col / (np.abs(col).max() / 7), 6))) <= 16


class TestHostStreaming:
    """stream_from_host: layers live in host numpy, quantized one at a time —
    identical result to the fully device-resident path."""

    def test_stream_from_host_matches_resident(self):
        import numpy as np

        from mquant_tpu.gptq.driver import GPTQConfig, gptq_quantize_decoder
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           init_decoder_params)

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8) for n in LLM_SITES}
        embeds = [jax.random.normal(jax.random.key(1), (1, 16, 32),
                                    jnp.float32) * 0.1]

        p_dev, _ = gptq_quantize_decoder(cfg, params, embeds, specs,
                                         gcfg=GPTQConfig())
        host = dict(params)
        host["layers"] = jax.tree.map(lambda x: np.asarray(x),
                                      params["layers"])
        p_host, _ = gptq_quantize_decoder(cfg, host, embeds, specs,
                                          gcfg=GPTQConfig(),
                                          stream_from_host=True)
        for site in LLM_SITES:
            np.testing.assert_allclose(
                np.asarray(p_dev["layers"][site]["w"]),
                np.asarray(p_host["layers"][site]["w"]), atol=1e-6,
                err_msg=site)
        assert isinstance(p_host["layers"]["q"]["w"], np.ndarray)

    def test_realize_on_device_matches_post_hoc_realize(self):
        import numpy as np

        from mquant_tpu.gptq.driver import GPTQConfig, gptq_quantize_decoder
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           init_decoder_params)
        from mquant_tpu.transform.recipes import realize_decoder_weights

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8) for n in LLM_SITES}
        embeds = [jax.random.normal(jax.random.key(1), (1, 16, 32),
                                    jnp.float32) * 0.1]
        host = dict(params)
        host["layers"] = jax.tree.map(lambda x: np.asarray(x),
                                      params["layers"])
        p_rt, _ = gptq_quantize_decoder(cfg, host, embeds, specs,
                                        gcfg=GPTQConfig(),
                                        stream_from_host=True,
                                        realize_on_device=True)
        p_dev, rep = gptq_quantize_decoder(cfg, params, embeds, specs,
                                           gcfg=GPTQConfig())
        # both paths must realize on the SAME (exact GPTQ) grid
        ref = realize_decoder_weights(p_dev, specs, qps=rep["qparams"])
        for site in LLM_SITES:
            np.testing.assert_array_equal(
                np.asarray(p_rt["layers"][site]["w_q"]),
                np.asarray(ref["layers"][site]["w_q"]), err_msg=site)
