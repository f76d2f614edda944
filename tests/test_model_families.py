"""Forward/calibration tests for all five supported model families (tiny cfgs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.models.registry import SUPPORTED_MODELS, get_family
from mquant_tpu.models.vision import patchify_2d

FAMILIES = ["qwenvl", "internvl", "minicpmv", "glm4v"]


def build_inputs(fam, cfg):
    B, img = 1, 16
    images = jax.random.normal(jax.random.key(1), (B, img, img, 3), jnp.float32)
    patches, _grid2 = patchify_2d(images, 4)
    gh = gw = img // 4
    if fam.name == "qwenvl":
        n_img_tokens = cfg.resampler.n_queries
        extra = {}
    elif fam.name == "internvl":
        n_img_tokens = (gh // 2) * (gw // 2)
        extra = {"grid": (gh, gw)}
    elif fam.name == "minicpmv":
        n_img_tokens = cfg.resampler.n_queries
        extra = {}
    elif fam.name == "glm4v":
        n_img_tokens = 2 + (gh // 2) * (gw // 2)
        extra = {"grid": (gh, gw)}
    toks = np.full((B, n_img_tokens + 6), 7, np.int64)
    toks[:, 3:3 + n_img_tokens] = cfg.image_token_id
    return jnp.asarray(toks), patches, extra


@pytest.mark.parametrize("name", FAMILIES)
class TestFamilies:
    def test_fp_forward(self, name):
        fam = get_family(name)
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        toks, patches, extra = build_inputs(fam, cfg)
        logits, _, _ = fam.forward_fn(cfg, params, toks, patches, **extra)
        assert logits.shape[:2] == toks.shape
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_images_matter(self, name):
        fam = get_family(name)
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        toks, patches, extra = build_inputs(fam, cfg)
        l1, _, _ = fam.forward_fn(cfg, params, toks, patches, **extra)
        l2, _, _ = fam.forward_fn(cfg, params, toks, patches * 3.0, **extra)
        assert float(jnp.abs(l1 - l2).max()) > 1e-5

    def test_calib_stats_cover_subsystems(self, name):
        fam = get_family(name)
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        toks, patches, extra = build_inputs(fam, cfg)
        # spec every known site name in each subsystem namespace
        from mquant_tpu.models.llm import LLM_SITES
        from mquant_tpu.models.vision import VIT_SITES

        specs = {f"llm.{s}": SiteSpec(w_bits=4, a_bits=8, a_static=True)
                 for s in LLM_SITES}
        specs.update({f"vis.{s}": SiteSpec(w_bits=8, a_bits=8, a_static=True)
                      for s in VIT_SITES + ("patch_embed",)})
        for s in ("kv_proj", "q", "k", "v", "out", "proj_fc"):
            specs[f"res.{s}"] = SiteSpec(w_bits=8, a_bits=8, a_static=True)
        for s in ("fc1", "fc2", "conv", "linear_proj", "gate", "h_to_4h", "4h_to_h"):
            specs[f"proj.{s}"] = SiteSpec(w_bits=8, a_bits=8, a_static=True)
        specs.update({f"merger.{s}": SiteSpec(w_bits=8, a_bits=8, a_static=True)
                      for s in ("mlp0", "mlp2")})

        logits, _, st = fam.forward_fn(cfg, params, toks, patches, specs=specs,
                                       mode="calib", collect_stats=True, **extra)
        stats, _ = st
        prefixes = {k.split(".")[0] for k in stats}
        assert set(fam.subsystems) <= prefixes, (fam.subsystems, prefixes)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_fake_quant_runs(self, name):
        fam = get_family(name)
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        toks, patches, extra = build_inputs(fam, cfg)
        from mquant_tpu.models.llm import LLM_SITES

        specs = {f"llm.{s}": SiteSpec(w_bits=4, a_bits=8) for s in LLM_SITES}
        logits, _, _ = fam.forward_fn(cfg, params, toks, patches, specs=specs,
                                      mode="fake", **extra)
        assert bool(jnp.all(jnp.isfinite(logits)))


def test_registry_names():
    for n in SUPPORTED_MODELS:
        fam = get_family(n)
        assert fam.name
    with pytest.raises(ValueError):
        get_family("llava")
