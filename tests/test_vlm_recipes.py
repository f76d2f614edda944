"""End-to-end fuse+rotate invariance for every VLM family — the strongest
correctness property in the suite: the full offline transform pipeline must
leave fp logits unchanged."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.layers import SiteSpec
from mquant_tpu.models.registry import get_family
from mquant_tpu.models.vision import patchify_2d, patchify_qwen2vl
from mquant_tpu.transform import vlm_recipes as VR

FAMILIES = ["qwen2vl", "qwenvl", "internvl", "minicpmv", "glm4v"]


def build(fam):
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    # non-trivial norm affines so fusion is actually exercised
    def spice(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k.startswith("ln") or k == "norm1":
                    nv = dict(v)
                    kk = jax.random.key(hash((path, k)) % 2**31)
                    nv["w"] = v["w"] + 0.2 * jax.random.normal(kk, v["w"].shape)
                    if v.get("b") is not None:
                        nv["b"] = v["b"] + 0.1 * jax.random.normal(
                            jax.random.fold_in(kk, 1), v["b"].shape)
                    out[k] = nv
                else:
                    out[k] = spice(v, path + (k,))
            else:
                out[k] = v
        return out

    params = spice(params)
    B, img = 1, 16
    images = jax.random.normal(jax.random.key(1), (B, img, img, 3), jnp.float32)
    gh = gw = img // 4
    extra = {}
    if fam.name == "qwen2vl":
        patches, grid = patchify_qwen2vl(images, patch=4)
        n_img = patches.shape[1] // 4
        extra = {"grid_hw": grid}
    else:
        patches, _ = patchify_2d(images, 4)
        if fam.name == "qwenvl":
            n_img = cfg.resampler.n_queries
        elif fam.name == "minicpmv":
            n_img = cfg.resampler.n_queries
        elif fam.name == "internvl":
            n_img = (gh // 2) * (gw // 2)
            extra = {"grid": (gh, gw)}
        else:  # glm4v
            n_img = 2 + (gh // 2) * (gw // 2)
            extra = {"grid": (gh, gw)}
    toks = np.full((B, n_img + 6), 7, np.int64)
    toks[:, 3:3 + n_img] = cfg.image_token_id
    return cfg, params, jnp.asarray(toks), patches, extra


@pytest.mark.parametrize("name", FAMILIES)
def test_fuse_rotate_invariance(name):
    fam = get_family(name)
    cfg, params, toks, patches, extra = build(fam)
    if name == "internvl":
        # InternVL's mlp1 LayerNorm spans 4 concatenated stream vectors; the
        # fusion drops their per-block mean differences — the SAME approximation
        # the reference makes (ref: internvl_rotation.py:198-207 converts
        # mlp1[0] LN→RMSN after per-block mean baking). The exactness oracle is
        # therefore the FUSED model; rotation on top must be exact.
        fused, _ = VR.prepare_vlm(name, cfg, params, jax.random.key(7), rotate=False)
        ref, _, _ = fam.forward_fn(cfg, fused, toks, patches, **extra)
    elif name == "qwen2vl":
        ref, _, _ = fam.forward_fn(cfg, params, toks, patches, extra["grid_hw"])
    else:
        ref, _, _ = fam.forward_fn(cfg, params, toks, patches, **extra)

    prepared, info = VR.prepare_vlm(name, cfg, params, jax.random.key(7),
                                    online_had_down=True, split_down=True)
    assert prepared["llm"]["layers"]["down"].get("w_col0") is not None
    specs = {"llm.down": SiteSpec(online_had="full", split=True)}
    if name == "qwen2vl":
        out, _, _ = fam.forward_fn(cfg, prepared, toks, patches, extra["grid_hw"],
                                   specs=specs, mode="fake")
    else:
        out, _, _ = fam.forward_fn(cfg, prepared, toks, patches, specs=specs,
                                   mode="fake", **extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("name", ["qwen2vl", "minicpmv"])
def test_fuse_only_invariance(name):
    fam = get_family(name)
    cfg, params, toks, patches, extra = build(fam)
    if name == "qwen2vl":
        ref, _, _ = fam.forward_fn(cfg, params, toks, patches, extra["grid_hw"])
    else:
        ref, _, _ = fam.forward_fn(cfg, params, toks, patches, **extra)
    prepared, _ = VR.prepare_vlm(name, cfg, params, jax.random.key(3), rotate=False)
    if name == "qwen2vl":
        out, _, _ = fam.forward_fn(cfg, prepared, toks, patches, extra["grid_hw"])
    else:
        out, _, _ = fam.forward_fn(cfg, prepared, toks, patches, **extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("name", ["qwen2vl", "qwenvl"])
def test_visual_online_hadamard_pad_split_invariance(name):
    """Visual-tower online Hadamard + fc2 pad + RMS split must be exact
    (ref: minicpmv_rotation.py:130-160 visual fc2 pad,
    exam/quant_qwenvl.py:106-178 --online_visual_hadamard/--visual_split)."""
    from mquant_tpu.models.vision import init_vit_params

    fam = get_family(name)
    cfg, params, toks, patches, extra = build(fam)
    # force an MLP width that REQUIRES padding (44 → auto_pad 48 = 12·4)
    vitcfg = dataclasses.replace(cfg.vit, mlp_width=44)
    cfg = dataclasses.replace(cfg, vit=vitcfg)
    params = dict(params)
    newvit = init_vit_params(vitcfg, jax.random.key(5), dtype=jnp.float32)
    for extra_key in ("fc_sub_mean",):  # loader-added keys init_vit lacks
        if extra_key in params["vit"]:
            newvit[extra_key] = params["vit"][extra_key]
    params["vit"] = newvit

    if name == "qwen2vl":
        ref, _, _ = fam.forward_fn(cfg, params, toks, patches, extra["grid_hw"])
    else:
        ref, _, _ = fam.forward_fn(cfg, params, toks, patches, **extra)

    prepared, info = VR.prepare_vlm(
        name, cfg, params, jax.random.key(7), online_had_down=True,
        split_down=True, online_had_visual=True, split_visual=True)
    fc2 = prepared["vit"]["blocks"]["fc2"]
    assert info["vis_fc2_pad"] == 48
    assert fc2.get("w_col0") is not None
    assert fc2["w"].shape[-2] == 48 - 1  # padded then split
    assert prepared["vit"]["blocks"]["fc1"]["w"].shape[-1] == 48

    specs = {"llm.down": SiteSpec(online_had="full", split=True),
             "vis.fc2": SiteSpec(online_had="full", split=True)}
    if name == "qwen2vl":
        out, _, _ = fam.forward_fn(cfg, prepared, toks, patches,
                                   extra["grid_hw"], specs=specs, mode="fake")
    else:
        out, _, _ = fam.forward_fn(cfg, prepared, toks, patches, specs=specs,
                                   mode="fake", **extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_vision_only_rotation():
    """ref --rotate without --rotate_llm: vision stream rotated, LLM weights
    untouched, forward still finite (fp invariance holds trivially)."""
    import jax
    import jax.numpy as jnp

    from mquant_tpu.models.registry import get_family
    from mquant_tpu.transform.vlm_recipes import prepare_vlm

    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    p2, info = prepare_vlm("qwen2vl", cfg,
                           jax.tree.map(lambda x: x, params),
                           jax.random.key(1), rotate_llm=False)
    assert info.get("vit_rotated") and "llm" not in info
    # llm q weight unchanged by rotation (fusion may fold LN -> compare the
    # rotation-specific invariant: down_proj untouched by hadamard/pad)
    assert p2["llm"]["layers"]["down"]["w"].shape == \
        params["llm"]["layers"]["down"]["w"].shape
    from tests.test_pipeline import fwd, synthetic_calib_batches
    b = synthetic_calib_batches(fam, cfg, 1, jax.random.key(2))[0]
    out = fwd(fam, cfg, p2, b)
    assert bool(jnp.all(jnp.isfinite(out)))
