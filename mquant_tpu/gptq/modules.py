"""GPTQ for the cross-modal modules and the patch embed.

The reference GPTQs every cross-modal projector stage-sequentially:
attn_pool (ref: fake_quant/gptq/qwenvl_gptq_plus.py:344-443), the Qwen2-VL
merger (qwen2vl_gptq_plus.py:287-380), InternVL mlp1
(internvl_gptq_plus.py:279-366), the MiniCPM-V resampler
(minicpmv_gptq_plus.py:322-331), and the patch-embed convs
(qwenvl_gptq_plus.py:65-138, Conv3d via gptq_utils.py:15-57).

TPU-native design: instead of forward hooks + a Catcher abort, each module's
inputs are CAPTURED by the module's own jittable forward — a "capture spec"
(a_bits set + static, no finalized state) makes every ``qlinear`` record its
post-transform input (after online Hadamard and RMS-split slicing, exactly
the tensor GPTQ must see) into the Tape while quantization passes through.
Stages run in dependency order; each stage's capture re-runs the forward with
the previously-quantized stages' weights in place — the same progressive
scheme as the LLM/ViT drivers, with no hook machinery.

The patch embed here is an ordinary linear over flattened patch pixels (the
reference needs im2col/unfoldNd conv-GPTQ machinery; our loaders already
patchify, so ``gptq_quantize_matrix`` applies directly — incl. the Conv3d
case, whose temporal×h×w kernel is just more pixels per row).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.layers import SiteSpec
from . import core as C
from .driver import GPTQConfig


def _capture_specs(specs: Dict[str, SiteSpec], sites: Sequence[str]) -> Dict:
    """Specs that make qlinear RECORD its (post-transform) input for ``sites``
    while quantizing nothing: a_bits set + a_static with no finalized state is
    a calibration pass-through."""
    out = {}
    for name, sp in (specs or {}).items():
        if name in sites:
            out[name] = dataclasses.replace(sp, a_bits=sp.a_bits or 8,
                                            a_static=True, out_bits=None)
        else:
            # keep transforms (hadamard/split) but never record or quantize
            out[name] = dataclasses.replace(sp, a_bits=None, a_static=False,
                                            out_bits=None)
    return out


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> Dict:
    if len(path) == 1:
        out = dict(tree)
        out[path[0]] = value
        return out
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def gptq_quantize_module(
    params: Dict,
    run_capture: Callable[[Dict, Dict, dict], Dict[str, jax.Array]],
    batches: List[dict],
    stages: Sequence[Sequence[str]],
    path_of: Dict[str, Tuple[str, ...]],
    specs: Dict[str, SiteSpec],
    gcfg: GPTQConfig = GPTQConfig(),
    report: Optional[Dict] = None,
) -> tuple[Dict, Dict]:
    """Stage-sequential GPTQ over an arbitrary module.

    ``run_capture(params, capture_specs, batch) -> {site: samples (N, C)}``
    runs the module forward in calibration mode and returns the recorded
    per-site inputs. ``stages`` lists site groups in dependency order;
    ``path_of`` maps a site name to its params path."""
    report = report if report is not None else {"fallbacks": [], "sites": 0}
    for stage_sites in stages:
        active = [s for s in stage_sites
                  if specs.get(s) is not None and specs[s].w_bits is not None
                  and s in path_of]
        if not active:
            continue
        cspecs = _capture_specs(specs, active)
        Hs: Dict[str, Optional[jax.Array]] = {s: None for s in active}
        for b in batches:
            samples = run_capture(params, cspecs, b)
            for s in active:
                if s in samples:
                    Hs[s] = C.accumulate_hessian(Hs[s], samples[s])
        for s in active:
            if Hs[s] is None:
                continue
            spec = specs[s]
            site_p = dict(_get_path(params, path_of[s]))
            if site_p.get("w") is None:
                continue
            res = C.gptq_quantize_matrix(
                site_p["w"].astype(jnp.float32), Hs[s], bits=spec.w_bits,
                percdamp=gcfg.percdamp, act_order=gcfg.act_order,
                group_size=gcfg.group_size, mse_clip=gcfg.mse_clip,
                sym=gcfg.sym)
            site_p["w"] = res.w.astype(_get_path(params, path_of[s])["w"].dtype)
            params = _set_path(params, path_of[s], site_p)
            report["sites"] += 1
            if bool(res.used_fallback):
                report["fallbacks"].append(s)
    return params, report


# ---------------------------------------------------------------------------
# per-module capture closures + stage orders (matching the reference drivers)
# ---------------------------------------------------------------------------


def _samples_from(st) -> Dict[str, jax.Array]:
    if st is None:
        return {}
    stats, samples = st
    return samples


def gptq_quantize_merger(cfg, params: Dict, feat_batches: List[jax.Array],
                         specs: Dict[str, SiteSpec], gcfg=GPTQConfig(),
                         report=None) -> tuple[Dict, Dict]:
    """Qwen2-VL merger: [mlp0] → [mlp2] (ref: qwen2vl_gptq_plus.py:287-380)."""
    from ..models.vision import merger_forward

    def cap(p, cspecs, feats):
        _, st = merger_forward(cfg.merger, p["merger"], feats, specs=cspecs,
                               mode="calib", collect_stats=True,
                               collect_samples=True)
        return _samples_from(st)

    stages = [["merger.mlp0"], ["merger.mlp2"]]
    paths = {"merger.mlp0": ("merger", "mlp0"), "merger.mlp2": ("merger", "mlp2")}
    return gptq_quantize_module(params, cap, feat_batches, stages, paths,
                                specs, gcfg, report)


def gptq_quantize_resampler(cfg, params: Dict, feat_batches: List[jax.Array],
                            specs: Dict[str, SiteSpec], gcfg=GPTQConfig(),
                            report=None) -> tuple[Dict, Dict]:
    """Qwen-VL attn_pool / MiniCPM-V resampler:
    [kv_proj] → [k, v, q] → [out] → [proj_fc]
    (ref: qwenvl_gptq_plus.py:344-443, minicpmv_gptq_plus.py:322-331)."""
    from ..models.resampler import resampler_forward

    def cap(p, cspecs, feats):
        _, st = resampler_forward(cfg.resampler, p["res"], feats, specs=cspecs,
                                  mode="calib", collect_stats=True,
                                  collect_samples=True)
        return _samples_from(st)

    stages = [["res.kv_proj"], ["res.k", "res.v", "res.q"], ["res.out"],
              ["res.proj_fc"]]
    paths = {f"res.{s}": ("res", s)
             for s in ("kv_proj", "k", "v", "q", "out", "proj_fc")}
    return gptq_quantize_module(params, cap, feat_batches, stages, paths,
                                specs, gcfg, report)


def gptq_quantize_mlp1(cfg, params: Dict, shuffled_batches: List[jax.Array],
                       specs: Dict[str, SiteSpec], gcfg=GPTQConfig(),
                       report=None) -> tuple[Dict, Dict]:
    """InternVL mlp1: [fc1] → [fc2] (ref: internvl_gptq_plus.py:279-366).
    ``shuffled_batches`` are pixel-shuffled ViT features."""
    from ..models.projectors import mlp1_forward

    def cap(p, cspecs, x):
        _, st = mlp1_forward(cfg.mlp1, p["proj"], x, specs=cspecs, mode="calib",
                             collect_stats=True, collect_samples=True)
        return _samples_from(st)

    stages = [["proj.fc1"], ["proj.fc2"]]
    paths = {"proj.fc1": ("proj", "fc1"), "proj.fc2": ("proj", "fc2")}
    return gptq_quantize_module(params, cap, shuffled_batches, stages, paths,
                                specs, gcfg, report)


def gptq_quantize_glu(cfg, params: Dict, feat_batches: List[tuple],
                      specs: Dict[str, SiteSpec], gcfg=GPTQConfig(),
                      report=None) -> tuple[Dict, Dict]:
    """GLM-4V GLU projector: [conv] → [linear_proj] → [gate, h_to_4h] →
    [4h_to_h] (the reference ships no GLM GPTQ; stage order follows the data
    flow of plugin/visual.py:155-215). ``feat_batches``: (feats, gh, gw)."""
    from ..models.projectors import glu_projector_forward

    def cap(p, cspecs, b):
        feats, gh, gw = b
        _, st = glu_projector_forward(cfg.proj, p["proj"], feats, gh, gw,
                                      specs=cspecs, mode="calib",
                                      collect_stats=True, collect_samples=True)
        return _samples_from(st)

    stages = [["proj.conv"], ["proj.linear_proj"],
              ["proj.gate", "proj.h_to_4h"], ["proj.4h_to_h"]]
    paths = {f"proj.{s}": ("proj", s)
             for s in ("conv", "linear_proj", "gate", "h_to_4h", "4h_to_h")}
    return gptq_quantize_module(params, cap, feat_batches, stages, paths,
                                specs, gcfg, report)


def gptq_quantize_patch_embed(cfg, params: Dict, patch_batches: List[jax.Array],
                              specs: Dict[str, SiteSpec], gcfg=GPTQConfig(),
                              report=None, prefix: str = "vis"
                              ) -> tuple[Dict, Dict]:
    """Patch-embed GPTQ: the Hessian is over raw flattened patch pixels — the
    linear-ized equivalent of the reference's GPTQConv im2col path
    (ref: qwenvl_gptq_plus.py:65-138, gptq_utils.py:15-57 incl. Conv3d)."""
    name = f"{prefix}.patch_embed"

    def cap(p, cspecs, patches):
        # the input IS the raw patches (dtype-cast as the forward would)
        return {name: patches.reshape(-1, patches.shape[-1])}

    return gptq_quantize_module(params, cap, patch_batches, [[name]],
                                {name: ("vit", "patch_embed")}, specs, gcfg,
                                report)
