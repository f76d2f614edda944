"""End-to-end PTQ pipeline: load → fuse/rotate → weight-quant → calibrate → serve.

The functional equivalent of the reference's per-model pipeline scripts
(``exam/quant_{qwenvl,qwen2vl,internvl,minicpmv}.py`` main(), ref:
exam/quant_qwenvl.py:74-262) with ONE structured config replacing the ~50-flag
argparse duplicated per script (SURVEY §5 "config/flag system"). Flag-name
parity is kept in :class:`QuantizeConfig` field names and the CLI wrappers in
``exam/``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.layers import SiteSpec
from .models.llm import LLM_SITES
from .models.registry import ModelFamily, get_family
from .models.vision import VIT_SITES

log = logging.getLogger("mquant_tpu.pipeline")

# site lists per subsystem prefix (superset; sites absent from a family are
# simply never referenced by its forward)
SUBSYSTEM_SITES = {
    "vis": VIT_SITES + ("patch_embed",),
    "merger": ("mlp0", "mlp2"),
    "res": ("kv_proj", "q", "k", "v", "out", "proj_fc"),
    "proj": ("fc1", "fc2", "conv", "linear_proj", "gate", "h_to_4h", "4h_to_h"),
    "llm": LLM_SITES,
}


@dataclasses.dataclass
class QuantizeConfig:
    """One structured config. Field ↔ reference-flag parity (exam/quant_*.py):

    rotate/rotate_mode/rotate_visual ↔ --rotate --rotate_mode
    --rotate_visual_clip/--rotate_visual_cross_attn/--rotate_llm;
    online_llm_hadamard ↔ --online_llm_hadamard; llm_split ↔ --llm_split;
    {visual,llm}_{w,a}_bits ↔ --{visual,llm}_{w,a}_bits; {visual,llm}_w_rtn;
    w_clip ↔ --{visual,llm}_w_clip; {visual,llm}_static; act_observer ↔
    observer str; calib_num; nsamples/percdamp/act_order/w_groupsize (GPTQ);
    a_asym/w_asym; a_groupsize; act_per_tensor; skip_names; fp32_had ↔ the
    online Hadamard here runs bf16-operand MXU matmuls with f32 accumulation
    (feeds an int8 quantizer, so operand precision is immaterial — measured
    equivalent and 4× faster than the f32 path); seed.
    """

    # rotation / equivalent transforms
    rotate: bool = True
    rotate_mode: str = "hadamard"  # hadamard | random
    rotate_visual: bool = True
    rotate_llm: bool = True  # ref --rotate_llm (vision-only rotation if off)
    online_llm_hadamard: bool = True
    online_had_mode: str = "full"  # "full" | "block" | "auto". block: I⊗H_128
    # online transform (one MXU-perfect matmul at serve time; √128-wide
    # outlier spreading — quality-gated by tests/test_outlier_stress.py; TPU
    # TTFT fast path). auto: calib-time gate picks by int8 MSE on captured
    # down inputs (_choose_online_had_mode — neither variant dominates)
    llm_split: bool = True
    online_visual_hadamard: bool = False  # ref: exam/quant_qwenvl.py --online_visual_hadamard
    visual_split: bool = False  # ref: --visual_split (fc2/c_proj RMS split)
    smooth_alpha: float = 0.0  # >0: SmoothQuant-style migration before
    # rotation (transform/smooth.py — beyond the reference)
    # weight quantization
    visual_w_bits: int = 8
    llm_w_bits: int = 4
    visual_w_rtn: bool = True  # visual GPTQ → RTN (reference --visual_w_rtn)
    llm_w_rtn: bool = False
    w_clip: bool = False  # MSE clip grid search
    w_asym: bool = False  # asymmetric (zero-point) weight grid, ref --w_asym
    w_groupsize: Optional[int] = None
    auto_bits: float = 0.0  # >0: sensitivity-based mixed precision — promote
    # the most damaging sites from auto_bits_low to auto_bits_high under a
    # target average bits/weight budget (utils/autobits.py, beyond the ref)
    auto_bits_low: int = 4
    auto_bits_high: int = 8
    lm_head_bits: object = 0  # 0 = fp head (ref parity: the reference rotates
    # but never quantizes the head); 8/4 = int8 / packed-W4 head; "auto" =
    # per-model quality-proxy gate (utils/autobits.decide_head_bits) picks
    # W4 iff its head-only perplexity ratio stays under lm_head_gate.
    # The head spec also makes --auto_bits score the lm_head site.
    lm_head_gate: float = 1.002
    act_order: bool = False
    percdamp: float = 0.01
    nsamples: int = 128
    # activation quantization
    visual_a_bits: int = 8
    llm_a_bits: int = 8
    visual_static: bool = True
    llm_static: bool = True
    a_asym: bool = False
    a_groupsize: Optional[int] = None  # dynamic per-token-per-group act scales
    a_clip_ratio: float = 1.0  # dynamic range clip, ref --a_clip_ratio
    calib_decode_steps: int = 0  # fold N greedy decode steps into LLM stats
    act_per_tensor: bool = True  # static granularity
    act_observer: str = "minmax"
    calib_num: int = 128
    skip_names: Tuple[str, ...] = ()
    # serving
    realize_int: bool = False
    kv_bits: Optional[int] = None  # int8 KV cache (the reference parses
    # --k_bits/--v_bits without wiring them, ref: utils.py:221-267; here wired)
    seed: int = 0


def build_specs(fam: ModelFamily, q: QuantizeConfig) -> Dict[str, SiteSpec]:
    """Specs for every quant site of the family (MSQ: per-subsystem settings).
    Equivalent of the per-model ``*_add_act_qaunt`` wrap maps + quantizer
    configure loops (ref: quant_utils.py:543-611, exam/quant_qwenvl.py:198-246).
    """
    specs: Dict[str, SiteSpec] = {}
    for prefix in fam.subsystems:
        visual = prefix != "llm"
        w_bits = q.visual_w_bits if visual else q.llm_w_bits
        a_bits = q.visual_a_bits if visual else q.llm_a_bits
        static = q.visual_static if visual else q.llm_static
        for s in SUBSYSTEM_SITES[prefix]:
            name = f"{prefix}.{s}"
            if any(sk in name for sk in q.skip_names):
                continue
            specs[name] = SiteSpec(
                w_bits=w_bits or None, a_bits=a_bits or None, a_static=static,
                a_symmetric=not q.a_asym,
                a_per_channel=False if q.act_per_tensor else True,
                a_groupsize=q.a_groupsize, a_clip_ratio=q.a_clip_ratio,
                observer=q.act_observer)
    if q.lm_head_bits and q.lm_head_bits != "auto":
        # quantized head (beyond the reference): halves/quarters the decode
        # head stream; "auto" resolves post-rotation in run_pipeline
        specs["llm.lm_head"] = SiteSpec(
            w_bits=int(q.lm_head_bits), a_bits=q.llm_a_bits or None,
            a_static=q.llm_static, a_symmetric=not q.a_asym,
            a_per_channel=False if q.act_per_tensor else True,
            observer=q.act_observer)
    if ("llm.down" in specs and q.rotate and q.rotate_llm
            and q.online_llm_hadamard):
        if q.online_had_mode == "block":
            specs["llm.down"] = dataclasses.replace(
                specs["llm.down"], online_had="block", head_dim=128,
                split=q.llm_split)
        else:
            specs["llm.down"] = dataclasses.replace(
                specs["llm.down"], online_had="full", split=q.llm_split)
    if "vis.fc2" in specs and q.rotate and q.rotate_visual:
        # split and online-had are independent flags (ref --visual_split /
        # --online_visual_hadamard); the spec must mirror prepare_vlm, which
        # splits fc2 storage whenever visual_split is set — a split-storage
        # site with split=False would feed full-width Hessians to GPTQ
        if q.online_visual_hadamard or q.visual_split:
            specs["vis.fc2"] = dataclasses.replace(
                specs["vis.fc2"],
                online_had="full" if q.online_visual_hadamard else None,
                split=q.visual_split)
    return specs


# ---------------------------------------------------------------------------
# calibration data
# ---------------------------------------------------------------------------


def synthetic_calib_batches(fam: ModelFamily, cfg, n_batches: int, key: jax.Array,
                            batch: int = 1, text_len: int = 32,
                            image_size: int = 16, patch: Optional[int] = None):
    """Random multimodal calibration batches (shape-correct) for environments
    without datasets. Real runs use ``mquant_tpu.evaluation`` datasets."""
    from .models.vision import patchify_2d, patchify_qwen2vl

    patch = patch or cfg.patch
    out = []
    for i in range(n_batches):
        k = jax.random.fold_in(key, i)
        images = jax.random.normal(k, (batch, image_size, image_size, 3),
                                   jnp.float32)
        extra = {}
        if fam.name == "qwen2vl":
            patches, grid = patchify_qwen2vl(images, patch=patch)
            n_img = patches.shape[1] // 4
            extra["grid_hw"] = grid
        else:
            patches, _ = patchify_2d(images, patch)
            gh = gw = image_size // patch
            if fam.name in ("qwenvl", "minicpmv"):
                n_img = cfg.resampler.n_queries
            elif fam.name == "internvl":
                n_img = (gh // 2) * (gw // 2)
                extra["grid"] = (gh, gw)
            else:
                n_img = 2 + (gh // 2) * (gw // 2)
                extra["grid"] = (gh, gw)
        toks = np.full((batch, n_img + text_len), 11, np.int64)
        toks[:, 2:2 + n_img] = cfg.image_token_id
        rnd = jax.random.randint(jax.random.fold_in(k, 1), (batch, text_len - 2),
                                 0, min(cfg.llm.vocab, 1000))
        toks[:, n_img + 2:] = np.asarray(rnd)
        out.append({"tokens": jnp.asarray(toks), "patches": patches, **extra})
    return out


# ---------------------------------------------------------------------------
# pipeline stages
# ---------------------------------------------------------------------------


def quantize_weights(fam: ModelFamily, cfg, params: Dict,
                     specs: Dict[str, SiteSpec], q: QuantizeConfig,
                     calib_batches: Optional[List[dict]] = None) -> Dict:
    """Stage: weight quantization. LLM via GPTQ (or RTN); visual subsystems —
    patch-embed, ViT blocks AND every cross-modal module (merger / resampler /
    mlp1 / GLU projector) — via stage-sequential GPTQ when ``--visual_w_gptq``
    (ref drivers: gptq/{qwenvl,qwen2vl,internvl,minicpmv}_gptq_plus.py), RTN
    otherwise. Operates site-by-site through the path map."""
    from .core import quant as Q

    params = dict(params)
    gptq_done_sites: set = set()

    # vision tower + cross-modal modules: GPTQ when enabled
    vis_w = specs.get("vis.q", SiteSpec()).w_bits
    if (not q.visual_w_rtn and vis_w is not None and calib_batches
            and "vit" in params):
        from .gptq import modules as GM
        from .gptq.driver import GPTQConfig, gptq_quantize_vit
        from .models.vision import vit_preamble, vit_forward

        gcfg = GPTQConfig(percdamp=q.percdamp, act_order=q.act_order,
                          group_size=q.w_groupsize, mse_clip=q.w_clip,
                          sym=not q.w_asym)
        vrep = {"fallbacks": [], "sites": 0}
        batches = _bound_nsamples(
            [b for b in calib_batches if b.get("patches") is not None],
            q.nsamples)

        # 1. patch embed (the reference's conv GPTQ,
        #    ref: qwenvl_gptq_plus.py:65-138)
        if specs.get("vis.patch_embed") is not None:
            patch_b = [b["patches"].astype(cfg.vit.dtype) for b in batches]
            params, vrep = GM.gptq_quantize_patch_embed(
                cfg, params, patch_b, specs, gcfg, vrep)
            gptq_done_sites.add("vis.patch_embed")

        # 2. ViT blocks (with the quantized patch embed in place)
        feats, grids = [], []
        for b in batches:
            feats.append(vit_preamble(cfg.vit, params["vit"], b["patches"]))
            grids.append(b.get("grid_hw"))
        if feats:
            params["vit"], vrep2 = gptq_quantize_vit(
                cfg.vit, params["vit"], feats, specs,
                grids=grids if cfg.vit.rotary_2d else None, gcfg=gcfg)
            vrep["fallbacks"] += vrep2["fallbacks"]
            vrep["sites"] += vrep2["sites"]
            gptq_done_sites |= {f"vis.{s}" for s in VIT_SITES}

        # 3. cross-modal module, fed by the fully-quantized tower
        #    (ref stage orders: merger qwen2vl_gptq_plus.py:287-380, attn_pool
        #    qwenvl_gptq_plus.py:344-443, mlp1 internvl_gptq_plus.py:279-366,
        #    resampler minicpmv_gptq_plus.py:322-331)
        def tower_feats(b):
            out, _ = vit_forward(cfg.vit, params["vit"], b["patches"],
                                 grid_hw=b.get("grid_hw"))
            return out

        if fam.name == "qwen2vl" and "merger" in params:
            params, vrep = GM.gptq_quantize_merger(
                cfg, params, [tower_feats(b) for b in batches], specs, gcfg, vrep)
            gptq_done_sites |= {"merger.mlp0", "merger.mlp2"}
        elif fam.name in ("qwenvl", "minicpmv") and "res" in params:
            params, vrep = GM.gptq_quantize_resampler(
                cfg, params, [tower_feats(b) for b in batches], specs, gcfg, vrep)
            gptq_done_sites |= {f"res.{s}" for s in SUBSYSTEM_SITES["res"]}
        elif fam.name == "internvl" and "proj" in params:
            from .models.projectors import pixel_shuffle

            shuffled = [pixel_shuffle(tower_feats(b), *b["grid"]) for b in batches]
            params, vrep = GM.gptq_quantize_mlp1(cfg, params, shuffled, specs,
                                                 gcfg, vrep)
            gptq_done_sites |= {"proj.fc1", "proj.fc2"}
        elif fam.name == "glm4v" and "proj" in params:
            fb = [(tower_feats(b), *b["grid"]) for b in batches]
            params, vrep = GM.gptq_quantize_glu(cfg, params, fb, specs, gcfg, vrep)
            gptq_done_sites |= {f"proj.{s}" for s in SUBSYSTEM_SITES["proj"]}

        if vrep["fallbacks"]:
            log.warning(f"visual GPTQ RTN-fallbacks: {vrep['fallbacks']}")

    # remaining visual / projector sites: RTN (path-resolved)
    group_of = {"vis": "vit", "merger": "merger", "res": "res", "proj": "proj"}
    for name, spec in specs.items():
        prefix, site = name.split(".", 1)
        if prefix == "llm" or spec.w_bits is None:
            continue
        if name in gptq_done_sites:
            continue  # already GPTQ-quantized
        group_key = group_of[prefix]
        if group_key not in params:
            continue
        path = ((group_key, "blocks", site) if prefix == "vis" and site in VIT_SITES
                else (group_key, site))
        node = params
        for k in path[:-1]:
            node = node.get(k, {})
        src = node.get(path[-1])
        if not isinstance(src, dict) or src.get("w") is None:
            continue
        stacked = src["w"].ndim == 3
        new_site = dict(src)
        new_site["w"] = Q.rtn_fake_quant_weight(
            src["w"], spec.w_bits, mse_clip=q.w_clip, symmetric=not q.w_asym,
            reduce_axes=(-2,) if stacked else None).astype(src["w"].dtype)
        # immutably write back along the path
        def set_in(tree, path, value):
            if len(path) == 1:
                out = dict(tree)
                out[path[0]] = value
                return out
            out = dict(tree)
            out[path[0]] = set_in(tree[path[0]], path[1:], value)
            return out

        params = set_in(params, list(path), new_site)

    # LLM: GPTQ (needs decoder-input embeds) or RTN
    wqps = None  # exact per-site weight grids for lossless realization
    llm_spec_bits = specs.get("llm.q", SiteSpec()).w_bits
    if llm_spec_bits is not None:
        if q.llm_w_rtn or calib_batches is None:
            from .transform.recipes import rtn_quantize_decoder

            params["llm"], wqps = rtn_quantize_decoder(
                cfg.llm, params["llm"], specs, mse_clip=q.w_clip,
                symmetric=not q.w_asym, return_qparams=True)
        else:
            from .gptq.driver import GPTQConfig, gptq_quantize_decoder

            # --nsamples bounds the GPTQ Hessian data independently of
            # --calib_num (activation calibration) — the reference's two-knob
            # contract (ref: exam/quant_qwenvl.py argparse, docs/qwenvl.md)
            gptq_batches = _bound_nsamples(calib_batches, q.nsamples)
            embeds = [embed_batch(fam, cfg, params, b) for b in gptq_batches]
            gcfg = GPTQConfig(percdamp=q.percdamp, act_order=q.act_order,
                              group_size=q.w_groupsize, mse_clip=q.w_clip,
                              sym=not q.w_asym)
            params["llm"], report = gptq_quantize_decoder(
                cfg.llm, params["llm"], embeds, specs, gcfg=gcfg)
            if report["fallbacks"]:
                log.warning(f"GPTQ RTN-fallbacks: {report['fallbacks']}")
            wqps = report["qparams"]  # incl. act_order perms (permuted-
            # layout realization handles act_order × w_groupsize)
            # lm_head (spec'd via lm_head_bits): per-out-channel RTN — the
            # standard head treatment; GPTQ's Hessian walk targets the
            # decoder sites (ref drivers never touch the head either)
            head_spec = specs.get("llm.lm_head")
            head = params["llm"].get("lm_head")
            if (head_spec is not None and head_spec.w_bits is not None
                    and isinstance(head, dict) and head.get("w") is not None):
                from .core.formats import get_format

                fmt = get_format(head_spec.w_bits, signed=not q.w_asym)
                qp = Q.weight_qparams(head["w"], fmt, per_channel=True,
                                      symmetric=not q.w_asym, mse_clip=q.w_clip)
                llm = dict(params["llm"])
                llm["lm_head"] = {**head, "w": Q.fake_quantize(
                    head["w"], qp, fmt).astype(head["w"].dtype)}
                params["llm"] = llm
                out = head["w"].shape[-1]
                wqps = dict(wqps or {})
                wqps["lm_head"] = (qp.scale.reshape(1, out),
                                   None if qp.zero_point is None
                                   else qp.zero_point.reshape(1, out))
    return params, wqps


def _bound_nsamples(batches: List[dict], nsamples: int) -> List[dict]:
    """Cap the total number of calibration ROWS fed to GPTQ at ``nsamples``
    (whole batches plus one row-sliced remainder batch)."""
    if not nsamples or nsamples <= 0:
        return batches
    out, seen = [], 0
    for b in batches:
        rows = b["tokens"].shape[0]
        if seen + rows <= nsamples:
            out.append(b)
            seen += rows
        else:
            take = nsamples - seen
            if take > 0:
                out.append({k: (v[:take] if hasattr(v, "shape") and
                                getattr(v, "ndim", 0) >= 1 and
                                v.shape[0] == rows else v)
                            for k, v in b.items()})
                seen += take
        if seen >= nsamples:
            break
    return out


def _choose_online_had_mode(fam: ModelFamily, cfg, params: Dict,
                            batch: dict, max_tokens: int = 128):
    """Calibration-time gate for the online-Hadamard variant on llm.down
    (``--online_had_mode auto``): capture the PRE-transform down_proj inputs
    on one calib batch and score each candidate transform (full = padded
    Kronecker over the whole intermediate; block = I ⊗ H_128) by the error it
    leaves on the DOWN-PROJ OUTPUT under exactly the serving quantization —
    per-layer-static per-tensor int8 activations × per-channel symmetric int4
    weights with the transform folded in (y = (xH)·q(HᵀW) vs the fp x·W).

    Neither variant dominates (tests/test_outlier_stress.py adversarial
    cases): spikes correlated WITHIN one 128-block defeat block mode (√128
    spreading re-concentrates them), while a dense single-block pattern
    defeats the full transform (spreading pushes that block's energy into
    every weight row, and the int4 weight grid pays for it across the whole
    width). An activation-only MSE proxy mispredicts the dense case — the
    weight-side requantization is NOT second-order there — so both sides are
    scored.
    """
    from .kernels.fwht import online_hadamard
    from .transform.hadamard import auto_pad_size

    probe = {"llm.down": SiteSpec(a_bits=8, a_static=True)}
    kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    _, _, st = fam.forward_fn(cfg, params, batch["tokens"],
                              batch.get("patches"), specs=probe, mode="fake",
                              collect_stats=True, collect_samples=True,
                              **kwargs)
    x_all = st[1]["llm.down"]  # forward_fn stats = (stats, samples); (L, N, I) raw down inputs
    x_all = x_all[:, :max_tokens].astype(jnp.float32)
    I = x_all.shape[-1]
    w_all = params["llm"]["layers"]["down"]["w"]  # (L, I, H)
    pad = auto_pad_size(I)

    @jax.jit
    def layer_errs(x, w):
        # x (N, I), w (I, H); one layer's candidate errors + reference energy
        w = w.astype(jnp.float32)
        y0 = x @ w
        ref = jnp.sum(y0 * y0)

        def q_err(xt, wt):
            # per-layer static per-tensor int8 acts (what the minmax observer
            # would calibrate on this batch) × per-channel symmetric int4
            # weights
            sa = jnp.maximum(jnp.max(jnp.abs(xt)), 1e-8) / 127.0
            xq = jnp.round(xt / sa).clip(-127, 127) * sa
            sw = jnp.maximum(jnp.max(jnp.abs(wt), axis=0, keepdims=True),
                             1e-8) / 7.0
            wq = jnp.round(wt / sw).clip(-7, 7) * sw
            return jnp.sum((xq @ wq - y0) ** 2)

        xf = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        wf = jnp.pad(w, ((0, pad), (0, 0))) if pad else w
        # fold HᵀW by transforming the row axis: online_hadamard acts on the
        # last axis, so transpose → WᵀH → transpose back gives HᵀW
        # (orthonormal: (xH)(HᵀW) = xW exactly)
        out = {"full": q_err(online_hadamard(xf),
                             online_hadamard(wf.T).T)}
        if I % 128 == 0:
            N, H = x.shape[0], w.shape[1]
            xb = online_hadamard(x.reshape(N, I // 128, 128)).reshape(N, I)
            wb = online_hadamard(
                w.T.reshape(H, I // 128, 128)).reshape(H, I).T
            out["block"] = q_err(xb, wb)
        return out, ref

    sums: Dict[str, float] = {}
    ref_sum = 0.0
    for li in range(x_all.shape[0]):  # layer at a time: bounds fp32 copies
        e, ref = layer_errs(x_all[li], w_all[li])
        ref_sum += float(ref)
        for k, v in e.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    errs = {k: v / max(ref_sum, 1e-12) for k, v in sums.items()}
    pick = min(errs, key=errs.get)
    return pick, {k: float(v) for k, v in errs.items()}


def embed_batch(fam: ModelFamily, cfg, params: Dict, batch: dict) -> jax.Array:
    """Decoder-input embeddings for one multimodal batch (embedding + vision +
    splice) — the input capture the reference does with Catcher hooks
    (ref: gptq/qwenvl_gptq_plus.py:76-98)."""
    from .models.qwen2vl import splice_image_embeds

    toks = batch["tokens"]
    embeds = params["llm"]["embed"]["w"][toks].astype(cfg.llm.dtype)
    patches = batch.get("patches")
    if patches is None:
        return embeds
    extra = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    if fam.name == "qwen2vl":
        from .models.vision import merger_forward, vit_forward

        feats, _ = vit_forward(cfg.vit, params["vit"], patches,
                               grid_hw=extra.get("grid_hw"))
        merged, _ = merger_forward(cfg.merger, params["merger"], feats)
        img = merged
    elif fam.name in ("qwenvl", "minicpmv"):
        from .models.resampler import resampler_forward
        from .models.vision import vit_forward

        feats, _ = vit_forward(cfg.vit, params["vit"], patches)
        img, _ = resampler_forward(cfg.resampler, params["res"], feats)
    elif fam.name == "internvl":
        from .models.projectors import mlp1_forward, pixel_shuffle
        from .models.vision import vit_forward

        gh, gw = extra["grid"]
        feats, _ = vit_forward(cfg.vit, params["vit"], patches)
        img, _ = mlp1_forward(cfg.mlp1, params["proj"],
                              pixel_shuffle(feats, gh, gw))
    else:  # glm4v
        from .models.projectors import glu_projector_forward
        from .models.vision import vit_forward

        gh, gw = extra["grid"]
        feats, _ = vit_forward(cfg.vit, params["vit"], patches)
        img, _ = glu_projector_forward(cfg.proj, params["proj"], feats, gh, gw)
    return splice_image_embeds(embeds, toks, img, cfg.image_token_id)


def calibrate_activations(fam: ModelFamily, cfg, params: Dict,
                          specs: Dict[str, SiteSpec],
                          calib_batches: List[dict],
                          decode_steps: int = 0) -> Dict:
    """Stage: static activation calibration over real multimodal forwards
    (the MSQ pass — ref: quant_utils.py:1079-1129 calib_vqa_plus).

    ``decode_steps > 0`` additionally folds the activations of that many
    greedy DECODE steps per batch into the LLM sites' stats — the reference
    calibrates by driving ``model.generate``, so its scales see decode-phase
    activations too, not just prefill."""
    from .calib.calibrate import calibrate, finalize_state, merge_stats

    def fwd(batch, collect_samples=False):
        kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
        logits, _, st = fam.forward_fn(
            cfg, params, batch["tokens"], batch.get("patches"),
            specs=specs, mode="calib", collect_stats=True,
            collect_samples=collect_samples, **kwargs)
        return logits, st

    if not decode_steps:
        return calibrate(fwd, [(b,) for b in calib_batches], specs)

    from .models.llm import decoder_forward, init_cache

    needs_samples = any(s.observer in ("omse", "ptf") for s in specs.values())
    running = None
    samples = None
    for i, b in enumerate(calib_batches):
        last = i == len(calib_batches) - 1
        _, (stats, smp) = fwd(b, collect_samples=last and needs_samples)
        running = merge_stats(specs, running, stats)
        if last and needs_samples:
            samples = smp
        # decode-phase stats: prefill a KV cache (stats NOT double-counted —
        # this pass runs without collection), then fold each greedy step
        embeds = embed_batch(fam, cfg, params, b)
        B, T = b["tokens"].shape
        cache = init_cache(cfg.llm, B, T + decode_steps)
        logits, cache, _ = decoder_forward(
            cfg.llm, params["llm"], embeds, specs=specs, mode="calib",
            cache=cache, prefill_fresh=True)
        tok = jnp.argmax(logits[:, -1:], axis=-1)
        for _ in range(decode_steps):
            logits, cache, st2 = decoder_forward(
                cfg.llm, params["llm"], tok, specs=specs, mode="calib",
                cache=cache, collect_stats=True)
            running = merge_stats(specs, running, st2[0])
            tok = jnp.argmax(logits[:, -1:], axis=-1)
    return finalize_state(specs, running or {}, samples)


def run_pipeline(model: str, q: QuantizeConfig,
                 model_dir: Optional[str] = None,
                 params: Optional[Dict] = None,
                 cfg=None,
                 calib_batches: Optional[List[dict]] = None,
                 calib_dataset: Optional[str] = None,
                 tokenizer=None,
                 artifact_dir: Optional[str] = None,
                 tiny: bool = False):
    """The full PTQ pipeline. Returns (cfg, params, state, specs, info)."""
    fam = get_family(model)
    cfg = cfg or (fam.tiny_fn() if tiny else fam.config_fn())
    key = jax.random.key(q.seed)

    if params is None:
        if model_dir:
            from .models.loader import load_model

            params = load_model(fam.name, cfg, model_dir, dtype=cfg.llm.dtype)
            log.info(f"loaded checkpoint from {model_dir}")
        else:
            params = fam.init_fn(cfg, key)
            log.info("using random-initialized weights (no model_dir)")

    specs = build_specs(fam, q)

    info = {}
    if calib_batches is None and calib_dataset:
        # real multimodal-prompt calibration (ref: calib_vqa_plus) — rows go
        # through the SAME chat-template + bucket construction as serving.
        # Built before any transform: batch content (tokens/patches) does
        # not depend on weight values.
        from .evaluation.adapter import VLMRunner, calib_batches_from_dataset
        from .evaluation.eval import build_dataset

        runner = VLMRunner(fam.name, cfg, params, tokenizer=tokenizer)
        calib_batches = calib_batches_from_dataset(
            runner, build_dataset(calib_dataset), q.calib_num)
        log.info(f"calibration prompts from {calib_dataset}: "
                 f"{len(calib_batches)} rows")
    if calib_batches is None:
        calib_batches = synthetic_calib_batches(
            fam, cfg, max(1, q.calib_num // 16), jax.random.fold_in(key, 2))

    if q.smooth_alpha > 0:
        # migration must precede rotation (rotation mixes channels)
        from .transform.smooth import (collect_llm_channel_amax,
                                       smooth_decoder)

        amax = collect_llm_channel_amax(fam, cfg, params, calib_batches)
        params = dict(params)
        params["llm"] = smooth_decoder(params["llm"], amax, q.smooth_alpha)
        info["smooth_alpha"] = q.smooth_alpha
        log.info(f"smoothquant migration applied (alpha={q.smooth_alpha})")

    if q.online_had_mode == "auto":
        # per-site calib-time gate (after smoothing, before the rotation
        # folds the chosen H into the down weights) — see
        # _choose_online_had_mode for why neither variant dominates
        if q.rotate and q.rotate_llm and q.online_llm_hadamard:
            pick, errs = _choose_online_had_mode(fam, cfg, params,
                                                 calib_batches[0])
            info["online_had_auto"] = {"picked": pick, **errs}
            log.info(f"online-Hadamard auto-select: {pick} "
                     f"(int8 MSE {errs})")
        else:
            pick = "full"
        q = dataclasses.replace(q, online_had_mode=pick)
        specs = build_specs(fam, q)  # rebuild with the decided mode

    if q.rotate:
        from .transform.vlm_recipes import prepare_vlm

        params, rinfo = prepare_vlm(
            fam.name, cfg, params, jax.random.fold_in(key, 1),
            rotate_visual=q.rotate_visual, rotate_llm=q.rotate_llm,
            mode=q.rotate_mode,
            online_had_down=q.online_llm_hadamard and q.rotate_llm,
            online_had_mode=q.online_had_mode,
            split_down=q.llm_split and q.rotate_llm,
            online_had_visual=q.online_visual_hadamard,
            split_visual=q.visual_split)
        info.update(rinfo)
        pad = getattr(info.get("llm"), "down_pad", 0)
        if pad:
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, intermediate_pad=pad))
        log.info(f"fuse+rotate done: {info}")

    if q.lm_head_bits == "auto":
        # per-model quality-proxy gate: W4 head iff head-only ppl ratio
        # within lm_head_gate (runs post-rotation: the head is rotated)
        from .utils.autobits import decide_head_bits

        pick, ratios = decide_head_bits(fam, cfg, params, specs,
                                        calib_batches[0], gate=q.lm_head_gate)
        specs["llm.lm_head"] = SiteSpec(
            w_bits=pick, a_bits=q.llm_a_bits or None, a_static=q.llm_static,
            a_symmetric=not q.a_asym,
            a_per_channel=False if q.act_per_tensor else True,
            observer=q.act_observer)
        info["lm_head_bits"] = pick
        log.info("lm_head gate: W4 ppl ratio %.5f, int8 %.5f (gate %.4f) "
                 "→ %d-bit head", ratios[4], ratios[8], q.lm_head_gate, pick)

    if q.auto_bits > 0:
        # sensitivity measured on the TRANSFORMED model (rotation changes
        # which sites are hard); the returned specs drive GPTQ/calib/realize
        from .utils.autobits import (allocation_report, autobits_specs,
                                     site_weight_elems)

        specs, sens, bits = autobits_specs(
            fam, cfg, params, specs, calib_batches[0], q.auto_bits,
            low=q.auto_bits_low, high=q.auto_bits_high)
        info["autobits"] = bits
        log.info("auto-bits allocation (target avg %.2f):\n%s", q.auto_bits,
                 allocation_report(sens, site_weight_elems(params, specs),
                                   bits))

    params, wqps = quantize_weights(fam, cfg, params, specs, q, calib_batches)
    log.info("weight quantization done")

    state = None
    if q.visual_static or q.llm_static:
        state = calibrate_activations(fam, cfg, params, specs, calib_batches,
                                      decode_steps=q.calib_decode_steps)
        log.info(f"activation calibration done ({len(state)} sites)")

    if q.realize_int:
        from .transform.recipes import realize_decoder_weights

        params = dict(params)
        # exact grids (wqps) make realization lossless for asym/grouped
        # weights; state enables per-channel static act-scale folding
        params["llm"] = realize_decoder_weights(params["llm"], specs,
                                                qps=wqps, state=state)
        log.info("realized int weights for the LLM serving path")

    if artifact_dir:
        from .utils.checkpoint import config_to_dict, save_artifact

        meta = {"model": model, "config": str(cfg),
                "config_dict": config_to_dict(cfg),
                "quantize_config": dataclasses.asdict(q),
                # autobits lives as structured meta["autobits"], not inside
                # the rotation string
                "rotation": str({k: v for k, v in info.items()
                                 if k != "autobits"})}
        if "autobits" in info:
            meta["autobits"] = info["autobits"]  # structured per-site bits
        save_artifact(artifact_dir, params, state, specs, meta=meta)
        log.info(f"artifact saved to {artifact_dir}")
    return cfg, params, state, specs, info
