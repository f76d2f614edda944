"""GPTQ driver for the stacked decoder — stage-sequential, layer-streamed.

Capability parity with the reference's per-model GPTQ drivers
(ref: fake_quant/gptq/{qwenvl,qwen2vl,internvl,minicpmv}_gptq_plus.py): process
layers in order; within a layer quantize site groups in dependency order
  [q, k, v] → [o] → [gate, up] → [down (rows 1: when RMS-split)]
re-deriving each group's inputs with the previously-quantized groups in place,
then produce the next layer's inputs with the fully-quantized layer.

TPU-native differences:
  * no Catcher/forward-abort hooks (ref: qwenvl_gptq_plus.py:76-98): the caller
    hands in the decoder-input hidden states directly (one jitted embedding+
    splice pass produces them);
  * each stage replay is ONE jitted function reused across layers (static
    shapes → 5 compiles total, not 5×L), batched over all calibration samples;
  * Hessians accumulate on device in f32 via ``accumulate_hessian``; only one
    layer's weights are device-resident at a time (same streaming memory
    profile as the reference's layer-at-a-time design, ref: SURVEY §3.3).

Activations stay in floating point during GPTQ (matching the reference, whose
act quantizers are in the default pass-through state at this point); the online
Hadamard and RMS split ARE active so the Hessian matches the serving-time input
distribution of down_proj (ref: exam/quant_qwenvl.py:135-158 configures the
wrappers before GPTQ runs).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models import layers as L
from ..models.layers import SiteSpec, qlinear
from ..models.llm import DecoderConfig, rope_tables, _apply_rope
from . import core as C

STAGES = ("qkv", "o", "gu", "down", "next")


def _strip_act_quant(specs: Dict[str, SiteSpec]) -> Dict[str, SiteSpec]:
    """Keep transforms (online Hadamard, split) but disable activation quant —
    GPTQ sees fp activations through progressively-quantized weights."""
    out = {}
    for k, v in (specs or {}).items():
        out[k] = dataclasses.replace(v, a_bits=None, a_static=False)
    return out


def make_stage_fn(cfg: DecoderConfig, specs: Dict[str, SiteSpec], stage: str):
    specs = _strip_act_quant(specs)

    def site(nm):
        return specs.get("llm." + nm)

    @jax.jit
    def f(lp, h, cos, sin, mask):
        B, T, _ = h.shape
        hd, H, KV = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
        x1 = L.rms_norm(h, lp["ln1"]["w"], cfg.norm_eps)
        if stage == "qkv":
            return x1
        q = qlinear(x1, lp["q"], "llm.q", site("q"), None, "fake", None)
        k = qlinear(x1, lp["k"], "llm.k", site("k"), None, "fake", None)
        v = qlinear(x1, lp["v"], "llm.v", site("v"), None, "fake", None)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, KV, hd)
        v = v.reshape(B, T, KV, hd)
        q, k = _apply_rope(cfg, q, k, cos, sin)
        attn = L.attention(q, k, v, mask).reshape(B, T, H * hd)
        if stage == "o":
            return attn
        h2 = h + qlinear(attn, lp["o"], "llm.o", site("o"), None, "fake", None)
        x2 = L.rms_norm(h2, lp["ln2"]["w"], cfg.norm_eps)
        if stage == "gu":
            return x2
        g = qlinear(x2, lp["gate"], "llm.gate", site("gate"), None, "fake", None)
        u = qlinear(x2, lp["up"], "llm.up", site("up"), None, "fake", None)
        a = L.swiglu(g, u)
        dspec = site("down")
        if dspec is not None and dspec.online_had is not None:
            from ..models.layers import _online_hadamard

            a = _online_hadamard(a, dspec)  # full/head/block-aware
        if stage == "down":
            return a
        # full down (split-aware) via qlinear with the hadamard already applied
        nohad = dataclasses.replace(dspec, online_had=None) if dspec else None
        d = qlinear(a, lp["down"], "llm.down", nohad, None, "fake", None)
        return h2 + d

    return f


@dataclasses.dataclass
class GPTQConfig:
    """Knob parity with the reference CLI (--percdamp --act_order --w_groupsize
    --w_clip, ref: exam/quant_qwenvl.py argparse)."""

    percdamp: float = 0.01
    act_order: bool = False
    group_size: Optional[int] = None
    mse_clip: bool = False
    use_rtn: bool = False  # --llm_w_rtn fallback path
    sym: bool = True  # False = asymmetric (zero-point) grid, ref --w_asym


def gptq_quantize_decoder(
    cfg: DecoderConfig,
    params: Dict,
    hidden_batches: List[jax.Array],  # decoder-input embeds per batch (B,T,hid)
    specs: Dict[str, SiteSpec],
    positions: Optional[List[jax.Array]] = None,
    gcfg: GPTQConfig = GPTQConfig(),
    progress: Optional[callable] = None,
    stream_from_host: bool = False,
    realize_on_device: bool = False,
) -> tuple[Dict, Dict]:
    """Quantize every spec'd decoder weight with GPTQ. Returns (params, report).

    ``stream_from_host=True``: ``params["layers"]`` leaves live in HOST memory
    (numpy, incl. ml_dtypes.bfloat16); each layer is transferred to the device
    only while being quantized and written back after. This is how a 7B+ bf16
    model is GPTQ'd on a 16 GB chip — the fully-resident stacked weights plus
    an 18944² Hessian + factor exceed HBM at full depth (measured OOM); the
    driver is already layer-sequential, so streaming adds only the per-layer
    PCIe/DMA transfer. Returns host-stacked (numpy) layer leaves in this mode.

    ``realize_on_device=True`` (with streaming): instead of writing bf16 fake-
    quantized weights back to the host, each finished layer is converted to
    real-int serving storage (w_q/w_scale, int8 ≤ half the bytes) and the
    stacked result STAYS on device — bf16-at-rest on the host goes in, a
    servable quantized model comes out, with no device→host weight traffic."""
    import numpy as np

    nL = cfg.n_layers
    stage_fns = {s: make_stage_fn(cfg, specs, s) for s in STAGES}
    hess = jax.jit(C.accumulate_hessian)

    # per-batch rope tables + causal masks (constant across layers)
    pre = []
    for i, h in enumerate(hidden_batches):
        B, T, _ = h.shape
        pos = (positions[i] if positions is not None
               else jnp.broadcast_to(jnp.arange(T)[None], (B, T)))
        cos, sin = rope_tables(cfg, pos, jnp.float32)
        pre.append((cos, sin, L.causal_mask(T, T)))

    def quantize_site(lp, name, H):
        """Returns (lp, used_fallback, (scale, zero, perm)|None). The qparams
        are the
        EXACT grid the fake-quantized weight lies on — carried to realization
        so int storage recovers the codes losslessly instead of re-quantizing
        onto a fresh symmetric grid (the round-2 w_asym/w_groupsize silent
        degradation)."""
        spec = specs.get("llm." + name)
        if spec is None or spec.w_bits is None:
            return lp, None, None
        site_p = dict(lp[name])
        w = site_p["w"].astype(jnp.float32)
        if gcfg.use_rtn:
            from ..core import quant as Q
            from ..core.formats import get_format

            fmt = get_format(spec.w_bits, signed=gcfg.sym)
            qp = Q.weight_qparams(w, fmt, per_channel=True, symmetric=gcfg.sym,
                                  mse_clip=gcfg.mse_clip)
            site_p["w"] = Q.fake_quantize(w, qp, fmt).astype(lp[name]["w"].dtype)
            lp = dict(lp)
            lp[name] = site_p
            out = w.shape[-1]
            qps = (qp.scale.reshape(1, out),
                   None if qp.zero_point is None else qp.zero_point.reshape(1, out),
                   None)
            return lp, False, qps
        res = C.gptq_quantize_matrix(
            w, H, bits=spec.w_bits, percdamp=gcfg.percdamp,
            act_order=gcfg.act_order, group_size=gcfg.group_size,
            mse_clip=gcfg.mse_clip, sym=gcfg.sym)
        site_p["w"] = res.w.astype(lp[name]["w"].dtype)
        lp = dict(lp)
        lp[name] = site_p
        # perm is only needed for realization when grouped scales index
        # permuted row blocks (act_order × group_size)
        perm = res.perm if (gcfg.act_order and gcfg.group_size) else None
        return lp, bool(res.used_fallback), (res.scale, res.zero, perm)

    report = {"fallbacks": [], "sites": 0, "qparams": []}
    hb = hidden_batches
    new_layers = []
    for l in range(nL):
        layer_qps = {}
        if stream_from_host:
            lp = jax.tree.map(lambda x: jnp.asarray(np.asarray(x[l])),
                              params["layers"])
        else:
            lp = jax.tree.map(lambda x: x[l], params["layers"])

        # group 1: q, k, v share the post-ln1 input
        Hq = None
        for h, (cos, sin, mask) in zip(hb, pre):
            x1 = stage_fns["qkv"](lp, h, cos, sin, mask)
            Hq = hess(Hq, x1) if Hq is not None else C.accumulate_hessian(None, x1)
        for s in ("q", "k", "v"):
            lp, fb, qps = quantize_site(lp, s, Hq)
            layer_qps[s] = qps
            _track(report, f"L{l}.{s}", fb)

        # group 2: o
        Ho = None
        for h, (cos, sin, mask) in zip(hb, pre):
            attn = stage_fns["o"](lp, h, cos, sin, mask)
            Ho = hess(Ho, attn) if Ho is not None else C.accumulate_hessian(None, attn)
        lp, fb, qps = quantize_site(lp, "o", Ho)
        layer_qps["o"] = qps
        _track(report, f"L{l}.o", fb)

        # group 3: gate, up share the post-ln2 input
        Hg = None
        for h, (cos, sin, mask) in zip(hb, pre):
            x2 = stage_fns["gu"](lp, h, cos, sin, mask)
            Hg = hess(Hg, x2) if Hg is not None else C.accumulate_hessian(None, x2)
        for s in ("gate", "up"):
            lp, fb, qps = quantize_site(lp, s, Hg)
            layer_qps[s] = qps
            _track(report, f"L{l}.{s}", fb)

        # group 4: down — on the post-hadamard input; RMS split keeps col0 fp
        # and quantizes only the remaining rows (ref: gptq drivers target
        # down_proj.L2, e.g. qwenvl_gptq_plus.py:542-545)
        dspec = specs.get("llm.down")
        split = dspec is not None and dspec.split and "w_col0" in lp["down"]
        Hd = None
        for h, (cos, sin, mask) in zip(hb, pre):
            a = stage_fns["down"](lp, h, cos, sin, mask)
            if split:
                a = a[..., 1:]
            Hd = hess(Hd, a) if Hd is not None else C.accumulate_hessian(None, a)
        lp, fb, qps = quantize_site(lp, "down", Hd)
        layer_qps["down"] = qps
        _track(report, f"L{l}.down", fb)

        # produce next layer's inputs with the fully quantized layer
        if l < nL - 1:
            hb = [stage_fns["next"](lp, h, cos, sin, mask)
                  for h, (cos, sin, mask) in zip(hb, pre)]
        report["qparams"].append(layer_qps)
        if stream_from_host and realize_on_device:
            from ..kernels.qmm import quantize_weights_real

            store = {}
            for name, site in lp.items():
                spec = specs.get("llm." + name)
                if (isinstance(site, dict) and "w" in site and spec is not None
                        and spec.w_bits is not None):
                    s = {k: v for k, v in site.items() if k != "w"}
                    # int8 storage (the serving default; the decode loop
                    # re-stores W4 as native S4 — see qmm.s4_squeeze_sites).
                    # The GPTQ grid is passed through so the codes are the
                    # exact ones the walk optimized — no re-quantization.
                    scale, zero, perm = (layer_qps.get(name)
                                         or (None, None, None))
                    w = site["w"]
                    if perm is not None:
                        # act_order × group_size: store rows in PERMUTED
                        # layout so the grouped scale table maps contiguous
                        # row blocks again; the serving GEMM gathers the
                        # activation through a_perm (exact — one cheap
                        # (..., in) gather per call)
                        w = w[perm]
                        s["a_perm"] = perm.astype(jnp.int32)
                    s.update(quantize_weights_real(w, spec.w_bits,
                                                   pack=False, scale=scale,
                                                   zero=zero))
                    store[name] = s
                else:
                    store[name] = site
            new_layers.append(store)
        elif stream_from_host:  # write back + free the device copy
            new_layers.append(jax.tree.map(
                lambda x: np.asarray(x) if x is not None else None, lp))
        else:
            new_layers.append(lp)
        if progress:
            progress(l, nL)

    stack = (np.stack if (stream_from_host and not realize_on_device)
             else jnp.stack)
    # stack site-by-site, releasing the per-layer buffers as we go: stacking
    # the whole tree at once doubles the weight footprint (measured OOM at 7B
    # with realize_on_device — 2×6.5 GB during the stack)
    stacked = {}
    for name in list(new_layers[0].keys()):
        site_leaves = [nl.pop(name) for nl in new_layers]
        stacked[name] = jax.tree.map(lambda *xs: stack(xs), *site_leaves)
        del site_leaves
    # stack per-layer qparams → {site: (scale (L,g,out), zero|None,
    # perm (L,in)|None)} so the post-hoc realize path can recover exact codes
    # (see quantize_site; perm → permuted-layout realization)
    qps_stacked = {}
    for name in report["qparams"][0]:
        entries = [lq.get(name) for lq in report["qparams"]]
        if entries[0] is None:
            qps_stacked[name] = None
            continue
        sc = jnp.stack([e[0] for e in entries])
        ze = (None if entries[0][1] is None
              else jnp.stack([e[1] for e in entries]))
        pm = (None if len(entries[0]) < 3 or entries[0][2] is None
              else jnp.stack([e[2] for e in entries]))
        qps_stacked[name] = (sc, ze, pm)
    report["qparams"] = qps_stacked
    out = dict(params)
    out["layers"] = stacked
    return out, report


def _track(report, name, fb):
    if fb is None:
        return
    report["sites"] += 1
    if fb:
        report["fallbacks"].append(name)


# ---------------------------------------------------------------------------
# vision-tower GPTQ (stage-sequential, like the LLM driver)
# ---------------------------------------------------------------------------

VIT_STAGES = ("qkv", "o", "fc1", "fc2", "next")


def make_vit_stage_fn(cfg, specs: Dict[str, SiteSpec], stage: str,
                      prefix: str = "vis"):
    """One jitted ViT-block stage replay (group order [q,k,v]→[o]→[fc1]→[fc2],
    the reference's visual GPTQ staging, ref: gptq/qwenvl_gptq_plus.py:183-195)."""
    from ..models.vision import _act, _norm

    specs = _strip_act_quant(specs)

    def site(nm):
        return specs.get(f"{prefix}.{nm}")

    @jax.jit
    def f(bp, h, cos, sin):
        B, T, _ = h.shape
        hd, H = cfg.head_dim, cfg.n_heads
        x1 = _norm(cfg, h, bp["ln1"])
        if stage == "qkv":
            return x1
        q = qlinear(x1, bp["q"], f"{prefix}.q", site("q"), None, "fake", None)
        k = qlinear(x1, bp["k"], f"{prefix}.k", site("k"), None, "fake", None)
        v = qlinear(x1, bp["v"], f"{prefix}.v", site("v"), None, "fake", None)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        v = v.reshape(B, T, H, hd)
        if cos is not None:
            q, k = L.apply_rope(q, k, cos, sin)
        a = L.attention(q, k, v).reshape(B, T, H * hd)
        if stage == "o":
            return a
        a = qlinear(a, bp["o"], f"{prefix}.o", site("o"), None, "fake", None)
        if cfg.layerscale and "ls1" in bp:
            a = a * bp["ls1"]["w"].astype(a.dtype)
        h2 = h + a
        x2 = _norm(cfg, h2, bp["ln2"])
        if stage == "fc1":
            return x2
        y = qlinear(x2, bp["fc1"], f"{prefix}.fc1", site("fc1"), None, "fake", None)
        y = _act(cfg, y)
        fspec = site("fc2")
        if stage == "fc2":
            # Hessian must see fc2's serving-time input: post-online-Hadamard
            # (ref: exam/quant_qwenvl.py:106-178 configures the visual wrappers
            # before GPTQ runs)
            if fspec is not None and fspec.online_had is not None:
                from ..models.layers import _online_hadamard

                y = _online_hadamard(y, fspec)  # full/head/block-aware
            return y
        y = qlinear(y, bp["fc2"], f"{prefix}.fc2", fspec, None, "fake", None)
        if cfg.layerscale and "ls2" in bp:
            y = y * bp["ls2"]["w"].astype(y.dtype)
        return h2 + y

    return f


def gptq_quantize_vit(
    cfg,  # ViTConfig
    vit_params: Dict,
    feat_batches: List[jax.Array],  # post-patch-embed(+pos/pre) features (B,T,W)
    specs: Dict[str, SiteSpec],
    grids: Optional[List[jax.Array]] = None,  # (B,T,2) for rotary_2d towers
    gcfg: GPTQConfig = GPTQConfig(),
    prefix: str = "vis",
) -> tuple[Dict, Dict]:
    """GPTQ for the vision tower blocks. ``feat_batches`` are the block-0 inputs
    (the caller runs patch-embed + pos/pre-norm once). Returns (vit_params,
    report). The patch-embed linear itself is quantized separately by the
    pipeline (its input is raw pixels; RTN suffices — capability parity with the
    conv GPTQ path can reuse gptq_quantize_matrix on patch pixels)."""
    stage_fns = {s: make_vit_stage_fn(cfg, specs, s, prefix) for s in VIT_STAGES}
    hess = jax.jit(C.accumulate_hessian)

    pre = []
    for i, h in enumerate(feat_batches):
        cos = sin = None
        if cfg.rotary_2d and grids is not None:
            from ..models.vision import rot2d_tables

            cos, sin = jax.vmap(lambda g: rot2d_tables(g, cfg.head_dim))(grids[i])
        pre.append((cos, sin))

    def quantize_site(bp, name, H):
        spec = specs.get(f"{prefix}.{name}")
        if spec is None or spec.w_bits is None:
            return bp, None
        sp = dict(bp[name])
        fb = False
        if gcfg.use_rtn:
            from ..core import quant as Q

            sp["w"] = Q.rtn_fake_quant_weight(
                sp["w"].astype(jnp.float32), spec.w_bits, symmetric=gcfg.sym,
                mse_clip=gcfg.mse_clip).astype(bp[name]["w"].dtype)
        else:
            res = C.gptq_quantize_matrix(
                sp["w"].astype(jnp.float32), H, bits=spec.w_bits,
                percdamp=gcfg.percdamp, act_order=gcfg.act_order,
                group_size=gcfg.group_size, mse_clip=gcfg.mse_clip,
                sym=gcfg.sym)
            sp["w"] = res.w.astype(bp[name]["w"].dtype)
            fb = bool(res.used_fallback)
        bp = dict(bp)
        bp[name] = sp
        return bp, fb

    report = {"fallbacks": [], "sites": 0}
    hb = feat_batches
    new_blocks = []
    nL = cfg.n_layers
    for l in range(nL):
        bp = jax.tree.map(lambda x: x[l], vit_params["blocks"])
        fc2_spec = specs.get(f"{prefix}.fc2")
        fc2_split = (fc2_spec is not None and fc2_spec.split
                     and "w_col0" in bp["fc2"])
        groups = (("qkv", ("q", "k", "v")), ("o", ("o",)),
                  ("fc1", ("fc1",)), ("fc2", ("fc2",)))
        for stage, names in groups:
            Hs = None
            for h, (cos, sin) in zip(hb, pre):
                x = stage_fns[stage](bp, h, cos, sin)
                if stage == "fc2" and fc2_split:
                    # RMS split: column 0 stays fp; Hessian over rows 1:
                    # (ref: visual GPTQ targets c_proj.L2,
                    # qwenvl_gptq_plus.py:183-195)
                    x = x[..., 1:]
                Hs = hess(Hs, x) if Hs is not None else C.accumulate_hessian(None, x)
            for nm in names:
                bp, fb = quantize_site(bp, nm, Hs)
                _track(report, f"{prefix}L{l}.{nm}", fb)
        if l < nL - 1:
            hb = [stage_fns["next"](bp, h, cos, sin)
                  for h, (cos, sin) in zip(hb, pre)]
        new_blocks.append(bp)

    out = dict(vit_params)
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *new_blocks)
    return out, report
