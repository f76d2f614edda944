"""Sensitivity-based mixed-precision weight bit allocation (beyond the
reference, which fixes one bit-width per subsystem via --{visual,llm}_w_bits,
ref: exam/quant_qwenvl.py argparse).

HAWQ-style importance, measured directly instead of via Hessian spectra: each
quant site's sensitivity is the end-to-end relative logit error when ONLY that
site's weights are quantized at the low bit-width (one forward per site on a
calibration batch — sites are few: ~7 LLM + ~6 ViT + projector). The most
damaging sites are then promoted to the high bit-width by greedy
benefit-per-byte knapsack under a weight-memory budget expressed as a target
average bits/weight. The result is a per-site ``w_bits`` override on the
existing spec dict, so GPTQ, calibration, realization, and serving all consume
it with no further plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# spec-prefix → params-tree top key ("vis.fc1" lives under params["vit"])
_PREFIX_TO_TOP = {"vis": "vit"}


def _find_site_arrays(tree, local: str) -> List[np.ndarray]:
    """All weight arrays under dict entries named ``local`` (any depth)."""
    found = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == local and isinstance(v, dict):
                w = v.get("w", v.get("w_q"))
                if w is not None:
                    found.append(w)
            else:
                found.extend(_find_site_arrays(v, local))
    return found


def site_weight_elems(params: Dict, specs: Dict) -> Dict[str, int]:
    """Weight element count per quant site (layer-stacked sites count all
    layers: one SiteSpec governs the whole stack)."""
    elems = {}
    for name in specs:
        prefix, local = name.split(".", 1)
        top = params.get(_PREFIX_TO_TOP.get(prefix, prefix))
        if top is None:
            continue
        arrs = _find_site_arrays(top, local)
        if arrs:
            elems[name] = int(sum(int(np.prod(a.shape)) for a in arrs))
    return elems


def _map_site_weights(tree, local: str, fn):
    """Copy of ``tree`` with every ``local`` site's "w" replaced by fn(w)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == local and isinstance(v, dict) and v.get("w") is not None:
            out[k] = {**v, "w": fn(v["w"])}
        else:
            out[k] = _map_site_weights(v, local, fn)
    return out


def transform_only_specs(specs: Dict) -> Dict:
    """Specs with all quantization DISABLED but the runtime transforms kept
    (online Hadamard / RMS split). Post-rotation the activation-side online
    Hadamard is part of the model's math — ``prepare_vlm`` folds H into the
    down-proj weight, so a forward that skips it (mode='fp' / specs=None)
    computes x @ (Hᵀw) with un-rotated x: a mathematically wrong model, not
    the fp reference. The probe therefore runs mode='fake' with these specs
    so both its reference and per-site forwards apply the transforms."""
    return {n: dataclasses.replace(s, w_bits=None, a_bits=None, out_bits=None)
            for n, s in specs.items()}


def site_sensitivities(fam, cfg, params: Dict, specs: Dict, batch: dict,
                       low_bits: int = 4) -> Dict[str, float]:
    """Relative logit error ‖y_q − y_fp‖/‖y_fp‖ with ONLY that site's weights
    RTN-fake-quantized at ``low_bits`` (per-out-channel minmax grid, the same
    grid the offline RTN path uses; fp activations) — the direct measurement
    of what uniform low-bit costs at each site. Weight quantization is
    offline in this framework (RTN/GPTQ write fake-quantized weights into
    params), so the probe quantizes the weights itself; forwards run in
    mode='fake' with :func:`transform_only_specs` so the online Hadamard /
    split transforms baked into the rotated weights stay applied."""
    from ..core import quant as Q
    from ..core.formats import get_format

    kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    tspecs = transform_only_specs(specs)

    def run(p):
        out, _, _ = fam.forward_fn(cfg, p, batch["tokens"],
                                   batch.get("patches"), specs=tspecs,
                                   mode="fake", **kwargs)
        return out

    fmt = get_format(low_bits, signed=True)

    def fq(w):
        # per-out-channel grid: reduce the INPUT axis only, so layer-stacked
        # (L, in, out) weights keep per-layer-per-column scales — the same
        # grid the offline RTN path uses (transform/recipes.py
        # rtn_quantize_decoder: reduce_axes=(-2,))
        qp = Q.weight_qparams(w, fmt, per_channel=True, symmetric=True,
                              reduce_axes=(-2,))
        return Q.fake_quantize(w, qp, fmt).astype(w.dtype)

    ref = run(params)
    denom = float(jnp.linalg.norm(ref.astype(jnp.float32))) + 1e-9
    sens = {}
    for name, spec in specs.items():
        if spec.w_bits is None:
            continue
        prefix, local = name.split(".", 1)
        top_key = _PREFIX_TO_TOP.get(prefix, prefix)
        if top_key not in params:
            continue
        probe = dict(params)
        probe[top_key] = _map_site_weights(params[top_key], local, fq)
        y = run(probe)
        sens[name] = float(
            jnp.linalg.norm((y - ref).astype(jnp.float32))) / denom
    return sens


def allocate_bits(sens: Dict[str, float], elems: Dict[str, int],
                  target_avg_bits: float, low: int = 4,
                  high: int = 8) -> Dict[str, int]:
    """Greedy knapsack: every site starts at ``low``; promote to ``high`` in
    descending sensitivity-per-element order while the promoted extra bits
    keep the average ≤ ``target_avg_bits``."""
    names = [n for n in sens if n in elems]
    total = sum(elems[n] for n in names)
    bits = {n: low for n in names}
    if not names or target_avg_bits <= low:
        return bits
    budget = (min(target_avg_bits, high) - low) * total  # extra bits available
    per_elem_cost = high - low
    for n in sorted(names, key=lambda n: sens[n] / max(elems[n], 1),
                    reverse=True):
        cost = elems[n] * per_elem_cost
        if cost <= budget:
            bits[n] = high
            budget -= cost
    return bits


def autobits_specs(fam, cfg, params: Dict, specs: Dict, batch: dict,
                   target_avg_bits: float, low: int = 4, high: int = 8,
                   ) -> Tuple[Dict, Dict[str, float], Dict[str, int]]:
    """Measure sensitivities, allocate per-site bits under the budget, and
    return (specs with w_bits overridden, sensitivities, allocation).
    Run AFTER rotation (sensitivity depends on the transformed weights) and
    BEFORE GPTQ/calibration (both consume the returned specs)."""
    sens = site_sensitivities(fam, cfg, params, specs, batch, low_bits=low)
    elems = site_weight_elems(params, specs)
    bits = allocate_bits(sens, elems, target_avg_bits, low=low, high=high)
    new_specs = dict(specs)
    for name, b in bits.items():
        new_specs[name] = dataclasses.replace(specs[name], w_bits=b)
    return new_specs, sens, bits


# the head-only perplexity-ratio budget: W4 head accepted iff its ratio
# stays under this (a fraction of the pipeline's <1% total gate). One
# constant shared by decide_head_bits and bench.resolve_bench_head.
HEAD_GATE_DEFAULT = 1.002


def head_quantized_decoder(dec_params: Dict, bits: int) -> Dict:
    """Decoder-tree copy (lm_head at top level) with ONLY the lm_head
    weights RTN-fake-quantized at ``bits`` (per-out-channel minmax — the
    probe/offline grid)."""
    from ..core import quant as Q
    from ..core.formats import get_format

    fmt = get_format(bits, signed=True)

    def fq(w):
        qp = Q.weight_qparams(w, fmt, per_channel=True, symmetric=True,
                              reduce_axes=(-2,) if w.ndim == 3 else None)
        return Q.fake_quantize(w, qp, fmt).astype(w.dtype)

    return _map_site_weights(dec_params, "lm_head", fq)


def head_quantized_params(params: Dict, bits: int) -> Dict:
    """VLM-params copy (decoder under ``params["llm"]``) with only the
    lm_head fake-quantized at ``bits``."""
    out = dict(params)
    out["llm"] = head_quantized_decoder(params["llm"], bits)
    return out


def ppl_ratio_from_logits(lf, lq) -> float:
    """exp(CE(fp_dist, quantized) − H(fp_dist)) — the checkpoint-free quality
    proxy (1.0 = no degradation; the repo's acceptance gate machinery,
    tests/test_quality_proxy.py)."""
    lf = lf.astype(jnp.float32)
    lq = jnp.asarray(lq).astype(jnp.float32)
    pf = jax.nn.softmax(lf, -1)
    ce_q = -jnp.sum(pf * jax.nn.log_softmax(lq, -1), -1)
    ce_f = -jnp.sum(pf * jax.nn.log_softmax(lf, -1), -1)
    return float(jnp.exp(jnp.mean(ce_q - ce_f)))


def decide_head_bits(fam, cfg, params: Dict, specs: Dict, batch: dict,
                     low: int = 4, high: int = 8,
                     gate: float = HEAD_GATE_DEFAULT,
                     ) -> Tuple[int, Dict[int, float]]:
    """Quality-proxy gate for the lm_head weight width: measure the
    perplexity ratio of quantizing ONLY the head at ``low`` vs ``high`` and
    pick ``low`` (the packed-W4 head, +7% decode from halving the head
    stream) iff its ratio stays under ``gate``. This replaces the former
    always-int8 judgment call with a per-model measurement — head
    sensitivity is model-dependent, and the framework owns the tooling to
    measure it. Returns (bits, {bits: ppl_ratio})."""
    kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    tspecs = transform_only_specs(specs)

    def run(p):
        out, _, _ = fam.forward_fn(cfg, p, batch["tokens"],
                                   batch.get("patches"), specs=tspecs,
                                   mode="fake", **kwargs)
        return out

    lf = run(params)
    ratios = {b: ppl_ratio_from_logits(lf, run(head_quantized_params(params, b)))
              for b in (low, high)}
    return (low if ratios[low] <= gate else high), ratios


def rtn_apply_bits(params: Dict, bits: Dict[str, int]) -> Dict:
    """Params copy with each site's weights RTN-fake-quantized at its
    allocated bit-width (per-out-channel minmax — the probe's grid). For
    quick what-if evaluation of an allocation; the real pipeline path is
    ``quantize_weights`` consuming the overridden specs."""
    from ..core import quant as Q
    from ..core.formats import get_format

    out = dict(params)
    for name, b in bits.items():
        prefix, local = name.split(".", 1)
        top_key = _PREFIX_TO_TOP.get(prefix, prefix)
        if top_key not in out:
            continue
        fmt = get_format(b, signed=True)

        def fq(w, fmt=fmt):
            qp = Q.weight_qparams(w, fmt, per_channel=True, symmetric=True,
                                  reduce_axes=(-2,))
            return Q.fake_quantize(w, qp, fmt).astype(w.dtype)

        out[top_key] = _map_site_weights(out[top_key], local, fq)
    return out


def allocation_report(sens: Dict[str, float], elems: Dict[str, int],
                      bits: Dict[str, int]) -> str:
    lines = [f"{'site':24s} {'sens':>10s} {'Melems':>8s} {'bits':>5s}"]
    for n in sorted(bits, key=lambda n: sens.get(n, 0.0), reverse=True):
        lines.append(f"{n:24s} {sens.get(n, 0.0):10.4f} "
                     f"{elems.get(n, 0) / 1e6:8.2f} {bits[n]:5d}")
    total = sum(elems.get(n, 0) for n in bits)
    avg = (sum(elems.get(n, 0) * b for n, b in bits.items()) / total
           if total else 0.0)
    lines.append(f"{'average':24s} {'':>10s} {total / 1e6:8.2f} {avg:5.2f}")
    return "\n".join(lines)
