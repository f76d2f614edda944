"""SmoothQuant-style activation-difficulty migration (beyond the reference).

Per-channel activation outliers are what make static per-tensor activation
scales lossy. MQuant's answer is rotation + RMS split (the reference's whole
mechanism, ref: fake_quant/rotation_utils.py); SmoothQuant's (Xiao et al.,
ICML 2023) is MIGRATION: scale each input channel j of a norm-fed linear by

    s_j = amax_x[j]^alpha / amax_w[j]^(1 - alpha)

folding 1/s into the preceding RMSNorm weight and s into the linear weight.
Exactly output-preserving in fp (the same mechanism as LN fusion,
``transform/fuse.py``), but the activation distribution flattens — some of
the quantization difficulty moves into the weights, which tolerate it better.

Offered as a composable tool (``--smooth_alpha``): it runs BEFORE rotation
(rotation mixes channels, after which per-channel migration is meaningless),
applies to the norm-fed site groups (ln1 → q/k/v, ln2 → gate/up), and works
with everything downstream (GPTQ sees the smoothed weights, calibration sees
the smoothed activations). The reference has no equivalent.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _f64(x):
    return np.asarray(x, np.float64)


def smooth_scales(act_amax: np.ndarray, weights, alpha: float,
                  eps: float = 1e-5) -> np.ndarray:
    """Per-input-channel migration scales for one norm-fed site group.

    act_amax: (L, H) per-channel activation |max| at the group's shared
    input. weights: list of (L, H, out) weight arrays of the group. Returns
    s (L, H), clipped away from 0 so degenerate channels become no-ops."""
    a = np.maximum(_f64(act_amax), eps)
    wmax = np.maximum.reduce([np.abs(_f64(w)).max(axis=-1) for w in weights])
    wmax = np.maximum(wmax, eps)
    s = a ** alpha / wmax ** (1.0 - alpha)
    return np.maximum(s, eps)


def smooth_decoder(llm_params: Dict, act_amax: Dict[str, np.ndarray],
                   alpha: float = 0.5) -> Dict:
    """Apply migration to the decoder's two norm-fed groups.

    act_amax: {"attn": (L, H) amax of ln1 output, "mlp": (L, H) of ln2
    output} (from :func:`collect_llm_channel_amax`). Returns new params;
    fp forward is exactly preserved (invariance-tested)."""
    layers = dict(llm_params["layers"])
    for ln_name, sites, key in (("ln1", ("q", "k", "v"), "attn"),
                                ("ln2", ("gate", "up"), "mlp")):
        s = smooth_scales(act_amax[key], [layers[n]["w"] for n in sites],
                          alpha)  # (L, H)
        g = _f64(layers[ln_name]["w"]) / s
        dt = layers[ln_name]["w"].dtype
        layers[ln_name] = dict(layers[ln_name], w=jnp.asarray(g, dt))
        for n in sites:
            w = _f64(layers[n]["w"]) * s[:, :, None]
            layers[n] = dict(layers[n], w=jnp.asarray(w, layers[n]["w"].dtype))
    return dict(llm_params, layers=layers)


def collect_llm_channel_amax(fam, cfg, params: Dict, calib_batches,
                             a_bits: int = 8) -> Dict[str, np.ndarray]:
    """Per-channel activation |max| at the decoder's norm-fed inputs, via
    ONE calibration pass with per-channel minmax observers on llm.q (ln1
    output; k/v share it) and llm.gate (ln2 output; up shares it)."""
    from ..models.layers import SiteSpec
    from ..pipeline import calibrate_activations

    qmax = 2 ** (a_bits - 1) - 1
    spec = SiteSpec(a_bits=a_bits, a_static=True, a_per_channel=True,
                    observer="minmax")
    tmp = {"llm.q": spec, "llm.gate": spec}
    state = calibrate_activations(fam, cfg, params, tmp, calib_batches)
    out = {}
    for key, site in (("attn", "llm.q"), ("mlp", "llm.gate")):
        scale = np.asarray(state[site]["act"].scale, np.float64)
        out[key] = scale * qmax  # minmax symmetric: scale == amax / qmax
    return out
