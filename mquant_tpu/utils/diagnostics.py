"""Quantization diagnostics.

Capability parity with the reference's analysis tooling: activation capture
for distribution inspection (``analysis``/``analysis_text``,
ref: fake_quant/quant_utils.py:964-1035, --analysis* flags
exam/quant_qwenvl.py:276-289) and per-layer quant-config reporting
(``extra_repr``, ref: quant_utils.py:297-314) — plus quantization-error
attribution the reference lacks.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def capture_activations(forward_with_stats, *batch) -> Dict[str, np.ndarray]:
    """Per-site input activations for one batch (distribution analysis).
    ``forward_with_stats`` = family forward partial with mode='calib',
    collect_stats=True. Layer-stacked sites return (L, tokens, C)."""
    _, (stats, samples) = forward_with_stats(*batch, collect_samples=True)
    return {k: np.asarray(v) for k, v in samples.items()}


def activation_summary(samples: Dict[str, np.ndarray]) -> str:
    """Readable per-site table: absmax / 99.9% quantile / rms — shows which
    sites carry outliers (what the reference plots, here as text)."""
    lines = [f"{'site':24s} {'absmax':>10s} {'q99.9':>10s} {'rms':>10s} {'kurt':>8s}"]
    for name in sorted(samples):
        x = samples[name].astype(np.float64).ravel()
        absmax = np.abs(x).max()
        q = np.quantile(np.abs(x), 0.999)
        rms = np.sqrt((x**2).mean())
        kurt = ((x - x.mean()) ** 4).mean() / max((x.var()) ** 2, 1e-12)
        lines.append(f"{name:24s} {absmax:10.3f} {q:10.3f} {rms:10.4f} {kurt:8.1f}")
    return "\n".join(lines)


def quant_config_report(specs: Dict, state: Optional[Dict] = None) -> str:
    """Per-site quant configuration + calibrated scale ranges — the functional
    ``extra_repr`` (ref: quant_utils.py:297-314)."""
    lines = [f"{'site':24s} {'W':>4s} {'A':>10s} {'transform':>12s} {'act scale':>18s}"]
    for name in sorted(specs):
        s = specs[name]
        a = ("-" if s.a_bits is None else
             f"a{s.a_bits}{'s' if s.a_static else 'd'}{'' if s.a_symmetric else 'z'}")
        tr = []
        if s.online_had:
            tr.append(f"had:{s.online_had}")
        if s.split:
            tr.append("split")
        sc = ""
        st = (state or {}).get(name, {})
        if st and st.get("act") is not None:
            scale = np.asarray(st["act"].scale)
            sc = (f"{scale.min():.2e}" if scale.size == 1
                  else f"{scale.min():.2e}..{scale.max():.2e}")
        w = "-" if s.w_bits is None else f"w{s.w_bits}"
        lines.append(f"{name:24s} {w:>4s} {a:>10s} {','.join(tr) or '-':>12s} {sc:>18s}")
    return "\n".join(lines)


def quant_error_report(fam, cfg, params_fp: Dict, params_q: Dict, batch: dict,
                       specs: Dict, state: Optional[Dict] = None) -> Dict[str, float]:
    """End-to-end quantization-error attribution: logit error with quantization
    enabled per-subsystem (vision-only, llm-only, all) — directly measures the
    MSQ decomposition."""
    kwargs = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}

    def run(p, sp, mode):
        out, _, _ = fam.forward_fn(cfg, p, batch["tokens"], batch.get("patches"),
                                   specs=sp, state=state, mode=mode, **kwargs)
        return out

    ref = run(params_fp, None, "fp")
    out = {}
    for label, pred in (("visual_only", lambda k: not k.startswith("llm.")),
                        ("llm_only", lambda k: k.startswith("llm.")),
                        ("all", lambda k: True)):
        sp = {k: v for k, v in specs.items() if pred(k)}
        y = run(params_q, sp, "fake")
        out[label] = float(jnp.linalg.norm(y - ref) / (jnp.linalg.norm(ref) + 1e-9))
    return out
