"""Static activation calibration (MSQ) as a jitted reduction.

Functional replacement of the reference's 3-phase hook state machine
(``calibrate → last_calibrate → quant``, ref: fake_quant/quant_utils.py:678-720 +
calib drivers :1079-1129). Here:

  phase 1  ``calibration_step`` — ONE jitted forward returning a stats pytree
           (per-site ObserverStats, per-layer-stacked), folded over batches with
           ``merge`` (the reference's ``calibrate`` loop);
  phase 2  ``finalize_state``  — stats (+ optional final-batch samples for
           omse/ptf) → static QuantParams per site (``last_calibrate``);
  phase 3  pass the resulting ``state`` to the model with mode="fake"/"real"
           (``quant``).

Because the whole phase-1 step is one compiled function, calibration over real
multimodal prompts runs at inference speed — and the MSQ property (separate
vision / projector / LLM scale sets) falls out of the site namespacing
(``vis.* / merger.* / llm.*``) rather than module-tree surgery.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.formats import get_format
from ..core import quant as Q
from ..observe import observers as O
from ..models.layers import SiteSpec


def merge_stats(
    specs: Dict[str, SiteSpec],
    running: Optional[Dict[str, O.ObserverStats]],
    batch: Dict[str, O.ObserverStats],
) -> Dict[str, O.ObserverStats]:
    """Fold one batch's (possibly layer-stacked) stats into the running stats."""
    if running is None:
        return batch
    out = dict(running)
    for name, b in batch.items():
        a = running.get(name)
        if a is None:
            out[name] = b
            continue
        spec = specs[name.removesuffix("#out")].observer_spec()
        out[name] = O.merge(spec, a, b)
    return out


def finalize_state(
    specs: Dict[str, SiteSpec],
    stats: Dict[str, O.ObserverStats],
    samples: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, Dict[str, Q.QuantParams]]:
    """Stats → static quant state {site: {"act": QuantParams}}.

    Layer-stacked stats (leading L axis) finalize elementwise (minmax/ema/
    percentile) or via vmap over layers (omse/ptf, which need samples)."""
    state: Dict[str, Dict[str, Q.QuantParams]] = {}
    for name, st in stats.items():
        base = name.removesuffix("#out")
        spec = specs[base]
        bits = spec.out_bits if name.endswith("#out") else spec.a_bits
        if bits is None:
            continue
        fmt = get_format(bits, signed=spec.a_symmetric)
        ospec = spec.observer_spec()
        needs_sample = ospec.kind in ("omse", "ptf")
        sample = (samples or {}).get(name) if needs_sample else None
        stacked = st.n.ndim > 0  # per-layer stacked stats
        if stacked:
            if needs_sample:
                if sample is None:
                    raise ValueError(f"{name}: {ospec.kind} requires samples")
                qp = jax.vmap(lambda s, x: O.finalize(ospec, s, fmt, x))(st, sample)
            else:
                qp = jax.vmap(lambda s: O.finalize(ospec, s, fmt))(st)
        else:
            qp = O.finalize(ospec, st, fmt, sample)
        key = "out" if name.endswith("#out") else "act"
        state.setdefault(base, {})[key] = qp
    return state


def calibrate(
    forward_with_stats: Callable[..., Tuple[Any, Tuple[Dict, Dict]]],
    batches: Iterable[tuple],
    specs: Dict[str, SiteSpec],
) -> Dict[str, Dict[str, Q.QuantParams]]:
    """Generic calibration loop.

    ``forward_with_stats(*batch, collect_samples=bool)`` must return
    ``(_, (stats, samples))`` — e.g. a partial of ``qwen2vl_forward`` with
    mode="calib", collect_stats=True. The final batch also collects raw samples
    for omse/ptf (the reference's ``last_calibrate`` batch,
    ref: quant_utils.py:1096-1100).
    """
    batches = list(batches)
    needs_samples = any(s.observer in ("omse", "ptf") for s in specs.values())
    running: Optional[Dict] = None
    samples = None
    for i, b in enumerate(batches):
        last = i == len(batches) - 1
        _, (stats, smp) = forward_with_stats(
            *b, collect_samples=last and needs_samples)
        running = merge_stats(specs, running, stats)
        if last and needs_samples:
            samples = smp
    return finalize_state(specs, running or {}, samples)
