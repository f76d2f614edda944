"""Tune the outlier-stress quality proxy: find injection magnitudes where
W4A8 WITHOUT rotation blows the <1% gate but the full method rescues it.
CPU-only experiment (run with the test env)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
for _k in [k for k in os.environ
           if k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU"))]:
    del os.environ[_k]

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
# already latched — override post-import like tests/conftest.py does
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mquant_tpu.models.registry import get_family
from mquant_tpu.pipeline import (QuantizeConfig, run_pipeline,
                                 synthetic_calib_batches)


def inject_glu_spikes(params, channels, mag):
    """GLU intermediate spikes — the distribution the ONLINE Hadamard exists
    to suppress (huge down_proj-input channels, LLaMA-family 'massive
    activation' spikes). Scale a few ``up`` columns by M and the matching
    ``down`` rows by 1/M: swiglu(g,u)=silu(g)·u is LINEAR in u, so the fp
    function is EXACTLY unchanged — but the down_proj input now carries
    token-varying channels M× the rest, with no normalization in between.
    A static per-tensor int8 scale is then set by the spike and the
    informative channels get ~127/M levels — unless the online Hadamard
    spreads the spike's energy across the width first."""
    p = jax.tree.map(lambda x: x, params)
    llm = dict(p["llm"])
    lay = dict(llm["layers"])
    up, down = dict(lay["up"]), dict(lay["down"])
    inter = up["w"].shape[-1]
    s = jnp.ones((inter,), up["w"].dtype).at[jnp.asarray(channels)].set(mag)
    up["w"] = up["w"] * s[None, None, :]
    down["w"] = down["w"] / s[None, :, None]
    lay["up"], lay["down"] = up, down
    llm["layers"] = lay
    p["llm"] = llm
    return p


def _fwd(fam, cfg, p, batch, specs=None, state=None, mode="fp"):
    kw = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    logits, _, _ = fam.forward_fn(cfg, p, batch["tokens"], batch["patches"],
                                  specs=specs, state=state, mode=mode, **kw)
    return logits


def ppl_ratio(fam, cfg, params, held, p_q, specs, state, cfg_q=None):
    ds = []
    for b in held:
        lf = _fwd(fam, cfg, params, b)
        lq = _fwd(fam, cfg_q or cfg, p_q, b, specs, state, mode="fake")
        pf = jax.nn.softmax(lf, -1)
        ce_q = -jnp.sum(pf * jax.nn.log_softmax(lq, -1), -1)
        ce_f = -jnp.sum(pf * jax.nn.log_softmax(lf, -1), -1)
        ds.append(float(jnp.mean(ce_q - ce_f)))
    return float(np.exp(np.mean(ds)))


def main():
    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    params = fam.init_fn(cfg, jax.random.key(0))
    calib = synthetic_calib_batches(fam, cfg, 2, jax.random.key(5))
    held = synthetic_calib_batches(fam, cfg, 2, jax.random.key(77))
    inter = params["llm"]["layers"]["up"]["w"].shape[-1]
    print(f"inter={inter}")

    for mag in (10.0, 100.0, 1000.0):
        chans = [3, inter // 2, inter - 5]
        p_out = inject_glu_spikes(params, chans, mag)
        for variant, kw in (
            ("bare", dict(rotate=False)),
            ("full", dict(rotate=True, online_had_mode="full")),
            ("block", dict(rotate=True, online_had_mode="block")),
        ):
            q = QuantizeConfig(calib_num=16, nsamples=8, visual_w_bits=8,
                               llm_w_bits=4, **kw)
            cfg_q, pq, st, sp, _ = run_pipeline(
                fam.name, q, params=jax.tree.map(lambda x: x, p_out),
                cfg=cfg, calib_batches=calib)
            r = ppl_ratio(fam, cfg, p_out, held, pq, sp, st, cfg_q=cfg_q)
            print(f"mag={mag} {variant}: ppl ratio {r:.4f}", flush=True)


if __name__ == "__main__":
    main()
