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


def inject_outliers(params, channels, act_mag, key):
    """Massive-activation channels: scale a few hidden channels of the
    embedding + every down_proj output column → the residual stream carries
    relative channel outliers that survive RMSNorm (the distributions MQuant's
    rotation exists to suppress)."""
    p = jax.tree.map(lambda x: x, params)
    llm = dict(p["llm"])
    emb = llm["embed"]["w"]
    scale = jnp.ones((emb.shape[1],), emb.dtype).at[jnp.asarray(channels)].set(act_mag)
    llm["embed"] = {"w": emb * scale[None, :]}
    layers = dict(llm["layers"])
    down = dict(layers["down"])
    down["w"] = down["w"] * scale[None, None, :]
    o = dict(layers["o"])
    o["w"] = o["w"] * scale[None, None, :]
    layers["down"], layers["o"] = down, o
    llm["layers"] = layers
    p["llm"] = llm
    return p


def _fwd(fam, cfg, p, batch, specs=None, state=None, mode="fp"):
    kw = {k: v for k, v in batch.items() if k not in ("tokens", "patches")}
    logits, _, _ = fam.forward_fn(cfg, p, batch["tokens"], batch["patches"],
                                  specs=specs, state=state, mode=mode, **kw)
    return logits


def ppl_ratio(fam, cfg, params, held, p_q, specs, state):
    ds = []
    for b in held:
        lf = _fwd(fam, cfg, params, b)
        lq = _fwd(fam, cfg, p_q, b, specs, state, mode="fake")
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
    hidden = params["llm"]["embed"]["w"].shape[1]
    print(f"hidden={hidden}")

    for act_mag in (10.0, 25.0, 50.0):
        chans = [3, hidden // 2, hidden - 5]
        p_out = inject_outliers(params, chans, act_mag, jax.random.key(9))
        for rotate in (False, True):
            q = QuantizeConfig(calib_num=16, nsamples=8, visual_w_bits=8,
                               llm_w_bits=4, rotate=rotate)
            _, pq, st, sp, _ = run_pipeline(
                fam.name, q, params=jax.tree.map(lambda x: x, p_out),
                cfg=cfg, calib_batches=calib)
            r = ppl_ratio(fam, cfg, p_out, held, pq, sp, st)
            print(f"act_mag={act_mag} rotate={rotate}: ppl ratio {r:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
