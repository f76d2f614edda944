"""Probe: does the I (x) H_128 block-Hadamard default survive ADVERSARIAL
outlier placement (spikes correlated within one 128-block), or does only the
full-width transform rescue those?

Patterns (all exactly function-preserving via the up-col/down-row trick):
  single   — one spiked channel (the existing stress test's case)
  inblock  — k spiked channels, all inside ONE 128-block
  dense    — every channel of ONE block spiked with random signs
  spread   — k spiked channels spread across different blocks (control)

For each: ppl-degradation ratio under bare / block / full W4A8.
env: MAG (300), K (8), INTER (512), LAYERS (4)
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from mquant_tpu.models.registry import get_family
from mquant_tpu.pipeline import QuantizeConfig, run_pipeline, synthetic_calib_batches
from test_outlier_stress import _fwd, ppl_ratio

MAG = float(os.environ.get("MAG", "300"))
K = int(os.environ.get("K", "8"))
INTER = int(os.environ.get("INTER", "512"))
LAYERS = int(os.environ.get("LAYERS", "4"))


def inject_channels(params, channels, mags):
    p = jax.tree.map(lambda x: x, params)
    llm = dict(p["llm"])
    lay = dict(llm["layers"])
    up, down = dict(lay["up"]), dict(lay["down"])
    inter = up["w"].shape[-1]
    s = np.ones((inter,), np.float32)
    for c, m in zip(channels, mags):
        s[c] = m
    s = jnp.asarray(s, up["w"].dtype)
    up["w"] = up["w"] * s[None, None, :]
    down["w"] = down["w"] / s[None, :, None]
    lay["up"], lay["down"] = up, down
    llm["layers"] = lay
    p["llm"] = llm
    return p


def patterns(inter):
    rng = np.random.default_rng(3)
    b0 = inter // 128 // 2 * 128  # a middle block
    out = {
        "single": ([b0 + 64], [MAG]),
        "inblock": (list(b0 + rng.choice(128, K, replace=False)),
                    [MAG * s for s in rng.choice([-1, 1], K)]),
        "dense": (list(range(b0, b0 + 128)),
                  list(MAG / 4 * rng.choice([-1.0, 1.0], 128))),
        "spread": (list(rng.choice(inter // 128, min(K, inter // 128),
                                   replace=False) * 128 + 17),
                   [MAG] * min(K, inter // 128)),
    }
    return out


def main():
    fam = get_family("qwen2vl")
    cfg = fam.tiny_fn()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, n_layers=LAYERS,
                                     intermediate=INTER))
    params = fam.init_fn(cfg, jax.random.key(0))
    calib = synthetic_calib_batches(fam, cfg, 2, jax.random.key(5))
    held = synthetic_calib_batches(fam, cfg, 2, jax.random.key(77))

    for name, (chans, mags) in patterns(INTER).items():
        p_out = inject_channels(params, chans, mags)
        row = {}
        for mode, kw in (("bare", dict(rotate=False)),
                         ("block", dict(rotate=True, online_had_mode="block")),
                         ("full", dict(rotate=True, online_had_mode="full"))):
            q = QuantizeConfig(calib_num=16, nsamples=8, visual_w_bits=8,
                               llm_w_bits=4, **kw)
            cfg_q, pq, st, sp, _ = run_pipeline(
                fam.name, q, params=jax.tree.map(lambda x: x, p_out),
                cfg=cfg, calib_batches=calib)
            row[mode] = ppl_ratio(fam, cfg, p_out, held, pq, sp, st, cfg_q)
        print(f"[{name:8s}] bare {row['bare']:.4f}  block {row['block']:.4f}"
              f"  full {row['full']:.4f}", flush=True)


if __name__ == "__main__":
    main()
