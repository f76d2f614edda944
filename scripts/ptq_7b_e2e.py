"""Full-scale GPTQ feasibility: stage-sequential GPTQ over a REAL-dims
Qwen2-VL-7B decoder (28 layers, random bf16 weights) on one chip, with
layer-streamed Hessians and the blocked on-device factorization.

Validates what tiny-config tests cannot: compile behavior, HBM headroom and
wall-clock at production shapes. Run: python scripts/ptq_7b_e2e.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.gptq.driver import GPTQConfig, gptq_quantize_decoder  # noqa: E402

N_BATCHES = int(os.environ.get("NSAMPLES_BATCHES", "2"))
T = int(os.environ.get("CALIB_T", "512"))


def main():
    cfg = B.make_cfg(28, intermediate_pad=0)
    key = jax.random.key(0)
    print(f"init 7B decoder (bf16, {cfg.n_layers} layers)...", flush=True)
    params = B.init_bf16_on_device(cfg, key)
    specs = B.llm_specs(lm_head_bits=None)
    embeds = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                                (1, T, cfg.hidden), jnp.bfloat16) * 0.02
              for i in range(N_BATCHES)]

    times = []

    def progress(l, n):
        times.append(time.perf_counter())
        if len(times) > 1:
            print(f"layer {l + 1}/{n}: {times[-1] - times[-2]:.1f}s", flush=True)

    t0 = time.perf_counter()
    times.append(t0)
    params, report = gptq_quantize_decoder(
        cfg, params, embeds, specs, gcfg=GPTQConfig(act_order=False),
        progress=progress)
    total = time.perf_counter() - t0
    per_layer = [b - a for a, b in zip(times[1:-1], times[2:])]
    print(f"\nGPTQ over {cfg.n_layers} layers x 7 sites: {total/60:.1f} min "
          f"total; steady per-layer {np.median(per_layer):.1f}s "
          f"(first-layer incl. compile {times[2]-times[1]:.1f}s); "
          f"fallbacks: {report['fallbacks'] or 'none'}", flush=True)
    w = jax.tree.leaves(params["layers"])[0]
    print("finite:", bool(jnp.all(jnp.isfinite(
        params["layers"]["down"]["w"].astype(jnp.float32)))), flush=True)


if __name__ == "__main__":
    main()
