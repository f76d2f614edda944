"""Full-scale GPTQ feasibility: stage-sequential GPTQ over a REAL-dims
Qwen2-VL-7B decoder (28 layers, random bf16 weights) on one chip, with the
layer weights HOST-STREAMED (stream_from_host=True): fully-resident bf16 7B
weights + the 18944^2 Hessian/factor exceed the 16 GB HBM (measured OOM), so
each layer lives on device only while being quantized, and the finished
layers are realized to int8 serving storage ON DEVICE (realize_on_device) —
no device->host weight traffic (which this dev tunnel does at ~1-4 MB/s; a
real host does it at PCIe speed, but the realize path makes it moot).

Validates what tiny-config tests cannot: compile behavior, HBM headroom and
wall-clock at production shapes.

Measured on v5e (2026-08-17): 28 layers x 7 sites in 21 min wall (contended
host; uncontended layers ran ~14 s each => ~7 min steady), first layer incl.
all compiles 22 s, ZERO Cholesky fallbacks; output = stacked int8 w_q/w_scale
resident on the chip, ready for the serving path.

Run: python scripts/ptq_7b_e2e.py
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
    import ml_dtypes

    cfg = B.make_cfg(28, intermediate_pad=0)
    key = jax.random.key(0)
    print(f"init 7B decoder layers in HOST memory (bf16, {cfg.n_layers} "
          f"layers)...", flush=True)
    rng = np.random.default_rng(0)
    L, Hd, I = cfg.n_layers, cfg.hidden, cfg.inter_eff
    Hh, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    # this image's numpy is an unoptimized build (RNG ~10M draws/s, LAPACK
    # reference-speed): bulk-generate by tiling one pre-converted random
    # block — memcpy-speed, statistically irrelevant for a timing demo
    blk = rng.standard_normal(1 << 16).astype(np.float32) * 0.02
    blk16 = (blk.view(np.uint32) >> 16).astype(np.uint16)

    def w(i, o):
        return np.resize(blk16, (L, i, o)).view(ml_dtypes.bfloat16)

    t_init = time.perf_counter()
    ones = np.ones((L, Hd), ml_dtypes.bfloat16)
    params = {"layers": {
        "ln1": {"w": ones},
        "q": {"w": w(Hd, Hh * hd), "b": np.zeros((L, Hh * hd), ml_dtypes.bfloat16)},
        "k": {"w": w(Hd, KV * hd), "b": np.zeros((L, KV * hd), ml_dtypes.bfloat16)},
        "v": {"w": w(Hd, KV * hd), "b": np.zeros((L, KV * hd), ml_dtypes.bfloat16)},
        "o": {"w": w(Hh * hd, Hd), "b": None},
        "ln2": {"w": ones.copy()},
        "gate": {"w": w(Hd, I), "b": None},
        "up": {"w": w(Hd, I), "b": None},
        "down": {"w": w(I, Hd), "b": None},
    }}
    print(f"host init done in {time.perf_counter() - t_init:.0f}s", flush=True)
    specs = B.llm_specs(lm_head_bits=None)
    embeds = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                                (1, T, cfg.hidden), jnp.bfloat16) * 0.02
              for i in range(N_BATCHES)]
    jax.block_until_ready(embeds)
    print("embeds on device; starting GPTQ", flush=True)

    times = []

    def progress(l, n):
        times.append(time.perf_counter())
        if len(times) > 1:
            print(f"layer {l + 1}/{n}: {times[-1] - times[-2]:.1f}s", flush=True)

    t0 = time.perf_counter()
    times.append(t0)
    params, report = gptq_quantize_decoder(
        cfg, params, embeds, specs, gcfg=GPTQConfig(act_order=False),
        progress=progress, stream_from_host=True,
        realize_on_device=True)
    total = time.perf_counter() - t0
    per_layer = [b - a for a, b in zip(times[1:-1], times[2:])]
    print(f"\nGPTQ over {cfg.n_layers} layers x 7 sites: {total/60:.1f} min "
          f"total; steady per-layer {np.median(per_layer):.1f}s "
          f"(first-layer incl. compile {times[2]-times[1]:.1f}s); "
          f"fallbacks: {report['fallbacks'] or 'none'}", flush=True)
    wq = params["layers"]["down"]["w_q"]
    print(f"servable int8 storage on device: down w_q {wq.shape} {wq.dtype}; "
          f"scale finite: "
          f"{bool(jnp.all(jnp.isfinite(params['layers']['down']['w_scale'])))}",
          flush=True)


if __name__ == "__main__":
    main()
