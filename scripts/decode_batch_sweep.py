"""Batched-decode scaling sweep: step time vs batch width.

The B=1 decode loop runs at ~620 GB/s (77% of HBM peak) streaming weights;
the pooled roofline shows B=8 at only ~37% — the weights amortize over 8
tokens but the measured step takes ~2x as long as B=1 instead of the ~5%
the extra KV reads explain. This sweep isolates where the scaling breaks:
for each B it measures the fused decode loop's per-step time and prints the
modeled bytes (weights + KV at the true buffer length), achieved GB/s, and
the ratio to the B=1 step.

Run on the TPU: python scripts/decode_batch_sweep.py [depth]
Env: MQUANT_SWEEP_BS=1,2,4,8  MQUANT_GEMV=pallas_w4 (bench default)
"""

import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    os.environ.setdefault("MQUANT_GEMV", "pallas_w4")
    os.environ.setdefault("MQUANT_BENCH_HEAD", "8")
    bs = [int(b) for b in os.environ.get("MQUANT_SWEEP_BS", "1,2,4,8").split(",")]
    sys.argv = ["x"]
    import bench as B

    from mquant_tpu.serve.generate import Generator, measure_decode_tps
    from mquant_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    cfg = B.make_cfg(depth)
    key = jax.random.key(0)
    params, state = B.init_w4a8_on_device(cfg, key)

    Tpre, gen_n = 512, 64
    max_len = Tpre + 128
    rows = []
    step1 = None
    for b in bs:
        gen = Generator(cfg, params, specs=B.llm_specs(), state=state,
                        mode="real", max_len=max_len, batch=b)
        toks = jnp.ones((b, Tpre), jnp.int32)
        tps = measure_decode_tps(gen, toks, n_tokens=gen_n, on_device=True)
        step_ms = b / tps * 1e3
        rl = B.pooled_roofline(cfg, tps, b, s_attn=max_len)
        if step1 is None:
            step1 = step_ms
        row = {"B": b, "tok_s": round(tps, 1), "step_ms": round(step_ms, 3),
               "step_vs_B1": round(step_ms / step1, 3),
               "achieved_gbps": rl["achieved_gbps"],
               "bw_frac": rl["bw_frac"],
               "bytes_per_step_mb": rl["bytes_per_step_mb"]}
        rows.append(row)
        log(row)
        del gen
        gc.collect()

    print(json.dumps({"depth": depth, "prefill": Tpre, "max_len": max_len,
                      "gemv": os.environ["MQUANT_GEMV"], "rows": rows}))


if __name__ == "__main__":
    main()
