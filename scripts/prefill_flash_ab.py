"""A/B: einsum vs Pallas flash attention for the T=1024 prefill.

The prefill decomposition (scripts/prefill_decompose.py) shows attention is
the largest non-GEMM slice of a prefill layer at T=1024 — the einsum path
materializes the (H, T, T) f32 logits (117 MB at 7B dims) and computes the
masked upper triangle it throws away. The flash kernel does neither, but its
crossover had only been measured at T=4096 (round 2: −23.4% TTFT). This
measures chained model-level TTFT at T=1024 for both paths by flipping
MQUANT_FLASH_MIN_T (models/layers.py:373).

Run on the TPU: python scripts/prefill_flash_ab.py [depth]
"""

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
    sys.argv = ["x"]
    import bench as B

    from mquant_tpu.serve.generate import Generator, measure_ttft_chained
    from mquant_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    cfg = B.make_cfg(depth)
    key = jax.random.key(0)
    log("init_w4a8_on_device ...")
    params, state = B.init_w4a8_on_device(cfg, key)
    log("init done")
    toks = jnp.ones((1, B.PREFILL), jnp.int32)

    out = {"depth": depth, "T": B.PREFILL}
    for label, min_t in (("einsum", "999999"), ("flash", "1024")):
        os.environ["MQUANT_FLASH_MIN_T"] = min_t
        gen = Generator(cfg, params, specs=B.llm_specs(), state=state,
                        mode="real", max_len=B.MAX_LEN, batch=1)
        log(f"measuring {label} ...")
        t = measure_ttft_chained(gen, toks, chain=16)
        log(f"  {label:8s} (MQUANT_FLASH_MIN_T={min_t}): TTFT {t*1e3:.2f} ms")
        out[f"ttft_ms_{label}"] = round(t * 1e3, 2)
        del gen

    out["flash_delta_pct"] = round(
        (out["ttft_ms_flash"] / out["ttft_ms_einsum"] - 1) * 100, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
