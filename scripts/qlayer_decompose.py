"""Full quantized-layer prefill probe at 7B dims: chained _layer_step in one
jit, with ablations, to locate the W4A8 TTFT overhead vs the pure-int8-GEMM
floor. Run on the TPU."""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.models import layers as L  # noqa: E402
from mquant_tpu.models import llm as M  # noqa: E402

T = int(os.environ.get("BENCH_T", "1024"))
CHAIN = int(os.environ.get("BENCH_CHAIN", "16"))
cfg = B.make_cfg(1, intermediate_pad=0)
key = jax.random.key(0)


def build():
    params, state = B.init_w4a8_on_device(cfg, key)
    lp = jax.tree.map(lambda x: x[0], params["layers"])
    lstate = {k: jax.tree.map(lambda x: x[0], v) for k, v in state.items()
              if k.startswith("llm.") and not k.endswith("lm_head")}
    return lp, lstate


def bench(label, specs, lp, lstate, mode="real"):
    pos = jnp.arange(T)[None]
    cos, sin = M.rope_tables(cfg, pos, jnp.float32)

    @jax.jit
    def f(lp, lstate, h):
        def body(i, h):
            out, _ = M._layer_step(cfg, specs, mode, h, lp, lstate, None,
                                   None, cos, sin, None, None,
                                   prefill_fresh=False)
            return out.astype(h.dtype)

        return jax.lax.fori_loop(0, CHAIN, body, h).ravel()[:8]

    hs = [jax.random.normal(jax.random.fold_in(key, 50 + i), (1, T, cfg.hidden),
                            jnp.bfloat16) for i in range(4)]
    r = f(lp, lstate, hs[0])
    _ = np.asarray(r).ravel()[0]
    ts = []
    for h in hs[1:]:
        t0 = time.perf_counter()
        r = f(lp, lstate, h)
        _ = np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / CHAIN
    print(f"{label}: {dt*1e3:.3f} ms/layer", flush=True)
    return dt


def main():
    print(f"T={T} chain={CHAIN} inter={cfg.inter_eff}", flush=True)
    lp, lstate = build()

    full = B.llm_specs(lm_head_bits=None)
    bench("w4a8 full (had down, static)", full, lp, lstate)

    nohad = dict(full)
    nohad["llm.down"] = dataclasses.replace(full["llm.down"], online_had=None)
    bench("w4a8 no online hadamard     ", nohad, lp, lstate)

    dyn = {k: dataclasses.replace(v, a_static=False) for k, v in full.items()}
    bench("w4a8 dynamic act scales     ", dyn, lp, lstate)

    # bf16 floor for the same layer (fp mode needs 'w'; dequantize once)
    lp_f = {}
    for k, v in lp.items():
        if isinstance(v, dict) and "w_q" in v:
            lp_f[k] = {"w": (v["w_q"].astype(jnp.float32)
                             * v["w_scale"][None]).astype(jnp.bfloat16),
                       "b": v.get("b")}
        else:
            lp_f[k] = v
    bench("bf16 layer                  ", {}, lp_f, None, mode="fp")


if __name__ == "__main__":
    main()
