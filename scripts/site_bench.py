"""Single-site chained benchmark: one 3584→19968 qlinear in all quant modes,
isolating matmul + act-quant + dequant overheads. Chained in one jit with a
projection back to the input width so iterations are data-dependent."""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mquant_tpu.core.quant import QuantParams
from mquant_tpu.kernels import qmm as KQ
from mquant_tpu.models.layers import SiteSpec, qlinear

M, K, N = int(os.environ.get("BM", "1024")), 3584, 19968
CHAIN = int(os.environ.get("BCHAIN", "32"))
key = jax.random.key(0)
back = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.01  # chain projection


def bench(label, step_fn, p):
    @jax.jit
    def f(p, x):
        def body(i, x):
            y = step_fn(p, x)  # (M, N)
            return jnp.dot(y.astype(jnp.bfloat16), back,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, CHAIN, body, x)

    xs = [jax.random.normal(jax.random.fold_in(key, 7 + i), (M, K), jnp.bfloat16)
          for i in range(4)]
    r = f(p, xs[0])
    _ = np.asarray(r[:1, :1])
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        r = f(p, x)
        _ = np.asarray(r[:1, :1])
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / CHAIN
    # subtract nothing; the back-projection (N→K) costs ~K/N of the main GEMM
    print(f"{label}: {dt*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    w_bf = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
    bench("bf16", lambda p, x: x @ p["w"], {"w": w_bf})

    spec8 = SiteSpec(w_bits=8, a_bits=8, a_static=True)
    st = {"act": QuantParams(scale=jnp.float32(0.05))}
    p8 = dict(KQ.quantize_weights_real(w_bf.astype(jnp.float32), 8))
    bench("w8a8 static", lambda p, x: KQ.quantized_matmul(x, p, spec8, st), p8)
    spec8d = SiteSpec(w_bits=8, a_bits=8, a_static=False)
    bench("w8a8 dyn-act", lambda p, x: KQ.quantized_matmul(x, p, spec8d, None), p8)

    spec4 = SiteSpec(w_bits=4, a_bits=8, a_static=True)
    p4 = dict(KQ.quantize_weights_real(w_bf.astype(jnp.float32), 4))
    bench("w4a8 pallas", lambda p, x: KQ.quantized_matmul(x, p, spec4, st), p4)
    os.environ["MQUANT_DISABLE_PALLAS"] = "1"
    bench("w4a8 xla", lambda p, x: KQ.quantized_matmul(x, p, spec4, st), p4)
    os.environ.pop("MQUANT_DISABLE_PALLAS")
    # pallas tile variants
    for tm, tn, tk in ((512, 512, 512), (256, 1024, 512), (256, 512, 896),
                       (512, 1024, 896), (128, 2048, 448)):
        def step(p, x, tm=tm, tn=tn, tk=tk):
            _aq = KQ._act_int8(x, spec4, st); xq, xsc = _aq.q, _aq.scale
            return KQ._qmm_pallas_w4(xq, xsc, p, jnp.bfloat16, tm=tm, tn=tn, tk=tk)

        bench(f"w4a8 pallas t=({tm},{tn},{tk})", step, p4)
