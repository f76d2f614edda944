"""MODEL-LEVEL decode-step attribution at the flagship serving config:
depth-28 w4a8, packed-W4 resident (pallas_w4 GEMV), prefill 1024, 128-step
fused decode loop — the exact bench.py path. Unlike the per-layer microbench
(scripts/decode_layer_ablate.py), this measures segments inside the real
``decode_n`` while/fori loop, so it captures what XLA's scheduler actually
overlaps.

Segments are removed by monkeypatching the layer library BEFORE tracing:
  full       — production path
  no_attn    — attention returns q (skips qK^T/softmax/pV, keeps GEMV shapes)
  no_norms   — rms_norm → identity
  no_rope    — rope application skipped
  no_head    — lm_head GEMV replaced by zeros (argmax → token 0)
  gemv_floor — all of the above off: embed + 7 GEMVs/layer + residuals + loop

Differences vs "full" attribute model-level cost; the gap between gemv_floor
and the modeled weight-streaming bound is kernel/loop overhead.

env: DEPTH (28), PREF (1024), NTOK (128), GEMV (pallas_w4)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MQUANT_GEMV", os.environ.get("GEMV", "pallas_w4"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.models import layers as L  # noqa: E402
from mquant_tpu.models import llm as M  # noqa: E402
from mquant_tpu.serve.generate import (  # noqa: E402
    Generator, measure_decode_tps)
from mquant_tpu.transform.hadamard import auto_pad_size  # noqa: E402

DEPTH = int(os.environ.get("DEPTH", "28"))
PREF = int(os.environ.get("PREF", "1024"))
NTOK = int(os.environ.get("NTOK", "128"))

_orig = {
    "attention": L.attention,
    "rms_norm": L.rms_norm,
    "apply_rope": L.apply_rope,
    "qlinear": M.qlinear,
}


def patch(no_attn=False, no_norms=False, no_rope=False, no_head=False):
    L.attention = _orig["attention"]
    L.rms_norm = _orig["rms_norm"]
    L.apply_rope = _orig["apply_rope"]
    M.qlinear = _orig["qlinear"]
    if no_attn:
        def attention(q, k, v, mask=None, scale=None, causal=False):
            return q
        L.attention = attention
    if no_norms:
        L.rms_norm = lambda x, w, eps=1e-6: x
    if no_rope:
        L.apply_rope = lambda q, k, cos, sin: (q, k)
    if no_head:
        def qlinear(x, p, name, spec=None, state=None, mode="fp", tape=None):
            if name == "llm.lm_head":
                n = (p["w_q"].shape[-1] if "w_q" in p else p["w"].shape[-1])
                return jnp.zeros(x.shape[:-1] + (n,), x.dtype)
            return _orig["qlinear"](x, p, name, spec, state, mode, tape)
        M.qlinear = qlinear
    # llm.py binds these at module import; rebind the names it uses
    M.L.attention = L.attention
    M.L.rms_norm = L.rms_norm
    M.L.apply_rope = L.apply_rope


VARIANTS = {
    "full": {},
    "no_attn": {"no_attn": True},
    "no_norms": {"no_norms": True},
    "no_rope": {"no_rope": True},
    "no_head": {"no_head": True},
    "gemv_floor": {"no_attn": True, "no_norms": True, "no_rope": True,
                   "no_head": True},
}


def main():
    key = jax.random.key(0)
    pad = auto_pad_size(B.make_cfg(DEPTH).intermediate)
    cfg = B.make_cfg(DEPTH, intermediate_pad=pad)
    params, state = B.init_w4a8_on_device(cfg, key)
    toks = jnp.ones((1, PREF), jnp.int32)
    print(f"backend={jax.default_backend()} gemv={os.environ['MQUANT_GEMV']}"
          f" depth={DEPTH} prefill={PREF} ntok={NTOK}", flush=True)
    base_ms = None
    for name, kw in VARIANTS.items():
        patch(**kw)
        gen = Generator(cfg, params, specs=B.llm_specs(), state=state,
                        mode="real", max_len=PREF + NTOK, batch=1)
        tps = measure_decode_tps(gen, toks, n_tokens=NTOK, on_device=True)
        ms = 1e3 / tps
        if name == "full":
            base_ms = ms
            print(f"  {name:10s}: {tps:7.1f} tok/s  {ms:6.2f} ms/step", flush=True)
        else:
            print(f"  {name:10s}: {tps:7.1f} tok/s  {ms:6.2f} ms/step  "
                  f"(saves {base_ms - ms:+.2f} ms)", flush=True)
        del gen
    patch()


if __name__ == "__main__":
    main()
