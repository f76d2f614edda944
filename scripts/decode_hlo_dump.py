"""Dump the optimized HLO of the flagship fused decode loop and report:
  - copy/fusion ops touching weight-stack-sized buffers inside the while body
  - total bytes-accessed cost analysis vs the modeled weight stream
Ground truth for where the decode step's HBM traffic actually goes
(microbenches on the tunneled dev chip are too noisy to attribute ~20%%
effects; the compiled program is not).

env: DEPTH (28), PREF (1024), GEMV (pallas_w4), HEAD (4), OUT (hlo path)
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MQUANT_GEMV", os.environ.get("GEMV", "pallas_w4"))
os.environ.setdefault("MQUANT_BENCH_HEAD", os.environ.get("HEAD", "4"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.argv = ["x"]
import bench as B  # noqa: E402
from mquant_tpu.serve.generate import Generator  # noqa: E402
from mquant_tpu.transform.hadamard import auto_pad_size  # noqa: E402

DEPTH = int(os.environ.get("DEPTH", "28"))
PREF = int(os.environ.get("PREF", "1024"))
BATCH = int(os.environ.get("BATCH", "1"))  # B>1: the batched decode step
OUT = os.environ.get("OUT", "/tmp/decode_n.hlo")


def main():
    key = jax.random.key(0)
    pad = auto_pad_size(B.make_cfg(DEPTH).intermediate)
    cfg = B.make_cfg(DEPTH, intermediate_pad=pad)
    params, state = B.init_w4a8_on_device(cfg, key)
    gen = Generator(cfg, params, specs=B.llm_specs(), state=state,
                    mode="real", max_len=PREF + 128, batch=BATCH)
    toks = jnp.ones((BATCH, PREF), jnp.int32)
    logits, cache = gen.prefill(toks)
    tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
    dec = gen._decode_n(128)
    compiled = dec.lower(gen.params, tok, cache).compile()
    txt = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"wrote {OUT} ({len(txt)/1e6:.1f} MB)")
    for k in sorted(ca):
        if "bytes" in k and ca[k] > 1e6:
            print(f"  cost[{k}] = {ca[k]/1e9:.3f} GB")

    # big buffers being copied / materialized inside the program
    sizes = []
    for m in re.finditer(r"(\w+)\s+(s8|s4|u8|s32|bf16|f32)\[([\d,]+)\][^=]*= "
                         r"(copy|fusion|dynamic-slice)\(", txt):
        dims = [int(d) for d in m.group(3).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        bytesz = n * {"s8": 1, "u8": 1, "s4": 0.5, "s32": 4, "bf16": 2,
                      "f32": 4}[m.group(2)]
        if bytesz >= 4 * 2**20:
            sizes.append((bytesz, m.group(4), m.group(2), m.group(3)))
    sizes.sort(reverse=True)
    print("large (>=4MB) copy/fusion/dyn-slice results:")
    for b, kind, dt, shape in sizes[:40]:
        print(f"  {b/2**20:8.1f} MB  {kind:13s} {dt}[{shape}]")


if __name__ == "__main__":
    main()
