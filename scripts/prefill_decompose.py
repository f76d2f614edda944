"""Prefill (TTFT) decomposition: what the non-GEMM share of a prefill layer
actually is — component microbenches vs the measured per-layer slope.

The bench reports prefill MFU as an int8-GEMM lower bound (68% in round 4).
This probe names the rest: for one decoder layer at T=1024, 7B dims, it
times each component in isolation (N reps fused in ONE jit so the tunnel's
dispatch RTT amortizes away) and compares the sum against the measured
depth slope of the real chained-prefill TTFT:

  * int8 site GEMMs  — the 7 quantized matmuls at their true shapes
  * attention        — bf16 QK^T + softmax + AV at T=1024 causal
  * online Hadamard  — the block-mode I (x) H_128 transform on the down input
  * norms/rope/quant — RMSNorm x2, RoPE apply, act quantize (VPU elementwise)

Residual = slope - sum(components): fusion wins / overlap XLA achieves that
the isolated pieces cannot show (a negative-ish residual means components
overlap inside the real layer — evidence the tail is already hidden).

Run on the TPU: python scripts/prefill_decompose.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.argv = ["x"]
import bench as B  # noqa: E402

from mquant_tpu.utils.misc import enable_compilation_cache  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


T = 1024
REPS = 32


def _fetch(x):
    """Force completion by fetching one scalar (block_until_ready does not
    wait on the tunnel backend — see serve/generate._force)."""
    import numpy as np

    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timed(name, fn, carry0, *args):
    """Per-rep time of fn with a REAL tensor carry chained through every rep
    (fn: (carry, *args) -> carry of the same pytree shape), measured as the
    slope between two chain lengths so the per-dispatch tunnel RTT cancels.

    Three hazards this harness defeats (each produced garbage in earlier
    versions of this probe):
      * scalar `y[0,0]` reductions — XLA pushes the slice through the dot
        and hoists the loop-invariant body out of the fori_loop (seven
        7B-dims GEMMs "measured" 0.002 ms);
      * `block_until_ready` — returns without waiting on the axon tunnel;
        a value must be FETCHED;
      * dispatch memoization — repeated identical (fn, args) calls return
        cached results; every trial must vary its inputs."""

    def loop_for(reps):
        @jax.jit
        def loop(c0, *a):
            def body(i, c):
                return fn(c, *a)

            out = jax.lax.fori_loop(0, reps, body, c0)
            # return ONE element per leaf: _fetch np.asarray()s the whole
            # returned array, and shipping a multi-MB carry over the ~20 MB/s
            # tunnel (0.15-1.5 s) buries the compute delta in transfer noise.
            # XLA cannot narrow the slice through the loop: every body step
            # consumes the full previous carry.
            return jax.tree.map(lambda t: t.ravel()[:1], out)

        return loop

    def vary(c, i):
        return jax.tree.map(
            lambda t: t + jnp.asarray((i % 100) + 1, jnp.int32).astype(
                t.dtype), c)

    times = {}
    for reps in (8, REPS):
        loop = loop_for(reps)
        _fetch(loop(carry0, *args))  # compile
        best = float("inf")
        for i in range(4):
            c0 = vary(carry0, 10 * reps + i)
            t0 = time.perf_counter()
            _fetch(loop(c0, *args))
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    ms = (times[REPS] - times[8]) / (REPS - 8) * 1e3
    log(f"  {name:28s} {ms:7.3f} ms  "
        f"(chain8 {times[8]*1e3:.2f} ms, chain{REPS} {times[REPS]*1e3:.2f} ms)")
    return ms


def main():
    enable_compilation_cache()
    cfg = B.make_cfg(28)
    Hd, I = cfg.hidden, cfg.inter_eff
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    key = jax.random.key(0)

    log(f"dims: hidden={Hd} inter={I} heads={H} kv={KV} hd={hd} T={T}")

    # --- component microbenches -------------------------------------------
    sites = B.site_dims(cfg)
    x8 = jax.random.randint(key, (T, Hd), -127, 128, jnp.int8)
    ws = {s: jax.random.randint(jax.random.fold_in(key, i), (a, b), -7, 8,
                                jnp.int8)
          for i, (s, (a, b)) in enumerate(sites.items())}
    xi8 = jax.random.randint(key, (T, I), -127, 128, jnp.int8)

    def gemms(carry, ws):
        # carry = (x int8 (T,Hd), xi int8 (T,I)); per-site row-max is a
        # non-factorable reduction (sum_j would fold into a GEMV: the row
        # maxes force every output column to exist), and the next rep's
        # inputs mix in those maxes so the chain is serial.
        x, xi = carry
        m = jnp.zeros((T,), jnp.int32)
        for s, w in ws.items():
            inp = xi if s == "down" else x
            y = jax.lax.dot_general(
                inp, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            m = m + jnp.max(y, axis=1)
        nx = ((x.astype(jnp.int32) + m[:, None]) % 255 - 127).astype(jnp.int8)
        nxi = ((xi.astype(jnp.int32) + m[:, None]) % 255 - 127
               ).astype(jnp.int8)
        return (nx, nxi)

    t_gemm = timed("int8 site GEMMs (x7)", gemms, (x8, xi8), ws)

    q = jax.random.normal(key, (H, T, hd), jnp.bfloat16)
    k = jax.random.normal(key, (H, T, hd), jnp.bfloat16)
    v = jax.random.normal(key, (H, T, hd), jnp.bfloat16)
    mask = jnp.tril(jnp.ones((T, T), jnp.bool_))

    def attn(q, k, v):
        s = jnp.einsum("htd,hsd->hts", q, k).astype(jnp.float32)
        s = jnp.where(mask, s / (hd ** 0.5), -1e30)
        p = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
        o = jnp.einsum("hts,hsd->htd", p, v)
        return o

    t_attn = timed("attention (QK^T+softmax+AV)",
                   lambda c, k, v: attn(c, k, v), q, k, v)

    xh = jax.random.normal(key, (T * (I // 128), 128), jnp.bfloat16)
    h128 = jnp.asarray(jax.random.orthogonal(key, 128), jnp.bfloat16)

    t_had = timed("online Hadamard (I x H128)",
                  lambda c, h: c @ h, xh, h128)

    xf = jax.random.normal(key, (T, Hd), jnp.bfloat16)
    g = jnp.ones((Hd,), jnp.bfloat16)

    gate0 = jax.random.normal(jax.random.key(1), (T, I), jnp.bfloat16)

    def norms_quant(carry, g):
        # 2 RMSNorms + 2 act quantizations + silu-mul at inter width; the
        # next rep's inputs are the previous rep's full outputs.
        x, gate = carry
        for _ in range(2):
            var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1,
                           keepdims=True)
            y = (x * jax.lax.rsqrt(var + 1e-6).astype(x.dtype)) * g
            qx = jnp.clip(jnp.round(y.astype(jnp.float32) / 0.05), -127, 127)
            x = (y + 1e-3 * qx.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        up = gate + 1.0
        act = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
        gate = (0.99 * gate.astype(jnp.float32) + 1e-3 * act
                ).astype(jnp.bfloat16)
        return (x, gate)

    t_vpu = timed("norms+quant+silu (VPU)", norms_quant, (xf, gate0), g)

    comp_sum = t_gemm + t_attn + t_had + t_vpu

    # --- measured slope of the real model ---------------------------------
    from mquant_tpu.serve.generate import Generator, measure_ttft_chained

    def ttft(L):
        c = B.make_cfg(L)
        params, state = B.init_w4a8_on_device(c, key)
        os.environ.setdefault("MQUANT_GEMV", "pallas_w4")
        gen = Generator(c, params, specs=B.llm_specs(), state=state,
                        mode="real", max_len=B.MAX_LEN, batch=1)
        toks = jnp.ones((1, B.PREFILL), jnp.int32)
        t = measure_ttft_chained(gen, toks, chain=16)
        log(f"  TTFT L={L}: {t*1e3:.2f} ms")
        del params, gen
        import gc

        gc.collect()
        return t

    t28 = ttft(28)
    t14 = ttft(14)
    slope = (t28 - t14) / 14 * 1e3
    intercept = t28 * 1e3 - 28 * slope

    # ideal GEMM time at int8 peak for the MFU cross-check
    macs = T * sum(a * b for a, b in sites.values())
    ideal_gemm = 2 * macs / (B.INT8_PEAK_TOPS * 1e12) * 1e3

    log(f"\nper-layer slope (measured): {slope:.3f} ms")
    log(f"components sum (isolated):  {comp_sum:.3f} ms")
    log(f"  GEMM {t_gemm:.3f} (ideal {ideal_gemm:.3f}, "
        f"{ideal_gemm/max(t_gemm,1e-9)*100:.0f}% of int8 peak) | "
        f"attn {t_attn:.3f} | had {t_had:.3f} | vpu {t_vpu:.3f}")
    log(f"residual (slope - sum): {slope - comp_sum:+.3f} ms "
        f"(negative => the real layer overlaps components)")
    log(f"intercept (embed+head+final-norm+chain overhead): {intercept:.2f} ms")

    import json

    out = {
        "T": T, "slope_ms": round(slope, 3),
        "component_ms": {"gemm_int8": round(t_gemm, 3),
                         "attention": round(t_attn, 3),
                         "hadamard": round(t_had, 3),
                         "vpu_norms_quant": round(t_vpu, 3)},
        "components_sum_ms": round(comp_sum, 3),
        "residual_ms": round(slope - comp_sum, 3),
        "gemm_ideal_ms": round(ideal_gemm, 3),
        "intercept_ms": round(intercept, 2),
        "ttft_ms_L28": round(t28 * 1e3, 2),
    }
    print(json.dumps(out))
    path = os.environ.get("MQUANT_PREFILL_DECOMP_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
