"""A/B the 7B MLP block (gate/up/swiglu/down + online hadamard + quantize) at
prefill T=1024 across arithmetic variants: bf16, int8-real, fp8-real, padded
19968 vs exact 18944. Chain=96, tiny fetch (tunnel rules)."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, Hd = 1, int(os.environ.get("BENCH_T", "1024")), 3584
CHAIN = int(os.environ.get("BENCH_CHAIN", "96"))
key = jax.random.key(0)
dn = (((2,), (0,)), ((), ()))


def bench(label, step, ws):
    @jax.jit
    def f(h, ws):
        def body(i, h):
            return step(h, ws).astype(h.dtype)

        out = jax.lax.fori_loop(0, CHAIN, body, h)
        return out.ravel()[:8]

    hs = [jax.random.normal(jax.random.fold_in(key, 50 + i), (B, T, Hd),
                            jnp.bfloat16) for i in range(4)]
    r = f(hs[0], ws)
    _ = np.asarray(r).ravel()[0]
    ts = []
    for h in hs[1:]:
        t0 = time.perf_counter()
        r = f(h, ws)
        _ = np.asarray(r).ravel()[0]
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / CHAIN
    print(f"{label}: {dt*1e3:.3f} ms/mlp", flush=True)
    return dt


def mk_bf16(I):
    return {
        "g": jax.random.normal(jax.random.fold_in(key, 5), (Hd, I), jnp.bfloat16) * 0.02,
        "u": jax.random.normal(jax.random.fold_in(key, 6), (Hd, I), jnp.bfloat16) * 0.02,
        "d": jax.random.normal(jax.random.fold_in(key, 7), (I, Hd), jnp.bfloat16) * 0.02,
    }


def mk_int8(I):
    def q(k, i, o):
        return (jax.random.randint(jax.random.fold_in(key, k), (i, o), -127, 128,
                                   jnp.int8),
                jnp.full((o,), 0.01, jnp.float32))

    g, gs = q(5, Hd, I)
    u, us = q(6, Hd, I)
    d, ds = q(7, I, Hd)
    return {"g": g, "gs": gs, "u": u, "us": us, "d": d, "ds": ds}


def mk_fp8(I):
    w = mk_int8(I)
    return {k: (v.astype(jnp.float8_e4m3fn) if v.dtype == jnp.int8 else v)
            for k, v in w.items()}


def mlp_bf16(h, ws):
    g = h @ ws["g"]
    u = h @ ws["u"]
    a = jax.nn.silu(g) * u
    return a @ ws["d"]


def _q8(x, s=0.05):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)


def mlp_int8(h, ws, had=True):
    xq = _q8(h)
    g = jax.lax.dot_general(xq, ws["g"], dn, preferred_element_type=jnp.int32)
    u = jax.lax.dot_general(xq, ws["u"], dn, preferred_element_type=jnp.int32)
    gf = g.astype(jnp.float32) * (0.05 * ws["gs"])
    uf = u.astype(jnp.float32) * (0.05 * ws["us"])
    a = (jax.nn.silu(gf) * uf).astype(jnp.bfloat16)
    if had:
        from mquant_tpu.kernels.fwht import online_hadamard

        a = online_hadamard(a)
    aq = _q8(a)
    d = jax.lax.dot_general(aq, ws["d"], dn, preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (0.05 * ws["ds"])


def mlp_fp8(h, ws, had=True):
    # activations quantized to int8 grid then carried as fp8 values scaled to
    # the e4m3-exact range: int8 in [-127,127] is NOT exact in e4m3; instead
    # quantize to 0.5x grid in [-64,63] (7-bit) which IS exact... first probe:
    # plain cast (rate measurement only)
    xq = _q8(h).astype(jnp.float8_e4m3fn)
    g = jax.lax.dot_general(xq, ws["g"], dn, preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(xq, ws["u"], dn, preferred_element_type=jnp.float32)
    gf = g * (0.05 * ws["gs"])
    uf = u * (0.05 * ws["us"])
    a = (jax.nn.silu(gf) * uf).astype(jnp.bfloat16)
    if had:
        from mquant_tpu.kernels.fwht import online_hadamard

        a = online_hadamard(a)
    aq = _q8(a).astype(jnp.float8_e4m3fn)
    d = jax.lax.dot_general(aq, ws["d"], dn, preferred_element_type=jnp.float32)
    return d * (0.05 * ws["ds"])


if __name__ == "__main__":
    print(f"T={T} chain={CHAIN}", flush=True)
    from functools import partial

    bench("bf16  I=18944        ", mlp_bf16, mk_bf16(18944))
    bench("bf16  I=19968 (pad)  ", mlp_bf16, mk_bf16(19968))
    bench("int8  I=18944 nohad  ", partial(mlp_int8, had=False), mk_int8(18944))
    bench("int8  I=18944 +had148", mlp_int8, mk_int8(18944))
    bench("int8  I=19968 +had156", mlp_int8, mk_int8(19968))
    bench("fp8   I=18944 nohad  ", partial(mlp_fp8, had=False), mk_fp8(18944))
    bench("fp8   I=18944 +had148", mlp_fp8, mk_fp8(18944))
    bench("fp8   I=19968 +had156", mlp_fp8, mk_fp8(19968))


# --- optimization prototypes ------------------------------------------------


def mlp_int8_bf16ew(h, ws):
    """int8 GEMMs, bf16 elementwise epilogue (dequant+silu+mul in bf16)."""
    xq = _q8(h)
    g = jax.lax.dot_general(xq, ws["g"], dn, preferred_element_type=jnp.int32)
    u = jax.lax.dot_general(xq, ws["u"], dn, preferred_element_type=jnp.int32)
    gf = g.astype(jnp.bfloat16) * (0.05 * ws["gs"]).astype(jnp.bfloat16)
    uf = u.astype(jnp.bfloat16) * (0.05 * ws["us"]).astype(jnp.bfloat16)
    a = jax.nn.silu(gf) * uf
    from mquant_tpu.kernels.fwht import online_hadamard

    a = online_hadamard(a)
    aq = _q8(a)
    d = jax.lax.dot_general(aq, ws["d"], dn, preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (0.05 * ws["ds"])


def mlp_int8_fused_epilogue(h, ws, extras):
    """int8 GEMMs + ONE pallas pass for dequant+swiglu+hadamard+requantize."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, Bm, I, K, m, s_in = extras
    Tt = int(os.environ.get("TT", "32"))

    def kern(g_ref, u_ref, gs_ref, us_ref, a_ref, b_ref, o_ref):
        gf = g_ref[:].astype(jnp.float32) * gs_ref[:].astype(jnp.float32)
        uf = u_ref[:].astype(jnp.float32) * us_ref[:].astype(jnp.float32)
        a = (gf * jax.lax.logistic(gf)) * uf
        t = jax.lax.dot_general(a.reshape(Tt * K, m).astype(jnp.bfloat16),
                                b_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t = t.reshape(Tt, K, m).astype(jnp.bfloat16)
        y = jax.lax.dot_general(a_ref[:], t, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (K, Tt, m)
        y = jnp.swapaxes(y, 0, 1).reshape(Tt, I)
        o_ref[:] = jnp.clip(jnp.round(y * (1.0 / 0.05)), -127, 127).astype(jnp.int8)

    xq = _q8(h)
    g = jax.lax.dot_general(xq, ws["g"], dn, preferred_element_type=jnp.int32)
    u = jax.lax.dot_general(xq, ws["u"], dn, preferred_element_type=jnp.int32)
    B_, T_ = g.shape[0], g.shape[1]
    g2 = g.reshape(B_ * T_, I)
    u2 = u.reshape(B_ * T_, I)
    gs = (0.05 * ws["gs"]).reshape(1, I).astype(jnp.float32)
    us = (0.05 * ws["us"]).reshape(1, I).astype(jnp.float32)
    aq = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B_ * T_, I), jnp.int8),
        grid=(B_ * T_ // Tt,),
        in_specs=[
            pl.BlockSpec((Tt, I), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, I), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tt, I), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(g2, u2, gs, us, A, Bm)
    aq = aq.reshape(B_, T_, I)
    d = jax.lax.dot_general(aq, ws["d"], dn, preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (0.05 * ws["ds"])


if os.environ.get("PROTO") == "1":
    from functools import partial
    from mquant_tpu.kernels.fwht import _factors

    I = 18944
    A_np, B_np, K = _factors(I)
    m = I // K
    extras = (jnp.asarray(A_np, jnp.bfloat16), jnp.asarray(B_np, jnp.bfloat16),
              I, K, m, 0.05)
    ws8 = mk_int8(I)
    bench("int8 bf16-elementwise+had148", mlp_int8_bf16ew, ws8)
    bench("int8 fused-pallas-epilogue  ",
          partial(mlp_int8_fused_epilogue, extras=extras), ws8)
