"""Fused single-token decode attention (kernels/attn_decode.py).

Kernel-level exactness vs the dynamic_update_slice + masked-einsum reference,
and model-level parity of the fused decode path (MQUANT_ATTN=fused, interpret
mode on CPU) against the XLA path — incl. per-row slot positions (engine
pool) and left-pad attn_start (ragged batches). The reference has no decode
engine at all (SURVEY §3.4); this kernel belongs to the TPU serving rebuild.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.kernels.attn_decode import attn_decode_fused
from mquant_tpu.models import layers as L
from mquant_tpu.models import llm as M


def _ref_one(q, kn, vn, kc, vc, p, st):
    S = kc.shape[0]
    z = jnp.zeros((), p.dtype)
    kc = jax.lax.dynamic_update_slice(kc, kn, (p, z, z))
    vc = jax.lax.dynamic_update_slice(vc, vn, (p, z, z))
    cols = jnp.arange(S)
    mask = ((cols <= p) & (cols >= st))[None, None, None, :]
    a = L.attention(q[None], kc[None].astype(q.dtype),
                    vc[None].astype(q.dtype), mask)
    return a[0], kc, vc


class TestKernel:
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    def test_perrow_pos_and_start_exact(self, dtype):
        key = jax.random.key(0)
        B, S, H, KVH, hd = 3, 96, 8, 2, 128
        r = lambda i, sh: jax.random.normal(  # noqa: E731
            jax.random.fold_in(key, i), sh, dtype)
        q, kn, vn = r(1, (B, 1, H, hd)), r(2, (B, 1, KVH, hd)), r(3, (B, 1, KVH, hd))
        kc, vc = r(4, (B, S, KVH, hd)), r(5, (B, S, KVH, hd))
        pos = jnp.array([5, 37, 95], jnp.int32)
        start = jnp.array([0, 10, 33], jnp.int32)
        out, kc2, vc2 = attn_decode_fused(q, kn, vn, kc, vc, pos, hd**-0.5,
                                          start=start, interpret=True)
        outs, kcs, vcs = jax.vmap(_ref_one)(q, kn, vn, kc, vc, pos, start)
        # the kernel accumulates the new-token softmax term outside the MXU
        # dot (the spliced-row design is illegal under Mosaic tiling), so
        # outputs agree to rounding, not bitwise: ≤1 ulp of the output dtype
        atol = 2e-6 if dtype == jnp.float32 else 1e-2
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(outs.reshape(out.shape),
                                              np.float32),
                                   atol=atol, rtol=atol)
        assert bool(jnp.all(kc2 == kcs)) and bool(jnp.all(vc2 == vcs))

    def test_scalar_pos_defaults(self):
        key = jax.random.key(7)
        B, S, H, KVH, hd = 2, 64, 4, 4, 128  # MHA (G = 1) corner
        r = lambda i, sh: jax.random.normal(  # noqa: E731
            jax.random.fold_in(key, i), sh, jnp.bfloat16)
        q, kn, vn = r(1, (B, 1, H, hd)), r(2, (B, 1, KVH, hd)), r(3, (B, 1, KVH, hd))
        kc, vc = r(4, (B, S, KVH, hd)), r(5, (B, S, KVH, hd))
        out, kc2, _ = attn_decode_fused(q, kn, vn, kc, vc, jnp.int32(40),
                                        hd**-0.5, interpret=True)
        outs, kcs, _ = jax.vmap(
            lambda *a: _ref_one(*a, jnp.int32(40), jnp.int32(0)))(
                q, kn, vn, kc, vc)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(outs.reshape(out.shape),
                                              np.float32),
                                   atol=1e-2, rtol=1e-2)
        assert bool(jnp.all(kc2 == kcs))


@pytest.fixture(scope="module")
def tiny128():
    """hd=128 so the fused kernel is eligible (tests run on CPU: the kernel
    runs in interpret mode, forced via MQUANT_ATTN=fused)."""
    cfg = M.DecoderConfig(vocab=64, hidden=256, n_layers=2, n_heads=2,
                          n_kv_heads=1, intermediate=384, head_dim=128,
                          dtype=jnp.float32)
    params = M.init_decoder_params(cfg, jax.random.key(0))
    return cfg, params


def _prefill(cfg, params, B=2, T=7, max_len=32):
    cache = M.init_cache(cfg, B, max_len)
    toks = jax.random.randint(jax.random.fold_in(jax.random.key(1), T),
                              (B, T), 0, cfg.vocab)
    logits, cache, _ = M.decoder_forward(cfg, params, toks, cache=cache,
                                         prefill_fresh=True)
    cache = dict(cache)
    cache["pos"] = jnp.asarray(T, jnp.int32)
    return jnp.argmax(logits[:, -1:], -1).astype(jnp.int32), cache


class TestModelParity:
    def _run(self, monkeypatch, cfg, params, tok, cache, knob, **kw):
        monkeypatch.setenv("MQUANT_ATTN", knob)
        logits, c2, _ = M.decoder_forward(cfg, params, tok,
                                          cache=dict(cache), **kw)
        return np.asarray(logits), c2

    def test_decode_step_parity(self, tiny128, monkeypatch):
        cfg, params = tiny128
        tok, cache = _prefill(cfg, params)
        lx, cx = self._run(monkeypatch, cfg, params, tok, cache, "xla")
        lf, cf = self._run(monkeypatch, cfg, params, tok, cache, "fused")
        np.testing.assert_allclose(lx, lf, atol=2e-5, rtol=1e-5)
        # layer-0 cache row is bit-identical (same inputs); deeper layers may
        # differ by f32 association order of the preceding attention
        assert bool(jnp.all(cx["k"][0] == cf["k"][0]))
        np.testing.assert_allclose(np.asarray(cx["k"], np.float32),
                                   np.asarray(cf["k"], np.float32), atol=1e-5)

    def test_perrow_pos_with_start_parity(self, tiny128, monkeypatch):
        cfg, params = tiny128
        tok, cache = _prefill(cfg, params)
        cache["pos"] = jnp.array([7, 12], jnp.int32)  # slot-engine style
        st = jnp.array([0, 3], jnp.int32)
        lx, _ = self._run(monkeypatch, cfg, params, tok, cache, "xla",
                          attn_start=st)
        lf, _ = self._run(monkeypatch, cfg, params, tok, cache, "fused",
                          attn_start=st)
        np.testing.assert_allclose(lx, lf, atol=2e-5, rtol=1e-5)

    def test_quantized_kv_stays_on_xla(self, tiny128, monkeypatch):
        """int8 KV caches are ineligible — fused knob must not change them."""
        cfg, params = tiny128
        monkeypatch.setenv("MQUANT_ATTN", "fused")
        cache = M.init_cache(cfg, 2, 32, quantized=True)
        assert not M._use_fused_decode_attn(cfg, cache, 1, False, None)
        # and a mask-supplying caller is ineligible too
        fpc = M.init_cache(cfg, 2, 32)
        assert not M._use_fused_decode_attn(cfg, fpc, 1, False,
                                            jnp.ones((2, 1, 1, 32), bool))
        assert M._use_fused_decode_attn(cfg, fpc, 1, False, None)
        assert not M._use_fused_decode_attn(cfg, fpc, 2, False, None)

    def test_auto_knob_off_on_cpu(self, tiny128, monkeypatch):
        cfg, _ = tiny128
        monkeypatch.delenv("MQUANT_ATTN", raising=False)
        cache = M.init_cache(cfg, 2, 32)
        assert not M._use_fused_decode_attn(cfg, cache, 1, False, None)
