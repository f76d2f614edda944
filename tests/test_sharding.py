"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mquant_tpu.models.llm import DecoderConfig, decoder_forward, init_decoder_params
from mquant_tpu.parallel.sharding import (
    decoder_param_specs,
    make_mesh,
    shard_params,
    vlm_param_specs,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh(8, tp=4)
        assert m.shape == {"dp": 2, "tp": 4}
        m2 = make_mesh(8)
        assert m2.shape == {"dp": 1, "tp": 8}


class TestDecoderTP:
    def test_tp_forward_matches_single_device(self):
        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        toks = jax.random.randint(jax.random.key(1), (4, 8), 0, cfg.vocab)
        ref, _, _ = decoder_forward(cfg, params, toks)

        mesh = make_mesh(8, tp=4)
        sp = shard_params(params, mesh, decoder_param_specs(params))
        toks_s = jax.device_put(toks, NamedSharding(mesh, P("dp", None)))
        with jax.set_mesh(mesh):
            out = jax.jit(lambda p, t: decoder_forward(cfg, p, t)[0])(sp, toks_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_param_specs_cover_tree(self):
        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = decoder_param_specs(params)
        # structure matches exactly (None leaves for None biases)
        jax.tree.map(lambda a, b: None, params, specs,
                     is_leaf=lambda x: x is None)

    def test_quantized_params_sharding(self):
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import LLM_SITES
        from mquant_tpu.transform import recipes as RZ

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=8, a_bits=8) for n in LLM_SITES}
        qp = RZ.realize_decoder_weights(params, specs)
        mesh = make_mesh(8, tp=4)
        sp = shard_params(qp, mesh, decoder_param_specs(qp))
        toks = jax.random.randint(jax.random.key(1), (4, 8), 0, cfg.vocab)
        ref, _, _ = decoder_forward(cfg, qp, toks, specs=specs, mode="real")
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda p, t: decoder_forward(cfg, p, t, specs=specs, mode="real")[0])(sp, toks)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as G

        fn, args = G.entry()
        out = jax.jit(fn)(*args)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as G

        G.dryrun_multichip(8)


class TestShardedServing:
    """TP-sharded prefill + KV-cache decode matches single-device — the
    multi-chip serving path (prefill writes the cache under the mesh; decode
    steps carry it)."""

    def test_tp_prefill_decode_matches_single_device(self):
        from mquant_tpu.models.llm import init_cache

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        toks = jax.random.randint(jax.random.key(1), (2, 8), 0, cfg.vocab)

        # single device reference: prefill + 3 decode steps
        cache = init_cache(cfg, 2, 16)
        logits, cache, _ = decoder_forward(cfg, params, toks, cache=cache,
                                           prefill_fresh=True)
        ref_steps = []
        tok = jnp.argmax(logits[:, -1:], axis=-1)
        for _ in range(3):
            logits, cache, _ = decoder_forward(cfg, params, tok, cache=cache)
            tok = jnp.argmax(logits[:, -1:], axis=-1)
            ref_steps.append(np.asarray(tok))

        mesh = make_mesh(8, tp=4)
        sp = shard_params(params, mesh, decoder_param_specs(params))
        toks_s = jax.device_put(toks, NamedSharding(mesh, P("dp", None)))
        with jax.set_mesh(mesh):
            cache = init_cache(cfg, 2, 16)
            prefill = jax.jit(lambda p, t, c: decoder_forward(
                cfg, p, t, cache=c, prefill_fresh=True)[:2])
            step = jax.jit(lambda p, t, c: decoder_forward(
                cfg, p, t, cache=c)[:2])
            logits, cache = prefill(sp, toks_s, cache)
            tok = jnp.argmax(logits[:, -1:], axis=-1)
            for i in range(3):
                logits, cache = step(sp, tok, cache)
                tok = jnp.argmax(logits[:, -1:], axis=-1)
                assert (np.asarray(tok) == ref_steps[i]).all(), i


class Test72BScale:
    """72B config validates structurally without 72B memory: abstract trace
    (eval_shape) of the decoder step + TP-divisibility of every sharded dim."""

    def test_72b_decoder_traces_and_tp_divides(self):
        from functools import partial

        from mquant_tpu.models.qwen2vl import Qwen2VLConfig

        cfg = Qwen2VLConfig.qwen2vl_72b().llm
        assert cfg.hidden == 8192 and cfg.n_layers == 80

        # abstract params pytree with real 72B shapes (no allocation)
        L, Hd, I = cfg.n_layers, cfg.hidden, cfg.intermediate
        Hh, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

        def st(*shape, dt=jnp.bfloat16):
            return jax.ShapeDtypeStruct(shape, dt)

        params = {
            "embed": {"w": st(cfg.vocab, Hd)},
            "layers": {
                "ln1": {"w": st(L, Hd)},
                "q": {"w": st(L, Hd, Hh * hd), "b": st(L, Hh * hd)},
                "k": {"w": st(L, Hd, KV * hd), "b": st(L, KV * hd)},
                "v": {"w": st(L, Hd, KV * hd), "b": st(L, KV * hd)},
                "o": {"w": st(L, Hh * hd, Hd), "b": None},
                "ln2": {"w": st(L, Hd)},
                "gate": {"w": st(L, Hd, I), "b": None},
                "up": {"w": st(L, Hd, I), "b": None},
                "down": {"w": st(L, I, Hd), "b": None},
            },
            "ln_f": {"w": st(Hd)},
            "lm_head": {"w": st(Hd, cfg.vocab)},
        }
        toks = jax.ShapeDtypeStruct((1, 128), jnp.int32)
        out = jax.eval_shape(
            lambda p, t: decoder_forward(cfg, p, t)[0], params, toks)
        assert out.shape == (1, 128, cfg.vocab)

        # sharding specs build for the abstract tree (coverage is asserted at
        # tiny scale by test_param_specs_cover_tree) and every TP-cut dim
        # divides an 8-way tp axis
        from mquant_tpu.parallel.sharding import decoder_param_specs

        specs = decoder_param_specs(params)
        assert specs["layers"]["down"]["w"] is not None
        for dim in (Hh * hd, I, Hd):
            assert dim % 8 == 0, dim


class TestAllFamiliesTP:
    """Every family's FULL params tree (incl. res/proj subsystems) shards
    under the (dp, tp) mesh and the TP forward matches single-device.
    Replaces the reference's accelerate whole-module 72B placement
    (SURVEY §2.7, ref: exam/quant_qwen2vl.py:26)."""

    @pytest.mark.parametrize("fname", ["qwenvl", "internvl", "minicpmv",
                                       "glm4v"])
    def test_tp_forward_matches_single_device(self, fname):
        from mquant_tpu.models.registry import get_family
        from mquant_tpu.pipeline import (QuantizeConfig, build_specs,
                                         synthetic_calib_batches)

        fam = get_family(fname)
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(0))
        specs = build_specs(fam, QuantizeConfig(llm_static=False,
                                                visual_static=False))
        batch = synthetic_calib_batches(fam, cfg, 1, jax.random.key(1))[0]
        extra = {k: v for k, v in batch.items()
                 if k not in ("tokens", "patches")}

        # fp-mode equality: GSPMD is semantics-preserving, so TP must match
        # single-device to reduction-reorder noise. (Fake-quant mode is NOT a
        # tight equality check — a 1-ulp psum reorder can flip a rounding
        # boundary and cascade — so quant coverage is a finiteness run.)
        ref, _, _ = fam.forward_fn(cfg, params, batch["tokens"],
                                   batch.get("patches"), mode="fp", **extra)

        mesh = make_mesh(8, tp=4)
        sp = shard_params(params, mesh, vlm_param_specs(params))
        # res/proj subsystems must be covered by the spec tree (not absent)
        if "res" in params:
            assert "res" in vlm_param_specs(params)
        if "proj" in params:
            assert "proj" in vlm_param_specs(params)
        with jax.set_mesh(mesh):
            out = jax.jit(lambda p, t, im: fam.forward_fn(
                cfg, p, t, im, mode="fp", **extra)[0])(
                    sp, batch["tokens"], batch.get("patches"))
            qout = jax.jit(lambda p, t, im: fam.forward_fn(
                cfg, p, t, im, specs=specs, mode="fake", **extra)[0])(
                    sp, batch["tokens"], batch.get("patches"))
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-4, atol=2e-4)
        assert np.isfinite(np.asarray(qout, np.float32)).all()


class TestShardedServingStack:
    """The serving stack (continuous-batching engine, speculative decoding)
    runs unchanged under a TP mesh: params sharded Megatron-style, GSPMD
    inserts the collectives, outputs match the unsharded runs."""

    def _cfg_params(self):
        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        return cfg, init_decoder_params(cfg, jax.random.key(5))

    def test_engine_under_tp_matches_unsharded(self):
        from mquant_tpu.serve.engine import ServingEngine

        cfg, params = self._cfg_params()
        prompts = [list(range(1, 7)), list(range(10, 20)), [30, 31, 32]]

        eng0 = ServingEngine(cfg, params, slots=2, max_len=64,
                             steps_per_block=2)
        rids0 = [eng0.submit(p, max_new_tokens=5) for p in prompts]
        ref = eng0.run()

        mesh = make_mesh(8, tp=4)
        sp = shard_params(params, mesh, decoder_param_specs(params))
        with jax.set_mesh(mesh):
            eng = ServingEngine(cfg, sp, slots=2, max_len=64,
                                steps_per_block=2)
            eng.register_prefix(prompts[1][:4])  # prefix path under TP too
            rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
            outs = eng.run()
        for r0, r in zip(rids0, rids):
            assert ref[r0] == outs[r]
        assert eng.prefix_hits == 1

    def test_speculative_under_tp_matches_unsharded(self):
        from mquant_tpu.serve.generate import Generator
        from mquant_tpu.serve.speculative import speculative_generate

        cfg, params = self._cfg_params()
        toks = jnp.asarray([[5, 9, 2, 7, 5, 9, 2, 7]])
        ref = speculative_generate(Generator(cfg, params, max_len=128),
                                   toks, max_new_tokens=12, k=3)

        mesh = make_mesh(8, tp=4)
        sp = shard_params(params, mesh, decoder_param_specs(params))
        with jax.set_mesh(mesh):
            out = speculative_generate(Generator(cfg, sp, max_len=128),
                                       toks, max_new_tokens=12, k=3)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestPackedResidentTP:
    """Single-resident packed W4 serving under tensor parallelism: per-site
    packed storage shards exactly like the int8 layout (w_q rows are in/2 —
    the Megatron in/out axes divide identically), the shared-input fusion is
    auto-disabled on sharded params (q|k|v concat boundaries land mid-shard),
    and generation is token-exact vs the unsharded run. On the CPU mesh the
    Pallas GEMV route takes its unpack+dot fallback — the test pins the
    layout/sharding correctness the kernel relies on."""

    def test_packed_resident_tp_token_exact(self, monkeypatch):
        from mquant_tpu.core.quant import QuantParams
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import LLM_SITES
        from mquant_tpu.serve.generate import Generator
        from mquant_tpu.transform.recipes import realize_decoder_weights

        monkeypatch.setenv("MQUANT_GEMV", "pallas_w4")  # → packed resident
        cfg = DecoderConfig(vocab=128, hidden=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=128, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8, a_static=True)
                 for n in LLM_SITES}
        state = {f"llm.{n}": {"act": QuantParams(
            scale=jnp.full((2,), 0.05, jnp.float32))} for n in LLM_SITES}
        rp = realize_decoder_weights(params, specs)
        toks = jnp.ones((1, 8), jnp.int32)

        g0 = Generator(cfg, rp, specs=specs, state=state, mode="real",
                       max_len=64)
        assert g0.params["layers"]["q"].get("w_q_fused") is not None  # fused
        ref = g0.generate_on_device(toks, max_new_tokens=6)

        mesh = make_mesh(8, tp=4)
        sp = shard_params(rp, mesh, decoder_param_specs(rp))
        with jax.set_mesh(mesh):
            g = Generator(cfg, sp, specs=specs, state=state, mode="real",
                          max_len=64)
            lay = g.params["layers"]
            # packed single-resident, per-site (fusion auto-disabled under TP)
            assert lay["q"].get("w_q_fused") is None
            assert lay["q"]["w_q"].shape[-2] * 2 == cfg.hidden
            assert lay["down"]["w_q"].shape[-2] * 2 == cfg.intermediate
            out = g.generate_on_device(toks, max_new_tokens=6)
        assert (np.asarray(out) == np.asarray(ref)).all()


class TestServerUnderTP:
    def test_http_server_over_tp_mesh_matches_unsharded(self):
        """The full HTTP deploy surface under tensor parallelism: params
        sharded Megatron-style over a (1,4) mesh, the scheduler thread
        enters the mesh, requests over real HTTP match the unsharded
        server token-for-token."""
        import http.client
        import json

        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import InferenceServer

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=2, n_heads=4,
                            n_kv_heads=4, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(5))
        prompts = [list(range(1, 7)), list(range(10, 20))]

        def post(port, body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("POST", "/v1/completions", json.dumps(body),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            out = json.loads(resp.read())
            conn.close()
            return resp.status, out

        def serve_all(params, mesh=None):
            eng = ServingEngine(cfg, params, slots=2, max_len=64,
                                steps_per_block=2)
            srv = InferenceServer(eng, port=0, mesh=mesh)
            try:
                outs = []
                for p in prompts:
                    status, out = post(srv.port,
                                       {"prompt": p, "max_tokens": 5})
                    assert status == 200, out
                    outs.append(out["choices"][0]["tokens"])
                return outs
            finally:
                srv.shutdown()

        ref = serve_all(params)
        mesh = make_mesh(8, tp=4)
        sp = shard_params(params, mesh, decoder_param_specs(params))
        got = serve_all(sp, mesh=mesh)
        assert got == ref


class TestShardedOfflineGPTQ:
    """The offline pipeline under the mesh (VERDICT r4 #4): dp-sharded
    Hessian accumulation, the column-sharded GPTQ walk, and realize —
    each asserted equal to the single-device path."""

    def _problem(self, n_in=64, n_out=48, ns=256):
        rng = np.random.default_rng(3)
        X = rng.standard_normal((8, ns // 8, n_in)).astype(np.float32)
        W = (rng.standard_normal((n_in, n_out)) * 0.05).astype(np.float32)
        return jnp.asarray(X), jnp.asarray(W)

    def test_hessian_dp_matches_solo(self):
        from mquant_tpu.gptq import core as C
        from mquant_tpu.gptq.sharded import hessian_dp

        X, _ = self._problem()
        mesh = make_mesh(8, tp=4)
        Hs = hessian_dp(X, mesh)
        # replicated output, one psum over dp inserted by XLA
        assert Hs.sharding.is_fully_replicated
        Hr = C.accumulate_hessian(None, X)
        np.testing.assert_allclose(np.asarray(Hs), np.asarray(Hr),
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("act_order,group_size,sym", [
        (False, None, True), (True, 16, True), (False, 16, False)])
    def test_sharded_walk_codes_equal_solo(self, act_order, group_size, sym):
        from mquant_tpu.gptq import core as C
        from mquant_tpu.gptq.sharded import gptq_matrix_sharded, hessian_dp

        X, W = self._problem()
        mesh = make_mesh(8, tp=4)
        H = C.accumulate_hessian(None, X)
        solo = C.gptq_quantize_matrix(W, H, bits=4, act_order=act_order,
                                      group_size=group_size, sym=sym)
        shd = gptq_matrix_sharded(W, hessian_dp(X, mesh), mesh, bits=4,
                                  act_order=act_order, group_size=group_size,
                                  sym=sym)
        assert not bool(shd.used_fallback)
        # the walk is per-output-column independent: identical codes
        np.testing.assert_array_equal(np.asarray(solo.w), np.asarray(shd.w))
        np.testing.assert_array_equal(np.asarray(solo.scale),
                                      np.asarray(shd.scale))
        if solo.zero is not None:
            np.testing.assert_array_equal(np.asarray(solo.zero),
                                          np.asarray(shd.zero))

    def test_realize_under_mesh_matches_solo(self):
        from mquant_tpu.kernels.qmm import quantize_weights_real

        _, W = self._problem()
        # jit both sides: XLA's division rewrite makes eager scales differ
        # from compiled ones by ~1 ulp (codes are identical either way)
        solo = jax.jit(lambda w: quantize_weights_real(w, 4, pack=True))(W)
        mesh = make_mesh(8, tp=4)
        Ws = jax.device_put(W, NamedSharding(mesh, P(None, ("dp", "tp"))))
        with jax.set_mesh(mesh):
            shd = jax.jit(lambda w: quantize_weights_real(w, 4, pack=True))(Ws)
        for k in solo:
            np.testing.assert_array_equal(np.asarray(solo[k]),
                                          np.asarray(shd[k]))
