"""Continuous-batching ServingEngine tests.

The engine's correctness claim: a request decoded in a slot pool — admitted
mid-run, next to unrelated rows at other positions — produces exactly the
tokens the same prompt produces alone through ``Generator.generate`` (greedy,
same cache semantics). Reference has no serving scheduler at all (SURVEY §1
"no separate serving stack"); this subsumes its one-request-at-a-time HF
generate loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
from mquant_tpu.serve.engine import ServingEngine
from mquant_tpu.serve.generate import Generator


def _cfg(**kw):
    base = dict(vocab=96, hidden=48, n_layers=2, n_heads=4, n_kv_heads=2,
                intermediate=64, dtype=jnp.float32)
    base.update(kw)
    return DecoderConfig(**base)


def _solo(cfg, params, prompt, n, eos_id=None, positions=None, **gkw):
    gen = Generator(cfg, params, max_len=128, **gkw)
    pos = None if positions is None else jnp.asarray(
        np.broadcast_to(np.asarray(positions), (3, len(prompt)))[:, None])
    out = gen.generate(jnp.asarray(prompt)[None], max_new_tokens=n,
                       eos_id=eos_id, positions=pos)
    toks = [int(t) for t in np.asarray(out)[0]]
    if eos_id is not None and eos_id in toks:
        toks = toks[:toks.index(eos_id)]
    return toks


class TestEngine:
    def test_pool_matches_solo(self):
        """Three different-length prompts, fewer slots than requests →
        continuous admission; every request matches its solo generation."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        prompts = [list(range(1, 6)), list(range(20, 29)),
                   list(range(40, 43))]
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3)
        rids = [eng.submit(p, max_new_tokens=7) for p in prompts]
        outs = eng.run()
        assert set(outs) == set(rids)
        for rid, p in zip(rids, prompts):
            assert outs[rid] == _solo(cfg, params, p, 7), (rid, p)

    def test_admission_mid_flight(self):
        """A request submitted while others are decoding joins at a block
        boundary and still matches its solo run."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(1))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=2)
        ra = eng.submit(list(range(1, 9)), max_new_tokens=9)
        finished = {}
        finished.update(eng.step_block())  # A decoding alone
        rb = eng.submit(list(range(30, 34)), max_new_tokens=5)  # joins next tick
        while eng._queue or any(eng._active):
            finished.update(eng.step_block())
        assert finished[ra] == _solo(cfg, params, list(range(1, 9)), 9)
        assert finished[rb] == _solo(cfg, params, list(range(30, 34)), 5)

    def test_eos_frees_slot_for_queue(self):
        """eos retirement: a finished row's slot is reused by a queued
        request; outputs still exact."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(2))
        p1, p2 = list(range(1, 7)), list(range(50, 60))
        solo1 = _solo(cfg, params, p1, 12)
        eos = solo1[3]  # force an eos 4 tokens in
        eng = ServingEngine(cfg, params, slots=1, max_len=128,
                            steps_per_block=4, eos_id=eos)
        r1 = eng.submit(p1, max_new_tokens=12)
        r2 = eng.submit(p2, max_new_tokens=6)
        outs = eng.run()
        assert outs[r1] == solo1[:3]
        assert outs[r2] == _solo(cfg, params, p2, 6, eos_id=eos)

    def test_kv_quant_pool(self):
        """int8 KV cache slots work with per-row positions."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(3))
        p = list(range(2, 12))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=4, kv_quant=True)
        rid = eng.submit(p, max_new_tokens=6)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 6, kv_quant=True)

    def test_mrope_positions(self):
        """M-RoPE prompts (Qwen2-VL style): per-slot rope_delta makes decode
        resume at max(position)+1, matching the solo path."""
        cfg = _cfg(mrope_sections=(2, 2, 2), head_dim=12, n_heads=4,
                   hidden=48)
        params = init_decoder_params(cfg, jax.random.PRNGKey(4))
        T = 8
        pos = np.broadcast_to(np.arange(T)[None], (3, T)).copy()
        pos[1:, 2:6] = 2  # an "image span" with 2-d positions
        prompt = list(range(5, 5 + T))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3)
        rid = eng.submit(prompt, max_new_tokens=6, positions=pos)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, prompt, 6, positions=pos)

    def test_embeds_request(self):
        """(T, H) embeds prompts (spliced VLM inputs) serve through slots."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(5))
        emb = np.asarray(
            jax.random.normal(jax.random.PRNGKey(9), (7, cfg.hidden)),
            np.float32)
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=4)
        rid = eng.submit(emb, max_new_tokens=5)
        outs = eng.run()
        gen = Generator(cfg, params, max_len=128)
        ref = gen.generate_on_device(jnp.asarray(emb)[None],
                                     max_new_tokens=5)
        assert outs[rid] == [int(t) for t in np.asarray(ref)[0]]

    def test_capacity_guard(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(6))
        eng = ServingEngine(cfg, params, slots=1, max_len=32)
        with pytest.raises(AssertionError):
            eng.submit(list(range(30)), max_new_tokens=8)

    def test_batched_admission_mixed_lengths(self):
        """Same-bucket prompts admit as ONE batched (k, Tb) prefill (size
        bucketed to 1/2/4/8, padded by repeating the last member). Each row
        keeps its TRUE length via the per-row last_index gather — outputs
        must equal solo runs despite sharing the prefill call."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(21))
        rng = np.random.default_rng(7)
        # three prompts in the 32-bucket (→ k=4 padded batch), one in 64
        lens = (20, 23, 22, 40)
        prompts = [list(rng.integers(1, 90, size=n)) for n in lens]
        eng = ServingEngine(cfg, params, slots=4, max_len=128,
                            steps_per_block=4)
        rids = [eng.submit(p, max_new_tokens=7) for p in prompts]
        outs = eng.run()
        assert any(k[0] == "admitN" for k in eng._jit), \
            "batched admission path never compiled"
        for rid, p in zip(rids, prompts):
            assert outs[rid] == _solo(cfg, params, p, 7), (rid, p)

    def test_batched_admission_token_cap(self):
        """admit_batch_tokens bounds the dispatched batch: chunks are cut
        at the power-of-two floor of the budget, so no compiled admission
        ever exceeds the cap (review finding: rounding up AFTER the chunk
        cut could dispatch 8×Tb against a ~5×Tb budget)."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(23))
        rng = np.random.default_rng(11)
        # five 32-bucket prompts against a 3×32-token budget → cap 2
        prompts = [list(rng.integers(1, 90, size=20)) for _ in range(5)]
        eng = ServingEngine(cfg, params, slots=5, max_len=128,
                            steps_per_block=4, admit_batch_tokens=96)
        rids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        outs = eng.run()
        sizes = {k[2] for k in eng._jit if k[0] == "admitN"}
        assert sizes and max(sizes) <= 2, sizes
        for rid, p in zip(rids, prompts):
            assert outs[rid] == _solo(cfg, params, p, 5), (rid, p)

    def test_batched_admission_mrope(self):
        """Two same-bucket M-RoPE requests share one batched admission;
        per-row rope_delta and positions survive the batching."""
        cfg = _cfg(mrope_sections=(2, 2, 2), head_dim=12, n_heads=4,
                   hidden=48)
        params = init_decoder_params(cfg, jax.random.PRNGKey(22))
        T = 8
        pos_a = np.broadcast_to(np.arange(T)[None], (3, T)).copy()
        pos_a[1:, 2:6] = 2
        pos_b = np.broadcast_to(np.arange(T)[None], (3, T)).copy()
        pos_b[1:, 1:5] = 1
        pa, pb = list(range(5, 5 + T)), list(range(40, 40 + T))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3)
        ra = eng.submit(pa, max_new_tokens=6, positions=pos_a)
        rb = eng.submit(pb, max_new_tokens=6, positions=pos_b)
        outs = eng.run()
        assert any(k[0] == "admitN" for k in eng._jit)
        assert outs[ra] == _solo(cfg, params, pa, 6, positions=pos_a)
        assert outs[rb] == _solo(cfg, params, pb, 6, positions=pos_b)


class TestPrefixCaching:
    def test_prefix_reuse_matches_solo(self):
        """Requests sharing a registered system prefix prefill only their
        suffix against the stored KV row — outputs must equal solo runs of
        the FULL prompt (exactness of prefix reuse)."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(10))
        sys_p = list(range(30, 42))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3)
        eng.register_prefix(sys_p)
        prompts = [sys_p + [3, 1, 4], sys_p + list(range(60, 70)),
                   [9, 8, 7, 6]]  # last one: no prefix match
        rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
        outs = eng.run()
        for rid, p in zip(rids, prompts):
            assert outs[rid] == _solo(cfg, params, p, 6), p
        assert eng.prefix_hits == 2

    def test_longest_prefix_wins(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(11))
        short = list(range(20, 26))
        long = short + list(range(50, 58))
        eng = ServingEngine(cfg, params, slots=1, max_len=128)
        eng.register_prefix(short)
        eng.register_prefix(long)
        p = long + [2, 4]
        rid = eng.submit(p, max_new_tokens=5)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 5)
        assert eng.prefix_hits == 1  # one admission, longest prefix used

    def test_prefix_row_survives_reuse(self):
        """The stored prefix row must not be consumed by donation: two
        requests reusing the same prefix both match solo."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(12))
        sys_p = list(range(10, 20))
        eng = ServingEngine(cfg, params, slots=1, max_len=128)
        eng.register_prefix(sys_p)
        a, b = sys_p + [5], sys_p + [7, 8]
        ra = eng.submit(a, max_new_tokens=4)
        rb = eng.submit(b, max_new_tokens=4)
        outs = eng.run()
        assert outs[ra] == _solo(cfg, params, a, 4)
        assert outs[rb] == _solo(cfg, params, b, 4)
        assert eng.prefix_hits == 2


class TestChunkedAdmission:
    def test_chunked_matches_solo(self):
        """A long prompt admitted in pieces produces exactly the whole-
        prompt result (causal-with-offset pieces == one-shot prefill)."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(13))
        p = list(range(1, 38))  # 37 tokens, chunk 8 → 5 pieces
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3, admit_chunk=8)
        rid = eng.submit(p, max_new_tokens=6)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 6)

    def test_decode_proceeds_during_admission(self):
        """While a long prompt admits chunk-by-chunk, already-running rows
        keep decoding — the defining property of chunked-prefill admission."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(14))
        short = list(range(5, 10))
        long = list(range(1, 33))  # 32 tokens, chunk 8 → 4 pieces
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=2, admit_chunk=8)
        rs = eng.submit(short, max_new_tokens=12)
        eng.step_block()  # admit + decode short
        n0 = len(eng._active[0].out)
        rl = eng.submit(long, max_new_tokens=4)
        eng.step_block()  # starts the chunked admission + decodes short
        assert eng._admitting is not None  # long still admitting...
        assert len(eng._active[0].out) > n0  # ...and short kept decoding
        outs = {}
        while len(outs) < 2:  # finish everything; both match solo
            outs.update(eng.step_block())
        assert outs[rs] == _solo(cfg, params, short, 12)
        assert outs[rl] == _solo(cfg, params, long, 4)

    def test_prefix_plus_chunked(self):
        """A registered prefix composes with chunked suffix admission."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(15))
        sys_p = list(range(40, 50))
        eng = ServingEngine(cfg, params, slots=1, max_len=128,
                            admit_chunk=8)
        eng.register_prefix(sys_p)
        p = sys_p + list(range(1, 22))  # suffix 21 > chunk 8
        rid = eng.submit(p, max_new_tokens=5)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 5)
        assert eng.prefix_hits == 1

    def test_chunked_embeds(self):
        """Chunked admission for (T, H) embeds prompts (long VLM inputs)."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(16))
        emb = np.asarray(
            jax.random.normal(jax.random.PRNGKey(17), (23, cfg.hidden)),
            np.float32)
        eng = ServingEngine(cfg, params, slots=1, max_len=128,
                            admit_chunk=8)
        rid = eng.submit(emb, max_new_tokens=5)
        outs = eng.run()
        gen = Generator(cfg, params, max_len=128)
        ref = gen.generate_on_device(jnp.asarray(emb)[None],
                                     max_new_tokens=5)
        assert outs[rid] == [int(t) for t in np.asarray(ref)[0]]


class TestEngineSpeculative:
    """Batched self-speculation in the slot pool (spec_k > 0): outputs must
    equal the plain engine token-for-token — per-row acceptance and pos
    rollback are invisible in the output, only in how many forwards ran."""

    def _run_both(self, prompts, n, eos_id=None, seed=20, **kw):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(seed))
        a = ServingEngine(cfg, params, slots=2, max_len=128,
                          steps_per_block=3, eos_id=eos_id, **kw)
        ra = [a.submit(p, max_new_tokens=n) for p in prompts]
        outs_a = a.run()
        b = ServingEngine(cfg, params, slots=2, max_len=128,
                          steps_per_block=2, eos_id=eos_id, spec_k=4, **kw)
        rb = [b.submit(p, max_new_tokens=n) for p in prompts]
        outs_b = b.run()
        for x, y in zip(ra, rb):
            assert outs_a[x] == outs_b[y], (outs_a[x], outs_b[y])
        return cfg, params, outs_a, ra

    def test_spec_pool_matches_plain(self):
        self._run_both([list(range(1, 8)), [5, 9, 2, 7, 5, 9, 2, 7],
                        list(range(40, 51))], 9)

    def test_spec_pool_continuous_admission(self):
        # more requests than slots → admission into a mid-speculation pool
        self._run_both([list(range(1, 6)), list(range(20, 29)),
                        [30, 31, 32], [7, 7, 7, 7]], 6)

    def test_spec_pool_eos(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(21))
        p = [5, 9, 2, 7, 5, 9, 2, 7]
        base = _solo(cfg, params, p, 12)
        eos = base[len(base) // 2]  # mid-stream eos exercises the trim
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=2, eos_id=eos, spec_k=4)
        rid = eng.submit(p, max_new_tokens=12)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 12, eos_id=eos)

    def test_spec_with_prefix_and_kvquant(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(22))
        sys_p = list(range(10, 22))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=2, spec_k=3, kv_quant=True)
        eng.register_prefix(sys_p)
        p = sys_p + [3, 1, 4]
        rid = eng.submit(p, max_new_tokens=7)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 7, kv_quant=True)
        assert eng.prefix_hits == 1


class TestDraftIds:
    def test_embeds_with_draft_ids_matches_and_seeds(self):
        """Embeds requests with caller-supplied token ids: hist seeded with
        the prompt so drafts can quote it; output unchanged (exactness is
        draft-independent)."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(30))
        ids = np.asarray(list(range(3, 10)), np.int64)
        emb = np.asarray(params["embed"]["w"])[ids].astype(np.float32)
        ref = Generator(cfg, params, max_len=128).generate_on_device(
            jnp.asarray(emb)[None], max_new_tokens=6)
        eng = ServingEngine(cfg, params, slots=1, max_len=128, spec_k=3,
                            steps_per_block=2)
        rid = eng.submit(emb, max_new_tokens=6, draft_ids=ids)
        # step_block = admit + one decode block: hist starts from the seeded
        # prompt ids (+ first token + the block's emissions)
        eng.step_block()
        assert int(np.asarray(eng.hist_len)[0]) >= len(ids) + 1
        assert list(np.asarray(eng.hist)[0, :len(ids)]) == list(ids)
        outs = eng.step_block()
        while rid not in outs:
            outs.update(eng.step_block())
        assert outs[rid] == [int(t) for t in np.asarray(ref)[0]]


class TestVLMPrefixCaching:
    """Embeds (VLM) requests match registered text prefixes through their
    draft_ids: the system-prompt KV row is reused, outputs unchanged."""

    def test_vlm_prefix_hit_outputs_exact(self):
        import numpy as np

        from mquant_tpu.evaluation.adapter import VLMRunner
        from mquant_tpu.models.qwen2vl import (Qwen2VLConfig,
                                               init_qwen2vl_params)

        cfg = Qwen2VLConfig.tiny()
        params = init_qwen2vl_params(cfg, jax.random.PRNGKey(5))
        runner = VLMRunner("qwen2vl", cfg, params, max_len=256,
                           max_new_tokens=6)
        img = np.random.default_rng(0).random((24, 24, 3)).astype(np.float32)
        prompts = [{"text": "what is this?", "image": img},
                   {"text": "describe the scene", "image": img}]

        # baseline: no prefix registered
        base = runner.serve_engine(prompts, max_new_tokens=6)

        # the common leading text span (chat template system part) ends at
        # the first image token
        toks, _ = runner.build_inputs(prompts[0])
        ids = np.asarray(toks)[0]
        first_img = int(np.argmax(ids == cfg.image_token_id))
        assert first_img > 4  # the template really has a text prefix
        prefix = [int(t) for t in ids[:first_img]]

        eng = ServingEngine(cfg.llm, params["llm"], slots=2, max_len=512,
                            steps_per_block=4)
        eng.register_prefix(prefix)
        got = runner.serve_engine(prompts, max_new_tokens=6, engine=eng)
        assert eng.prefix_hits == 2
        assert got == base

    def test_mrope_mismatched_positions_skip(self):
        """An embeds request whose prefix-region positions are not arange
        (image inside the would-be prefix) must NOT match."""
        import numpy as np

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(6))
        eng = ServingEngine(cfg, params, slots=1, max_len=128,
                            steps_per_block=2)
        prefix = list(range(1, 9))
        eng.register_prefix(prefix)
        # embeds request with matching draft_ids but shifted positions
        emb = np.random.default_rng(1).random((12, cfg.hidden)).astype(
            np.float32)
        pos = np.broadcast_to(np.arange(12), (3, 12)).copy()
        pos[:, :8] += 1  # not arange over the prefix region
        rid = eng.submit(emb, max_new_tokens=4,
                         positions=pos, draft_ids=list(range(1, 13)))
        eng.run()
        assert eng.prefix_hits == 0


class TestSpecWithInt4KV:
    def test_spec_int4_cache_exact(self):
        """Speculation over the nibble-packed uint4 cache: rollback handles
        the extra zp arrays; outputs equal the plain int4-KV generator."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(23))
        p = list(range(10, 22)) + [3, 1, 4]
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=2, spec_k=3, kv_quant=4)
        rid = eng.submit(p, max_new_tokens=7)
        assert eng.run()[rid] == _solo(cfg, params, p, 7, kv_quant=4)

    def test_prefix_int4_deterministic_and_rows_exact(self):
        """Prefix caching + int4 KV. A lossy cache makes whole-prefill and
        cache-continuation DIFFERENT numerical semantics (fresh prefill
        attends its own fp K/V; a continuation reads the dequantized rows),
        so token-for-token equality with the no-prefix pool is NOT the
        contract at 4 bits (at 8 bits the noise doesn't flip tokens — tested
        above). What IS guaranteed: the stored prefix rows are bit-exact vs
        a fresh prefill, and the served output is deterministic."""
        import numpy as np

        from mquant_tpu.models.llm import (_kv_unpack4, decoder_forward,
                                           init_cache)

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(23))
        sys_p = list(range(10, 22))
        p = sys_p + [3, 1, 4]

        def run():
            eng = ServingEngine(cfg, params, slots=2, max_len=128,
                                steps_per_block=2, spec_k=3, kv_quant=4)
            eng.register_prefix(sys_p)
            rid = eng.submit(p, max_new_tokens=7)
            out = eng.run()[rid]
            assert eng.prefix_hits == 1
            return out, eng

        out1, eng = run()
        out2, _ = run()
        assert out1 == out2 and len(out1) == 7
        # stored prefix rows == fresh-prefill rows, bit-exact
        row = eng._prefixes[0][1]
        fresh = init_cache(cfg, 1, 128, quantized=4)
        _, fresh, _ = decoder_forward(
            cfg, params, jnp.asarray(sys_p)[None], cache=fresh,
            prefill_fresh=True, last_index=jnp.asarray(11, jnp.int32))
        L = len(sys_p)
        for nm in ("k", "v"):
            a = _kv_unpack4(row[nm][:, :, :L], row[nm + "_scale"][:, :, :L],
                            row[nm + "_zp"][:, :, :L], jnp.float32)
            b = _kv_unpack4(fresh[nm][:, :, :L],
                            fresh[nm + "_scale"][:, :, :L],
                            fresh[nm + "_zp"][:, :, :L], jnp.float32)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestWarmup:
    def test_warmup_compiles_without_touching_state(self):
        """warmup precompiles admissions + the block; engine outputs after
        warmup equal a cold engine's."""
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(30))
        p = list(range(1, 9))

        cold = ServingEngine(cfg, params, slots=2, max_len=128,
                             steps_per_block=3)
        rid = cold.submit(p, max_new_tokens=6)
        want = cold.run()[rid]

        warm = ServingEngine(cfg, params, slots=2, max_len=128,
                             steps_per_block=3)
        warm.warmup(prompt_lens=(8, 16))
        n_compiled = len(warm._jit)
        assert n_compiled >= 2  # admission bucket(s) + block
        rid = warm.submit(p, max_new_tokens=6)
        assert warm.run()[rid] == want
        # the run reused the warmed jits for this shape (bucket 16 + block);
        # the request's NTK alpha rides in as DATA, so admit keys carry no
        # alpha — a new NTK band never recompiles admission
        assert ("admit", 16, False, False) in warm._jit
        assert ("block", 3) in warm._jit

    def test_warmup_sampling_and_spec_variants(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(31))
        ServingEngine(cfg, params, slots=2, max_len=64, sample_top_k=8
                      ).warmup(prompt_lens=(8,))
        ServingEngine(cfg, params, slots=2, max_len=64, spec_k=3
                      ).warmup(prompt_lens=(8,))


class TestBucketedCacheGrowth:
    """max_len is a CAP: the pool's KV buffer starts at a small bucket and
    grows to the bucketed high-water mark of admitted work — the decode
    attention streams the whole BUFFER per step, so a 2048-cap engine
    serving 300-token work must not pay 2048 rows of KV reads."""

    def test_starts_small_grows_on_demand_outputs_exact(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.key(0))
        eng = ServingEngine(cfg, params, slots=2, max_len=1024,
                            steps_per_block=4)
        assert int(eng.cache["k"].shape[2]) == 256  # initial bucket
        p_short = np.arange(1, 20, dtype=np.int64)
        p_long = (np.arange(300) % 40 + 1).astype(np.int64)

        solo = {}
        gen = Generator(cfg, params, max_len=1024)
        for nm, p in (("s", p_short), ("l", p_long)):
            out = gen.generate(jnp.asarray(p)[None], max_new_tokens=6)
            solo[nm] = [int(t) for t in np.asarray(out)[0]]

        ra = eng.submit(p_short, max_new_tokens=6)
        assert int(eng.cache["k"].shape[2]) == 256  # short work: no growth
        rb = eng.submit(p_long, max_new_tokens=6)
        # long prompt: admission bucket 512 covers prompt+decode → S=512,
        # half the 1024 cap's KV stream
        assert int(eng.cache["k"].shape[2]) == 512
        outs = eng.run()
        assert outs[ra] == solo["s"]
        assert outs[rb] == solo["l"]

    def test_growth_with_registered_prefix(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.key(0))
        eng = ServingEngine(cfg, params, slots=2, max_len=1024,
                            steps_per_block=4)
        pref = np.arange(1, 33, dtype=np.int64)
        eng.register_prefix(pref)
        # growth must pad the registered row so it stays insertable
        long_req = np.concatenate([pref, (np.arange(270) % 40 + 1)])
        rid = eng.submit(long_req.astype(np.int64), max_new_tokens=5)
        outs = eng.run()
        assert eng.prefix_hits == 1
        gen = Generator(cfg, params, max_len=1024)
        want = np.asarray(gen.generate(jnp.asarray(long_req)[None],
                                       max_new_tokens=5))[0]
        assert outs[rid] == [int(t) for t in want]

    def test_cap_still_enforced(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.key(0))
        eng = ServingEngine(cfg, params, slots=1, max_len=128,
                            steps_per_block=2)
        with pytest.raises(AssertionError):
            eng.submit(np.arange(1, 200, dtype=np.int64), max_new_tokens=8)
