"""Chat templating + resolution bucketing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.buckets import (
    BucketSpec,
    max_bucket_tokens,
    prepare_image,
    resampler_pos_table,
)
from mquant_tpu.serve.chat import build_chat_prompt, build_interleaved


class TestChat:
    @pytest.mark.parametrize("fam", ["qwen2vl", "qwenvl", "internvl",
                                     "minicpmv", "glm4v"])
    def test_prompt_pieces(self, fam):
        p = build_chat_prompt(fam, "What is this?", 64)
        assert "What is this?" in p["text_after"]
        assert p["n_image_tokens"] == 64
        assert isinstance(p["text_before"], str)

    def test_qwen2vl_vision_tags(self):
        p = build_chat_prompt("qwen2vl", "Q", 4)
        assert p["text_before"].endswith("<|vision_start|>")
        assert p["text_after"].startswith("<|vision_end|>")

    def test_interleaved(self):
        segs = ["Compare ", "<image>", " with ", "<image>", "."]
        out = build_interleaved("minicpmv", segs, 64)
        assert [o["kind"] for o in out] == ["text", "image", "text", "image", "text"]
        assert out[1]["n_tokens"] == 64


class ChatMLTok:
    """Char-level mock with <|im_start|>/<|im_end|> as single special ids —
    makes encode(concat) == concat(encode), so piecewise reference token
    construction and whole-text tokenization are comparable."""

    IM_START, IM_END = 100000, 100001
    _SPECIALS = (("<|im_start|>", IM_START), ("<|im_end|>", IM_END))

    def encode(self, s):
        out, i = [], 0
        while i < len(s):
            for lit, tid in self._SPECIALS:
                if s.startswith(lit, i):
                    out.append(tid)
                    i += len(lit)
                    break
            else:
                out.append(ord(s[i]))
                i += 1
        return out


def _ref_make_context(tok, query, history, system, max_window_size):
    """The reference's make_context token construction, transcribed for
    parity checking (ref: model/qwen_generation_utils.py:128-187): per-turn
    ChatML blocks, newest-first window walk, final user turn + assistant
    header always appended."""
    ims, ime = [tok.IM_START], [tok.IM_END]
    nl = tok.encode("\n")

    def tstr(role, content):
        return tok.encode(role) + nl + tok.encode(content)

    sys_tokens = ims + tstr("system", system) + ime
    ctx = []
    for q, a in reversed(history):
        qt = ims + tstr("user", q) + ime
        if a is not None:
            rt = ims + tstr("assistant", a) + ime
            nxt = nl + qt + nl + rt
        else:
            nxt = nl + qt + nl
        if len(sys_tokens) + len(nxt) + len(ctx) < max_window_size:
            ctx = nxt + ctx
        else:
            break
    ctx = sys_tokens + ctx
    ctx += (nl + ims + tstr("user", query) + ime
            + nl + ims + tok.encode("assistant") + nl)
    return ctx


class TestMultiTurnChatML:
    """Protocol-faithful multi-turn contexts: every history turn rendered as
    real ChatML with the reference's token-budget window walk — token-for-
    token equal to make_context (ref: qwen_generation_utils.py:128-187)."""

    HIST = [("first question", "first answer"),
            ("second question?", "longer second answer with detail"),
            ("third", None)]

    @pytest.mark.parametrize("fam", ["qwenvl", "qwen2vl", "internvl"])
    def test_tokens_equal_reference_make_context(self, fam):
        tok = ChatMLTok()
        sys = "You are a helpful assistant."
        p = build_chat_prompt(fam, "final q", 0, system=sys,
                              history=self.HIST, encode=tok.encode)
        got = tok.encode(p["text_before"] + p["text_after"])
        want = _ref_make_context(tok, "final q", self.HIST, sys, 6144)
        assert got == want

    @pytest.mark.parametrize("window", [1, 60, 90, 140, 6144])
    def test_window_truncation_matches_reference(self, window):
        tok = ChatMLTok()
        sys = "sys"
        p = build_chat_prompt("qwenvl", "q", 0, system=sys,
                              history=self.HIST, encode=tok.encode,
                              max_window_size=window)
        got = tok.encode(p["text_before"] + p["text_after"])
        want = _ref_make_context(tok, "q", self.HIST, sys, window)
        assert got == want

    def test_no_tokenizer_keeps_all_turns(self):
        p = build_chat_prompt("qwen2vl", "q", 0, history=self.HIST)
        text = p["text_before"] + p["text_after"]
        for q, a in self.HIST:
            assert q in text
            if a is not None:
                assert a in text
        assert text.count("<|im_start|>user") == len(self.HIST) + 1

    def test_image_prompt_history_precedes_final_turn(self):
        p = build_chat_prompt("qwen2vl", "what is it?", 16,
                              history=[("hello", "hi there")])
        before = p["text_before"]
        assert "hello" in before and "hi there" in before
        assert before.index("hi there") < before.index("<|vision_start|>")
        # history sits between the system block and the final user turn
        assert before.index("<|im_end|>") < before.index("hello")

    def test_multi_image_history(self):
        from mquant_tpu.serve.chat import build_multi_image_prompt

        pieces = build_multi_image_prompt(
            "qwen2vl", "compare", [8, 8], history=[("a", "b")])
        head = pieces[0]["text"]
        assert "<|im_start|>assistant\nb<|im_end|>" in head

    def test_glm4v_history_role_blocks(self):
        p = build_chat_prompt("glm4v", "next", 0,
                              history=[("q1", "a1"), ("q2", "a2")])
        text = p["text_before"] + p["text_after"]
        assert ("<|user|>\nq1<|assistant|>\na1<|user|>\nq2<|assistant|>\n"
                "a2<|user|>\nnext<|assistant|>\n") in text


class Glm4Tok:
    """Char-level mock with the GLM-4 role specials as single ids."""

    _SPECIALS = ("[gMASK]", "<sop>", "<|user|>", "<|assistant|>")

    def encode(self, s):
        out, i = [], 0
        while i < len(s):
            for j, lit in enumerate(self._SPECIALS):
                if s.startswith(lit, i):
                    out.append(200000 + j)
                    i += len(lit)
                    break
            else:
                out.append(ord(s[i]))
                i += 1
        return out


class TestGlm4vHistory:
    """GLM-4V multi-turn contexts get the same protocol treatment as the
    ChatML families: query-only turns preserved (ref behavior,
    qwen_generation_utils.py:150-153) and a newest-first token-budget
    window walk."""

    HIST = [("first question", "first answer"),
            ("second question?", "longer second answer with detail"),
            ("third", None)]

    def _ref_window(self, tok, history, window):
        """Independent transcription of the newest-first budget walk over
        GLM-4 role blocks (head = [gMASK]<sop><|user|>\\n)."""
        nl = len(tok.encode("\n"))
        head = 3 + nl
        ctx, kept = 0, []
        for q, a in reversed(history):
            nxt = len(tok.encode(q)) + 1 + nl
            if a is not None:
                nxt += len(tok.encode(a)) + 1 + nl
            if head + nxt + ctx < window:
                kept.insert(0, (q, a))
                ctx += nxt
            else:
                break
        return kept

    def test_query_only_turn_preserved(self):
        p = build_chat_prompt("glm4v", "final", 0, history=self.HIST)
        text = p["text_before"] + p["text_after"]
        assert "second question?<|assistant|>\nlonger second answer" in text
        assert "third<|user|>\nfinal<|assistant|>\n" in text  # no dropped turn

    @pytest.mark.parametrize("window", [1, 12, 40, 80, 6144])
    def test_window_truncation_newest_first(self, window):
        tok = Glm4Tok()
        p = build_chat_prompt("glm4v", "q", 0, history=self.HIST,
                              encode=tok.encode, max_window_size=window)
        text = p["text_before"] + p["text_after"]
        kept = self._ref_window(tok, self.HIST, window)
        for q, a in self.HIST:
            assert (q in text) == ((q, a) in kept), (window, q)
        # newest-first: whatever is kept is a SUFFIX of the history
        if kept:
            assert kept == self.HIST[-len(kept):]

    def test_tokens_equal_blockwise_construction(self):
        tok = Glm4Tok()
        p = build_chat_prompt("glm4v", "fq", 0, history=self.HIST,
                              encode=tok.encode)
        got = tok.encode(p["text_before"] + p["text_after"])
        want = tok.encode("[gMASK]<sop><|user|>\n")
        for q, a in self.HIST:
            want += tok.encode(q)
            if a is not None:
                want += tok.encode(f"<|assistant|>\n{a}")
            want += tok.encode("<|user|>\n")
        want += tok.encode("fq<|assistant|>\n")
        assert got == want


class TestBuckets:
    def test_choose_aspect(self):
        spec = BucketSpec.default(patch=14, base=448)
        assert spec.choose(448, 448) == (448, 448)
        assert spec.choose(500, 1000)[1] > spec.choose(500, 1000)[0]  # wide
        assert spec.choose(1000, 500)[0] > spec.choose(1000, 500)[1]  # tall

    def test_prepare_image_and_mask(self, rng):
        spec = BucketSpec(patch=4, buckets=((16, 16), (16, 32)))
        img = rng.uniform(size=(20, 21, 3)).astype(np.float32)
        maxtok = max_bucket_tokens(spec)
        out, grid, mask = prepare_image(img, spec, max_tokens=maxtok)
        assert out.shape[0] % 4 == 0 and out.shape[1] % 4 == 0
        assert mask.shape == (maxtok,)
        assert mask.sum() == grid[0] * grid[1]

    def test_pos_table_gamma_division(self, rng):
        g = rng.uniform(0.5, 2.0, size=(16,))
        t1 = resampler_pos_table(16, (2, 2), 8)
        t2 = resampler_pos_table(16, (2, 2), 8, ln_kv_gamma=g)
        np.testing.assert_allclose(t2[:4], t1[:4] / g[None, :], rtol=1e-5)
        np.testing.assert_allclose(t2[4:], 0.0)


class TestMaskedVitForward:
    def test_padded_tokens_do_not_change_valid_outputs(self, rng):
        """The whole point of bucketing: masked padding must not leak into valid
        positions' features (attention key mask) nor calibration stats."""
        import jax
        import jax.numpy as jnp

        from mquant_tpu.models.vision import ViTConfig, init_vit_params, vit_forward

        cfg = ViTConfig(width=32, n_layers=2, n_heads=2, mlp_width=48,
                        patch_dim=48, dtype=jnp.float32)
        params = init_vit_params(cfg, jax.random.key(0))
        x = jnp.asarray(rng.normal(size=(1, 8, 48)), jnp.float32)
        ref, _ = vit_forward(cfg, params, x)
        xp = jnp.concatenate([x, 99.0 * jnp.ones((1, 4, 48), jnp.float32)], axis=1)
        mask = jnp.asarray([[1] * 8 + [0] * 4], jnp.float32)
        out, _ = vit_forward(cfg, params, xp, token_mask=mask)
        np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestGroupedAttention:
    def test_grouped_matches_repeat(self, rng):
        """The grouped-query einsum must equal the naive repeat formulation."""
        import jax.numpy as jnp

        from mquant_tpu.models import layers as L

        B, T, S, H, KVH, hd = 2, 5, 9, 8, 2, 16
        q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, KVH, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, KVH, hd)), jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, size=(B, 1, T, S)), bool)
        mask = mask.at[..., 0].set(True)  # every row attends somewhere
        out = L.attention(q, k, v, mask)

        kr = jnp.repeat(k, H // KVH, axis=2)
        vr = jnp.repeat(v, H // KVH, axis=2)
        logits = jnp.einsum("bthd,bshd->bhts", q, kr) * hd**-0.5
        logits = jnp.where(mask, logits, -1e30)
        ref = jnp.einsum("bhts,bshd->bthd",
                         jax.nn.softmax(logits, axis=-1), vr)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_causal_flag_matches_mask(self, rng):
        import jax.numpy as jnp

        from mquant_tpu.models import layers as L

        B, T, H, hd = 1, 6, 4, 8
        q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
        a = L.attention(q, k, v, causal=True)
        b = L.attention(q, k, v, L.causal_mask(T, T))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


class TestDynamicNTK:
    """Dynamic-NTK long-context RoPE — parity with the reference formula
    (ref: model/modeling_qwen_opt.py:696-707 + RotaryEmbedding:1201-1213)."""

    def _cfg(self, **kw):
        from mquant_tpu.models.llm import DecoderConfig

        return DecoderConfig(vocab=64, hidden=32, n_layers=1, n_heads=2,
                             n_kv_heads=2, intermediate=48, rope_theta=10000.0,
                             use_dynamic_ntk=True, ntk_seq_length=2048,
                             dtype=np.float32, **kw)

    def test_alpha_matches_reference_formula(self):
        import math

        from mquant_tpu.models.llm import ntk_alpha_for

        cfg = self._cfg()
        for T in (128, 2048, 2049, 3000, 4096, 8192, 16384):
            cv = math.log(T / 2048, 2) + 1
            ref = max(2 ** math.ceil(cv) - 1, 1)
            assert ntk_alpha_for(cfg, T) == float(ref), T
        # disabled flag → always 1
        import dataclasses as dc

        off = dc.replace(cfg, use_dynamic_ntk=False)
        assert ntk_alpha_for(off, 8192) == 1.0

    def test_rope_tables_scale_theta(self):
        import jax.numpy as jnp

        from mquant_tpu.models.llm import rope_tables

        cfg = self._cfg()
        pos = jnp.arange(8)[None, :]
        alpha = 3.0
        cos, sin = rope_tables(cfg, pos, jnp.float32, ntk_alpha=alpha)
        # reference: inv_freq from base' = base * alpha ** (d/(d-2))
        d = cfg.head_dim
        base = 10000.0 * alpha ** (d / (d - 2))
        inv = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float32) / d))
        freqs = np.arange(8, dtype=np.float32)[:, None] * inv[None]
        emb = np.concatenate([freqs, freqs], axis=-1)
        np.testing.assert_allclose(np.asarray(cos[0]), np.cos(emb), rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin[0]), np.sin(emb), rtol=1e-5,
                                   atol=1e-5)

    def test_generator_long_prompt_sets_alpha_and_decodes(self):
        import dataclasses as dc

        import jax.numpy as jnp

        from mquant_tpu.models.llm import init_decoder_params
        from mquant_tpu.serve.generate import Generator

        cfg = dc.replace(self._cfg(), ntk_seq_length=16)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        gen = Generator(cfg, params, max_len=96, batch=1)
        toks = jnp.ones((1, 40), jnp.int32)  # 40 > 16 → alpha = 2^ceil(log2(2.5)+1)-1 = 7
        out = gen.generate(toks, max_new_tokens=4)
        assert gen._ntk_alpha == 7.0
        assert out.shape[1] == 4
        # short prompt resets alpha to 1
        gen.generate(jnp.ones((1, 8), jnp.int32), max_new_tokens=2)
        assert gen._ntk_alpha == 1.0

    def test_rope_tables_per_row_alpha_vector(self):
        """A traced (B,) alpha vector gives each row its own theta — equal to
        the static-alpha tables row by row (the per-request serving form)."""
        import jax.numpy as jnp

        from mquant_tpu.models.llm import rope_tables

        cfg = self._cfg()
        pos = jnp.broadcast_to(jnp.arange(6)[None, :], (2, 6))
        cv, sv = rope_tables(cfg, pos, jnp.float32,
                             ntk_alpha=jnp.asarray([1.0, 7.0]))
        for b, a in enumerate((1.0, 7.0)):
            c1, s1 = rope_tables(cfg, pos[b:b + 1], jnp.float32, ntk_alpha=a)
            np.testing.assert_allclose(np.asarray(cv[b]), np.asarray(c1[0]),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(sv[b]), np.asarray(s1[0]),
                                       rtol=1e-5, atol=1e-5)

    def test_engine_pool_per_request_alpha_matches_solo(self):
        """A beyond-the-NTK-band prompt and a short one decode TOGETHER in
        the slot pool, each token-for-token equal to its solo Generator run
        (the solo path computes alpha per request by construction)."""
        import dataclasses as dc

        import jax.numpy as jnp

        from mquant_tpu.models.llm import init_decoder_params
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.generate import Generator

        cfg = dc.replace(self._cfg(), n_layers=2, ntk_seq_length=16)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        long_p = (np.arange(40) % 48 + 3).astype(np.int64)  # alpha 7
        short_p = (np.arange(9) % 48 + 5).astype(np.int64)  # alpha 1

        solo = {}
        gen = Generator(cfg, params, max_len=96, batch=1)
        for name, p in (("long", long_p), ("short", short_p)):
            out = gen.generate(jnp.asarray(p)[None], max_new_tokens=6)
            solo[name] = [int(t) for t in np.asarray(out)[0]]
        assert gen._ntk_alpha == 1.0  # last (short) run

        eng = ServingEngine(cfg, params, slots=2, max_len=96,
                            steps_per_block=3)
        ra = eng.submit(jnp.asarray(long_p), max_new_tokens=6)
        rb = eng.submit(jnp.asarray(short_p), max_new_tokens=6)
        outs = eng.run()
        assert list(eng.alphas) == [7.0, 1.0]
        assert outs[ra] == solo["long"]
        assert outs[rb] == solo["short"]
        # alpha rides into admission as TRACED data: the jit keys carry no
        # alpha, so a new NTK band never recompiles the admission prefill
        admit_keys = [k for k in eng._jit if k[0] in ("admit", "row_step",
                                                      "prefix_fill")]
        assert admit_keys and all(
            not any(isinstance(e, float) for e in k) for k in admit_keys), \
            admit_keys

    def test_engine_spec_decode_per_request_alpha(self):
        """Speculative pool: same per-request alpha exactness (the verify
        forward uses the per-row tables)."""
        import dataclasses as dc

        import jax.numpy as jnp

        from mquant_tpu.models.llm import init_decoder_params
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.generate import Generator

        cfg = dc.replace(self._cfg(), n_layers=2, ntk_seq_length=16)
        params = init_decoder_params(cfg, jax.random.PRNGKey(1))
        long_p = (np.arange(40) % 48 + 3).astype(np.int64)
        gen = Generator(cfg, params, max_len=96, batch=1)
        want = [int(t) for t in np.asarray(
            gen.generate(jnp.asarray(long_p)[None], max_new_tokens=6))[0]]
        eng = ServingEngine(cfg, params, slots=2, max_len=96,
                            steps_per_block=2, spec_k=3)
        rid = eng.submit(jnp.asarray(long_p), max_new_tokens=6)
        assert eng.run()[rid] == want

    def test_prefix_alpha_mismatch_not_matched(self):
        """Under dynamic NTK a stored prefix row is only reusable by requests
        at the SAME alpha (the rope theta is baked into its K rows)."""
        import dataclasses as dc

        import jax.numpy as jnp

        from mquant_tpu.models.llm import init_decoder_params
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.generate import Generator

        cfg = dc.replace(self._cfg(), n_layers=2, ntk_seq_length=16)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        prefix = (np.arange(8) % 48 + 3).astype(np.int64)  # alpha 1 at len 8
        long_tail = (np.arange(32) % 48 + 7).astype(np.int64)
        full = np.concatenate([prefix, long_tail])  # len 40 → alpha 7

        gen = Generator(cfg, params, max_len=96, batch=1)
        want = [int(t) for t in np.asarray(
            gen.generate(jnp.asarray(full)[None], max_new_tokens=5))[0]]

        eng = ServingEngine(cfg, params, slots=2, max_len=96,
                            steps_per_block=3)
        eng.register_prefix(prefix)
        rid = eng.submit(jnp.asarray(full), max_new_tokens=5)
        outs = eng.run()
        assert eng.prefix_hits == 0  # alpha mismatch → prefix unusable
        assert outs[rid] == want
        # same-alpha request (short) DOES hit the prefix
        short = np.concatenate([prefix, prefix[:4] + 1])  # len 12 → alpha 1
        rid2 = eng.submit(jnp.asarray(short), max_new_tokens=4)
        want2 = [int(t) for t in np.asarray(
            gen.generate(jnp.asarray(short)[None], max_new_tokens=4))[0]]
        assert eng.run()[rid2] == want2
        assert eng.prefix_hits == 1


class TestS4Decode:
    """Native-S4 weight storage inside the fused decode loop: exact
    equivalence with int8 storage (same 4-bit grid values, same bf16 dot)."""

    def test_s4_decode_matches_int8(self, monkeypatch):
        import jax.numpy as jnp

        from mquant_tpu.core.quant import QuantParams
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import (DecoderConfig, LLM_SITES,
                                           init_decoder_params)
        from mquant_tpu.serve.generate import Generator
        from mquant_tpu.transform.recipes import realize_decoder_weights

        cfg = DecoderConfig(vocab=128, hidden=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=96, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8, a_static=True)
                 for n in LLM_SITES}
        state = {f"llm.{n}": {"act": QuantParams(
            scale=jnp.full((2,), 0.05, jnp.float32))} for n in LLM_SITES}
        rp = realize_decoder_weights(params, specs)
        toks = jnp.ones((1, 8), jnp.int32)

        monkeypatch.setenv("MQUANT_DECODE_S4", "0")
        a = Generator(cfg, rp, specs=specs, state=state, mode="real",
                      max_len=64).generate_on_device(toks, max_new_tokens=6)
        monkeypatch.setenv("MQUANT_DECODE_S4", "1")
        b = Generator(cfg, rp, specs=specs, state=state, mode="real",
                      max_len=64).generate_on_device(toks, max_new_tokens=6)
        assert (np.asarray(a) == np.asarray(b)).all()
        # SINGLE-RESIDENT packed storage + fused q/k/v, gate/up groups (the
        # pallas_w4 serving default; on CPU the packed GEMM falls back to
        # unpack+dot, exercising pack/fuse/slice + packed PREFILL end-to-end)
        monkeypatch.setenv("MQUANT_GEMV", "pallas_w4")
        g = Generator(cfg, rp, specs=specs, state=state, mode="real",
                      max_len=64)
        assert "layers_packed" not in g.params  # ONE resident copy
        assert g.params["layers"]["q"].get("w_q_fused") is not None
        assert "w_q" not in g.params["layers"]["q"]  # int8 copy dropped
        c = g.generate_on_device(toks, max_new_tokens=6)
        assert (np.asarray(a) == np.asarray(c)).all()
        # dual residency (round-3 design, kept for A/B): int8 + packed copy
        monkeypatch.setenv("MQUANT_W4_RESIDENT", "dual")
        g2 = Generator(cfg, rp, specs=specs, state=state, mode="real",
                       max_len=64)
        assert "layers_packed" in g2.params
        d = g2.generate_on_device(toks, max_new_tokens=6)
        assert (np.asarray(a) == np.asarray(d)).all()
        # int8 residency: in-jit packing per fused loop, no persistent copy
        monkeypatch.setenv("MQUANT_W4_RESIDENT", "int8")
        e = Generator(cfg, rp, specs=specs, state=state, mode="real",
                      max_len=64).generate_on_device(toks, max_new_tokens=6)
        assert (np.asarray(a) == np.asarray(e)).all()
        # packed residency under the XLA GEMV: per-site packed bytes (no
        # fusion), decode re-stores as native S4 from PACKED input in-loop
        monkeypatch.setenv("MQUANT_W4_RESIDENT", "packed")
        monkeypatch.setenv("MQUANT_GEMV", "xla")
        g3 = Generator(cfg, rp, specs=specs, state=state, mode="real",
                       max_len=64)
        assert g3.params["layers"]["q"].get("w_q_fused") is None
        assert (g3.params["layers"]["q"]["w_q"].shape[-2] * 2
                == cfg.hidden)  # packed bytes resident
        f = g3.generate_on_device(toks, max_new_tokens=6)
        assert (np.asarray(a) == np.asarray(f)).all()


class TestBatchedServing:
    def test_batch_matches_single(self):
        import jax.numpy as jnp

        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.generate import Generator

        cfg = DecoderConfig(vocab=96, hidden=48, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        gen = Generator(cfg, params, max_len=64)
        a = jnp.arange(1, 9)[None]           # prompt A (1, 8)
        b = jnp.arange(11, 19)[None]         # prompt B (1, 8)
        ab = jnp.concatenate([a, b], axis=0)  # (2, 8)
        out_ab = np.asarray(gen.generate_on_device(ab, max_new_tokens=5))
        out_a = np.asarray(gen.generate_on_device(a, max_new_tokens=5))
        out_b = np.asarray(gen.generate_on_device(b, max_new_tokens=5))
        assert (out_ab[0] == out_a[0]).all()
        assert (out_ab[1] == out_b[0]).all()


class TestRaggedBatch:
    """Left-padded ragged batching: different-length prompts in one batch
    decode token-for-token like individual runs (pad columns masked, RoPE's
    relative phases unaffected by the per-row shift)."""

    def test_ragged_matches_individual(self):
        import jax.numpy as jnp

        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.generate import Generator

        cfg = DecoderConfig(vocab=96, hidden=48, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        gen = Generator(cfg, params, max_len=64)
        seqs = [[5, 9, 12], [7, 1, 2, 3, 4, 8, 11], [20] * 12]
        outs = gen.generate_batch(seqs, max_new_tokens=5)
        for s, o in zip(seqs, outs):
            ref = np.asarray(gen.generate(jnp.asarray(s)[None],
                                          max_new_tokens=5))[0]
            assert o == list(ref), (s, o, list(ref))

    def test_ragged_eos_trim(self):
        import jax.numpy as jnp

        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.generate import Generator

        cfg = DecoderConfig(vocab=32, hidden=32, n_layers=1, n_heads=2,
                            n_kv_heads=2, intermediate=48, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(1))
        gen = Generator(cfg, params, max_len=64)
        outs = gen.generate_batch([[3, 4], [5, 6, 7]], max_new_tokens=6,
                                  eos_id=0)
        assert all(0 not in o for o in outs)


class TestChunkedPrefill:
    def test_chunked_matches_single_shot(self):
        import jax.numpy as jnp

        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.generate import Generator

        cfg = DecoderConfig(vocab=96, hidden=48, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        gen = Generator(cfg, params, max_len=96)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 22), 1, 90)
        ref, _ = gen.prefill(toks)
        got, cache = gen.prefill_chunked(toks, chunk=8)  # 8+8+6 pieces
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # decode continues correctly from the chunked cache
        step = gen._decode()
        tok = jnp.argmax(got, axis=-1)[:, None].astype(jnp.int32)
        logits, _ = step(params, tok, cache)
        assert bool(jnp.all(jnp.isfinite(logits)))


class TestFusedEosEarlyExit:
    """The fused on-device decode loops handle eos themselves (while_loop with
    a per-row done mask): outputs must equal the host per-step loop's, with
    finished rows frozen to eos."""

    def _cfg_params(self):
        import jax.numpy as jnp

        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params

        cfg = DecoderConfig(vocab=32, hidden=32, n_layers=2, n_heads=2,
                            n_kv_heads=2, intermediate=48, dtype=jnp.float32)
        return cfg, init_decoder_params(cfg, jax.random.PRNGKey(3))

    def test_on_device_eos_matches_host_loop(self):
        import jax.numpy as jnp

        from mquant_tpu.serve.generate import Generator

        cfg, params = self._cfg_params()
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 1, 30)
        # pick the eos id as a token the model actually produces so the early
        # exit genuinely triggers
        gen = Generator(cfg, params, max_len=64)
        free = gen.generate(toks, max_new_tokens=8)
        eos = int(np.asarray(free)[0, 3])  # 4th generated token of row 0

        host = np.asarray(Generator(cfg, params, max_len=64)
                          .generate(toks, max_new_tokens=8, eos_id=eos))
        dev = np.asarray(Generator(cfg, params, max_len=64)
                         .generate_on_device(toks, max_new_tokens=8,
                                             eos_id=eos))
        # host loop stops when ALL rows have hit eos; before that point the
        # streams must agree, and fused rows after their own eos are frozen
        for r in range(2):
            h = list(host[r])
            d = list(dev[r][:len(h)])
            cut = h.index(eos) if eos in h else len(h)
            assert d[:cut + 1] == h[:cut + 1], (r, h, d)
        # frozen tail: everything after a row's eos is eos
        for r in range(2):
            row = list(dev[r])
            if eos in row:
                i = row.index(eos)
                assert all(t == eos for t in row[i:]), row

    def test_ragged_fused_eos_matches_serial(self):
        import jax.numpy as jnp

        from mquant_tpu.serve.generate import Generator

        cfg, params = self._cfg_params()
        gen = Generator(cfg, params, max_len=64)
        # derive an eos that occurs for one of the prompts
        probe = gen.generate_batch([[3, 4], [5, 6, 7]], max_new_tokens=8)
        eos = probe[0][2]
        outs = Generator(cfg, params, max_len=64).generate_batch(
            [[3, 4], [5, 6, 7]], max_new_tokens=8, eos_id=eos)
        # serial reference rows
        for seq, got in zip([[3, 4], [5, 6, 7]], outs):
            ref = Generator(cfg, params, max_len=64).generate(
                jnp.asarray([seq]), max_new_tokens=8, eos_id=eos)
            ref = [int(t) for t in np.asarray(ref)[0]]
            ref = ref[:ref.index(eos)] if eos in ref else ref
            assert got == ref, (seq, got, ref)


class TestCapacityReset:
    def test_reset_capacity_shrinks_and_serves(self):
        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.generate import Generator

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=1, n_heads=4,
                            n_kv_heads=2, intermediate=48, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        gen = Generator(cfg, params, max_len=64)
        long_p = jnp.ones((1, 100), jnp.int32)
        ref_long = gen.generate_on_device(long_p, max_new_tokens=4)
        assert gen.max_len >= 128  # sticky growth happened
        short = jnp.arange(1, 9)[None]
        ref_short = gen.generate_on_device(short, max_new_tokens=4)
        gen.reset_capacity(16)
        assert gen.max_len == 32
        out = gen.generate_on_device(short, max_new_tokens=4)
        assert (np.asarray(out) == np.asarray(ref_short)).all()


class TestEngineStats:
    def test_stats_shape(self):
        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
        from mquant_tpu.serve.engine import ServingEngine

        cfg = DecoderConfig(vocab=64, hidden=32, n_layers=1, n_heads=4,
                            n_kv_heads=2, intermediate=48, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.PRNGKey(1))
        eng = ServingEngine(cfg, params, slots=2, max_len=64, spec_k=3,
                            steps_per_block=2)
        eng.submit([1, 2, 3], max_new_tokens=40)
        s0 = eng.stats()
        assert s0["queued"] == 1 and s0["active"] == 0
        eng.step_block()
        s1 = eng.stats()  # 40 tokens can't finish in one 2-round block
        assert s1["occupancy"] > 0 and s1["spec_accept_per_round"] >= 1.0
        eng.run()


class TestCompilationCache:
    """Persistent XLA compile cache wiring (serve/server.py boot, bench.py,
    exam CLI) — kills the measured 548 s W4A8 cold start on warm boots."""

    def test_enable_sets_config_and_creates_dir(self, tmp_path):
        import jax

        from mquant_tpu.utils.misc import enable_compilation_cache

        prev = jax.config.jax_compilation_cache_dir
        try:
            d = str(tmp_path / "xla_cache")
            got = enable_compilation_cache(d)
            assert got == d
            assert (tmp_path / "xla_cache").is_dir()
            assert jax.config.jax_compilation_cache_dir == d
            assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_env_off_disables(self, tmp_path, monkeypatch):
        import jax

        from mquant_tpu.utils.misc import enable_compilation_cache

        prev = jax.config.jax_compilation_cache_dir
        monkeypatch.setenv("MQUANT_COMPILE_CACHE", "off")
        try:
            assert enable_compilation_cache(str(tmp_path / "x")) == ""
            assert not (tmp_path / "x").exists()
            assert jax.config.jax_compilation_cache_dir == prev
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)


class TestRaggedPerRowNTK:
    """generate_batch derives each row's dynamic-NTK alpha from ITS OWN
    prompt length (as the engine does) — a short row batched with a long
    one must decode token-for-token like its solo run even when the two
    rows land in different NTK bands (ref: modeling_qwen_opt.py:696-707)."""

    def test_cross_band_rows_match_solo(self):
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from mquant_tpu.models.llm import (DecoderConfig, init_decoder_params,
                                           ntk_alpha_for)
        from mquant_tpu.serve.generate import Generator

        cfg = DecoderConfig(vocab=96, hidden=48, n_layers=2, n_heads=4,
                            n_kv_heads=2, intermediate=64, dtype=jnp.float32,
                            use_dynamic_ntk=True, ntk_seq_length=16)
        params = init_decoder_params(cfg, jax.random.PRNGKey(2))
        short = [5, 9, 12]                       # alpha 1 band
        long = list(range(3, 43))                # 40 tokens → alpha > 1
        assert (ntk_alpha_for(cfg, len(short))
                != ntk_alpha_for(cfg, len(long))), "bands must differ"
        gen = Generator(cfg, params, max_len=96)
        outs = gen.generate_batch([short, long], max_new_tokens=6)
        for s, o in zip([short, long], outs):
            solo = Generator(cfg, params, max_len=96)
            ref = np.asarray(solo.generate(jnp.asarray(s)[None],
                                           max_new_tokens=6))[0]
            assert o == list(ref), (len(s), o, list(ref))
