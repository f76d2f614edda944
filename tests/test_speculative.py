"""Self-speculative decoding: exactness vs plain greedy + drafting behavior.

The guarantee under test: speculative output == plain greedy decode
token-for-token REGARDLESS of draft quality (ref parity anchor: the
reference's HF generate is plain greedy, vlmeval/vlm/base.py:99-121 —
speculation must be unobservable in the output)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
from mquant_tpu.serve.generate import Generator
from mquant_tpu.serve.speculative import ngram_propose, speculative_generate


def _cfg(**kw):
    base = dict(vocab=96, hidden=48, n_layers=2, n_heads=4, n_kv_heads=2,
                intermediate=64, dtype=jnp.float32)
    base.update(kw)
    return DecoderConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    return cfg, init_decoder_params(cfg, jax.random.PRNGKey(0))


def _greedy(cfg, params, toks, n, eos_id=None, **kw):
    g = Generator(cfg, params, max_len=256, **kw)
    out = np.asarray(g.generate_on_device(
        jnp.asarray(toks), max_new_tokens=n, eos_id=eos_id))[0]
    out = [int(t) for t in out]
    if eos_id is not None and eos_id in out:
        out = out[:out.index(eos_id)]
    return np.asarray(out, np.int32)


def _spec(cfg, params, toks, n, eos_id=None, k=5, **kw):
    g = Generator(cfg, params, max_len=256, **kw)
    return speculative_generate(g, jnp.asarray(toks), max_new_tokens=n,
                                k=k, eos_id=eos_id, return_stats=True)


class TestExactness:
    def test_matches_plain_greedy(self, setup):
        cfg, params = setup
        toks = np.array([[5, 9, 2, 7, 5, 9, 2, 7, 5, 9]])  # repetitive
        ref = _greedy(cfg, params, toks, 24)
        out, stats = _spec(cfg, params, toks, 24)
        np.testing.assert_array_equal(out, ref)
        assert stats["iters"] >= 1

    def test_matches_on_nonrepetitive_prompt(self, setup):
        cfg, params = setup
        toks = np.arange(1, 14)[None]  # no recurring n-gram in the prompt
        ref = _greedy(cfg, params, toks, 16)
        out, _ = _spec(cfg, params, toks, 16)
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("k", [1, 3, 7])
    def test_matches_for_every_draft_len(self, setup, k):
        cfg, params = setup
        toks = np.array([[3, 1, 4, 1, 5, 9, 2, 6]])
        ref = _greedy(cfg, params, toks, 20)
        out, _ = _spec(cfg, params, toks, 20, k=k)
        np.testing.assert_array_equal(out, ref)

    def test_eos_trim_matches(self, setup):
        cfg, params = setup
        toks = np.array([[5, 9, 2, 7, 5, 9, 2, 7]])
        base = _greedy(cfg, params, toks, 24)
        # pick an eos that actually occurs mid-stream so the trim is exercised
        eos = int(base[len(base) // 2])
        ref = _greedy(cfg, params, toks, 24, eos_id=eos)
        out, _ = _spec(cfg, params, toks, 24, eos_id=eos)
        np.testing.assert_array_equal(out, ref)

    def test_real_int_path(self):
        """Speculation through the real-int serving path (W4A8 realized):
        draft/verify/rollback must compose with S4 weight streaming and
        static int8 activation scales."""
        from mquant_tpu.core.quant import QuantParams
        from mquant_tpu.models.layers import SiteSpec
        from mquant_tpu.models.llm import LLM_SITES
        from mquant_tpu.transform.recipes import realize_decoder_weights

        cfg = _cfg(hidden=64, intermediate=96, vocab=128)
        params = init_decoder_params(cfg, jax.random.PRNGKey(7))
        specs = {f"llm.{n}": SiteSpec(w_bits=4, a_bits=8, a_static=True)
                 for n in LLM_SITES}
        state = {f"llm.{n}": {"act": QuantParams(
            scale=jnp.full((2,), 0.05, jnp.float32))} for n in LLM_SITES}
        rp = realize_decoder_weights(params, specs)
        toks = np.array([[5, 9, 2, 7, 5, 9, 2, 7, 5, 9]])
        ref = _greedy(cfg, rp, toks, 16, specs=specs, state=state,
                      mode="real")
        out, _ = _spec(cfg, rp, toks, 16, specs=specs, state=state,
                       mode="real")
        np.testing.assert_array_equal(out, ref)


class TestDrafting:
    def test_ngram_propose_finds_continuation(self):
        ctx = jnp.zeros((64,), jnp.int32)
        seq = jnp.asarray([10, 11, 12, 13, 14, 20, 21, 10, 11, 12],
                          jnp.int32)
        ctx = ctx.at[:10].set(seq)
        # suffix [10,11,12] recurs at 0; continuation is [13,14,20,21]
        d = np.asarray(ngram_propose(ctx, jnp.int32(10), k=4))
        np.testing.assert_array_equal(d, [13, 14, 20, 21])

    def test_ngram_prefers_latest_match(self):
        ctx = jnp.zeros((64,), jnp.int32)
        seq = jnp.asarray([7, 8, 1, 7, 8, 2, 7, 8], jnp.int32)
        ctx = ctx.at[:8].set(seq)
        # bigram [7,8] occurs at 0 (→1) and 3 (→2); latest wins → 2
        d = np.asarray(ngram_propose(ctx, jnp.int32(8), k=1))
        assert d[0] == 2

    def test_acceptance_beats_one_on_cycling_output(self, setup):
        """Tiny random models cycle under greedy decode; once the cycle is in
        the history the n-gram draft predicts it — accepted/iter must
        exceed 1 (the speedup mechanism, not just the correctness)."""
        cfg, params = setup
        best = 0.0
        for seed in range(4):
            toks = np.asarray(
                jax.random.randint(jax.random.PRNGKey(seed), (1, 8), 1, 90))
            out, stats = _spec(cfg, params, toks, 48, k=5)
            best = max(best, stats["accepted_per_iter"])
        assert best > 1.0, best
