"""HTTP serving front-end tests: OpenAI-style API over the engine.

Claims under test:
  1. /v1/completions returns exactly the tokens the engine produces solo.
  2. Concurrent requests from many HTTP threads all match their solo runs
     (continuous batching behind one scheduler thread).
  3. Streaming chunks concatenate to the non-streamed output.
  4. Chat endpoint renders the family template; /metrics and /health live.
"""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mquant_tpu.models.llm import DecoderConfig, init_decoder_params
from mquant_tpu.serve.engine import ServingEngine
from mquant_tpu.serve.generate import Generator
from mquant_tpu.serve.server import InferenceServer


def _cfg(**kw):
    base = dict(vocab=96, hidden=48, n_layers=2, n_heads=4, n_kv_heads=2,
                intermediate=64, dtype=jnp.float32)
    base.update(kw)
    return DecoderConfig(**base)


class ToyTokenizer:
    """Deterministic text↔ids for tests: one id per character, mod vocab."""

    def encode(self, s):
        return [1 + (ord(c) % 90) for c in s]

    def decode(self, ids):
        return "".join(chr(97 + (t % 26)) for t in ids)


def _solo(cfg, params, prompt, n):
    gen = Generator(cfg, params, max_len=128)
    out = gen.generate(jnp.asarray(prompt)[None], max_new_tokens=n)
    return [int(t) for t in np.asarray(out)[0]]


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, json.loads(data)


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


@pytest.fixture(scope="module")
def served():
    cfg = _cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    eng = ServingEngine(cfg, params, slots=2, max_len=128, steps_per_block=3)
    srv = InferenceServer(eng, tokenizer=ToyTokenizer(), port=0)
    yield cfg, params, srv
    srv.shutdown()


class TestCompletions:
    def test_ids_roundtrip_matches_solo(self, served):
        cfg, params, srv = served
        prompt = list(range(1, 9))
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": prompt, "max_tokens": 7})
        assert status == 200
        assert out["choices"][0]["tokens"] == _solo(cfg, params, prompt, 7)
        assert out["usage"]["completion_tokens"] == 7

    def test_text_prompt_uses_tokenizer(self, served):
        cfg, params, srv = served
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": "hello", "max_tokens": 4})
        assert status == 200
        ids = ToyTokenizer().encode("hello")
        assert out["choices"][0]["tokens"] == _solo(cfg, params, ids, 4)
        assert isinstance(out["choices"][0]["text"], str)

    def test_concurrent_requests_all_exact(self, served):
        cfg, params, srv = served
        prompts = [list(range(1 + 7 * i, 6 + 7 * i)) for i in range(5)]
        results = [None] * len(prompts)

        def worker(i):
            _, out = _post(srv.port, "/v1/completions",
                           {"prompt": prompts[i], "max_tokens": 6})
            results[i] = out["choices"][0]["tokens"]

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        for i, p in enumerate(prompts):
            assert results[i] == _solo(cfg, params, p, 6), i

    def test_bad_requests(self, served):
        _, _, srv = served
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [], "max_tokens": 2})
        assert status == 400
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": {"not": "valid"}})
        assert status == 400
        # over-capacity prompt surfaces as a 400, not a server crash
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": list(range(1, 300)), "max_tokens": 8})
        assert status == 400 and "error" in out

    def test_streaming_concatenates_to_full(self, served):
        cfg, params, srv = served
        prompt = list(range(3, 11))
        want = _solo(cfg, params, prompt, 9)
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": prompt, "max_tokens": 9,
                                 "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"
        body = resp.read().decode()  # http.client de-chunks
        conn.close()
        events = [ln[len("data: "):] for ln in body.split("\n")
                  if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        got = []
        n_chunks = 0
        for ev in events[:-1]:
            payload = json.loads(ev)
            got.extend(payload["choices"][0]["tokens"])
            n_chunks += 1
        assert got == want
        assert n_chunks >= 2  # streamed at block granularity, not one blob


class TestChatAndOps:
    def test_chat_completion(self, served):
        cfg, params, srv = served
        status, out = _post(srv.port, "/v1/chat/completions",
                            {"messages": [
                                {"role": "system", "content": "be brief"},
                                {"role": "user", "content": "hi"}],
                             "max_tokens": 5})
        assert status == 200
        assert out["object"] == "chat.completion"
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)
        # template rendering matches the family builder
        from mquant_tpu.serve.chat import build_chat_prompt
        pieces = build_chat_prompt("qwen2vl", "hi", 0, system="be brief")
        ids = ToyTokenizer().encode(
            pieces["text_before"] + pieces["text_after"])
        assert out["choices"][0]["tokens"] == _solo(cfg, params, ids, 5)

    def test_chat_requires_messages(self, served):
        _, _, srv = served
        status, _ = _post(srv.port, "/v1/chat/completions", {"messages": []})
        assert status == 400

    def test_multi_turn_chat_renders_real_chatml(self, served):
        """History turns over HTTP arrive as per-turn ChatML blocks (ref
        make_context parity), not role-prefixed prose."""
        cfg, params, _ = served
        # multi-turn ChatML needs more room than the shared fixture's 128
        eng = ServingEngine(cfg, params, slots=2, max_len=256,
                            steps_per_block=3)
        srv = InferenceServer(eng, tokenizer=ToyTokenizer(), port=0)
        try:
            msgs = [{"role": "system", "content": "be brief"},
                    {"role": "user", "content": "first q"},
                    {"role": "assistant", "content": "first a"},
                    {"role": "user", "content": "second q"}]
            status, out = _post(srv.port, "/v1/chat/completions",
                                {"messages": msgs, "max_tokens": 5})
        finally:
            srv.shutdown()
        assert status == 200
        from mquant_tpu.serve.chat import build_chat_prompt
        tok = ToyTokenizer()
        pieces = build_chat_prompt(
            "qwen2vl", "second q", 0, system="be brief",
            history=[("first q", "first a")], encode=tok.encode)
        text = pieces["text_before"] + pieces["text_after"]
        assert "<|im_start|>user\nfirst q<|im_end|>" in text
        assert "<|im_start|>assistant\nfirst a<|im_end|>" in text
        ids = tok.encode(text)
        gen = Generator(cfg, params, max_len=256)
        want = gen.generate(jnp.asarray(ids)[None], max_new_tokens=5)
        assert out["choices"][0]["tokens"] == [int(t) for t in
                                               np.asarray(want)[0]]

    def test_health_models_metrics(self, served):
        _, _, srv = served
        status, body = _get(srv.port, "/health")
        assert status == 200 and json.loads(body)["status"] == "ok"
        status, body = _get(srv.port, "/v1/models")
        assert json.loads(body)["data"][0]["id"] == "mquant-tpu"
        status, body = _get(srv.port, "/metrics")
        assert status == 200
        text = body.decode()
        assert "mquant_requests_total" in text
        assert "mquant_slots 2" in text

    def test_404(self, served):
        _, _, srv = served
        status, _ = _get(srv.port, "/nope")
        assert status == 404


class TestVLMServer:
    """Image chat requests: base64 image part → vision encode + splice on the
    scheduler thread → slot pool; output equals VLMRunner.serve_engine."""

    @pytest.fixture(scope="class")
    def vlm_served(self):
        from mquant_tpu.models.qwen2vl import (Qwen2VLConfig,
                                               init_qwen2vl_params)
        from mquant_tpu.evaluation.adapter import VLMRunner
        from mquant_tpu.serve.server import InferenceServer

        cfg = Qwen2VLConfig.tiny()
        params = init_qwen2vl_params(cfg, jax.random.key(0))
        runner = VLMRunner("qwen2vl", cfg, params, max_len=128,
                           max_new_tokens=6)
        srv = InferenceServer.for_vlm(runner, slots=2, max_len=512)
        yield runner, srv
        srv.shutdown()

    @staticmethod
    def _png_b64(rng_seed=0, size=24):
        import base64
        import io

        from PIL import Image

        arr = (np.random.default_rng(rng_seed)
               .random((size, size, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode()), arr

    def test_image_chat_matches_serve_engine(self, vlm_served):
        runner, srv = vlm_served
        url, arr = self._png_b64()
        status, out = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "what is this?"},
                {"type": "image_url", "image_url": {"url": url}},
            ]}],
            "max_tokens": 6})
        assert status == 200, out
        want = runner.serve_engine(
            [{"text": "what is this?", "image": arr}], max_new_tokens=6)[0]
        assert out["choices"][0]["message"]["content"] == want

    def test_text_only_chat_still_works(self, vlm_served):
        runner, srv = vlm_served
        status, out = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 4})
        assert status == 200, out
        assert isinstance(out["choices"][0]["message"]["content"], str)

    def test_bad_image_is_400(self, vlm_served):
        _, srv = vlm_served
        status, out = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "data:image/png;base64,notbase64!!"}},
            ]}],
            "max_tokens": 4})
        assert status == 400 and "error" in out


class TestDeployFromArtifact:
    """Quantize once → artifact → HTTP server, no Python config object."""

    def test_config_roundtrip_all_families(self):
        import json

        from mquant_tpu.models.registry import get_family
        from mquant_tpu.utils.checkpoint import (config_from_dict,
                                                 config_to_dict)

        for name in ("qwen2vl", "qwenvl", "internvl", "minicpmv", "glm4v"):
            cfg = get_family(name).tiny_fn()
            d = json.loads(json.dumps(config_to_dict(cfg)))  # through JSON
            assert config_from_dict(d) == cfg, name

    def test_artifact_to_server(self, tmp_path):
        from mquant_tpu.pipeline import QuantizeConfig, run_pipeline
        from mquant_tpu.serve.server import build_server_from_artifact

        art = str(tmp_path / "art")
        q = QuantizeConfig(llm_w_bits=4, visual_w_bits=8, calib_num=16,
                           nsamples=8, realize_int=False)
        run_pipeline("qwen2vl", q, tiny=True, artifact_dir=art)

        srv = build_server_from_artifact(art, slots=2, max_len=256, port=0)
        try:
            status, out = _post(srv.port, "/v1/completions",
                                {"prompt": list(range(1, 9)),
                                 "max_tokens": 5})
            assert status == 200, out
            toks = out["choices"][0]["tokens"]
            assert len(toks) == 5 and all(isinstance(t, int) for t in toks)
            # the server runs the QUANTIZED model: same artifact through a
            # direct fake-quant generator gives the same tokens
            from mquant_tpu.models.registry import get_family
            from mquant_tpu.serve.generate import Generator
            from mquant_tpu.utils.checkpoint import (config_from_dict,
                                                     load_artifact)

            params, state, specs, meta = load_artifact(art)
            cfg = config_from_dict(meta["config_dict"])
            gen = Generator(cfg.llm, params["llm"], specs=specs, state=state,
                            mode="fake", max_len=256)
            ref = gen.generate(jnp.asarray(list(range(1, 9)))[None],
                               max_new_tokens=5)
            assert toks == [int(t) for t in np.asarray(ref)[0]]
        finally:
            srv.shutdown()


class TestCancellation:
    def test_engine_cancel_states(self):
        """Cancel in each lifecycle state; surviving requests still exact."""
        from mquant_tpu.serve.engine import ServingEngine

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(3))
        eng = ServingEngine(cfg, params, slots=1, max_len=128,
                            steps_per_block=2)
        ra = eng.submit(list(range(1, 6)), max_new_tokens=8)
        rb = eng.submit(list(range(20, 26)), max_new_tokens=6)  # queued
        assert eng.cancel(rb)           # cancel while queued
        eng.step_block()                 # A decoding
        assert eng.cancel(ra)            # cancel while active
        finished = {}
        while eng._queue or any(eng._active):
            finished.update(eng.step_block())
        assert rb not in finished or finished[rb] == []
        # a fresh request after cancellations is unaffected
        rc = eng.submit(list(range(40, 45)), max_new_tokens=6)
        outs = eng.run()
        assert outs[rc] == _solo(cfg, params, list(range(40, 45)), 6)
        assert not eng.cancel(rc)        # already finished → False

    def test_stream_disconnect_frees_slot(self, served):
        """A streaming client that hangs up mid-response gets cancelled by
        the worker; the engine keeps serving others and /metrics counts it."""
        import time as _time

        cfg, params, srv = served
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.request("POST", "/v1/completions",
                     json.dumps({"prompt": list(range(1, 7)),
                                 "max_tokens": 64, "stream": True}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        resp.read(40)          # first bytes arrive → request is decoding
        import socket as _socket

        # plain close() would not close the OS socket (the response's
        # makefile holds a reference) — shutdown() forces the FIN
        conn.sock.shutdown(_socket.SHUT_RDWR)
        conn.sock.close()      # hang up mid-stream
        # another request proceeds normally while the dead one unwinds
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": list(range(8, 14)), "max_tokens": 5})
        assert status == 200
        assert out["choices"][0]["tokens"] == _solo(
            cfg, params, list(range(8, 14)), 5)
        for _ in range(200):   # worker notices on its next write attempt
            if srv.worker.cancelled_total >= 1:
                break
            _time.sleep(0.05)
        assert srv.worker.cancelled_total >= 1

    def test_latency_metrics_exposed(self, served):
        _, _, srv = served
        _post(srv.port, "/v1/completions",
              {"prompt": [5, 6, 7], "max_tokens": 3})
        status, body = _get(srv.port, "/metrics")
        text = body.decode()
        assert "mquant_ttft_seconds_sum" in text
        assert "mquant_request_count" in text
        s = srv.worker.stats()
        assert s["request_count"] >= 1 and s["ttft_count"] >= 1
        assert s["request_seconds_sum"] > 0


class TestSampling:
    """Stochastic decoding in the pool: per-row temperature/top_p, static
    top-k cap, seed-keyed determinism; greedy rows stay exactly greedy."""

    def _engine(self, seed=0, **kw):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(11))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3, sample_top_k=8, seed=seed,
                            **kw)
        return cfg, params, eng

    def test_temp_zero_equals_greedy_even_in_sampling_engine(self):
        cfg, params, eng = self._engine()
        p = list(range(1, 8))
        rid = eng.submit(p, max_new_tokens=7, temperature=0.0)
        outs = eng.run()
        assert outs[rid] == _solo(cfg, params, p, 7)

    def test_mixed_pool_greedy_row_unpolluted(self):
        """A sampling row next to a greedy row: the greedy row's output is
        unchanged token-for-token."""
        cfg, params, eng = self._engine()
        pg, ps = list(range(1, 8)), list(range(30, 36))
        rg = eng.submit(pg, max_new_tokens=7, temperature=0.0)
        rs = eng.submit(ps, max_new_tokens=7, temperature=1.5, top_p=0.9)
        outs = eng.run()
        assert outs[rg] == _solo(cfg, params, pg, 7)
        assert len(outs[rs]) == 7

    def test_same_seed_reproduces_other_seed_differs(self):
        p = list(range(5, 12))

        def run(seed):
            _, _, eng = self._engine(seed=seed)
            rid = eng.submit(p, max_new_tokens=12, temperature=2.0)
            return eng.run()[rid]

        a, b = run(7), run(7)
        assert a == b  # deterministic replay
        outs = {tuple(run(s)) for s in (7, 8, 9, 10)}
        assert len(outs) > 1  # seeds actually vary the tokens

    def test_sampling_actually_deviates_from_greedy(self):
        cfg, params, eng = self._engine(seed=3)
        p = list(range(2, 9))
        greedy = _solo(cfg, params, p, 16)
        rid = eng.submit(p, max_new_tokens=16, temperature=3.0)
        sampled = eng.run()[rid]
        assert sampled != greedy  # at temp 3 on a flat tiny model

    def test_top_p_one_point_zero_valid(self):
        _, _, eng = self._engine()
        rid = eng.submit(list(range(1, 5)), max_new_tokens=5,
                         temperature=0.8, top_p=1.0)
        assert len(eng.run()[rid]) == 5

    def test_requires_sampling_engine(self):
        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(11))
        eng = ServingEngine(cfg, params, slots=1, max_len=64)
        with pytest.raises(AssertionError):
            eng.submit([1, 2, 3], max_new_tokens=4, temperature=1.0)

    def test_http_temperature_plumbs(self, served):
        """The shared fixture engine is greedy-only: a sampled request is a
        clean 400, not a crash; temperature=0 passes through."""
        _, _, srv = served
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [1, 2, 3], "max_tokens": 3,
                             "temperature": 0.7})
        assert status == 400 and "sample_top_k" in out["error"]
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [1, 2, 3], "max_tokens": 3,
                             "temperature": 0})
        assert status == 200


class TestStopStrings:
    def test_stop_truncates_and_frees_slot(self, served):
        """A stop string ends the request early: finish_reason "stop", text
        truncated before the match, far fewer tokens than max_tokens."""
        cfg, params, srv = served
        # find what the model says greedily, pick a substring as the stop
        full = _solo(cfg, params, list(range(1, 7)), 24)
        text = ToyTokenizer().decode(full)
        stop = text[8:11]
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": list(range(1, 7)), "max_tokens": 24,
                             "stop": stop})
        assert status == 200
        c = out["choices"][0]
        assert c["finish_reason"] == "stop"
        assert stop not in c["text"]
        assert c["text"] == text[:text.find(stop)]
        assert len(c["tokens"]) < 24  # ended early (block granularity)

    def test_no_stop_hit_runs_to_length(self, served):
        _, _, srv = served
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [3, 4, 5], "max_tokens": 5,
                             "stop": ["@@@never@@@"]})
        assert status == 200
        c = out["choices"][0]
        assert c["finish_reason"] == "length" and len(c["tokens"]) == 5


class TestNCompletions:
    def test_n_sampled_choices(self):
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import InferenceServer

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(40))
        eng = ServingEngine(cfg, params, slots=4, max_len=128,
                            steps_per_block=3, sample_top_k=8, seed=1)
        srv = InferenceServer(eng, tokenizer=ToyTokenizer(), port=0)
        try:
            status, out = _post(srv.port, "/v1/completions",
                                {"prompt": list(range(1, 8)),
                                 "max_tokens": 8, "n": 3,
                                 "temperature": 2.0})
            assert status == 200, out
            assert len(out["choices"]) == 3
            assert [c["index"] for c in out["choices"]] == [0, 1, 2]
            assert out["usage"]["completion_tokens"] == 24
            # high temperature: the three samples are not all identical
            toks = {tuple(c["tokens"]) for c in out["choices"]}
            assert len(toks) > 1
            # invalid combos are clean 400s
            status, out = _post(srv.port, "/v1/completions",
                                {"prompt": [1, 2], "n": 2})  # greedy n>1
            assert status == 400
            status, out = _post(srv.port, "/v1/completions",
                                {"prompt": [1, 2], "n": 2, "stream": True,
                                 "temperature": 1.0})
            assert status == 400
        finally:
            srv.shutdown()


class TestLogprobs:
    def test_greedy_logprobs_match_reference_forward(self):
        """Per-token logprobs equal log_softmax of the reference forward at
        each emitted position (greedy engine, admission token included)."""
        from mquant_tpu.models.llm import decoder_forward
        from mquant_tpu.serve.engine import ServingEngine

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(50))
        p = list(range(1, 9))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3)
        rid = eng.submit(p, max_new_tokens=6)
        toks = eng.run()[rid]
        lps = eng.logprobs_of(rid)
        assert len(lps) == len(toks) == 6
        # reference: one full forward over prompt+emitted, log_softmax at
        # the positions that produced each token
        seq = jnp.asarray(p + toks[:-1])[None]
        logits, _, _ = decoder_forward(cfg, params, seq)
        ref = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        for i, (t, lp) in enumerate(zip(toks, lps)):
            want = float(ref[len(p) - 1 + i, t])
            assert abs(lp - want) < 5e-3, (i, lp, want)

    def test_http_logprobs_field(self, served):
        _, _, srv = served
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [2, 3, 4], "max_tokens": 4,
                             "logprobs": True})
        assert status == 200
        c = out["choices"][0]
        lp = c["logprobs"]["token_logprobs"]
        assert len(lp) == len(c["tokens"]) == 4
        assert all(v <= 0 for v in lp)  # greedy logprobs are ≤ 0
        # absent unless requested
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [2, 3, 4], "max_tokens": 2})
        assert "logprobs" not in out["choices"][0]

    def test_sampled_logprobs_under_model_dist(self, served):
        """Sampled tokens report their logprob under the MODEL distribution
        (not the temperature-scaled one): finite, ≤ 0."""
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import InferenceServer

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(51))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3, sample_top_k=8, seed=2)
        srv2 = InferenceServer(eng, port=0)
        try:
            status, out = _post(srv2.port, "/v1/completions",
                                {"prompt": [5, 6, 7], "max_tokens": 5,
                                 "temperature": 1.5, "logprobs": True})
            assert status == 200
            lp = out["choices"][0]["logprobs"]["token_logprobs"]
            assert len(lp) == 5 and all(v <= 0 and v > -50 for v in lp)
        finally:
            srv2.shutdown()

    def test_spec_logprobs_match_plain(self):
        """Speculative decoding reports the same logprobs as the plain
        engine (its tokens are exactly the greedy ones)."""
        from mquant_tpu.serve.engine import ServingEngine

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(52))
        p = list(range(4, 14))

        def run(spec):
            eng = ServingEngine(cfg, params, slots=1, max_len=128,
                                steps_per_block=2, spec_k=spec)
            rid = eng.submit(p, max_new_tokens=8)
            toks = eng.run()[rid]
            return toks, eng.logprobs_of(rid)

        t0, l0 = run(0)
        t1, l1 = run(3)
        assert t0 == t1
        np.testing.assert_allclose(l0, l1, rtol=1e-4, atol=1e-4)


class TestWorkerResilience:
    def test_worker_crash_fails_requests_instead_of_hanging(self):
        """If the scheduler thread dies (e.g. an engine bug), every waiting
        and future request gets an error response — handlers never hang."""
        import time as _time

        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import EngineWorker

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(60))
        eng = ServingEngine(cfg, params, slots=1, max_len=64)

        def boom(*a, **k):
            raise RuntimeError("injected engine failure")

        eng.step_block = boom
        w = EngineWorker(eng)
        p = w.submit([1, 2, 3], max_new_tokens=4)
        assert p.done.wait(30)
        assert p.error and "injected engine failure" in p.error
        for _ in range(100):
            if w.crashed:
                break
            _time.sleep(0.05)
        p2 = w.submit([4, 5], max_new_tokens=2)  # fail-fast after crash
        assert p2.done.wait(5) and p2.error
        w.shutdown()

    def test_server_releases_engine_bookkeeping(self):
        """Long-lived serving: retired requests are released from the
        engine's request map (the VLM embeds arrays would otherwise leak)."""
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import InferenceServer

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(61))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=3)
        srv = InferenceServer(eng, port=0)
        try:
            for i in range(3):
                status, _ = _post(srv.port, "/v1/completions",
                                  {"prompt": [1 + i, 2, 3], "max_tokens": 3})
                assert status == 200
            assert len(eng._requests) == 0
        finally:
            srv.shutdown()


class TestRealIntDeploy:
    def test_realized_artifact_serves_real_path(self, tmp_path):
        """realize_int artifact → server: meta selects mode='real', the
        engine decodes through the int8 GEMM kernels, tokens equal the
        direct real-mode generator."""
        from mquant_tpu.pipeline import QuantizeConfig, run_pipeline
        from mquant_tpu.serve.server import build_server_from_artifact

        art = str(tmp_path / "art")
        q = QuantizeConfig(llm_w_bits=4, visual_w_bits=8, calib_num=16,
                           nsamples=8, realize_int=True)
        run_pipeline("qwen2vl", q, tiny=True, artifact_dir=art)
        srv = build_server_from_artifact(art, slots=2, max_len=256, port=0)
        try:
            assert srv.worker.engine.mode == "real"
            status, out = _post(srv.port, "/v1/completions",
                                {"prompt": list(range(1, 9)),
                                 "max_tokens": 5})
            assert status == 200, out
            from mquant_tpu.models.registry import get_family
            from mquant_tpu.utils.checkpoint import (config_from_dict,
                                                     load_artifact)

            params, state, specs, meta = load_artifact(art)
            cfg = config_from_dict(meta["config_dict"])
            gen = Generator(cfg.llm, params["llm"], specs=specs, state=state,
                            mode="real", max_len=256)
            ref = gen.generate(jnp.asarray(list(range(1, 9)))[None],
                               max_new_tokens=5)
            assert out["choices"][0]["tokens"] == [
                int(t) for t in np.asarray(ref)[0]]
        finally:
            srv.shutdown()


class TestPerRequestSeed:
    def _engine(self, **kw):
        from mquant_tpu.serve.engine import ServingEngine

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(70))
        return cfg, params, ServingEngine(cfg, params, slots=3, max_len=128,
                                          steps_per_block=3, sample_top_k=8,
                                          **kw)

    def test_seeded_request_schedule_independent(self):
        """The same (prompt, seed) yields the same tokens whether served
        alone or next to other traffic — noise is keyed by (request seed,
        emitted index), not by block counters or slot index."""
        p = list(range(3, 10))
        _, _, eng1 = self._engine(seed=111)
        r = eng1.submit(p, max_new_tokens=10, temperature=1.5, seed=42)
        alone = eng1.run()[r]

        _, _, eng2 = self._engine(seed=999)  # different engine seed too
        eng2.submit(list(range(40, 52)), max_new_tokens=12, temperature=0.9,
                    seed=7)  # neighbor traffic occupying another slot
        r2 = eng2.submit(p, max_new_tokens=10, temperature=1.5, seed=42)
        eng2.submit(list(range(60, 64)), max_new_tokens=6)
        busy = eng2.run()[r2]
        assert busy == alone

    def test_http_seed_replay_and_n_distinct(self):
        from mquant_tpu.serve.server import InferenceServer

        _, _, eng = self._engine(seed=5)
        srv = InferenceServer(eng, port=0)
        try:
            body = {"prompt": list(range(2, 9)), "max_tokens": 8,
                    "temperature": 1.2, "seed": 123}
            _, a = _post(srv.port, "/v1/completions", body)
            _, b = _post(srv.port, "/v1/completions", body)
            assert a["choices"][0]["tokens"] == b["choices"][0]["tokens"]
            _, c = _post(srv.port, "/v1/completions",
                         dict(body, seed=124))
            # a different seed is allowed to (and here does) differ
            _, d = _post(srv.port, "/v1/completions",
                         dict(body, n=3))
            toks = [tuple(ch["tokens"]) for ch in d["choices"]]
            assert toks[0] == tuple(a["choices"][0]["tokens"])  # seed+0
            assert len(set(toks)) > 1  # copies got distinct seeds
        finally:
            srv.shutdown()


class TestChunkedAdmissionServer:
    def test_long_prompt_over_http_with_chunked_admission(self):
        """A long prompt served over HTTP through chunked admission (one
        bounded piece per scheduler tick) while short traffic flows: both
        exact vs solo runs."""
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import InferenceServer

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(80))
        long_p = [1 + (i % 90) for i in range(160)]
        short_p = list(range(5, 11))
        eng = ServingEngine(cfg, params, slots=2, max_len=256,
                            steps_per_block=3, admit_chunk=64)
        srv = InferenceServer(eng, port=0)
        try:
            import threading
            results = {}

            def go(name, p, n):
                status, out = _post(srv.port, "/v1/completions",
                                    {"prompt": p, "max_tokens": n})
                results[name] = (status, out["choices"][0]["tokens"])

            ts = [threading.Thread(target=go, args=("long", long_p, 6)),
                  threading.Thread(target=go, args=("short", short_p, 6))]
            for t in ts:
                t.start()
            for t in ts:
                t.join(180)
            assert results["long"][0] == 200
            assert results["short"][0] == 200
            gen = Generator(cfg, params, max_len=256)
            for name, p in (("long", long_p), ("short", short_p)):
                ref = gen.generate(jnp.asarray(p)[None], max_new_tokens=6)
                assert results[name][1] == [int(t) for t in
                                            np.asarray(ref)[0]], name
        finally:
            srv.shutdown()


class TestPenalties:
    def test_frequency_penalty_reduces_repetition(self):
        """Greedy decoding on a tiny model loops; a frequency penalty
        measurably reduces repeats. Unpenalized rows in the same pool stay
        exactly greedy."""
        from mquant_tpu.serve.engine import ServingEngine

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(90))
        p = list(range(3, 9))
        eng = ServingEngine(cfg, params, slots=2, max_len=160,
                            steps_per_block=4, sample_top_k=8)
        plain = eng.submit(p, max_new_tokens=24)
        pen = eng.submit(p, max_new_tokens=24, frequency_penalty=1.5)
        outs = eng.run()
        assert outs[plain] == _solo(cfg, params, p, 24)  # unpolluted

        def max_count(toks):
            return max(toks.count(t) for t in set(toks))

        assert max_count(outs[pen]) < max_count(outs[plain]), (
            outs[plain], outs[pen])

    def test_presence_penalty_counts_prompt_tokens(self):
        """A large presence penalty suppresses every token already in the
        prompt — the first emitted token is not a prompt token (counts are
        seeded from the prompt, OpenAI semantics)."""
        from mquant_tpu.serve.engine import ServingEngine

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(91))
        p = list(range(3, 9))
        eng = ServingEngine(cfg, params, slots=1, max_len=160,
                            sample_top_k=8)
        rid = eng.submit(p, max_new_tokens=6, presence_penalty=100.0)
        outs = eng.run()
        assert outs[rid][0] not in p
        assert len(set(outs[rid])) == len(outs[rid])  # no repeats at 100

    def test_http_penalty_fields(self, served):
        """Penalty fields on a greedy-only engine are a clean 400."""
        _, _, srv = served
        status, out = _post(srv.port, "/v1/completions",
                            {"prompt": [1, 2, 3], "max_tokens": 3,
                             "frequency_penalty": 0.5})
        assert status == 400 and "sample_top_k" in out["error"]


class TestServerVariants:
    def test_server_over_speculative_engine_exact(self):
        """The HTTP server on a spec_k engine: outputs equal plain greedy
        (speculation is output-exact), draft machinery invisible to the
        API."""
        from mquant_tpu.serve.engine import ServingEngine
        from mquant_tpu.serve.server import InferenceServer

        cfg = _cfg()
        params = init_decoder_params(cfg, jax.random.PRNGKey(95))
        p = list(range(2, 12))
        eng = ServingEngine(cfg, params, slots=2, max_len=128,
                            steps_per_block=2, spec_k=4)
        srv = InferenceServer(eng, port=0)
        try:
            status, out = _post(srv.port, "/v1/completions",
                                {"prompt": p, "max_tokens": 8,
                                 "logprobs": True})
            assert status == 200
            assert out["choices"][0]["tokens"] == _solo(cfg, params, p, 8)
            assert len(out["choices"][0]["logprobs"]["token_logprobs"]) == 8
        finally:
            srv.shutdown()

    @pytest.mark.parametrize("family", ["internvl", "minicpmv", "qwenvl",
                                        "glm4v"])
    def test_other_vlm_families_over_http(self, family):
        """Image chat works for the non-flagship families too (engine_request
        is family-generic: vision encode + splice, no M-RoPE)."""
        import base64
        import io

        from PIL import Image

        from mquant_tpu.evaluation.adapter import VLMRunner
        from mquant_tpu.models.registry import get_family
        from mquant_tpu.serve.server import InferenceServer

        fam = get_family(family)
        cfg = fam.tiny_fn()
        params = fam.init_fn(cfg, jax.random.key(1))
        runner = VLMRunner(family, cfg, params, max_len=256,
                           max_new_tokens=4)
        srv = InferenceServer.for_vlm(runner, slots=2, max_len=512)
        try:
            arr = (np.random.default_rng(0).random((24, 24, 3))
                   * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            url = ("data:image/png;base64,"
                   + base64.b64encode(buf.getvalue()).decode())
            status, out = _post(srv.port, "/v1/chat/completions", {
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "describe"},
                    {"type": "image_url", "image_url": {"url": url}}]}],
                "max_tokens": 4})
            assert status == 200, out
            want = runner.serve_engine(
                [{"text": "describe", "image": arr}], max_new_tokens=4)[0]
            assert out["choices"][0]["message"]["content"] == want
        finally:
            srv.shutdown()

    def test_realized_artifact_serves_vlm_image_chat(self, tmp_path):
        """Quantized (realized-int) artifact → server → IMAGE chat: the
        vision tower runs in real mode on the scheduler thread, spliced
        embeds decode through the int8 GEMMs."""
        import base64
        import io

        from PIL import Image

        from mquant_tpu.pipeline import QuantizeConfig, run_pipeline
        from mquant_tpu.serve.server import build_server_from_artifact

        art = str(tmp_path / "art")
        q = QuantizeConfig(llm_w_bits=4, visual_w_bits=8, calib_num=16,
                           nsamples=8, realize_int=True)
        run_pipeline("qwen2vl", q, tiny=True, artifact_dir=art)
        srv = build_server_from_artifact(art, slots=2, max_len=512, port=0)
        try:
            arr = (np.random.default_rng(1).random((24, 24, 3))
                   * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            url = ("data:image/png;base64,"
                   + base64.b64encode(buf.getvalue()).decode())
            status, out = _post(srv.port, "/v1/chat/completions", {
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "what is this?"},
                    {"type": "image_url", "image_url": {"url": url}}]}],
                "max_tokens": 5})
            assert status == 200, out
            want = srv.vlm_runner.serve_engine(
                [{"text": "what is this?", "image": arr}],
                max_new_tokens=5)[0]
            assert out["choices"][0]["message"]["content"] == want
        finally:
            srv.shutdown()
