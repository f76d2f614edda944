"""HTTP serving load test: concurrent requests against the in-process
OpenAI-style server, reporting aggregate throughput, request latency
percentiles, and TTFT (from the streaming first chunk).

Measures the WHOLE serving stack — HTTP parse, scheduler thread, engine
admission/decode blocks, streaming — not just the kernels, so the delta vs
`scripts/engine_bench.py` is the serving overhead.

Run (real chip, 7B dims): python scripts/server_bench.py
Tiny smoke (CPU):        DEPTH=2 TINY=1 python scripts/server_bench.py
Env knobs: DEPTH, SLOTS, CLIENTS, REQUESTS, MAX_NEW, PROMPT_T, SPEC_K
"""

import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = os.environ.get("TINY", "0") == "1"
DEPTH = int(os.environ.get("DEPTH", "2" if TINY else "28"))
SLOTS = int(os.environ.get("SLOTS", "8"))
CLIENTS = int(os.environ.get("CLIENTS", "8"))
REQUESTS = int(os.environ.get("REQUESTS", "16"))
MAX_NEW = int(os.environ.get("MAX_NEW", "16" if TINY else "64"))
PROMPT_T = int(os.environ.get("PROMPT_T", "24" if TINY else "256"))
SPEC_K = int(os.environ.get("SPEC_K", "0"))


def build_server():
    import jax

    from mquant_tpu.serve.engine import ServingEngine
    from mquant_tpu.serve.server import InferenceServer

    if TINY:
        import jax.numpy as jnp

        from mquant_tpu.models.llm import DecoderConfig, init_decoder_params

        cfg = DecoderConfig(vocab=256, hidden=64, n_layers=DEPTH, n_heads=4,
                            n_kv_heads=2, intermediate=96, dtype=jnp.float32)
        params = init_decoder_params(cfg, jax.random.key(0))
        specs = state = None
        mode = "fp"
    else:
        from bench import init_w4a8_on_device, llm_specs, make_cfg
        from mquant_tpu.transform.hadamard import auto_pad_size

        pad = auto_pad_size(make_cfg(DEPTH).intermediate)
        cfg = make_cfg(DEPTH, intermediate_pad=pad)
        params, state = init_w4a8_on_device(cfg, jax.random.key(0))
        specs = llm_specs()
        mode = "real"
    eng = ServingEngine(cfg if TINY else cfg, params, specs=specs,
                        state=state, mode=mode, slots=SLOTS,
                        max_len=((PROMPT_T + MAX_NEW + 127) // 128) * 128 + 128,
                        steps_per_block=8, spec_k=SPEC_K)
    return InferenceServer(eng, port=0), cfg


def one_request(port, rng, lat, ttfts, toks_out):
    prompt = [int(t) for t in rng.integers(1, 200, PROMPT_T)]
    t0 = time.time()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": prompt, "max_tokens": MAX_NEW,
                             "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    first = None
    n = 0
    buf = b""
    while True:
        chunk = resp.read(4096)
        if not chunk:
            break
        if first is None:
            first = time.time()
        buf += chunk
        if b"[DONE]" in buf:
            break
    conn.close()
    for ln in buf.decode().split("\n"):
        if ln.startswith("data: ") and not ln.endswith("[DONE]"):
            try:
                n += len(json.loads(ln[6:])["choices"][0]["tokens"])
            except (json.JSONDecodeError, KeyError):
                pass
    lat.append(time.time() - t0)
    ttfts.append(first - t0)
    toks_out.append(n)


def main():
    srv, cfg = build_server()
    # warm the compiles (admission + block shapes) outside the measured span
    warm_rng = np.random.default_rng(99)
    one_request(srv.port, warm_rng, [], [0], [])
    lat, ttfts, toks = [], [], []
    lock = threading.Lock()
    work = list(range(REQUESTS))

    def client(i):
        rng = np.random.default_rng(i)
        while True:
            with lock:
                if not work:
                    return
                work.pop()
            one_request(srv.port, rng, lat, ttfts, toks)

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total = sum(toks)
    lat_s, ttft_s = np.sort(lat), np.sort(ttfts)
    print(json.dumps({
        "depth": DEPTH, "slots": SLOTS, "clients": CLIENTS,
        "requests": REQUESTS, "prompt_t": PROMPT_T, "max_new": MAX_NEW,
        "spec_k": SPEC_K,
        "wall_s": round(wall, 3),
        "aggregate_tok_s": round(total / wall, 1),
        "latency_p50_s": round(float(lat_s[len(lat_s) // 2]), 3),
        "latency_p95_s": round(float(lat_s[int(len(lat_s) * 0.95) - 1]), 3),
        "ttft_p50_s": round(float(ttft_s[len(ttft_s) // 2]), 3),
        "engine_stats": {k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in srv.worker.stats().items()},
    }), flush=True)
    srv.shutdown()


if __name__ == "__main__":
    main()
