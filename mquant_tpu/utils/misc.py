"""Runtime utilities: seeding, logging, memory reporting, profiling.

Capability parity with fake_quant/utils.py: ``seed_everything`` (:439-462),
``config_logging`` (:61-76), ``cleanup_memory`` (:381-410) — TPU-flavored: XLA
live-buffer stats instead of torch.cuda, ``jax.profiler`` traces instead of the
reference's absent tracing (SURVEY §5: "tracing/profiling: none").
"""

from __future__ import annotations

import contextlib
import gc
import logging
import os
import random
import time
from typing import Optional

import jax
import numpy as np


def seed_everything(seed: int = 0) -> jax.Array:
    """Seed python/numpy and return a jax PRNG key (jax randomness is explicit
    via keys; there is no global jax seed to set)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.key(seed)


def config_logging(log_file: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    """File+console logging, one line format (ref: utils.py:61-76)."""
    handlers = [logging.StreamHandler()]
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
        handlers=handlers, force=True)
    return logging.getLogger("mquant_tpu")


def device_memory_stats() -> dict:
    """Live-buffer bytes per device (the TPU equivalent of the reference's
    torch.cuda memory logging, ref: utils.py:381-410)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use", 0),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use", 0)}
        except Exception:
            out[str(d)] = {}
    return out


def cleanup_memory(logger: Optional[logging.Logger] = None):
    before = device_memory_stats()
    gc.collect()
    after = device_memory_stats()
    if logger:
        for d in before:
            b = before[d].get("bytes_in_use", 0)
            a = after[d].get("bytes_in_use", 0)
            logger.info(f"cleanup_memory {d}: {b/2**30:.2f} → {a/2**30:.2f} GiB")
    return after


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/mquant_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock segments with device sync (TTFT-style reporting)."""

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        rows = []
        for k, v in self.times.items():
            rows.append(f"{k}: n={len(v)} median={sorted(v)[len(v)//2]*1e3:.1f}ms")
        return "; ".join(rows)


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_time_secs: float = 1.0) -> str:
    """Turn on JAX's persistent (on-disk) compilation cache.

    Round-4 measurement: the W4A8 serving stack pays ~548 s of XLA/Pallas
    compiles on every cold start (vs 14 s for bf16) — re-paid at every server
    boot and bench run unless compiled executables persist. This wires
    ``jax_compilation_cache_dir`` so the second boot loads executables from
    disk instead of recompiling. Call it BEFORE the first ``jit`` dispatch
    (backend init is fine; compilations before the call are not cached).

    Resolution order for the directory: explicit arg →
    ``$MQUANT_COMPILE_CACHE`` → ``~/.cache/mquant_tpu/xla_cache``.
    Set ``MQUANT_COMPILE_CACHE=0`` (or ``off``) to disable entirely.

    Entry points that call this automatically: ``bench.py``,
    ``mquant_tpu.serve.server`` (both CLI and ``build_server_from_artifact``),
    and the ``exam/quant_vlm.py`` pipeline CLI.
    """
    env = os.environ.get("MQUANT_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return ""
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "mquant_tpu", "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold is 1s: every Pallas kernel + the big serving jits
    # qualify, while trivial host-side jits stay out of the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
