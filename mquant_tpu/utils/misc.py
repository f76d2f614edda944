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
