"""Adaptive-resolution bucketing for variable-size images.

The reference's MiniCPM-V/Qwen2-VL paths handle arbitrary resolutions with
dynamic shapes (adaptive pos-embed cache, ref: plugin/resampler.py:114-129;
cu_seqlens vision batching). XLA needs static shapes, so images map to a fixed
set of resolution buckets; padding tokens carry a validity mask that the
attention and the calibration observers both respect (SURVEY §7.3 "shape
bucketing/padding with masked observers").
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """A fixed set of (h, w) pixel buckets, all multiples of the patch size."""

    patch: int
    buckets: Tuple[Tuple[int, int], ...]  # (H, W) pixel sizes

    @staticmethod
    def default(patch: int = 14, base: int = 448) -> "BucketSpec":
        s = base
        return BucketSpec(patch=patch, buckets=(
            (s, s), (s, 2 * s), (2 * s, s), (s // 2, s), (s, s // 2),
            (2 * s, 2 * s)))

    def choose(self, h: int, w: int) -> Tuple[int, int]:
        """Bucket with the closest aspect ratio, then smallest sufficient area."""
        ar = h / max(w, 1)

        def key(b):
            bh, bw = b
            return (abs(np.log(ar / (bh / bw))), abs(bh * bw - h * w))

        return min(self.buckets, key=key)


def prepare_image(img: np.ndarray, spec: BucketSpec,
                  max_tokens: Optional[int] = None,
                  mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
    """uint8/float (H, W, 3) image → (resized float32 (bh, bw, 3), grid (gh, gw),
    token_mask (max_tokens,) or None).

    Uses the native C++ resize when built. ``max_tokens`` pads/masks the patch
    sequence to the largest bucket so all buckets share one compiled shape."""
    from .. import native as N

    h, w = img.shape[:2]
    bh, bw = spec.choose(h, w)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    out = N.resize_normalize(img, (bh, bw), mean, std)
    gh, gw = bh // spec.patch, bw // spec.patch
    mask = None
    if max_tokens is not None:
        n = gh * gw
        assert n <= max_tokens, (n, max_tokens)
        mask = np.zeros((max_tokens,), np.float32)
        mask[:n] = 1.0
    return out, (gh, gw), mask


def max_bucket_tokens(spec: BucketSpec) -> int:
    return max((bh // spec.patch) * (bw // spec.patch) for bh, bw in spec.buckets)


def resampler_pos_table(width: int, grid: Tuple[int, int], max_tokens: int,
                        ln_kv_gamma: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-bucket sincos pos table for the perceiver resampler, padded to
    max_tokens (the functional pos-embed cache of plugin/resampler.py:114-129);
    pre-divided by the fused ln_kv γ when fusion ran
    (ref: minicpmv_rotation.py:76-83)."""
    from .resampler import sincos_2d_pos_embed

    gh, gw = grid
    tab = sincos_2d_pos_embed(width, gh, gw)
    if ln_kv_gamma is not None:
        tab = tab / np.asarray(ln_kv_gamma, np.float64)[None, :]
    out = np.zeros((max_tokens, width), np.float32)
    out[: tab.shape[0]] = tab.astype(np.float32)
    return out
