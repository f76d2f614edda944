"""Fused single-token decode attention (GQA) — one Pallas kernel per layer.

The XLA decode path spends ~110 µs/layer outside the weight-streaming GEMVs
(measured by scripts/decode_layer_ablate.py at 7B dims, S=1152): the KV-cache
dynamic_update_slice, the grouped-query einsum, the mask/softmax chain and
their kernel-launch/HBM round trips each cost tens of µs on a (1, S)-sized
problem. This kernel fuses the whole post-rope attention step:

    cache[b, pos] ← k_new, v_new          (one-row DMA, aliased in/out)
    scores = q·Kᵀ / √hd  masked to ≤ pos  (MXU, per kv head)
    out    = softmax(scores)·V            (MXU)

into ONE launch per layer. The caches live in HBM (explicit memory_space —
with ANY, XLA can place a small cache in VMEM where dynamic 1-row slices
violate Mosaic's 8-aligned sublane tiling) and are DMA'd once into VMEM
scratch — the same full-S read the einsum path pays — but the new-row write
is one 8-row-aligned window DMA (Mosaic slices memrefs at 8-row granularity)
instead of a full-buffer dynamic_update_slice, and the scores/probs never
touch HBM. The new token's k/v never enters the scratch copy (same tiling
restriction); it rides as a separate softmax term:
m = max(max(scores_cache), s_new), denom = Σexp + exp(s_new − m),
out = P·V + p_new·v_new.

Exactness: integer-free bf16 dots with f32 accumulation and f32 softmax —
the same operand dtypes/accumulation the XLA einsum path uses; outputs agree
to bf16 rounding (the paths differ in final-ulp association order: the
new-token term is accumulated outside the MXU dot).

The reference has no decode engine at all (SURVEY §3.4: its latency numbers
come from fake-quant PyTorch under VLMEvalKit's generate loop); this kernel
is part of the TPU rebuild's serving stack.

MEASURED RESULT (v5e, recorded experiment — kernel kept behind
``MQUANT_ATTN=fused``, default stays XLA): the per-layer microbench win is
real (−47.9 µs/layer-step, scripts/decode_layer_ablate.py at 7B dims S=1152),
but the model-level A/B at the flagship serving config (depth 28, prefill
1024, 128-token fused decode, pallas_w4 GEMV) measured 114.3 tok/s fused vs
118.0 tok/s XLA (scripts/attn_fused_ab.py). Inside the fused decode
while_loop XLA overlaps the einsum/softmax chain with the asynchronously
launched weight-streaming GEMVs; a Pallas launch is a synchronization point
and its full-cache VMEM DMA sits on the critical path. Same verdict as the
fused had-quant/rms-quant prefill kernels (scripts/ttft_decompose.py): on
this chip XLA's own fusion+overlap wins; the kernel and its exactness tests
stay as the documented baseline for future mesh-sharded revisits.

B=8 A/B (slot-pool shapes, scripts/engine_kv_sweep.py MQUANT_ATTN=fused,
same depth-28 pallas_w4 config): fused 8.53/9.70/10.72/11.86 ms/step vs XLA
8.93/9.43/9.97/10.81 at S=512/768/1024/1280 — a marginal win at S=512 only;
the per-row full-cache DMA grows with S and loses from S≥768. Verdict
unchanged at batch: default stays XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref,  # (B,) int32  [scalar prefetch, SMEM]
            start_ref,  # (B,) int32 first attendable column [scalar prefetch]
            q_ref,  # (1, H, hd) VMEM
            knew_ref, vnew_ref,  # (1, 1, KVHd) VMEM   (KVHd = KVH*hd)
            kc_ref, vc_ref,  # (B, S, KVHd) ANY/HBM (aliased → kout/vout)
            o_ref,  # (1, H, hd) VMEM out
            kout_ref, vout_ref,  # aliased ANY outs
            ks_ref, vs_ref,  # (S, KVHd) VMEM scratch (cache dtype)
            kw_ref, vw_ref,  # (8, KVHd) VMEM write-back window scratch
            sem,  # DMA semaphores (4,)
            *, kvh: int, g: int, hd: int, scale: float):
    b = pl.program_id(0)
    pos = pos_ref[b]
    start = start_ref[b]
    S = ks_ref.shape[0]

    # one contiguous DMA per cache: HBM (S, KVHd) row block → VMEM scratch
    ld_k = pltpu.make_async_copy(kc_ref.at[b], ks_ref, sem.at[0])
    ld_v = pltpu.make_async_copy(vc_ref.at[b], vs_ref, sem.at[1])
    ld_k.start()
    ld_v.start()
    ld_k.wait()
    ld_v.wait()

    # Write the new row back to HBM (aliased output = the input buffer, so
    # only the touched window moves; the rest of the cache is untouched).
    # Mosaic tiling allows memref slices only at 8-row granularity (bf16
    # packs (2,1) sublanes), so a bare 1-row DMA at `pos` is illegal: build
    # the 8-row aligned window around `pos` in VMEM — 7 neighbor rows from
    # the just-loaded scratch copy (unchanged), the `pos` row replaced by
    # k_new/v_new via an iota-select — and DMA that window back.
    base = pl.multiple_of((pos // 8) * 8, 8)  # S % 8 == 0 ⇒ base+8 ≤ S
    off = pos - base
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == off
    kw_ref[...] = jnp.where(rowsel, knew_ref[0], ks_ref[pl.ds(base, 8), :])
    vw_ref[...] = jnp.where(rowsel, vnew_ref[0], vs_ref[pl.ds(base, 8), :])
    st_k = pltpu.make_async_copy(kw_ref, kout_ref.at[b, pl.ds(base, 8)],
                                 sem.at[2])
    st_v = pltpu.make_async_copy(vw_ref, vout_ref.at[b, pl.ds(base, 8)],
                                 sem.at[3])
    st_k.start()
    st_v.start()

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    # The scratch row at `pos` is STALE: a dynamic 1-row splice into tiled
    # VMEM is illegal on Mosaic (sublane slices must be 8-aligned), and its
    # HBM write above races the cache load anyway. Mask it out (col < pos)
    # and carry the new token as a separate softmax term instead — same
    # f32 max/exp/normalize math, no extra DMA.
    valid = (cols >= start) & (cols < pos)
    q = q_ref[0]  # (H, hd)
    nt = (((1,), (1,)), ((), ()))  # contract lanes of both (q·Kᵀ)
    nn = (((1,), (0,)), ((), ()))
    for h in range(kvh):
        qg = q[h * g:(h + 1) * g, :]  # (G, hd)
        kh = ks_ref[:, h * hd:(h + 1) * hd]  # (S, hd) lane-aligned slice
        vh = vs_ref[:, h * hd:(h + 1) * hd]
        kn = knew_ref[0, :, h * hd:(h + 1) * hd]  # (1, hd) this step's k
        vn = vnew_ref[0, :, h * hd:(h + 1) * hd]  # (1, hd) this step's v
        scores = jax.lax.dot_general(
            qg, kh, nt, preferred_element_type=jnp.float32) * scale
        scores = jnp.where(valid, scores, jnp.float32(-1e30))
        # N=1 dot_general trips a Mosaic broadcast-verifier bug; an
        # elementwise multiply-reduce is the same exact-bf16-product /
        # f32-accumulate math on the VPU
        snew = jnp.sum(qg.astype(jnp.float32) * kn.astype(jnp.float32),
                       axis=-1, keepdims=True) * scale  # (G, 1)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), snew)
        p = jnp.exp(scores - m)
        pn = jnp.exp(snew - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + pn
        probs = (p / denom).astype(vh.dtype)
        pnew = (pn / denom).astype(vh.dtype)
        out = jax.lax.dot_general(probs, vh, nn,
                                  preferred_element_type=jnp.float32)
        out = out + (pnew.astype(jnp.float32)
                     * vn.astype(jnp.float32))  # (G,1)·(1,hd) → (G,hd)
        o_ref[0, h * g:(h + 1) * g, :] = out.astype(o_ref.dtype)

    st_k.wait()
    st_v.wait()


def attn_decode_fused(q: jax.Array,  # (B, 1, H, hd) post-rope
                      k_new: jax.Array,  # (B, 1, KVH, hd) post-rope
                      v_new: jax.Array,  # (B, 1, KVH, hd)
                      k_cache: jax.Array,  # (B, S, KVH, hd)
                      v_cache: jax.Array,  # (B, S, KVH, hd)
                      pos: jax.Array,  # () or (B,) int32 write/attend index
                      scale: float,
                      start: jax.Array | None = None,  # () or (B,) int32
                      interpret: bool = False):
    """Returns (attn (B, 1, H, hd), new_k_cache, new_v_cache). The caches are
    updated at ``pos`` (per row when pos is (B,)) and attention covers
    positions start ≤ col ≤ pos (``start`` defaults to 0; per-row starts
    support left-padded ragged batches whose pad columns hold garbage K/V) —
    exactly `dynamic_update_slice` + the masked GQA einsum
    (models/layers.py:attention) in one launch. Caller guards: T == 1,
    fp16/bf16 cache, hd % 128 == 0, H % KVH == 0."""
    B, _, H, hd = q.shape
    S, KVH = k_cache.shape[1], k_cache.shape[2]
    assert S % 8 == 0, S  # 8-row aligned write-back window (see _kernel)
    G = H // KVH
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    if start is None:
        start = jnp.zeros((B,), jnp.int32)
    start = jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (B,))
    kc = k_cache.reshape(B, S, KVH * hd)
    vc = v_cache.reshape(B, S, KVH * hd)
    # (B, 1, KVHd): the singleton sublane axis keeps the per-b block spec
    # legal at B > 1 (a (1, KVHd) block on a (B, KVHd) array violates
    # Mosaic's 8-sublane block rule; with the array's sublane dim == 1 the
    # block can equal it)
    kn = k_new.reshape(B, 1, KVH * hd).astype(k_cache.dtype)
    vn = v_new.reshape(B, 1, KVH * hd).astype(v_cache.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KVH * hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KVH * hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, KVH * hd), k_cache.dtype),
            pltpu.VMEM((S, KVH * hd), v_cache.dtype),
            pltpu.VMEM((8, KVH * hd), k_cache.dtype),
            pltpu.VMEM((8, KVH * hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out, kc2, vc2 = pl.pallas_call(
        functools.partial(_kernel, kvh=KVH, g=G, hd=hd, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, hd), q.dtype),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ],
        # kernel operand indices INCLUDE the scalar-prefetch args: pos=0,
        # start=1, q=2, kn=3, vn=4, kc=5 → out 1, vc=6 → out 2
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos, start, q.reshape(B, H, hd), kn, vn, kc, vc)
    return (out.reshape(B, 1, H, hd),
            kc2.reshape(B, S, KVH, hd), vc2.reshape(B, S, KVH, hd))
