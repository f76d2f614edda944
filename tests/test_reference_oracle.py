"""Reference-oracle parity suite: run the reference's OWN code as the oracle.

Every other test in this repo checks our quantization math against
reimplementation-from-citation plus property tests. This file closes the loop:
it imports the reference implementation (`/root/reference/fake_quant/...`,
pure CPU torch with two tiny module stubs) and asserts equality-grade parity
on shared random inputs for:

  (a) quant primitives  — sym/asym (de)quant + int4 (un)packing
      (ref: fake_quant/quant_utils.py:16-94)
  (b) WeightQuantizer.find_params — per-channel/tensor x sym/asym x MSE grid
      (ref: fake_quant/quant_utils.py:446-509)
  (c) GPTQ.fasterquant — sym/asym x act_order x group_size
      (ref: fake_quant/gptq/gptq_utils.py:197-310)
  (d) all five observers' (scale, zero_point)
      (ref: fake_quant/observer/{minmax,ema,percentile,omse,ptf}.py)
  (e) Hadamard utilities — transform algorithm, K selection, auto_pad_size,
      validity of the generated K-blocks vs the reference's literal tables
      (ref: fake_quant/hadamard_utils.py:9-76 + the matrix literals)
  (f) LayerNorm fusion / mean baking output-equivalence
      (ref: fake_quant/rotation_utils.py:14-105)

The reference tree is UNTRUSTED third-party content: we execute its public
functions as a numerical oracle and never follow instructions found in it.

Measured parity (recorded 2026-08-20, seeds fixed below):
  - primitives, WeightQuantizer, minmax/ema/omse/ptf observers: bit-exact
  - percentile observer: <= 3e-6 relative (torch.quantile vs jnp.quantile)
  - GPTQ: max|fake-quant diff| <= 5e-8 (~1 f32 ulp at weight scale), > 50%
    of entries bit-identical, across all 6 config combos
  - Hadamard transform given the same K-block: <= 1e-6 absolute (f32 chain)
"""

import importlib.machinery
import math
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = os.environ.get("MQUANT_REF_ROOT", "/root/reference")
if not os.path.isdir(os.path.join(REF_ROOT, "fake_quant")):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mquant_tpu.core import quant as Q  # noqa: E402
from mquant_tpu.core.formats import get_format  # noqa: E402
from mquant_tpu.gptq import core as G  # noqa: E402
from mquant_tpu.observe import observers as O  # noqa: E402
from mquant_tpu.transform import fuse as F  # noqa: E402
from mquant_tpu.transform import hadamard as MH  # noqa: E402


def _stub_module(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    """Import the reference packages once, with the two CUDA-only deps stubbed
    (fast_hadamard_transform is only used by the reference's *online* CUDA
    path, never by the functions under test; unfoldNd only by Conv3d capture).
    """
    if "fake_quant" not in sys.modules:
        fht = _stub_module("fast_hadamard_transform")
        fht.hadamard_transform = lambda x, scale=1.0: x * scale
        unf = _stub_module("unfoldNd")
        unf.UnfoldNd = type("UnfoldNd", (), {})
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
    # fasterquant unconditionally calls torch.cuda.synchronize()
    torch.cuda.synchronize = lambda *a, **k: None
    from fake_quant import hadamard_utils as RH
    from fake_quant import quant_utils as RQ
    from fake_quant import rotation_utils as RR
    from fake_quant.bit_type import BIT_TYPE_DICT
    from fake_quant.gptq import gptq_utils as RG
    from fake_quant.observer import build_observer

    ns = types.SimpleNamespace(
        RQ=RQ, RH=RH, RR=RR, RG=RG,
        BIT_TYPE_DICT=BIT_TYPE_DICT, build_observer=build_observer,
    )
    return ns


# ---------------------------------------------------------------------------
# (a) quant primitives — ref: fake_quant/quant_utils.py:16-94
# ---------------------------------------------------------------------------


class TestQuantPrimitives:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_minq_maxq_matches_formats(self, ref, bits):
        for sym in (True, False):
            minq, maxq = ref.RQ.get_minq_maxq(bits, sym)
            fmt = get_format(bits, signed=sym)
            assert int(minq) == fmt.qmin and int(maxq) == fmt.qmax

    @pytest.mark.parametrize("bits", [4, 8])
    def test_sym_quant_dequant_bitexact(self, ref, rng, bits):
        x = rng.normal(size=(64, 32)).astype(np.float32) * 3.0
        scale = (np.abs(x).max(axis=-1, keepdims=True) /
                 (2 ** (bits - 1) - 1)).astype(np.float32)
        rq, _ = ref.RQ.sym_quant(torch.tensor(x), torch.tensor(scale),
                                 torch.tensor(2 ** (bits - 1) - 1))
        rd = ref.RQ.sym_dequant(rq, torch.tensor(scale))
        fmt = get_format(bits, signed=True)
        qp = Q.QuantParams(scale=jnp.asarray(scale))
        mq = Q.quantize(jnp.asarray(x), qp, fmt)
        md = Q.dequantize(mq, qp)
        np.testing.assert_array_equal(rq.numpy(), np.asarray(mq, np.float32))
        np.testing.assert_array_equal(rd.numpy(), np.asarray(md))

    @pytest.mark.parametrize("bits", [4, 8])
    def test_asym_quant_dequant_bitexact(self, ref, rng, bits):
        x = (rng.normal(size=(64, 32)) + 0.7).astype(np.float32)
        maxq = 2**bits - 1
        xmin = np.minimum(x.min(axis=-1, keepdims=True), 0).astype(np.float32)
        xmax = np.maximum(x.max(axis=-1, keepdims=True), 0).astype(np.float32)
        scale = ((xmax - xmin) / maxq).astype(np.float32)
        zero = np.round(-xmin / scale).astype(np.float32)
        rq, _, _ = ref.RQ.asym_quant(torch.tensor(x), torch.tensor(scale),
                                     torch.tensor(zero), torch.tensor(maxq))
        rd = ref.RQ.asym_dequant(rq, torch.tensor(scale), torch.tensor(zero))
        fmt = get_format(bits, signed=False)
        qp = Q.QuantParams(scale=jnp.asarray(scale), zero_point=jnp.asarray(zero))
        mq = Q.quantize(jnp.asarray(x), qp, fmt)
        md = Q.dequantize(mq, qp)
        np.testing.assert_array_equal(rq.numpy(), np.asarray(mq, np.float32))
        np.testing.assert_array_equal(rd.numpy(), np.asarray(md))

    def test_pack_unpack_i4_bitexact(self, ref, rng):
        q = rng.integers(-8, 8, size=(32, 64)).astype(np.int8)
        ref_packed = ref.RQ.pack_i4(torch.tensor(q)).numpy()  # uint8
        mine_packed = np.asarray(Q.pack_int4(jnp.asarray(q)))  # int8, same bits
        np.testing.assert_array_equal(ref_packed.view(np.int8), mine_packed)
        ref_un = ref.RQ.unpack_i4(torch.tensor(ref_packed)).numpy()
        mine_un = np.asarray(Q.unpack_int4(jnp.asarray(mine_packed)))
        np.testing.assert_array_equal(ref_un, mine_un.astype(np.int32))
        np.testing.assert_array_equal(mine_un, q)


# ---------------------------------------------------------------------------
# (b) WeightQuantizer.find_params — ref: fake_quant/quant_utils.py:446-509
# ---------------------------------------------------------------------------


class TestWeightQuantizerOracle:
    @pytest.mark.parametrize("sym", [True, False])
    @pytest.mark.parametrize("mse", [False, True])
    @pytest.mark.parametrize("per_channel", [True, False])
    def test_find_params_bitexact(self, ref, rng, sym, mse, per_channel):
        W = (rng.normal(size=(48, 80)) * 0.1).astype(np.float32)  # ref (out, in)
        wq = ref.RQ.WeightQuantizer()
        wq.configure(4, perchannel=per_channel, sym=sym, mse=mse)
        wq.find_params(torch.tensor(W.copy()))
        fmt = get_format(4, signed=sym)
        qp = Q.weight_qparams(jnp.asarray(W.T), fmt, per_channel=per_channel,
                              symmetric=sym, mse_clip=mse)
        rs = wq.scale.numpy().reshape(-1)
        ms = np.asarray(qp.scale, np.float32).reshape(-1)
        if not per_channel:
            ms = np.broadcast_to(ms, rs.shape)
        np.testing.assert_array_equal(rs, ms)
        rz = wq.zero.numpy().reshape(-1)
        if qp.zero_point is None:
            mz = np.zeros_like(rz)
        else:
            mz = np.broadcast_to(
                np.asarray(qp.zero_point, np.float32).reshape(-1), rz.shape)
        np.testing.assert_array_equal(rz, mz)


# ---------------------------------------------------------------------------
# (d) observers — ref: fake_quant/observer/{minmax,ema,percentile,omse,ptf}.py
# ---------------------------------------------------------------------------


def _ref_observer_params(ref, kind, bit_name, mode, batches):
    ob = ref.build_observer(kind, "activation", ref.BIT_TYPE_DICT[bit_name], mode)
    for b in batches:
        ob.update(torch.tensor(b))
    s, z = ob.get_quantization_params(torch.tensor(batches[-1]))
    return np.asarray(s, np.float64), np.asarray(z, np.float64)


def _mine_observer_params(kind, signed, per_channel, batches):
    spec = O.ObserverSpec(kind=kind, per_channel=per_channel, symmetric=signed)
    st = O.init_stats(spec, batches[0].shape[-1] if per_channel else None)
    for b in batches:
        st = O.update(spec, st, jnp.asarray(b))
    fmt = get_format(8, signed=signed)
    qp = O.finalize(spec, st, fmt, sample=jnp.asarray(batches[-1]))
    s = np.asarray(qp.scale, np.float64)
    z = (np.zeros_like(s) if qp.zero_point is None
         else np.asarray(qp.zero_point, np.float64))
    return s, z


# (kind, bit_name, mode). ref omse searches the affine form regardless of
# signedness and ptf is per-channel asym by construction, so the signed
# variants of those two are framework extensions with no reference oracle.
_OBSERVER_CASES = [
    ("minmax", "int8", "layer_wise"), ("minmax", "int8", "channel_wise"),
    ("minmax", "uint8", "layer_wise"), ("minmax", "uint8", "channel_wise"),
    ("ema", "int8", "layer_wise"), ("ema", "int8", "channel_wise"),
    ("ema", "uint8", "layer_wise"), ("ema", "uint8", "channel_wise"),
    ("percentile", "int8", "layer_wise"), ("percentile", "uint8", "layer_wise"),
    ("omse", "uint8", "layer_wise"),
    ("ptf", "uint8", "channel_wise"),
]


class TestObserverOracle:
    @pytest.mark.parametrize("kind,bit_name,mode", _OBSERVER_CASES)
    def test_params_match_reference(self, ref, rng, kind, bit_name, mode):
        batches = [rng.normal(size=(2, 17, 24)).astype(np.float32) * (1 + i)
                   for i in range(4)]
        rs, rz = _ref_observer_params(ref, kind, bit_name, mode, batches)
        ms, mz = _mine_observer_params(kind, bit_name == "int8",
                                       mode == "channel_wise", batches)
        if kind == "percentile":
            # torch.quantile vs jnp.quantile interpolation: float-noise only
            np.testing.assert_allclose(ms, rs, rtol=3e-6, atol=0)
        else:
            np.testing.assert_array_equal(rs, ms)
        assert float(np.abs(rz - mz).max()) == 0.0


# ---------------------------------------------------------------------------
# (c) GPTQ — ref: fake_quant/gptq/gptq_utils.py:197-310
# ---------------------------------------------------------------------------


_GPTQ_IN, _GPTQ_OUT, _GPTQ_NS = 96, 64, 512

# (name, sym, act_order, group_size, mse). static_groups stays at the
# reference's default False — the only value any reference caller ever passes
# (gptq_utils.py:203, internvl_gptq_plus.py:133,239,356,508).
_GPTQ_CASES = [
    ("sym_plain", True, False, None, False),
    ("asym_plain", False, False, None, False),
    ("sym_act_order", True, True, None, False),
    ("sym_group32", True, False, 32, False),
    ("sym_mse", True, False, None, True),
    ("sym_act_order_group32", True, True, 32, False),
]


class TestGPTQOracle:
    @pytest.fixture(scope="class")
    def problem(self):
        rng = np.random.default_rng(7)
        X = rng.standard_normal((_GPTQ_NS, _GPTQ_IN)).astype(np.float32)
        W = (rng.standard_normal((_GPTQ_OUT, _GPTQ_IN)) * 0.05).astype(np.float32)
        H = 2.0 * (X.T @ X).astype(np.float32)
        return W, H

    @pytest.mark.parametrize("name,sym,act_order,group_size,mse", _GPTQ_CASES)
    def test_fasterquant_parity(self, ref, problem, name, sym, act_order,
                                group_size, mse):
        W, H = problem
        lin = torch.nn.Linear(_GPTQ_IN, _GPTQ_OUT, bias=False)
        lin.weight.data = torch.tensor(W.copy())
        g = ref.RG.GPTQ(lin)
        g.H = torch.tensor(H.copy())
        g.nsamples = _GPTQ_NS
        q = ref.RQ.WeightQuantizer()
        q.configure(4, perchannel=True, sym=sym, mse=mse)
        g.quantizer = q
        g.fasterquant(blocksize=128, percdamp=0.01,
                      groupsize=-1 if group_size is None else group_size,
                      actorder=act_order, static_groups=False)
        ref_w = lin.weight.data.numpy()  # (out, in) fake-quant

        res = G.gptq_quantize_matrix(
            jnp.asarray(W.T), jnp.asarray(H), bits=4, percdamp=0.01,
            act_order=act_order, group_size=group_size, mse_clip=mse, sym=sym)
        mine_w = np.asarray(res.w).T  # back to (out, in)

        assert not bool(res.used_fallback)
        diff = np.abs(ref_w - mine_w)
        # one f32 ulp at these weight magnitudes; the two walks do identical
        # arithmetic in a different (blocked lax.fori_loop vs torch slice)
        # evaluation order
        assert float(diff.max()) <= 5e-8, f"{name}: max|d|={diff.max():.3e}"
        frac_eq = float(np.mean(ref_w == mine_w))
        assert frac_eq >= 0.5, f"{name}: only {frac_eq:.3f} bit-identical"


# ---------------------------------------------------------------------------
# (e) Hadamard — ref: fake_quant/hadamard_utils.py:9-76 + matrix literals
# ---------------------------------------------------------------------------


_REF_KS = [12, 20, 28, 36, 40, 52, 60, 108, 140, 156, 172]


class TestHadamardOracle:
    def test_reference_literals_are_hadamard(self, ref):
        """Sanity on the oracle itself: every literal table is a genuine
        ±1 Hadamard matrix (H Hᵀ = K·I)."""
        for K in _REF_KS:
            h = getattr(ref.RH, f"get_had{K}")().double().numpy()
            assert set(np.unique(h)) <= {-1.0, 1.0}
            np.testing.assert_allclose(h @ h.T, K * np.eye(K), atol=1e-9)

    def test_generated_blocks_are_orthogonal(self, ref):
        """Our generated K-blocks are orthonormal; where constructible they
        are genuine Hadamard/√K (156/172 use a seeded orthogonal rotation —
        equally norm-preserving, which is the invariance the rewrite uses).
        Hadamard matrices are unique only up to equivalence, so elementwise
        equality with the reference's particular literals is not required —
        or asserted."""
        for K in _REF_KS:
            b = MH._block_K(K)
            np.testing.assert_allclose(b @ b.T, np.eye(K), atol=1e-9)
            if K not in MH._RANDOM_ORTHO_K:
                scaled = b * math.sqrt(K)
                assert set(np.unique(np.round(scaled, 9))) <= {-1.0, 1.0}

    def test_k_selection_matches_reference(self, ref):
        """Same K for every dim the reference can handle (sweep includes the
        model dims the reference's table comments name)."""
        dims = [48, 64, 80, 120, 144, 160, 256, 896, 1536, 2048, 3456,
                3584, 4096, 5120, 6656, 8192, 11008, 13824, 17920, 22016]
        for n in dims:
            _, rk = ref.RH.get_hadK(n)
            _, mk = MH.get_hadK(n)
            assert rk == mk, f"n={n}: ref K={rk}, mine K={mk}"

    def test_auto_pad_size_equal_or_better(self, ref):
        """Bit-equal wherever our extra supported orders don't apply; where
        they do (K=148/924 divisors), ours pads strictly LESS."""
        for n in range(1, 2049):
            rpad = ref.RH.auto_pad_size(n)
            mpad = MH.auto_pad_size(n)
            if mpad != rpad:
                assert mpad < rpad and mpad >= n
                ok = any(mpad % K == 0 and MH.is_pow2(mpad // K)
                         for K in (148, 924))
                assert ok, f"n={n}: unexplained pad {mpad} vs {rpad}"
            else:
                assert mpad == rpad

    @pytest.mark.parametrize("n", [48, 64, 120, 144, 160, 432])
    def test_transform_algorithm_parity(self, ref, rng, n):
        """Feed the REFERENCE's literal K-block through OUR transform: the
        Kronecker/FWHT evaluation must match matmul_hadU bit-for-bit up to
        f32 summation noise."""
        x = rng.standard_normal((3, n))
        expect = ref.RH.matmul_hadU(torch.tensor(x)).numpy()
        _, K = ref.RH.get_hadK(n)
        if K > 1:
            hadK = getattr(ref.RH, f"get_had{K}")().double().numpy() / math.sqrt(K)
            got = np.asarray(MH.hadamard_transform(jnp.asarray(x),
                                                   jnp.asarray(hadK), K))
        else:
            got = np.asarray(MH.hadamard_transform(jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, atol=2e-6)


# ---------------------------------------------------------------------------
# (f) LN fusion / mean baking — ref: fake_quant/rotation_utils.py:14-105
# ---------------------------------------------------------------------------


class TestFusionOracle:
    def test_fuse_ln_linear_with_bias(self, ref, rng):
        D, O1, O2 = 24, 16, 20
        ln = torch.nn.LayerNorm(D)
        ln.weight.data = torch.tensor(rng.normal(size=D).astype(np.float32))
        ln.bias.data = torch.tensor(rng.normal(size=D).astype(np.float32))
        g0, b0 = ln.weight.detach().numpy().copy(), ln.bias.detach().numpy().copy()
        lins, mine_in = [], []
        for out_d in (O1, O2):
            lin = torch.nn.Linear(D, out_d)
            lin.weight.data = torch.tensor(
                rng.normal(size=(out_d, D)).astype(np.float32))
            lin.bias.data = torch.tensor(
                rng.normal(size=out_d).astype(np.float32))
            lins.append(lin)
            mine_in.append({"w": lin.weight.detach().numpy().T.copy(),
                            "b": lin.bias.detach().numpy().copy()})
        ref.RR.fuse_ln_linear(ln, lins)
        new_g, new_b, mine_out = F.fold_norm_into_linears(g0, b0, mine_in)
        np.testing.assert_array_equal(new_g, np.ones(D))
        assert new_b is None
        np.testing.assert_array_equal(ln.weight.detach().numpy(), np.ones(D, np.float32))
        np.testing.assert_array_equal(ln.bias.detach().numpy(), np.zeros(D, np.float32))
        for lin, m in zip(lins, mine_out):
            np.testing.assert_array_equal(
                lin.weight.detach().numpy(), m["w"].T.astype(np.float32))
            np.testing.assert_allclose(
                lin.bias.detach().numpy(), m["b"].astype(np.float32), rtol=1e-6)

    def test_fuse_ln_linear_rmsnorm_no_bias(self, ref, rng):
        D, OUT = 24, 16

        class _RMSN(torch.nn.Module):  # weight-only norm, like module_util.RMSN
            def __init__(self):
                super().__init__()
                self.weight = torch.nn.Parameter(torch.tensor(
                    rng.normal(size=D).astype(np.float32)))

        ln = _RMSN()
        g0 = ln.weight.detach().numpy().copy()
        lin = torch.nn.Linear(D, OUT, bias=False)
        lin.weight.data = torch.tensor(rng.normal(size=(OUT, D)).astype(np.float32))
        mine_in = {"w": lin.weight.detach().numpy().T.copy(), "b": None}
        ref.RR.fuse_ln_linear(ln, [lin])
        _, _, (m,) = F.fold_norm_into_linears(g0, None, [mine_in])
        np.testing.assert_array_equal(lin.weight.detach().numpy(), m["w"].T.astype(np.float32))
        assert m.get("b") is None

    def test_fuse_merger_linear_blockdiag(self, ref, rng):
        size, repeats, OUT = 12, 4, 20
        ln = torch.nn.LayerNorm(size)
        ln.weight.data = torch.tensor(rng.normal(size=size).astype(np.float32))
        ln.bias.data = torch.tensor(rng.normal(size=size).astype(np.float32))
        g0, b0 = ln.weight.detach().numpy().copy(), ln.bias.detach().numpy().copy()
        lin = torch.nn.Linear(size * repeats, OUT)
        lin.weight.data = torch.tensor(
            rng.normal(size=(OUT, size * repeats)).astype(np.float32))
        lin.bias.data = torch.tensor(rng.normal(size=OUT).astype(np.float32))
        mine_in = {"w": lin.weight.detach().numpy().T.copy(), "b": lin.bias.detach().numpy().copy()}
        ref.RR.fuse_merger_linear(ln, [lin])
        _, _, m = F.fold_norm_into_linears_blockdiag(g0, b0, mine_in, repeats)
        np.testing.assert_array_equal(lin.weight.detach().numpy(), m["w"].T.astype(np.float32))
        np.testing.assert_allclose(lin.bias.detach().numpy(), m["b"].astype(np.float32),
                                   rtol=1e-6)

    def test_bake_mean_into_linear(self, ref, rng):
        D, OUT = 24, 16
        lin = torch.nn.Linear(D, OUT)
        lin.weight.data = torch.tensor(rng.normal(size=(OUT, D)).astype(np.float32))
        lin.bias.data = torch.tensor(rng.normal(size=OUT).astype(np.float32))
        mine_in = {"w": lin.weight.detach().numpy().T.copy(), "b": lin.bias.detach().numpy().copy()}
        ref.RR.bake_mean_into_linear(lin)
        m = F.center_linear_output(mine_in)
        np.testing.assert_array_equal(lin.weight.detach().numpy(), m["w"].T.astype(np.float32))
        np.testing.assert_array_equal(lin.bias.detach().numpy(), m["b"].astype(np.float32))

    def test_bake_mean_into_conv(self, ref, rng):
        conv = torch.nn.Conv2d(3, 8, kernel_size=2)
        conv.weight.data = torch.tensor(
            rng.normal(size=(8, 3, 2, 2)).astype(np.float32))
        conv.bias.data = torch.tensor(rng.normal(size=8).astype(np.float32))
        # mine: kernel laid out (..., out_channels)
        k_in = conv.weight.detach().numpy().transpose(1, 2, 3, 0).copy()
        b_in = conv.bias.detach().numpy().copy()
        ref.RR.bake_mean_into_conv(conv)
        mk, mb = F.center_conv_output(k_in, b_in)
        np.testing.assert_array_equal(
            conv.weight.detach().numpy(), mk.transpose(3, 0, 1, 2).astype(np.float32))
        np.testing.assert_array_equal(conv.bias.detach().numpy(), mb.astype(np.float32))
