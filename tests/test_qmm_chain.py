"""Chained fused-matmul kernel (ops/pallas_qmm_chain.py) vs the unfused
composition — interpret mode on CPU; the same code compiles for TPU.

The chain covers the decoder-layer tail (o_proj -> residual -> rmsnorm ->
gate+up -> swiglu -> down -> residual; llm_build_llama
/root/reference/src/llama-model.cpp:4980-5030) and the norm+matmul head
(attn_norm -> QKV / final_norm -> lm_head)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.gguf.constants import GGMLType
from llm_tpu.ops.pallas_qmm_chain import layer_tail, norm_mm, plan_phases
from llm_tpu.quant import codecs
from llm_tpu.quant.qtensor import dequantize_qtensor, qtensor_from_gguf

E, F = 512, 1024
EPS = 1e-5


def _mk_qt(rng, n, k, qtype):
    w = (rng.normal(size=(n, k)) * 0.05).astype(np.float32)
    raw = codecs.quantize(w, qtype)
    return qtensor_from_gguf(raw, qtype, (k, n))


def _deq(qt):
    return dequantize_qtensor(qt).T  # [K, N]


def _rms(x, gamma, eps=EPS):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps) * gamma).astype(np.float32)


@pytest.mark.parametrize("types", [
    (GGMLType.Q4_K, GGMLType.Q4_K, GGMLType.Q6_K),
    (GGMLType.Q8_0, GGMLType.Q8_0, GGMLType.Q8_0),
    (GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q4_K),
], ids=lambda t: "-".join(x.name for x in t))
def test_layer_tail_matches_unfused(types):
    rng = np.random.default_rng(7)
    wo = _mk_qt(rng, E, E, types[0])       # att(E) -> E
    wgu = _mk_qt(rng, 2 * F, E, types[1])  # E -> 2F
    wd = _mk_qt(rng, E, F, types[2])       # F -> E
    att = rng.normal(size=(5, E)).astype(np.float32) * 0.1
    xres = rng.normal(size=(5, E)).astype(np.float32) * 0.1
    gamma = (rng.normal(size=(E,)) * 0.1 + 1.0).astype(np.float32)

    got = layer_tail(
        jnp.asarray(att), jnp.asarray(xres), jnp.asarray(gamma),
        wo, wgu, wd, eps=EPS, compute_dtype=jnp.float32, interpret=True)
    assert got is not None and got.shape == (5, E)

    y1 = att @ _deq(wo)
    h = xres + y1
    hn = _rms(h, gamma)
    gu = hn @ _deq(wgu)
    g, u = gu[:, :F], gu[:, F:]
    cur = (g / (1.0 + np.exp(-g))) * u
    want = h + cur @ _deq(wd)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_layer_tail_bf16_matches_transformer_ops():
    """bf16 compute path vs the exact op sequence _layer_body runs unfused
    (qmm f32 out, bf16 residual walk)."""
    from llm_tpu.ops import qmatmul
    from llm_tpu.ops.norms import rms_norm

    rng = np.random.default_rng(8)
    wo = _mk_qt(rng, E, E, GGMLType.Q4_K)
    wgu = _mk_qt(rng, 2 * F, E, GGMLType.Q4_K)
    wd = _mk_qt(rng, E, F, GGMLType.Q6_K)
    att = jnp.asarray(rng.normal(size=(8, E)) * 0.1, jnp.bfloat16)
    xres = jnp.asarray(rng.normal(size=(8, E)) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(size=(E,)) * 0.1 + 1.0, jnp.float32)

    got = layer_tail(att, xres, gamma, wo, wgu, wd, eps=EPS,
                     compute_dtype=jnp.bfloat16, interpret=True)

    qmatmul.set_backend("pallas", interpret=True)
    try:
        attn_out = qmatmul.qmm(att, wo, out_dtype=jnp.bfloat16)
        h = xres + attn_out
        hn = rms_norm(h, gamma, EPS)
        gu = qmatmul.qmm(hn, wgu)
        g, u = gu[:, :F], gu[:, F:]
        import jax
        cur = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        want = h + qmatmul.qmm(cur, wd, out_dtype=jnp.bfloat16)
    finally:
        qmatmul.set_backend("auto")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_norm_mm_matches_unfused(qtype):
    rng = np.random.default_rng(9)
    w = _mk_qt(rng, 3 * E, E, qtype)
    x = rng.normal(size=(3, E)).astype(np.float32) * 0.3
    gamma = (rng.normal(size=(E,)) * 0.1 + 1.0).astype(np.float32)

    got = norm_mm(jnp.asarray(x), jnp.asarray(gamma), w, eps=EPS,
                  compute_dtype=jnp.float32, out_dtype=jnp.float32,
                  interpret=True)
    assert got is not None and got.shape == (3, 3 * E)
    want = _rms(x, gamma) @ _deq(w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_plan_phases_rejects_bad_geometry():
    rng = np.random.default_rng(10)
    w = _mk_qt(rng, 96, E, GGMLType.Q4_K)  # N=96 not 128-divisible
    assert plan_phases((w,), ("norm",)) is None


def test_plan_phases_vmem_shrinks_big_tiles():
    """8B-geometry tail must fit scoped VMEM (tile_k shrinks, not fail)."""
    from llm_tpu.ops.pallas_qmm_chain import PhaseSpec, _chain_vmem

    class FakeQT:
        def __init__(self, k, n):
            self.in_features, self.out_features = k, n
            self.layout, self.group_size, self.zp = "p4", 32, 8
            self.mins = object()
            self.pack_tk = 256

    specs = plan_phases(
        (FakeQT(4096, 4096), FakeQT(4096, 28672), FakeQT(14336, 4096)),
        ("cast", "res_norm", "swiglu"))
    assert specs is not None
    assert _chain_vmem(specs, 8, 256) <= (13 << 20)
    assert all(isinstance(s, PhaseSpec) for s in specs)
