"""Fused dequant-matmul Pallas kernel vs the XLA/numpy reference —
the keystone kernel-vs-reference harness (SURVEY.md §7 step 2), run in
interpreter mode on CPU; the same code compiles for TPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.gguf.constants import GGMLType
from llm_tpu.ops import qmatmul
from llm_tpu.ops.pallas_qmm import pack_p4, pack_p4_kmajor, qmm_pallas
from llm_tpu.quant import codecs
from llm_tpu.quant.qtensor import (
    dequantize_qtensor,
    qtensor_from_gguf,
    unpack_p4_kmajor_np,
    unpack_p4_np,
)


def test_pack_p4_round_trip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(4, 1024), dtype=np.int8)
    packed = pack_p4(q, zp=8, tile_k=512)
    assert packed.shape == (4, 512)
    back = unpack_p4_np(packed, pack_tk=512, zp=8)
    np.testing.assert_array_equal(back, q)


def test_pack_p4_kmajor_round_trip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(1024, 128), dtype=np.int8)
    packed = pack_p4_kmajor(q, zp=8, tile_k=256)
    assert packed.shape == (512, 128)
    back = unpack_p4_kmajor_np(packed, pack_tk=256, zp=8)
    np.testing.assert_array_equal(back, q)


@pytest.mark.parametrize("layout,zp", [("i8", 0), ("p4", 8)])
def test_qmm_pallas_interpret_matches_numpy(layout, zp):
    rng = np.random.default_rng(1)
    B, K, N, gs = 8, 1024, 256, 32
    # K-major planes [K, N]
    q = rng.integers(0, 16, size=(K, N)).astype(np.int8) - (zp if layout == "i8" else 0)
    scales = (rng.random((K // gs, N)).astype(np.float32) + 0.5) * 0.01
    x = rng.normal(size=(B, K)).astype(np.float32)

    if layout == "p4":
        qs_dev = jnp.asarray(pack_p4_kmajor(q.astype(np.int16) - zp, zp, 256))
        q_eff = q.astype(np.float32) - zp
    else:
        qs_dev = jnp.asarray(q)
        q_eff = q.astype(np.float32)

    y = qmm_pallas(
        jnp.asarray(x), qs_dev, jnp.asarray(scales),
        gs=gs, zp=zp if layout == "p4" else 0, layout=layout,
        tile_n=128, tile_k=256, interpret=True,
    )
    w = q_eff * np.repeat(scales, gs, axis=0)  # [K, N]
    want = x.astype(np.float32) @ w
    rel = np.abs(np.asarray(y) - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 2e-2  # bf16 mantissa on the dequantized weights


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q4_0])
def test_qmm_dispatch_pallas_vs_xla(qtype):
    """End-to-end: QTensor built with p4 packing, forced through the pallas
    path (interpret) must match the XLA path."""
    rng = np.random.default_rng(2)
    K, N, T = 512, 128, 5
    w = rng.normal(size=(N, K)).astype(np.float32)
    raw = codecs.quantize(w, qtype)
    qt = qtensor_from_gguf(raw, qtype, (K, N))
    assert qt.layout == "p4"
    x = rng.normal(size=(T, K)).astype(np.float32)

    want = x @ dequantize_qtensor(qt).T
    try:
        qmatmul.set_backend("pallas", interpret=True)
        got = np.asarray(qmatmul.qmm(jnp.asarray(x), qt, dtype=jnp.float32))
    finally:
        qmatmul.set_backend("auto")
    rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 1e-4


def test_qembed_p4_rows():
    rng = np.random.default_rng(3)
    V, K = 64, 512
    w = rng.normal(size=(V, K)).astype(np.float32)
    qt = qtensor_from_gguf(codecs.quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (K, V),
                           kmajor=False)
    assert qt.layout == "p4" and not qt.kmajor
    ids = jnp.asarray([0, 5, 63], jnp.int32)
    got = np.asarray(qmatmul.qembed(qt, ids, dtype=jnp.float32))
    want = dequantize_qtensor(qt)[np.asarray(ids)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("qtype", [
    GGMLType.IQ2_XXS, GGMLType.IQ2_S, GGMLType.IQ3_S, GGMLType.IQ1_S,
    GGMLType.IQ1_M, GGMLType.TQ1_0, GGMLType.TQ2_0, GGMLType.Q2_K,
    GGMLType.Q3_K,
], ids=lambda t: t.name)
def test_sub4bit_planes_through_kernel(qtype):
    """Sub-4-bit formats run the fused kernel (interpret mode) and match the
    exact codec dequant matmul — no dense bf16 fallback."""
    from llm_tpu.ops.qmatmul import qmm, set_backend
    from llm_tpu.quant import codecs
    from llm_tpu.quant.qtensor import qtensor_from_gguf

    rng = np.random.default_rng(11)
    K, N, B = 512, 128, 3
    w = rng.normal(size=(N, K)).astype(np.float32)
    raw = codecs.quantize(w, qtype)
    qt = qtensor_from_gguf(raw, qtype, (K, N))
    if qtype in (GGMLType.Q2_K, GGMLType.Q3_K,
                 GGMLType.TQ1_0, GGMLType.TQ2_0):
        assert qt.layout == "p4"  # nibble-packed: 4 bits/weight in HBM
    wd = codecs.dequantize(raw, qtype, K).reshape(N, K)
    x = rng.normal(size=(B, K)).astype(np.float32)
    want = x @ wd.T

    set_backend("pallas", interpret=True)
    try:
        got = np.asarray(qmm(jnp.asarray(x), qt, dtype=jnp.float32))
    finally:
        set_backend("auto")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
