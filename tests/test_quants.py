"""Quantization codec tests.

Mirrors the reference's test strategy (tests/test-quantize-fns.cpp): synthetic
data, round-trip RMSE thresholds per family, plus bit-exact layout checks
against the reference's pure-Python gguf-py dequantizers when available.
"""

import os
import sys

import numpy as np
import pytest

from llm_tpu.gguf.constants import GGMLType, type_traits
from llm_tpu.quant import codecs

from conftest import REFERENCE_DIR, reference_available


def synthetic(n: int, offset: float = 0.0) -> np.ndarray:
    i = np.arange(n, dtype=np.float32)
    return 0.1 + 2.0 * np.cos(i + offset)


def array_rmse(a, b):
    """sqrt(sum(diff^2)) / n — the reference's error metric
    (tests/test-quantize-fns.cpp array_rmse)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.sum((a - b) ** 2)) / a.size)


# total round-trip error thresholds in the spirit of test-quantize-fns.cpp:17-25
THRESH = {
    GGMLType.Q4_0: 0.002,
    GGMLType.Q4_1: 0.002,
    GGMLType.Q5_0: 0.002,
    GGMLType.Q5_1: 0.002,
    GGMLType.Q8_0: 0.002,
    GGMLType.Q8_1: 0.002,
    GGMLType.Q2_K: 0.0075,
    GGMLType.Q3_K: 0.0040,
    GGMLType.Q4_K: 0.002,
    GGMLType.Q5_K: 0.002,
    GGMLType.Q6_K: 0.002,
    GGMLType.Q8_K: 0.002,
    GGMLType.IQ4_NL: 0.002,
    GGMLType.IQ4_XS: 0.002,
}


@pytest.mark.parametrize("qtype", sorted(THRESH.keys(), key=int))
def test_round_trip_error(qtype):
    n = 32 * 128  # reference test_size
    x = synthetic(n).reshape(1, n)
    raw = codecs.quantize(x, qtype)
    tt = type_traits(qtype)
    assert raw.shape == (1, n // tt.block_size * tt.type_size)
    y = codecs.dequantize(raw, qtype, n)
    err = array_rmse(x, y)
    assert err < THRESH[qtype], f"{qtype.name}: round-trip error {err}"


@pytest.mark.parametrize("qtype", sorted(THRESH.keys(), key=int))
def test_round_trip_multirow(qtype):
    rows, n = 3, 512
    rng = np.random.default_rng(0)
    x = rng.normal(size=(rows, n)).astype(np.float32)
    raw = codecs.quantize(x, qtype)
    y = codecs.dequantize(raw, qtype, n).reshape(rows, n)
    # each row quantized independently: quantizing a single row must agree
    raw0 = codecs.quantize(x[:1], qtype)
    np.testing.assert_array_equal(raw[0], raw0[0])
    # per-element RMSE sanity bound (gaussian data, unit scale)
    per_elem = float(np.sqrt(np.mean((x - y) ** 2)))
    assert per_elem < 0.6, f"{qtype.name}: per-element RMSE {per_elem}"


def test_float_formats():
    x = np.array([[1.0, -2.5, 3.0e-5, 65504.0]], np.float32)
    for t in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        raw = codecs.quantize(x, t)
        y = codecs.dequantize(raw, t, 4)
        rtol = {GGMLType.F32: 0, GGMLType.F16: 1e-3, GGMLType.BF16: 1e-2}[t]
        np.testing.assert_allclose(y, x, rtol=rtol)


def test_q8_0_golden_block():
    """Hand-constructed block: values k/4 for k in [-16, 16)."""
    x = (np.arange(32, dtype=np.float32) - 16.0) / 4.0
    raw = codecs.quantize(x.reshape(1, 32), GGMLType.Q8_0)
    d = np.frombuffer(raw.tobytes()[:2], dtype=np.float16)[0]
    q = np.frombuffer(raw.tobytes()[2:], dtype=np.int8)
    assert np.isclose(float(d), 4.0 / 127.0, rtol=1e-3)
    np.testing.assert_array_equal(q, np.rint(x / float(d)).astype(np.int8))


def test_q4_0_nibble_layout():
    """Element i lives in the low nibble of byte i (i<16) / high nibble (i>=16)."""
    x = np.zeros((1, 32), np.float32)
    x[0, 0] = -8.0  # forces d = 1.0, q[0] = 0
    x[0, 5] = 7.0   # q -> 15
    x[0, 21] = 3.0  # q -> 11
    raw = codecs.quantize(x, GGMLType.Q4_0).tobytes()
    qs = np.frombuffer(raw[2:], dtype=np.uint8)
    assert qs[0] & 0xF == 0
    assert qs[5] & 0xF == 15
    assert qs[5] >> 4 == 11  # element 21 (=3.0 -> q=11) is byte 5's high nibble
    y = codecs.dequantize(np.frombuffer(raw, np.uint8), GGMLType.Q4_0, 32)[0]
    assert y[0] == -8.0 and y[5] == 7.0 and y[21] == 3.0


# ---------------------------------------------------------------------------
# Bit-exact oracle: the reference repo's own numpy dequantizers (gguf-py).
# Our quantize -> their dequantize must equal our dequantize exactly.
# ---------------------------------------------------------------------------

ORACLE_TYPES = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
    GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS,
]


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("qtype", ORACLE_TYPES, ids=lambda t: t.name)
def test_layout_vs_reference_gguf_py(qtype):
    sys.path.insert(0, os.path.join(REFERENCE_DIR, "gguf-py"))
    try:
        from gguf.quants import dequantize as ref_dequantize  # type: ignore
        import gguf as ref_gguf  # type: ignore
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(42)
    n = 512
    x = rng.normal(size=(2, n)).astype(np.float32)
    raw = codecs.quantize(x, qtype)
    ours = codecs.dequantize(raw, qtype, n).reshape(2, n)
    ref_qt = ref_gguf.GGMLQuantizationType(int(qtype))
    theirs = ref_dequantize(raw.reshape(2, -1), ref_qt).astype(np.float32)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# Importance-grid (IQ) and ternary (TQ) formats (llm_tpu/quant/iq_codecs.py).
# The reference cannot round-trip-test most of these without an imatrix
# (its encoders assert on one); ours always encode, so we test both the
# round-trip quality of our encoder and bit-exact decode parity.
# ---------------------------------------------------------------------------

# per-element RMSE bounds on unit gaussians for our nearest-codeword
# encoders (1.5-3.4 bpw formats; ternary-optimal RMSE is ~0.48)
IQ_THRESH = {
    GGMLType.IQ2_XXS: 0.55,
    GGMLType.IQ2_XS: 0.48,
    GGMLType.IQ2_S: 0.40,
    GGMLType.IQ3_XXS: 0.42,
    GGMLType.IQ3_S: 0.30,
    GGMLType.IQ1_S: 0.60,
    GGMLType.IQ1_M: 0.58,
    GGMLType.TQ1_0: 0.80,
    GGMLType.TQ2_0: 0.80,
}


@pytest.mark.parametrize("qtype", sorted(IQ_THRESH.keys(), key=int), ids=lambda t: t.name)
def test_iq_round_trip(qtype):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 512)).astype(np.float32)
    raw = codecs.quantize(x, qtype)
    tt = type_traits(qtype)
    assert raw.shape == (3, 512 // tt.block_size * tt.type_size)
    y = codecs.dequantize(raw, qtype, 512).reshape(3, 512)
    rmse = float(np.sqrt(np.mean((x - y) ** 2)))
    assert rmse < IQ_THRESH[qtype], f"{qtype.name}: per-element RMSE {rmse}"


@pytest.mark.parametrize("qtype", sorted(IQ_THRESH.keys(), key=int), ids=lambda t: t.name)
def test_iq_imatrix_weighted(qtype):
    """Encoding with an importance row must still produce a decodable
    bitstream and not degrade weighted error."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 512)).astype(np.float32)
    qw = (1.0 + rng.random(512)).astype(np.float32)
    raw = codecs.quantize(x, qtype, qw=qw)
    y = codecs.dequantize(raw, qtype, 512).reshape(2, 512)
    rmse = float(np.sqrt(np.mean((x - y) ** 2)))
    assert rmse < IQ_THRESH[qtype] * 1.25


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("qtype", sorted(IQ_THRESH.keys(), key=int), ids=lambda t: t.name)
def test_iq_layout_vs_reference_gguf_py(qtype):
    sys.path.insert(0, os.path.join(REFERENCE_DIR, "gguf-py"))
    try:
        from gguf.quants import dequantize as ref_dequantize  # type: ignore
        import gguf as ref_gguf  # type: ignore
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 512)).astype(np.float32)
    raw = codecs.quantize(x, qtype)
    ours = codecs.dequantize(raw, qtype, 512).reshape(2, 512)
    theirs = ref_dequantize(
        raw.reshape(2, -1), ref_gguf.GGMLQuantizationType(int(qtype))
    ).astype(np.float32)
    np.testing.assert_array_equal(ours, theirs)


def test_tq1_0_golden_trits():
    """Trit packing matches the reference's MSB-first ceil-scaled scheme
    (quantize_row_tq1_0_ref, ggml-quants.c:2064)."""
    x = np.zeros((1, 256), np.float32)
    x[0, 0] = 1.0    # trit +1, MSB of byte 0
    x[0, 32] = -1.0  # trit -1 (digit n=1 of byte 0)
    raw = codecs.quantize(x, GGMLType.TQ1_0).tobytes()
    # byte 0 digits MSB-first: [2,0,1,1,1] -> q=(((2*3+0)*3+1)*3+1)*3+1 = 175
    # ceil(175*256/243) = 185
    assert raw[0] == 185
    y = codecs.dequantize(np.frombuffer(raw, np.uint8), GGMLType.TQ1_0, 256)[0]
    assert y[0] == 1.0 and y[32] == -1.0 and y[1] == 0.0
