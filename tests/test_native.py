"""Native C unpacker vs the numpy path: planes must match bit-exactly."""

import numpy as np
import pytest

from llm_tpu import native
from llm_tpu.gguf.constants import GGMLType
from llm_tpu.quant import codecs
from llm_tpu.quant.qtensor import dequantize_qtensor, qtensor_from_gguf


@pytest.mark.skipif(not native.available(), reason="no C compiler")
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0,
                                   GGMLType.Q6_K, GGMLType.Q4_0],
                         ids=lambda t: t.name)
def test_native_matches_numpy(qtype):
    rng = np.random.default_rng(0)
    K, N = 512, 16
    w = rng.normal(size=(N, K)).astype(np.float32)
    raw = codecs.quantize(w, qtype)

    res = native.unpack_planes(int(qtype), raw, N, K)
    assert res is not None
    qn, sn, mn, gs, layout, zp = res

    import os
    os.environ["LLM_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        qt = qtensor_from_gguf(raw, qtype, (K, N))
    finally:
        del os.environ["LLM_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None

    assert qt.layout == layout and qt.group_size == gs and qt.zp == zp
    np.testing.assert_array_equal(np.asarray(qt.qs), qn)
    np.testing.assert_allclose(np.asarray(qt.scales), sn, rtol=0, atol=0)
    if mn is not None:
        np.testing.assert_allclose(np.asarray(qt.mins), mn, rtol=0, atol=0)


@pytest.mark.skipif(not native.available(), reason="no C compiler")
def test_native_qtensor_dequant_correct():
    """End-to-end: native-built QTensor dequantizes to the codec reference."""
    rng = np.random.default_rng(1)
    K, N = 512, 8
    w = rng.normal(size=(N, K)).astype(np.float32)
    raw = codecs.quantize(w, GGMLType.Q4_K)
    qt = qtensor_from_gguf(raw, GGMLType.Q4_K, (K, N))
    want = codecs.dequantize(raw, GGMLType.Q4_K, K).reshape(N, K)
    np.testing.assert_allclose(dequantize_qtensor(qt), want, rtol=0, atol=1e-6)
