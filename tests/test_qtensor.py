"""QTensor plane decomposition must reproduce the codec dequant exactly."""

import numpy as np
import pytest

from llm_tpu.gguf.constants import GGMLType
from llm_tpu.quant import codecs
from llm_tpu.quant.qtensor import (
    dequantize_qtensor,
    qtensor_from_gguf,
    supported_plane_types,
)


@pytest.mark.parametrize("qtype", supported_plane_types(), ids=lambda t: t.name)
def test_planes_match_codec_dequant(qtype):
    rng = np.random.default_rng(7)
    K, N = 512, 6
    w = rng.normal(size=(N, K)).astype(np.float32)  # numpy order: rows = outputs
    raw = codecs.quantize(w, qtype)
    qt = qtensor_from_gguf(raw, qtype, (K, N))
    assert qt.in_features == K and qt.out_features == N
    got = dequantize_qtensor(qt)  # [N, K]
    want = codecs.dequantize(raw, qtype, K).reshape(N, K)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
