"""imatrix collection + imatrix-weighted quantization round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.tools.imatrix import collect_imatrix
from llm_tpu.tools.quantize import quantize_model

from test_model_vs_hf import _tiny_hf_llama


def test_collect_and_quantize_with_imatrix(tmp_path):
    model = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    path = str(tmp_path / "m.gguf")
    convert_hf_llama(model, path)
    reader = GGUFReader(path)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=64).tolist()
    im = collect_imatrix(reader, tokens, n_ctx=32)
    # per-layer keys for every matmul input, vectors sized by in-features
    assert "blk.0.ffn_down.weight" in im
    assert im["blk.0.ffn_down.weight"].shape == (112,)
    assert im["blk.1.attn_q.weight"].shape == (64,)
    assert all(np.all(v >= 0) for v in im.values())

    # weighted quantization consumes the matrix without error
    out = str(tmp_path / "q.gguf")
    stats = quantize_model(path, out, "Q8_0", imatrix=im)
    assert stats["out_bytes"] < stats["in_bytes"]
