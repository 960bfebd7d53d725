"""LoRA adapter tests: GGUF adapter round-trip and numerical effect."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.constants import GGMLType
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.gguf.writer import GGUFWriter
from llm_tpu.models.loader import load_params
from llm_tpu.models.lora import attach_lora, load_lora_gguf
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from test_model_vs_hf import _tiny_hf_llama


def _write_adapter(path, rank=4, K=64, N=64, alpha=8.0, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch="llama")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", float(alpha))
    a = rng.normal(size=(rank, K)).astype(np.float32) * 0.05
    b = rng.normal(size=(N, rank)).astype(np.float32) * 0.05
    w.add_tensor("blk.0.attn_q.weight.lora_a", a)
    w.add_tensor("blk.0.attn_q.weight.lora_b", b)
    w.write()
    return a, b


def test_lora_changes_logits_proportionally(tmp_path):
    model = _tiny_hf_llama()
    mp = str(tmp_path / "m.gguf")
    convert_hf_llama(model, mp)
    ap = str(tmp_path / "adapter.gguf")
    a, b = _write_adapter(ap, K=64, N=64)

    lora, alpha = load_lora_gguf(ap)
    assert "blk.0.attn_q.weight" in lora

    def logits_with_scale(scale):
        reader = GGUFReader(mp)
        params, cfg = load_params(reader, dense_dtype=jnp.float32, fuse=False)
        n = attach_lora(params, lora, alpha, scale=scale, dtype=jnp.float32)
        assert n == 1
        ctx = Context(reader, n_cells=32, dtype=jnp.float32,
                      params_cfg=(params, cfg))
        ctx.decode(Batch.text([3, 1, 4, 1, 5]))
        return ctx.get_logits()

    base = logits_with_scale(0.0)
    mod = logits_with_scale(1.0)
    assert not np.allclose(base, mod, atol=1e-5)

    # scale 0 == no adapter at all
    reader = GGUFReader(mp)
    ctx0 = Context(reader, n_cells=32, dtype=jnp.float32)
    ctx0.decode(Batch.text([3, 1, 4, 1, 5]))
    np.testing.assert_allclose(base, ctx0.get_logits(), atol=1e-5)

    # delta matches manual computation on the q projection
    # (indirect check: logits differ smoothly with scale)
    half = logits_with_scale(0.5)
    d1 = np.abs(mod - base).mean()
    dh = np.abs(half - base).mean()
    assert 0.2 * d1 < dh < 0.8 * d1
