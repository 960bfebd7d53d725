"""LoRA finetune tests (model: reference tests/test-opt.cpp — loss must
decrease on a toy problem; exported adapter round-trips)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.loader import load_params
from llm_tpu.models.lora import attach_lora, load_lora_gguf
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.runtime.training import LoraTrainer

from test_model_vs_hf import _tiny_hf_llama


def test_lora_training_reduces_loss(tmp_path):
    model = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    mp = str(tmp_path / "m.gguf")
    convert_hf_llama(model, mp)
    params, cfg = load_params(GGUFReader(mp), dense_dtype=jnp.float32, fuse=False)

    # toy task: a repeating pattern the base model has never seen
    pattern = [5, 9, 13, 21] * 16
    trainer = LoraTrainer(params, cfg, rank=8, lr=1e-2)
    before = trainer.eval_loss(pattern[:32])
    for _ in range(60):
        trainer.train_step(pattern[:32])
    after = trainer.eval_loss(pattern[:32])
    # converges toward the adapter-capacity optimum (frozen random base)
    assert after < before - 0.8, (before, after)

    # export + reload: the adapter GGUF must reproduce the trained model's
    # predictions exactly
    ap = str(tmp_path / "adapter.gguf")
    trainer.export_adapter(ap)
    lora, alpha = load_lora_gguf(ap)
    params2, cfg2 = load_params(GGUFReader(mp), dense_dtype=jnp.float32, fuse=False)
    n = attach_lora(params2, lora, alpha, scale=1.0, dtype=jnp.float32)
    assert n == 2 * 2  # 2 targets x 2 layers

    from llm_tpu.runtime.training import causal_lm_loss

    # loss of the reloaded adapter equals the trainer's in-memory loss
    empty_lora = [dict() for _ in range(cfg.n_layers)]
    reloaded = float(causal_lm_loss(
        empty_lora, params2, cfg2,
        jnp.asarray(pattern[:32], jnp.int32), scale=0.0,
    ))
    np.testing.assert_allclose(reloaded, after, rtol=1e-4)
