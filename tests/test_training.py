"""LoRA finetune tests (model: reference tests/test-opt.cpp — loss must
decrease on a toy problem; exported adapter round-trips)."""

import numpy as np
import pytest

import jax
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


def test_full_weight_training_reduces_loss(tmp_path):
    """FullTrainer (adamw) drives next-token CE down on a repeating pattern
    and the GGUF checkpoint round-trips (llama_model_save_to_file +
    ggml_opt_fit parity)."""
    import sys
    sys.path.insert(0, "tests")
    from llm_tpu.convert.hf_llama import convert_hf_llama
    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.models.loader import load_params
    from llm_tpu.runtime.training import FullTrainer, batched_lm_loss
    from test_model_vs_hf import _tiny_hf_llama

    path = str(tmp_path / "base.gguf")
    convert_hf_llama(_tiny_hf_llama(hidden=64, layers=2, vocab=97), path)
    reader = GGUFReader(path)
    params, cfg = load_params(reader, dense_dtype=jnp.float32,
                              use_planes=False)

    rng = np.random.default_rng(0)
    pattern = rng.integers(0, 97, size=16).tolist()
    stream = (pattern * 12)[:160]

    tr = FullTrainer(params, cfg, lr=3e-3, optimizer="adamw")
    eval_toks = np.asarray((pattern * 3)[:32], np.int32)
    before = tr.eval_loss(eval_toks)
    for _ in range(12):
        tr.epoch(stream, n_ctx=32, batch_size=2)
    after = tr.eval_loss(eval_toks)
    assert after < before * 0.7, (before, after)

    # sgd variant also steps without error and reduces loss
    tr2 = FullTrainer(params, cfg, lr=1e-1, optimizer="sgd")
    b2 = tr2.eval_loss(eval_toks)
    for _ in range(8):
        tr2.epoch(stream, n_ctx=32, batch_size=2)
    assert tr2.eval_loss(eval_toks) < b2

    # checkpoint: saved GGUF reloads and reproduces the trained loss
    out = str(tmp_path / "trained.gguf")
    n = tr.save(reader, out)
    assert n > 5
    p2, cfg2 = load_params(GGUFReader(out), dense_dtype=jnp.float32,
                           use_planes=False)
    reload_loss = float(batched_lm_loss(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p2,
                     is_leaf=lambda x: x is None),
        cfg2, jnp.asarray(eval_toks)[None]))
    np.testing.assert_allclose(reload_loss, after, rtol=1e-5, atol=1e-5)
