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


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    mp = str(tmp_path_factory.mktemp("xl") / "m.gguf")
    convert_hf_llama(_tiny_hf_llama(), mp)
    return mp


@pytest.fixture(scope="module")
def adapter_path(tmp_path_factory):
    ap = str(tmp_path_factory.mktemp("xl") / "adapter.gguf")
    _write_adapter(ap, K=64, N=64)
    return ap


def test_export_lora_merges(tiny_model, adapter_path, tmp_path):
    """Merged GGUF == base + runtime-attached adapter (logit parity)."""
    from llm_tpu.models.lora import attach_lora, load_lora_gguf
    from llm_tpu.tools.export_lora import export_lora

    out = str(tmp_path / "merged.gguf")
    stats = export_lora(tiny_model, [(adapter_path, 1.0)], out)
    assert stats["n_merged"] > 0

    toks = [1, 5, 9, 13]
    # runtime attach on the base
    ctx1 = Context(GGUFReader(tiny_model), n_cells=32, dtype=jnp.float32,
                   use_planes=False)
    tensors, alpha = load_lora_gguf(adapter_path)
    attach_lora(ctx1.params, tensors, alpha, dtype=jnp.float32)
    assert ctx1.decode(Batch.text(toks)) == 0
    want = ctx1.get_logits()

    ctx2 = Context(GGUFReader(out), n_cells=32, dtype=jnp.float32)
    assert ctx2.decode(Batch.text(toks)) == 0
    np.testing.assert_allclose(ctx2.get_logits(), want, rtol=2e-3, atol=2e-3)


def test_peft_import_logit_parity(tmp_path):
    """Real HF PEFT checkpoint dir -> adapter GGUF -> runtime attach must
    reproduce the logits of the PEFT merge_and_unload() merged model (the
    reference convert_lora_to_gguf.py end-to-end behavior)."""
    peft = pytest.importorskip("peft")
    from llm_tpu.convert.peft_lora import convert_peft_lora

    model = _tiny_hf_llama()
    bp = str(tmp_path / "base.gguf")
    convert_hf_llama(model, bp)  # BEFORE merging mutates the base weights

    lcfg = peft.LoraConfig(
        r=4, lora_alpha=8,
        target_modules=["q_proj", "v_proj", "gate_proj", "down_proj"],
        init_lora_weights=False)  # random A AND B: nonzero delta
    torch.manual_seed(1)
    pm = peft.get_peft_model(model, lcfg)
    pdir = str(tmp_path / "peft")
    pm.save_pretrained(pdir)

    ap = str(tmp_path / "adapter.gguf")
    n = convert_peft_lora(pdir, ap, out_type=GGMLType.F32,
                          n_head=4, n_kv_head=2)  # llama: q/k permuted
    assert n == 4 * 2  # 4 target modules x 2 layers

    toks = [3, 1, 4, 1, 5, 9]
    ctx1 = Context(GGUFReader(bp), n_cells=32, dtype=jnp.float32,
                   use_planes=False)
    tensors, alpha = load_lora_gguf(ap)
    assert alpha == 8.0
    assert attach_lora(ctx1.params, tensors, alpha, dtype=jnp.float32) == n
    assert ctx1.decode(Batch.text(toks)) == 0
    got = ctx1.get_logits()

    merged = pm.merge_and_unload()
    mp = str(tmp_path / "merged.gguf")
    convert_hf_llama(merged, mp)
    ctx2 = Context(GGUFReader(mp), n_cells=32, dtype=jnp.float32,
                   use_planes=False)
    assert ctx2.decode(Batch.text(toks)) == 0
    np.testing.assert_allclose(got, ctx2.get_logits(), rtol=2e-3, atol=2e-3)
    # and the adapter actually does something
    ctx3 = Context(GGUFReader(bp), n_cells=32, dtype=jnp.float32,
                   use_planes=False)
    assert ctx3.decode(Batch.text(toks)) == 0
    assert not np.allclose(got, ctx3.get_logits(), atol=1e-4)


def test_peft_import_rejects_garbage(tmp_path):
    """Unknown module paths and half pairs fail loudly (reference exits on
    'Unexpected name')."""
    import json

    from llm_tpu.convert.peft_lora import convert_peft_lora

    pdir = tmp_path / "bad"
    pdir.mkdir()
    (pdir / "adapter_config.json").write_text(json.dumps({"lora_alpha": 8}))
    import torch as _t

    _t.save({"base_model.model.model.layers.0.mystery.lora_A.weight":
             _t.zeros(4, 8)}, str(pdir / "adapter_model.bin"))
    with pytest.raises(ValueError, match="cannot map"):
        convert_peft_lora(str(pdir), str(tmp_path / "o.gguf"))

    (pdir / "adapter_model.bin").unlink()
    _t.save({"base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
             _t.zeros(4, 8)}, str(pdir / "adapter_model.bin"))
    with pytest.raises(ValueError, match="missing its lora_b"):
        convert_peft_lora(str(pdir), str(tmp_path / "o.gguf"))


def test_control_vector_steers(tiny_model, tmp_path):
    """Control vectors: generator writes direction.N tensors; applying them
    shifts logits, scale 0 is a no-op, and clear restores baseline."""
    from llm_tpu.models.lora import (
        apply_control_vector, clear_control_vector, load_control_vector_gguf)
    from llm_tpu.tools.cvector_generator import generate_control_vector

    cv = generate_control_vector(
        tiny_model, ["a b c", "x y"], ["z z z", "q"],
        str(tmp_path / "cv.gguf"), method="mean", ctx_size=32)
    dirs = load_control_vector_gguf(cv)
    assert dirs and all(v.ndim == 1 for v in dirs.values())

    ctx = Context(GGUFReader(tiny_model), n_cells=32, dtype=jnp.float32)
    toks = [1, 5, 9]
    assert ctx.decode(Batch.text(toks)) == 0
    base = ctx.get_logits().copy()

    n = apply_control_vector(ctx.params, dirs, scale=5.0)
    assert n > 0
    ctx._steps.clear()
    ctx.clear()
    assert ctx.decode(Batch.text(toks)) == 0
    steered = ctx.get_logits().copy()
    assert not np.allclose(steered, base)

    clear_control_vector(ctx.params)
    ctx._steps.clear()
    ctx.clear()
    assert ctx.decode(Batch.text(toks)) == 0
    np.testing.assert_allclose(ctx.get_logits(), base, rtol=1e-5, atol=1e-5)
