"""End-to-end chained-kernel wiring: the SAME Context decode with the
chain kernels forced on (interpret mode) must reproduce the unfused path.
Kernel-level equivalence lives in test_qmm_chain.py; this file proves the
transformer's eligibility gates (head QKV, layer tail, lm_head) end to end
through quantized GGUFs."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.loader import load_params
from llm_tpu.ops.pallas_qmm_chain import head_eligible, tail_eligible
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context
from llm_tpu.tools.quantize import quantize_model


@pytest.fixture(scope="module")
def chain_gguf(tmp_path_factory):
    """Tiny llama with 128-aligned dims so the chain kernel engages, at two
    ftypes: Q4_K_M (mixed Q4_K/Q6_K phases, no fused QKV because attn_v
    upgrades) and Q8_0 (uniform i8, fused QKV head engages)."""
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("chain")
    f32 = str(d / "f32.gguf")
    convert_hf_llama(model, f32)
    paths = {}
    for ftype in ("Q4_K_M", "Q8_0"):
        out = str(d / f"{ftype}.gguf")
        quantize_model(f32, out, ftype)
        paths[ftype] = out
    return paths


def _decode_logits(path, toks):
    ctx = Context(GGUFReader(path), n_cells=32, dtype=jnp.bfloat16)
    assert ctx.decode(Batch.text(toks[:-1], seq_id=0)) == 0
    assert ctx.decode(Batch.one(toks[-1], pos=len(toks) - 1, seq_id=0)) == 0
    return np.asarray(ctx.get_logits())


@pytest.mark.parametrize("ftype", ["Q4_K_M", "Q8_0"])
def test_chain_e2e_matches_unfused(chain_gguf, monkeypatch, ftype):
    toks = [3, 1, 4, 1, 5, 9, 2]
    monkeypatch.setenv("LLM_TPU_CHAIN", "0")
    want = _decode_logits(chain_gguf[ftype], toks)
    monkeypatch.setenv("LLM_TPU_CHAIN", "1")
    monkeypatch.setenv("LLM_TPU_CHAIN_FORCE", "interpret")
    got = _decode_logits(chain_gguf[ftype], toks)
    # bf16 compute; partial-sum order differs between fused/unfused tiles
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    # the ranking must be stable
    assert int(np.argmax(got)) == int(np.argmax(want))


def test_chain_eligibility_on_quantized_llama(chain_gguf):
    params, _ = load_params(GGUFReader(chain_gguf["Q4_K_M"]))
    for layer in params["layers"]:
        assert tail_eligible(layer), sorted(layer)
    params8, _ = load_params(GGUFReader(chain_gguf["Q8_0"]))
    for layer in params8["layers"]:
        assert tail_eligible(layer)
        assert head_eligible(layer), sorted(layer)


def test_chain_ineligible_layers_fall_back(chain_gguf):
    """A layer with a post-norm key must be rejected by the gate."""
    params, _ = load_params(GGUFReader(chain_gguf["Q4_K_M"]))
    layer = dict(params["layers"][0])
    layer["attn_post_norm"] = jnp.ones((256,), jnp.float32)
    assert not tail_eligible(layer)
    layer2 = dict(params["layers"][0])
    layer2["ffn_down.lora"] = (1, 2, 3)
    assert not tail_eligible(layer2)
