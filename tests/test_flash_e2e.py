"""End-to-end fused-attention wiring tests: the SAME Context decode with
the Pallas kernels forced on (interpret mode) must reproduce the unfused
XLA path bit-near for the hard archs the kernels just learned — ALiBi
(mpt), partial rotary (phi2/stablelm class), MLA Dk!=Dv (deepseek2),
M-RoPE (qwen2vl). Kernel-level equivalence lives in test_pallas_attn.py;
this file proves the transformer's eligibility gate + table/companion
wiring end to end."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_auto
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context


def _decode_logits(path, toks, n_cells=64):
    ctx = Context(GGUFReader(path), n_cells=n_cells, dtype=jnp.float32)
    assert ctx.decode(Batch.text(toks[:-1], seq_id=0)) == 0
    assert ctx.decode(Batch.one(toks[-1], pos=len(toks) - 1, seq_id=0)) == 0
    return np.asarray(ctx.get_logits())


def _flash_vs_unfused(path, toks, monkeypatch, atol=2e-4):
    monkeypatch.delenv("LLM_TPU_FLASH_FORCE", raising=False)
    want = _decode_logits(path, toks)
    monkeypatch.setenv("LLM_TPU_FLASH_FORCE", "interpret")
    monkeypatch.setenv("LLM_TPU_FLASH_ANYDIM", "1")
    got = _decode_logits(path, toks)
    np.testing.assert_allclose(got, want, atol=atol, rtol=atol)


def test_flash_e2e_alibi_mpt(tmp_path, monkeypatch):
    """mpt: ALiBi slopes ride the kernel (no rope)."""
    cfg = transformers.MptConfig(
        vocab_size=97, d_model=64, n_heads=4, n_layers=2,
        max_seq_len=128,
        attn_config=transformers.models.mpt.configuration_mpt
        .MptAttentionConfig(alibi=True, alibi_bias_max=8),
    )
    torch.manual_seed(0)
    m = transformers.MptForCausalLM(cfg).eval()
    p = str(tmp_path / "mpt.gguf")
    convert_hf_auto(m, p)
    _flash_vs_unfused(p, [3, 1, 4, 1, 5, 9, 2], monkeypatch)


def test_flash_e2e_partial_rotary_phi2(tmp_path, monkeypatch):
    """phi2: partial rotary (n_dims < head_dim) through the identity
    cos/sin fill."""
    cfg = transformers.PhiConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.PhiForCausalLM(cfg).eval()
    p = str(tmp_path / "phi2.gguf")
    convert_hf_auto(m, p)
    _flash_vs_unfused(p, [3, 1, 4, 1, 5, 9, 2], monkeypatch)


def test_flash_e2e_mla_deepseek2(tmp_path, monkeypatch):
    """deepseek2 MLA: Dk != Dv with leading-rope layout."""
    cfg = transformers.DeepseekV3Config(
        vocab_size=97, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        n_group=1, topk_group=1, first_k_dense_replace=1,
        norm_topk_prob=True, routed_scaling_factor=2.0,
        scoring_func="sigmoid", kv_lora_rank=16, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=16,
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_interleave=False, use_cache=False,
    )
    torch.manual_seed(0)
    m = transformers.DeepseekV3ForCausalLM(cfg).eval()
    p = str(tmp_path / "ds2.gguf")
    convert_hf_auto(m, p)
    _flash_vs_unfused(p, [3, 1, 4, 1, 5, 9, 2], monkeypatch)


def test_flash_e2e_llama4(tmp_path, monkeypatch):
    """llama4: chunked-SWA mask (in the additive bias), per-token
    attention-temperature scaling on nope layers (applied to q pre-call)
    and the weightless qk L2 norm (k normalized unroped pre-cache; rope
    is orthogonal so it commutes with the on-read rotation) — all through
    the fused kernels (llm_build_llama_iswa parity)."""
    cfg = transformers.Llama4TextConfig(
        vocab_size=97, hidden_size=64, intermediate_size=48,
        intermediate_size_mlp=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, max_position_embeddings=128,
        attention_chunk_size=4, floor_scale=4.0, attn_scale=0.1,
        attn_temperature_tuning=True, use_qk_norm=True,
        rope_theta=10000.0, tie_word_embeddings=False, pad_token_id=0,
        rope_scaling=None,
    )
    torch.manual_seed(0)
    m = transformers.Llama4ForCausalLM(cfg).eval()
    p = str(tmp_path / "llama4.gguf")
    convert_hf_auto(m, p)
    # 13 tokens: spans several chunks of 4, so the chunked mask, the
    # floor-scaled temperature and the L2 norm all take effect
    _flash_vs_unfused(p, [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9],
                      monkeypatch)


def test_flash_e2e_mrope_qwen2vl(tmp_path, monkeypatch):
    """qwen2vl: M-RoPE per-cell angle tables through the fold."""
    cfg = transformers.Qwen2VLConfig(
        text_config=dict(
            model_type="qwen2_vl_text", vocab_size=97, hidden_size=64,
            intermediate_size=112, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]}),
        vision_config=dict(
            model_type="qwen2_vl", depth=1, embed_dim=32, hidden_size=64,
            num_heads=2, patch_size=8, spatial_merge_size=1,
            temporal_patch_size=1),
    )
    torch.manual_seed(0)
    m = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    p = str(tmp_path / "q2vl.gguf")
    convert_hf_auto(m, p)
    _flash_vs_unfused(p, [3, 1, 4, 1, 5, 9, 2], monkeypatch)
