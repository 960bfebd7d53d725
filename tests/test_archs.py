"""Multi-architecture oracle tests: tiny random HF models (qwen2, qwen3,
gemma2) converted to GGUF must reproduce transformers' logits — validating
per-arch config (NEOX rope, qk-norm, softcaps, post-norms, SWA, embedding
scaling)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.loader import load_params
from llm_tpu.models.transformer import forward

from test_model_vs_hf import _run_ours


def _check(model, arch, tmp_path, T=9, atol=3e-3):
    path = str(tmp_path / f"{arch}.gguf")
    convert_hf_llama(model, path, arch=arch)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, model.config.vocab_size, size=T).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=atol)


def test_qwen2(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2ForCausalLM(cfg).eval()
    _check(m, "qwen2", tmp_path)


def test_qwen3(tmp_path):
    cfg = transformers.Qwen3Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=24, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Qwen3ForCausalLM(cfg).eval()
    _check(m, "qwen3", tmp_path)


def test_gemma2(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        query_pre_attn_scalar=16, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    m = transformers.Gemma2ForCausalLM(cfg).eval()
    # 12 tokens > sliding_window=8 so SWA masking is actually exercised
    _check(m, "gemma2", tmp_path, T=12, atol=5e-3)


def test_phi3(tmp_path):
    cfg = transformers.Phi3Config(
        vocab_size=1097, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Phi3ForCausalLM(cfg).eval()
    _check(m, "phi3", tmp_path)


def test_mixtral_moe(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.MixtralForCausalLM(cfg).eval()
    _check(m, "llama", tmp_path, atol=5e-3)


def test_olmo2(tmp_path):
    cfg = transformers.Olmo2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Olmo2ForCausalLM(cfg).eval()
    _check(m, "olmo2", tmp_path)


def test_granite(tmp_path):
    cfg = transformers.GraniteConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        logits_scaling=8.0, attention_multiplier=0.125,
    )
    torch.manual_seed(0)
    m = transformers.GraniteForCausalLM(cfg).eval()
    _check(m, "granite", tmp_path)


def test_starcoder2(tmp_path):
    cfg = transformers.Starcoder2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, use_bias=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Starcoder2ForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    _check(m, "starcoder2", tmp_path)


def test_command_r(tmp_path):
    cfg = transformers.CohereConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        logit_scale=0.25, tie_word_embeddings=True, use_qk_norm=False,
    )
    torch.manual_seed(0)
    m = transformers.CohereForCausalLM(cfg).eval()
    _check(m, "command-r", tmp_path)


def test_gemma3(tmp_path):
    cfg = transformers.Gemma3TextConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        sliding_window=8, sliding_window_pattern=6,
        query_pre_attn_scalar=16, tie_word_embeddings=True,
        attn_logit_softcapping=None, final_logit_softcapping=None,
    )
    torch.manual_seed(0)
    m = transformers.Gemma3ForCausalLM(cfg).eval()
    # 7 layers + pattern 6 exercises both local (SWA, base 1e4) and global
    # (base 1e6) rope paths; T > window exercises the sliding mask
    _check(m, "gemma3", tmp_path, T=12)


def test_qwen2moe(tmp_path):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, decoder_sparse_step=1,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2MoeForCausalLM(cfg).eval()
    _check(m, "qwen2moe", tmp_path)


def test_qwen3moe(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, decoder_sparse_step=1,
    )
    torch.manual_seed(0)
    m = transformers.Qwen3MoeForCausalLM(cfg).eval()
    _check(m, "qwen3moe", tmp_path)


def test_stablelm(tmp_path):
    cfg = transformers.StableLmConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        rope_theta=10000.0, use_qkv_bias=True, tie_word_embeddings=False,
        use_parallel_residual=False, layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    m = transformers.StableLmForCausalLM(cfg).eval()
    _check(m, "stablelm", tmp_path)


def test_deepseek2(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_deepseek2

    cfg = transformers.DeepseekV2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.0,
        norm_topk_prob=False, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=False, use_cache=False,
    )
    torch.manual_seed(0)
    m = transformers.DeepseekV2ForCausalLM(cfg).eval()
    path = str(tmp_path / "ds2.gguf")
    convert_hf_deepseek2(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_gemma_v1(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True, hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    m = transformers.GemmaForCausalLM(cfg).eval()
    _check(m, "gemma", tmp_path)


def test_olmoe(tmp_path):
    cfg = transformers.OlmoeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.OlmoeForCausalLM(cfg).eval()
    _check(m, "olmoe", tmp_path)


def test_cohere2(tmp_path):
    cfg = transformers.Cohere2Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=5, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=6, sliding_window_pattern=4, logit_scale=0.25,
        tie_word_embeddings=True, layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    m = transformers.Cohere2ForCausalLM(cfg).eval()
    # 5 layers @ pattern 4 covers NoPE-global and roped-SWA layers;
    # T > window exercises the sliding mask
    _check(m, "cohere2", tmp_path, T=10)


def test_gpt2(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_gpt2

    cfg = transformers.GPT2Config(
        vocab_size=97, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        activation_function="gelu_new",
    )
    torch.manual_seed(0)
    m = transformers.GPT2LMHeadModel(cfg).eval()
    with torch.no_grad():  # HF zero-inits biases; randomize to verify them
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    path = str(tmp_path / "gpt2.gguf")
    convert_hf_gpt2(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_mpt_alibi(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_mpt

    cfg = transformers.MptConfig(
        vocab_size=97, d_model=64, n_heads=4, n_layers=2,
        expansion_ratio=2, max_seq_len=128,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            alibi=True, alibi_bias_max=8),
        no_bias=True,
    )
    torch.manual_seed(0)
    m = transformers.MptForCausalLM(cfg).eval()
    path = str(tmp_path / "mpt.gguf")
    convert_hf_mpt(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_phi2(tmp_path):
    cfg = transformers.PhiConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False,
        hidden_act="gelu_new", layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    m = transformers.PhiForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    from llm_tpu.convert.hf_llama import convert_hf_phi2

    path = str(tmp_path / "phi2.gguf")
    convert_hf_phi2(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_falcon(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_falcon

    cfg = transformers.FalconConfig(
        vocab_size=97, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.FalconForCausalLM(cfg).eval()
    path = str(tmp_path / "falcon.gguf")
    convert_hf_falcon(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_bloom(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_bloom

    cfg = transformers.BloomConfig(
        vocab_size=97, hidden_size=64, n_head=4, n_layer=2,
        layer_norm_epsilon=1e-5, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    m = transformers.BloomForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    path = str(tmp_path / "bloom.gguf")
    convert_hf_bloom(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_gptneox(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_gptneox

    cfg = transformers.GPTNeoXConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        max_position_embeddings=128, rope_theta=10000.0,
        use_parallel_residual=True, layer_norm_eps=1e-5,
        tie_word_embeddings=False, hidden_act="gelu",
    )
    torch.manual_seed(0)
    m = transformers.GPTNeoXForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    path = str(tmp_path / "neox.gguf")
    convert_hf_gptneox(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_gptj(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_gptj

    cfg = transformers.GPTJConfig(
        vocab_size=97, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8, activation_function="gelu_new",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.GPTJForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    path = str(tmp_path / "gptj.gguf")
    convert_hf_gptj(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_starcoder_bigcode(tmp_path):
    from llm_tpu.convert.hf_llama import convert_hf_starcoder

    cfg = transformers.GPTBigCodeConfig(
        vocab_size=97, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        multi_query=True, activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    m = transformers.GPTBigCodeForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, prm in m.named_parameters():
            if n.endswith(".bias"):
                prm.normal_(0, 0.05)
    path = str(tmp_path / "starcoder.gguf")
    convert_hf_starcoder(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(path, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-3)


def test_qwen2moe_quantized_expert_planes(tmp_path):
    """Q8_0-quantized expert stacks stay quantized in HBM (stacked-expert
    QTensor planes, loader 3-D branch) and still track the HF logits."""
    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.models.loader import load_params
    from llm_tpu.quant.qtensor import QTensor
    from llm_tpu.tools.quantize import quantize_model

    cfg = transformers.Qwen2MoeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=64, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, decoder_sparse_step=1,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2MoeForCausalLM(cfg).eval()
    f32 = str(tmp_path / "moe_f32.gguf")
    q8 = str(tmp_path / "moe_q8.gguf")
    convert_hf_llama(m, f32, arch="qwen2moe")
    quantize_model(f32, q8, "Q8_0")

    params, _ = load_params(GGUFReader(q8), dense_dtype=jnp.float32)
    stack = params["layers"][0]["ffn_up_exps"]
    assert isinstance(stack, QTensor) and stack.qs.ndim == 3
    assert stack.qs.shape[0] == 4  # leading expert dim

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    ours = _run_ours(q8, tokens)
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=0.06, rtol=0.06)


def test_olmo(tmp_path):
    """OLMo: llama graph with non-parametric LayerNorm (llm_build_olmo,
    llama-model.cpp:3289)."""
    cfg = transformers.OlmoConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.OlmoForCausalLM(cfg).eval()
    _check(m, "olmo", tmp_path)


def test_arcee(tmp_path):
    """Arcee: llama with squared-relu no-gate FFN (llm_build_arcee)."""
    cfg = transformers.ArceeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.ArceeForCausalLM(cfg).eval()
    _check(m, "arcee", tmp_path)


def test_ernie4_5(tmp_path):
    """ERNIE 4.5: llama graph, interleaved rotary stored unpermuted
    (llm_build_ernie4_5; reference converter Ernie4_5Model)."""
    cfg = transformers.Ernie4_5Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Ernie4_5ForCausalLM(cfg).eval()
    _check(m, "ernie4_5", tmp_path)


def test_nemotron(tmp_path):
    """Nemotron: layernorm1p (+1 folded at convert), relu^2 FFN, partial
    NEOX rotary (llm_build_nemotron, llama-model.cpp:12399)."""
    cfg = transformers.NemotronConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        partial_rotary_factor=0.5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.NemotronForCausalLM(cfg).eval()
    _check(m, "nemotron", tmp_path)


def test_glm4(tmp_path):
    """GLM4: sandwich norms (attn/ffn post-norms), fused gate-up in ffn_up,
    half-width interleaved rotary (llm_build_glm4, llama-model.cpp:12248)."""
    cfg = transformers.Glm4Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        head_dim=16, partial_rotary_factor=0.5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Glm4ForCausalLM(cfg).eval()
    _check(m, "glm4", tmp_path)


def test_cohere_command_r(tmp_path):
    """Command-R: LayerNorm + parallel attn/ffn sharing the input norm +
    logit scale (llm_build_command_r, llama-model.cpp:10081)."""
    cfg = transformers.CohereConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        logit_scale=0.25,
    )
    torch.manual_seed(0)
    m = transformers.CohereForCausalLM(cfg).eval()
    _check(m, "command-r", tmp_path)


def test_dbrx(tmp_path):
    """DBRX: fused Wqkv, weight-only LayerNorms, normalized softmax top-k
    MoE from flat expert params (llm_build_dbrx; DbrxModel converter)."""
    from transformers.models.dbrx.configuration_dbrx import (
        DbrxAttentionConfig, DbrxFFNConfig)

    cfg = transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128, vocab_size=97,
        pad_token_id=0,
        attn_config=DbrxAttentionConfig(kv_n_heads=2, rope_theta=10000.0),
        ffn_config=DbrxFFNConfig(ffn_hidden_size=48, moe_num_experts=4,
                                 moe_top_k=2),
    )
    torch.manual_seed(0)
    m = transformers.DbrxForCausalLM(cfg).eval()
    _check(m, "dbrx", tmp_path)


def test_granitemoe(tmp_path):
    """GraniteMoe: granite multipliers + fused input_linear split into
    gate/up expert stacks (GraniteMoeModel converter)."""
    cfg = transformers.GraniteMoeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, pad_token_id=0,
        max_position_embeddings=128, rope_theta=10000.0,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        logits_scaling=3.0, attention_multiplier=0.3,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.GraniteMoeForCausalLM(cfg).eval()
    _check(m, "granitemoe", tmp_path)


def test_dots1(tmp_path):
    """dots1: sigmoid routing + e_score_correction selection bias +
    normalized*scaled weights, qk norms, leading dense layer, ungated
    shared experts (llm_build_dots1)."""
    cfg = transformers.Dots1Config(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=True, pad_token_id=0, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Dots1ForCausalLM(cfg).eval()
    # randomize the zero-initialized selection bias so the test exercises it
    with torch.no_grad():
        for layer in m.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    _check(m, "dots1", tmp_path)


def test_phimoe(tmp_path):
    """PhiMoE: phi3-family graph + LayerNorm(+bias) + mixtral expert
    stacks. The reference routes it through standard softmax top-k
    (llm_build_phi3<MoE> -> build_moe_ffn SOFTMAX, llama-model.cpp:14845)
    rather than HF's training-oriented sparsemixer, so the oracle patches
    HF's router to the same softmax top-k semantics."""
    cfg = transformers.PhimoeConfig(
        vocab_size=97, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, pad_token_id=0,
        max_position_embeddings=128, rope_theta=10000.0, rope_scaling=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.PhimoeForCausalLM(cfg).eval()

    import torch.nn.functional as F
    from transformers.models.phimoe import modeling_phimoe as mp

    def softmax_topk_forward(self, hidden_states):
        b, s, d = hidden_states.shape
        x = hidden_states.view(-1, d)
        logits = self.gate(x)
        probs = F.softmax(logits, dim=-1)
        topw, topi = torch.topk(probs, self.top_k, dim=-1)
        out = torch.zeros_like(x)
        for k in range(self.top_k):
            for e in range(self.num_experts):
                mask = topi[:, k] == e
                if mask.any():
                    out[mask] += topw[mask, k, None] * self.experts[e](x[mask])
        return out.view(b, s, d), logits

    for layer in m.model.layers:
        layer.block_sparse_moe.forward = softmax_topk_forward.__get__(
            layer.block_sparse_moe)
    _check(m, "phimoe", tmp_path)


def test_bitnet(tmp_path):
    """BitNet b1.58: squared-relu gated FFN + RMS sub-norms before the
    attention/FFN output projections (llm_build_bitnet,
    llama-model.cpp:3634). Graph parity at f32; the ternary storage path
    is covered by the TQ1_0/TQ2_0 codec + plane tests."""
    cfg = transformers.BitNetConfig(
        vocab_size=97, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.BitNetForCausalLM(cfg).eval()
    _check(m, "bitnet", tmp_path)


@pytest.mark.parametrize("arch", ["baichuan", "xverse", "exaone", "internlm2"])
def test_config_mapped_llama_variants(arch, tmp_path):
    """Reference-registry archs without an installed HF class: their GGUF
    config mapping loads and decodes through the shared llama graph (the
    same tensors llama.cpp's converters emit for them)."""
    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.models.config import config_from_gguf
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    from test_model_vs_hf import _tiny_hf_llama

    m = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    path = str(tmp_path / f"{arch}.gguf")
    convert_hf_llama(m, path, arch=arch)
    cfg = config_from_gguf(GGUFReader(path))
    assert cfg.arch == arch
    ctx = Context(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    assert ctx.decode(Batch.text([3, 1, 4, 1, 5], seq_id=0)) == 0
    assert np.isfinite(ctx.get_logits()).all()


def test_convert_hf_auto_dispatch(tmp_path):
    """convert_hf_auto routes by config.model_type (reference converter
    registry parity) and the result decodes."""
    from test_model_vs_hf import _tiny_hf_llama

    from llm_tpu.convert.hf_llama import convert_hf_auto
    from llm_tpu.gguf.reader import GGUFReader
    from llm_tpu.runtime.batch import Batch
    from llm_tpu.runtime.engine import Context

    m = _tiny_hf_llama(hidden=64, layers=2, vocab=97)
    p = str(tmp_path / "auto.gguf")
    convert_hf_auto(m, p)
    r = GGUFReader(p)
    assert r.architecture == "llama"
    ctx = Context(r, n_cells=16, dtype=jnp.float32)
    assert ctx.decode(Batch.text([1, 2, 3], seq_id=0)) == 0

    with pytest.raises(ValueError, match="unsupported model_type"):
        class _C:  # minimal stand-in with an unknown type
            class config:
                model_type = "made_up_arch"
        convert_hf_auto(_C, str(tmp_path / "x.gguf"))
