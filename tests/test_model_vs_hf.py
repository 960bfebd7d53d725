"""End-to-end correctness oracle: a random tiny HF Llama (torch, f32) is
converted to GGUF by our converter, loaded by our loader, and the forward
logits must match transformers' output. This validates the converter's QK
permutation, the GGUF round-trip, RoPE, attention, and the decoder graph
in one shot."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_tpu.convert.hf_llama import convert_hf_llama
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.loader import load_params
from llm_tpu.models.transformer import forward


def _tiny_hf_llama(n_heads=4, n_kv_heads=2, hidden=64, layers=2, vocab=97, tie=False):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=112,
        num_hidden_layers=layers,
        num_attention_heads=n_heads,
        num_key_value_heads=n_kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        attention_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def _run_ours(path, tokens, n_cells=32, dtype=jnp.float32):
    r = GGUFReader(path)
    params, cfg = load_params(r, dense_dtype=dtype)
    T = len(tokens)
    kv_k = [jnp.zeros((cfg.n_kv_heads, n_cells, cfg.head_dim), dtype) for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, n_cells, cfg.head_dim_v), dtype) for _ in range(cfg.n_layers)]
    tok = jnp.asarray(tokens, jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    seq = jnp.zeros(T, jnp.int32)
    write_idx = jnp.arange(T, dtype=jnp.int32)
    cell_pos = jnp.concatenate([pos, jnp.zeros(n_cells - T, jnp.int32)])
    cell_bits = jnp.concatenate(
        [jnp.ones(T, jnp.uint32), jnp.zeros(n_cells - T, jnp.uint32)]
    )
    out_idx = jnp.arange(T, dtype=jnp.int32)
    logits, _, _, _ = forward(
        params, cfg, kv_k, kv_v, tok, pos, seq, write_idx, cell_pos, cell_bits,
        out_idx, dtype=dtype,
    )
    return np.asarray(logits)


@pytest.mark.parametrize("tie", [False, True])
def test_tiny_llama_logits_match_hf(tmp_path, tie):
    model = _tiny_hf_llama(tie=tie)
    path = str(tmp_path / "tiny.gguf")
    convert_hf_llama(model, path)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, model.config.vocab_size, size=9).tolist()
    ours = _run_ours(path, tokens)

    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_incremental_decode_matches_full_prefill(tmp_path):
    """Feeding tokens one at a time through the KV cache must reproduce the
    full-prefill logits (validates cache writes + metadata-driven masking)."""
    model = _tiny_hf_llama()
    path = str(tmp_path / "tiny.gguf")
    convert_hf_llama(model, path)
    r = GGUFReader(path)
    params, cfg = load_params(r, dense_dtype=jnp.float32)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, model.config.vocab_size, size=7).tolist()
    full = _run_ours(path, tokens)

    n_cells = 16
    kv_k = [jnp.zeros((cfg.n_kv_heads, n_cells, cfg.head_dim), jnp.float32) for _ in range(cfg.n_layers)]
    kv_v = [jnp.zeros((cfg.n_kv_heads, n_cells, cfg.head_dim_v), jnp.float32) for _ in range(cfg.n_layers)]
    cell_pos = np.zeros(n_cells, np.int32)
    cell_bits = np.zeros(n_cells, np.uint32)
    outs = []
    for t, tok in enumerate(tokens):
        cell_pos[t] = t
        cell_bits[t] = 1
        logits, kv_k, kv_v, _ = forward(
            params, cfg, kv_k, kv_v,
            jnp.asarray([tok], jnp.int32),
            jnp.asarray([t], jnp.int32),
            jnp.zeros(1, jnp.int32),
            jnp.asarray([t], jnp.int32),
            jnp.asarray(cell_pos),
            jnp.asarray(cell_bits),
            jnp.zeros(1, jnp.int32),
            dtype=jnp.float32,
        )
        outs.append(np.asarray(logits)[0])
    np.testing.assert_allclose(np.stack(outs), full, atol=2e-4, rtol=2e-4)
