"""Mamba (recurrent-memory) tests: HF logit oracle, chunked prefill ==
full prefill (state carry), seq ops, state save/load.

Mirrors the reference's approach of validating arch graphs against the
source models (llm_build_mamba, /root/reference/src/llama-model.cpp:9812)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from test_tools import _test_vocab


def _tiny_hf_mamba(hidden=64, layers=2, vocab=97, state=8, conv=4):
    import torch
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(7)
    cfg = MambaConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        state_size=state, conv_kernel=conv, intermediate_size=hidden * 2,
        time_step_rank=max(1, hidden // 16), use_cache=False,
        tie_word_embeddings=True,
    )
    return MambaForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def mamba_pair(tmp_path_factory):
    from llm_tpu.convert.hf_llama import convert_hf_mamba

    model = _tiny_hf_mamba()
    path = str(tmp_path_factory.mktemp("mamba") / "tiny_mamba.gguf")
    convert_hf_mamba(model, path, vocab=_test_vocab(97))
    return model, path


def test_mamba_logits_vs_hf(mamba_pair):
    import torch

    model, path = mamba_pair
    toks = [1, 10, 20, 30, 40, 5, 60]
    with torch.no_grad():
        want = model(torch.tensor([toks])).logits[0].numpy()

    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert ctx.cfg.is_recurrent
    b = Batch.text(toks, logits_last_only=False)
    assert ctx.decode(b) == 0
    got = np.stack([ctx.get_logits(i) for i in range(len(toks))])
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9999, f"corr {corr}"
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_mamba_chunked_prefill_matches_full(mamba_pair):
    _, path = mamba_pair
    toks = list(range(1, 20))  # 19 tokens -> chunks 16+2+1

    full = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32, n_ubatch=64)
    assert full.decode(Batch.text(toks)) == 0
    want = full.get_logits()

    chunked = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32, n_ubatch=8)
    assert chunked.decode(Batch.text(toks)) == 0
    np.testing.assert_allclose(chunked.get_logits(), want, rtol=2e-4, atol=2e-4)


def test_mamba_decode_continues_state(mamba_pair):
    import torch

    model, path = mamba_pair
    toks = [1, 10, 20, 30]
    with torch.no_grad():
        want = model(torch.tensor([toks + [40]])).logits[0, -1].numpy()

    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text(toks)) == 0
    assert ctx.decode(Batch.one(40)) == 0  # single-token decode path
    got = ctx.get_logits()
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.9999
    assert int(got.argmax()) == int(want.argmax())


def test_mamba_seq_ops(mamba_pair):
    _, path = mamba_pair
    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text([1, 10, 20], seq_id=0)) == 0
    base = ctx.get_logits().copy()

    # fork: seq_cp copies the state; decoding the same token on both seqs
    # gives identical logits
    ctx.seq_cp(0, 1)
    assert ctx.seq_pos_max(1) == ctx.seq_pos_max(0)
    assert ctx.decode(Batch.one(30, seq_id=0)) == 0
    l0 = ctx.get_logits().copy()
    assert ctx.decode(Batch.one(30, seq_id=1)) == 0
    np.testing.assert_allclose(ctx.get_logits(), l0, rtol=1e-5, atol=1e-5)

    # partial-range removal is rejected on recurrent memory
    assert ctx.seq_rm(0, p0=2) is False
    assert ctx.seq_rm(0) is True
    # after removal the seq restarts cleanly
    assert ctx.decode(Batch.text([1, 10, 20], seq_id=0)) == 0
    np.testing.assert_allclose(ctx.get_logits(), base, rtol=1e-5, atol=1e-5)


def test_mamba_state_roundtrip(mamba_pair):
    _, path = mamba_pair
    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text([1, 10, 20, 30])) == 0
    st = ctx.rslots.state_get(0)
    assert st is not None and st["pos_max"] == 3

    assert ctx.decode(Batch.one(40)) == 0
    want = ctx.get_logits().copy()

    ctx2 = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32,
                   params_cfg=(ctx.params, ctx.cfg))
    ctx2.rslots.state_set(0, st)
    assert ctx2.decode(Batch.one(40)) == 0
    np.testing.assert_allclose(ctx2.get_logits(), want, rtol=1e-5, atol=1e-5)


def test_mamba_parallel_decode_batches_seqs(mamba_pair):
    """Two seqs decoding one token each run in a single [ns=2, nt=1] step
    and match the serial results."""
    _, path = mamba_pair
    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text([1, 10, 20], seq_id=0)) == 0
    assert ctx.decode(Batch.text([2, 11, 21], seq_id=1)) == 0

    serial = {}
    ctx.seq_cp(0, 2)
    ctx.seq_cp(1, 3)
    assert ctx.decode(Batch.one(30, seq_id=2)) == 0
    serial[0] = ctx.get_logits().copy()
    assert ctx.decode(Batch.one(31, seq_id=3)) == 0
    serial[1] = ctx.get_logits().copy()

    b = Batch()
    b.add(30, None, (0,), logits=True)
    b.add(31, None, (1,), logits=True)
    assert ctx.decode(b) == 0
    np.testing.assert_allclose(ctx.get_logits(0), serial[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ctx.get_logits(1), serial[1], rtol=1e-5, atol=1e-5)


def test_mamba2_vs_hf(tmp_path):
    import torch
    import transformers
    """Mamba2 (SSD): scalar per-head decay scan, grouped gated RMS norm,
    packed in_proj [z|xBC|dt] (build_mamba2_layer,
    /root/reference/src/llama-model.cpp:9951)."""
    cfg = transformers.Mamba2Config(
        vocab_size=97, hidden_size=32, num_hidden_layers=2, state_size=16,
        head_dim=8, expand=2, n_groups=1, num_heads=8, conv_kernel=4,
        pad_token_id=0, tie_word_embeddings=False,
    )
    # n_groups=1 (all published mamba2 configs): HF's gated RMS norm spans
    # the full d_inner while the reference norms per group — equal at G=1
    torch.manual_seed(0)
    m = transformers.Mamba2ForCausalLM(cfg).eval()
    path = str(tmp_path / "mamba2.gguf")
    from llm_tpu.convert.hf_llama import convert_hf_mamba2

    convert_hf_mamba2(m, path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 97, size=9).tolist()
    c0 = Context(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    b0 = Batch()
    for i, t in enumerate(tokens):
        b0.add(t, i, (0,), logits=True)
    assert c0.decode(b0) == 0
    ours = np.stack([c0.get_logits(i) for i in range(len(tokens))])
    with torch.no_grad():
        ref = m(torch.tensor([tokens])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=6e-3, rtol=6e-3)

    # incremental decode (state carry) matches the one-shot prefill
    ctx = Context(GGUFReader(path), n_cells=32, dtype=jnp.float32)
    assert ctx.decode(Batch.text(tokens[:5], seq_id=0)) == 0
    for i, t in enumerate(tokens[5:]):
        assert ctx.decode(Batch.one(t, pos=5 + i, seq_id=0)) == 0
    np.testing.assert_allclose(ctx.get_logits(), ref[-1], atol=6e-3, rtol=6e-3)


def test_mamba_generate_loop_matches_serial(mamba_pair):
    """SSM on-device generation loop == per-token decode."""
    _, path = mamba_pair
    prompt = [3, 1, 4, 1, 5]
    serial = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert serial.decode(Batch.text(prompt, seq_id=0)) == 0
    toks = [int(np.argmax(serial.get_logits()))]
    for i in range(7):
        assert serial.decode(Batch.one(toks[-1], pos=len(prompt) + i,
                                       seq_id=0)) == 0
        toks.append(int(np.argmax(serial.get_logits())))
    ctx = Context(GGUFReader(path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    out = ctx.generate_loop(toks[0], 7, seq_id=0)
    assert out == toks[1:8]
