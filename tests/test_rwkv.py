"""RWKV6 tests: wkv6 recurrence vs a direct reference, synthetic-model
chunk consistency, decode continuity, and seq ops on the recurrent slots."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.gguf.constants import GGMLType, Keys
from llm_tpu.gguf.writer import GGUFWriter
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.models.rwkv import wkv6
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

from test_tools import _test_vocab


def test_wkv6_recurrence_matches_loop():
    """jax scan == direct per-token loop (ggml_rwkv_wkv6 semantics:
    out_j = sum_i r_i (tf_i k_i v_j + s_ij); s' = s * w_i + k_i v_j)."""
    rng = np.random.default_rng(0)
    ns, nt, H, D = 2, 5, 3, 4
    r, k, v, w = (rng.normal(size=(ns, nt, H, D)).astype(np.float32)
                  for _ in range(4))
    w = 1.0 / (1.0 + np.exp(-w))  # decay in (0, 1)
    tf = rng.normal(size=(H, D)).astype(np.float32)
    s0 = rng.normal(size=(ns, H, D, D)).astype(np.float32)

    want_y = np.zeros((ns, nt, H, D), np.float32)
    s = s0.copy()
    for t in range(nt):
        for n in range(ns):
            for h in range(H):
                kv = np.outer(k[n, t, h], v[n, t, h])
                want_y[n, t, h] = (
                    r[n, t, h] @ (tf[h][:, None] * kv + s[n, h]))
                s[n, h] = s[n, h] * w[n, t, h][:, None] + kv

    y, s_last = wkv6(*map(jnp.asarray, (r, k, v, tf, w, s0)))
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_last), s, rtol=1e-4, atol=1e-4)


def _write_rwkv6(path, vocab=97, E=32, layers=2, head=8, lora_r=4, ddim=8):
    rng = np.random.default_rng(1)
    w = GGUFWriter(path, arch="rwkv6")
    a = "rwkv6"
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 1 << 20)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), layers)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), E * 2)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), 0)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(f"{a}.wkv.head_size", head)
    w.add_kv(f"{a}.rescale_every_n_layers", 2)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), vocab)
    for key, val in _test_vocab(vocab).items():
        w.add_kv(key, val)

    def mat(name, n, kk, scale=0.2):
        w.add_tensor(name, (rng.normal(size=(n, kk)) * scale).astype(np.float32))

    def vec(name, n, scale=0.1, off=0.0):
        w.add_tensor(name, (off + rng.normal(size=(n,)) * scale).astype(np.float32))

    w.add_tensor("token_embd.weight",
                 (rng.normal(size=(vocab, E)) * 0.2).astype(np.float32))
    vec("token_embd_norm.weight", E, off=1.0)
    vec("token_embd_norm.bias", E)
    vec("output_norm.weight", E, off=1.0)
    vec("output_norm.bias", E)
    mat("output.weight", vocab, E)
    for il in range(layers):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        vec(b + "attn_norm.bias", E)
        vec(b + "attn_norm_2.weight", E, off=1.0)
        vec(b + "attn_norm_2.bias", E)
        vec(b + "time_mix_lerp_x.weight", E, off=0.5)
        for nm in ("w", "k", "v", "r", "g"):
            vec(b + f"time_mix_lerp_{nm}.weight", E, off=0.5)
        mat(b + "time_mix_w1.weight", 5 * lora_r, E)
        w.add_tensor(b + "time_mix_w2.weight",
                     (rng.normal(size=(5, E, lora_r)) * 0.2).astype(np.float32))
        w.add_tensor(b + "time_mix_first.weight",
                     (rng.normal(size=(E // head, head)) * 0.2).astype(np.float32))
        vec(b + "time_mix_decay.weight", E, off=-2.0)
        mat(b + "time_mix_decay_w1.weight", ddim, E)
        mat(b + "time_mix_decay_w2.weight", E, ddim)
        for nm in ("key", "value", "receptance", "gate", "output"):
            mat(b + f"time_mix_{nm}.weight", E, E)
        vec(b + "time_mix_ln.weight", E, off=1.0)
        vec(b + "time_mix_ln.bias", E)
        vec(b + "channel_mix_lerp_k.weight", E, off=0.5)
        vec(b + "channel_mix_lerp_r.weight", E, off=0.5)
        mat(b + "channel_mix_key.weight", E * 2, E)
        mat(b + "channel_mix_receptance.weight", E, E)
        mat(b + "channel_mix_value.weight", E, E * 2)
    w.write()
    return path


@pytest.fixture(scope="module")
def rwkv_path(tmp_path_factory):
    return _write_rwkv6(str(tmp_path_factory.mktemp("rwkv") / "tiny_rwkv6.gguf"))


def test_rwkv6_loads_and_decodes(rwkv_path):
    ctx = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32)
    assert ctx.cfg.is_recurrent and ctx.cfg.wkv_head_size == 8
    assert ctx.decode(Batch.text([1, 5, 9, 13])) == 0
    logits = ctx.get_logits()
    assert np.all(np.isfinite(logits)) and logits.std() > 0


def test_rwkv6_chunked_matches_full(rwkv_path):
    toks = list(range(1, 20))
    full = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32, n_ubatch=64)
    assert full.decode(Batch.text(toks)) == 0
    want = full.get_logits()
    chunked = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32, n_ubatch=8)
    assert chunked.decode(Batch.text(toks)) == 0
    np.testing.assert_allclose(chunked.get_logits(), want, rtol=2e-4, atol=2e-4)


def test_rwkv6_decode_continuity(rwkv_path):
    """prefill(a+b) == prefill(a) then decode(b) token by token."""
    a, b = [1, 5, 9], [13, 17]
    full = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32)
    assert full.decode(Batch.text(a + b)) == 0
    want = full.get_logits()

    inc = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32,
                  params_cfg=(full.params, full.cfg))
    assert inc.decode(Batch.text(a)) == 0
    for t in b:
        assert inc.decode(Batch.one(t)) == 0
    np.testing.assert_allclose(inc.get_logits(), want, rtol=2e-4, atol=2e-4)


def test_rwkv6_seq_fork(rwkv_path):
    ctx = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text([1, 5, 9], seq_id=0)) == 0
    ctx.seq_cp(0, 1)
    assert ctx.decode(Batch.one(13, seq_id=0)) == 0
    l0 = ctx.get_logits().copy()
    assert ctx.decode(Batch.one(13, seq_id=1)) == 0
    np.testing.assert_allclose(ctx.get_logits(), l0, rtol=1e-5, atol=1e-5)
