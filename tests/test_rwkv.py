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


# ---------------------------------------------------------------------------
# RWKV7 (llm_build_rwkv7 / ggml_rwkv_wkv7 parity)
# ---------------------------------------------------------------------------


def test_wkv7_recurrence_matches_loop():
    """Vectorized wkv7 scan == the reference CPU kernel's per-element loop
    (ggml/src/ggml-cpu/ops.cpp:9684-9707 semantics)."""
    from llm_tpu.models.rwkv import wkv7

    rng = np.random.default_rng(3)
    ns, nt, H, D = 2, 5, 2, 4
    r, w, k, v, a, b = (rng.normal(size=(ns, nt, H, D)).astype(np.float32)
                        for _ in range(6))
    w = np.exp(-np.exp(w))  # decays in (0, 1)
    s0 = rng.normal(size=(ns, H, D, D)).astype(np.float32)

    want_y = np.zeros((ns, nt, H, D), np.float32)
    S = s0.copy()
    for t in range(nt):
        for n in range(ns):
            for h in range(H):
                for i in range(D):
                    sa = float((a[n, t, h] * S[n, h, i]).sum())
                    S[n, h, i] = (S[n, h, i] * w[n, t, h]
                                  + v[n, t, h, i] * k[n, t, h]
                                  + sa * b[n, t, h])
                    want_y[n, t, h, i] = float((S[n, h, i] * r[n, t, h]).sum())

    y, s_last = wkv7(*(jnp.asarray(x) for x in (r, w, k, v, a, b)),
                     jnp.asarray(s0))
    np.testing.assert_allclose(np.asarray(y), want_y, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_last), S, atol=1e-4, rtol=1e-4)


def _write_rwkv7(path, vocab=97, E=32, layers=2, head=8, r_decay=4, r_iclr=4,
                 r_g=4, gate=True):
    rng = np.random.default_rng(5)
    w = GGUFWriter(path, arch="rwkv7")
    a = "rwkv7"
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 1 << 20)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), layers)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), E * 2)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), 0)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(f"{a}.wkv.head_size", head)
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
    n_mix = 6 if gate else 5
    for il in range(layers):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        vec(b + "attn_norm.bias", E)
        vec(b + "attn_norm_2.weight", E, off=1.0)
        vec(b + "attn_norm_2.bias", E)
        w.add_tensor(b + "time_mix_lerp_fused.weight",
                     (0.5 + rng.normal(size=(n_mix, E)) * 0.1).astype(np.float32))
        vec(b + "time_mix_w0.weight", E, off=-0.5)
        mat(b + "time_mix_w1.weight", r_decay, E)
        mat(b + "time_mix_w2.weight", E, r_decay)
        vec(b + "time_mix_a0.weight", E)
        mat(b + "time_mix_a1.weight", r_iclr, E)
        mat(b + "time_mix_a2.weight", E, r_iclr)
        if il > 0:
            vec(b + "time_mix_v0.weight", E)
            mat(b + "time_mix_v1.weight", r_iclr, E)
            mat(b + "time_mix_v2.weight", E, r_iclr)
        if gate:
            mat(b + "time_mix_g1.weight", r_g, E)
            mat(b + "time_mix_g2.weight", E, r_g)
        vec(b + "time_mix_k_k.weight", E, off=0.8)
        vec(b + "time_mix_k_a.weight", E, off=0.5)
        vec(b + "time_mix_r_k.weight", E)
        for nm in ("key", "value", "receptance", "output"):
            mat(b + f"time_mix_{nm}.weight", E, E)
        vec(b + "time_mix_ln.weight", E, off=1.0)
        vec(b + "time_mix_ln.bias", E)
        vec(b + "channel_mix_lerp_k.weight", E, off=0.5)
        mat(b + "channel_mix_key.weight", E * 2, E)
        mat(b + "channel_mix_value.weight", E, E * 2)
    w.write()
    return path


@pytest.fixture(scope="module")
def rwkv7_path(tmp_path_factory):
    return _write_rwkv7(str(tmp_path_factory.mktemp("rwkv7") / "tiny_rwkv7.gguf"))


def test_rwkv7_loads_and_decodes(rwkv7_path):
    ctx = Context(GGUFReader(rwkv7_path), n_cells=16, dtype=jnp.float32)
    assert ctx.cfg.arch == "rwkv7" and ctx.cfg.is_recurrent
    assert ctx.decode(Batch.text([1, 2, 3, 4, 5], seq_id=0)) == 0
    lg = ctx.get_logits()
    assert np.isfinite(lg).all() and lg.shape == (97,)


def test_rwkv7_chunked_matches_full(rwkv7_path):
    """State carry: decoding token-by-token == one prefill (the recurrence
    is exact across chunk boundaries)."""
    toks = [3, 1, 4, 1, 5, 9, 2]
    c1 = Context(GGUFReader(rwkv7_path), n_cells=16, dtype=jnp.float32)
    assert c1.decode(Batch.text(toks, seq_id=0)) == 0
    full = c1.get_logits()

    c2 = Context(GGUFReader(rwkv7_path), n_cells=16, dtype=jnp.float32)
    for i, t in enumerate(toks):
        assert c2.decode(Batch.one(t, pos=i, seq_id=0)) == 0
    np.testing.assert_allclose(c2.get_logits(), full, atol=2e-4, rtol=2e-4)


def test_rwkv7_seq_isolation(rwkv7_path):
    ctx = Context(GGUFReader(rwkv7_path), n_cells=16, dtype=jnp.float32)
    assert ctx.decode(Batch.text([5, 6, 7], seq_id=0)) == 0
    a = ctx.get_logits().copy()
    assert ctx.decode(Batch.text([9, 9, 9, 9], seq_id=1)) == 0
    ctx2 = Context(GGUFReader(rwkv7_path), n_cells=16, dtype=jnp.float32)
    assert ctx2.decode(Batch.text([5, 6, 7], seq_id=0)) == 0
    np.testing.assert_allclose(a, ctx2.get_logits(), atol=1e-5)


# ---------------------------------------------------------------- rwkv6qwen2


def test_gla_matches_reference_loop():
    """gla() vs a direct numpy transcription of ggml_gated_linear_attn
    (ggml-cpu/ops.cpp:9597-9607): S[i,j] = S[i,j]*g_i + k_i*v_j;
    y_j += S[i,j]*q_i*scale."""
    from llm_tpu.models.rwkv import gla

    rng = np.random.default_rng(0)
    ns, nt, H, D = 2, 5, 3, 4
    r, k, v, w = (rng.normal(size=(ns, nt, H, D)).astype(np.float32)
                  for _ in range(4))
    w = 1.0 / (1.0 + np.exp(-w))  # decay in (0, 1)
    s0 = rng.normal(size=(ns, H, D, D)).astype(np.float32)
    scale = D ** -0.5

    y_ref = np.zeros((ns, nt, H, D), np.float32)
    s_ref = s0.copy()
    for n in range(ns):
        for t in range(nt):
            for h in range(H):
                for i in range(D):
                    for j in range(D):
                        s_ref[n, h, i, j] = (s_ref[n, h, i, j] * w[n, t, h, i]
                                             + k[n, t, h, i] * v[n, t, h, j])
                        y_ref[n, t, h, j] += (s_ref[n, h, i, j]
                                              * r[n, t, h, i] * scale)

    y, s_last = gla(jnp.asarray(r), jnp.asarray(k), jnp.asarray(v),
                    jnp.asarray(w), jnp.asarray(s0), scale)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_last), s_ref, atol=1e-5, rtol=1e-5)


def _write_rwkv6qwen2(path, vocab=61, E=32, layers=2, head=8, n_kv=2,
                      lora_r=4, ddim=8, ff=48):
    """qrwkv GGUF: fused lerp stack, r/k/v biases, GQA time-mix k/v,
    qwen2 gated-silu FFN, RMS norms (reference Rwkv6Qwen2 converter
    tensor set)."""
    rng = np.random.default_rng(2)
    w = GGUFWriter(path, arch="rwkv6qwen2")
    a = "rwkv6qwen2"
    H = E // head
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 1 << 20)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), layers)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), ff)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), n_kv)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(f"{a}.wkv.head_size", head)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), vocab)
    for key, val in _test_vocab(vocab).items():
        w.add_kv(key, val)

    def mat(name, n, kk, scale=0.2):
        w.add_tensor(name, (rng.normal(size=(n, kk)) * scale).astype(np.float32))

    def vec(name, n, scale=0.1, off=0.0):
        w.add_tensor(name, (off + rng.normal(size=(n,)) * scale).astype(np.float32))

    w.add_tensor("token_embd.weight",
                 (rng.normal(size=(vocab, E)) * 0.2).astype(np.float32))
    vec("output_norm.weight", E, off=1.0)
    mat("output.weight", vocab, E)
    for il in range(layers):
        b = f"blk.{il}."
        vec(b + "attn_norm.weight", E, off=1.0)
        vec(b + "time_mix_lerp_x.weight", E, off=0.5)
        w.add_tensor(b + "time_mix_lerp_fused.weight",
                     (0.5 + rng.normal(size=(5, 1, E)) * 0.1).astype(np.float32))
        mat(b + "time_mix_w1.weight", 5 * lora_r, E)
        w.add_tensor(b + "time_mix_w2.weight",
                     (rng.normal(size=(5, E, lora_r)) * 0.2).astype(np.float32))
        vec(b + "time_mix_decay.weight", E, off=-2.0)
        mat(b + "time_mix_decay_w1.weight", ddim, E)
        mat(b + "time_mix_decay_w2.weight", E, ddim)
        mat(b + "time_mix_receptance.weight", E, E)
        vec(b + "time_mix_receptance.bias", E)
        mat(b + "time_mix_key.weight", n_kv * head, E)
        vec(b + "time_mix_key.bias", n_kv * head)
        mat(b + "time_mix_value.weight", n_kv * head, E)
        vec(b + "time_mix_value.bias", n_kv * head)
        mat(b + "time_mix_gate.weight", E, E)
        mat(b + "time_mix_output.weight", E, E)
        vec(b + "ffn_norm.weight", E, off=1.0)
        mat(b + "ffn_gate.weight", ff, E)
        mat(b + "ffn_up.weight", ff, E)
        mat(b + "ffn_down.weight", E, ff)
    w.write()
    return path


def test_rwkv6qwen2_decode_and_state_carry(tmp_path):
    p = _write_rwkv6qwen2(str(tmp_path / "qrwkv.gguf"))
    toks = [3, 1, 4, 1, 5, 9, 2, 6]

    full = Context(GGUFReader(p), n_cells=8, dtype=jnp.float32, n_ubatch=64)
    assert full.decode(Batch.text(toks, seq_id=0)) == 0
    ref = np.asarray(full.get_logits())
    assert np.isfinite(ref).all()

    # token-by-token decode must match (exact state carry through the GLA
    # recurrence and the token-shift row)
    ctx = Context(GGUFReader(p), n_cells=8, dtype=jnp.float32)
    for i, t in enumerate(toks):
        assert ctx.decode(Batch.one(t, pos=i, seq_id=0)) == 0
    step = np.asarray(ctx.get_logits())
    np.testing.assert_allclose(step, ref, atol=2e-4, rtol=1e-4)


def test_rwkv_generate_loop_matches_serial(rwkv_path):
    """Recurrent on-device generation (states carried in-jit) must match
    per-token decode exactly."""
    serial = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32)
    prompt = [3, 1, 4, 1, 5]
    assert serial.decode(Batch.text(prompt, seq_id=0)) == 0
    toks = [int(np.argmax(serial.get_logits()))]
    for i in range(9):
        assert serial.decode(Batch.one(toks[-1], pos=len(prompt) + i,
                                       seq_id=0)) == 0
        toks.append(int(np.argmax(serial.get_logits())))

    ctx = Context(GGUFReader(rwkv_path), n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text(prompt, seq_id=0)) == 0
    first = int(np.argmax(ctx.get_logits()))
    assert first == toks[0]
    out = ctx.generate_loop(first, 6, seq_id=0)
    assert out == toks[1:7]
    out2 = ctx.generate_loop(out[-1], 3, seq_id=0)
    assert out2 == toks[7:10]


# ------------------------------------------------- HF converter round-trips

class _Stub:
    def __init__(self, cfg: dict, sd: dict):
        from types import SimpleNamespace

        import torch

        self.config = SimpleNamespace(**cfg)
        self._sd = {k: torch.from_numpy(np.asarray(v, np.float32))
                    for k, v in sd.items()}

    def state_dict(self):
        return self._sd


def test_convert_hf_rwkv6(tmp_path):
    """HF Rwkv6 naming -> rwkv6 GGUF: fused [w,k,v,r,g] lerp stack,
    w1/w2 transposes, rescale folds (reference Rwkv6Model)."""
    from llm_tpu.convert.hf_llama import convert_hf_auto

    rng = np.random.default_rng(30)
    E, L, D, V, r, dd = 32, 2, 8, 61, 4, 8
    H = E // D
    sd = {
        "rwkv.embeddings.weight": rng.normal(size=(V, E)) * 0.2,
        "rwkv.blocks.0.pre_ln.weight": 1 + rng.normal(size=E) * 0.05,
        "rwkv.blocks.0.pre_ln.bias": rng.normal(size=E) * 0.02,
        "rwkv.ln_out.weight": 1 + rng.normal(size=E) * 0.05,
        "rwkv.ln_out.bias": rng.normal(size=E) * 0.02,
        "head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        h = f"rwkv.blocks.{i}."
        for nm in ("ln1", "ln2"):
            sd[h + nm + ".weight"] = 1 + rng.normal(size=E) * 0.05
            sd[h + nm + ".bias"] = rng.normal(size=E) * 0.02
        at = h + "attention."
        sd[at + "time_maa_x"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        for nm in "wkvrg":
            sd[at + f"time_maa_{nm}"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd[at + "time_maa_w1"] = rng.normal(size=(E, 5 * r)) * 0.2
        sd[at + "time_maa_w2"] = rng.normal(size=(5, r, E)) * 0.2
        sd[at + "time_faaaa"] = rng.normal(size=(H, D)) * 0.2
        sd[at + "time_decay"] = -2 + rng.normal(size=(1, 1, E)) * 0.1
        sd[at + "time_decay_w1"] = rng.normal(size=(E, dd)) * 0.2
        sd[at + "time_decay_w2"] = rng.normal(size=(dd, E)) * 0.2
        for nm in ("key", "value", "receptance", "gate", "output"):
            sd[at + nm + ".weight"] = rng.normal(size=(E, E)) * 0.2
        sd[at + "ln_x.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[at + "ln_x.bias"] = rng.normal(size=E) * 0.02
        ff = h + "feed_forward."
        sd[ff + "time_maa_k"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd[ff + "time_maa_r"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd[ff + "key.weight"] = rng.normal(size=(E * 2, E)) * 0.2
        sd[ff + "receptance.weight"] = rng.normal(size=(E, E)) * 0.2
        sd[ff + "value.weight"] = rng.normal(size=(E, E * 2)) * 0.2
    cfg = dict(model_type="rwkv6", hidden_size=E, num_hidden_layers=L,
               head_size=D, rescale_every=2, intermediate_size=E * 2,
               layer_norm_epsilon=1e-5, vocab_size=V, name_or_path="stub")
    p = str(tmp_path / "rwkv6_hf.gguf")
    convert_hf_auto(_Stub(cfg, sd), p, vocab=_test_vocab(V))
    r_ = GGUFReader(p)
    assert r_.akey("{arch}.rescale_every_n_layers") == 2
    names = set(r_.tensors)
    assert "blk.0.time_mix_lerp_fused.weight" in names

    toks = [3, 1, 4, 1, 5, 9, 2]
    full = Context(r_, n_cells=8, dtype=jnp.float32)
    assert full.decode(Batch.text(toks, seq_id=0)) == 0
    ref = np.asarray(full.get_logits())
    assert np.isfinite(ref).all()
    # state carry must be exact through chunk boundaries
    ctx = Context(GGUFReader(p), n_cells=8, dtype=jnp.float32)
    for i, t in enumerate(toks):
        assert ctx.decode(Batch.one(t, pos=i, seq_id=0)) == 0
    np.testing.assert_allclose(np.asarray(ctx.get_logits()), ref,
                               atol=2e-4, rtol=1e-4)


def test_convert_hf_rwkv7(tmp_path):
    """HF rwkv7 naming -> rwkv7 GGUF: x_x fused stack, transposed LoRA
    pairs, flattened r_k, layer-0 a->v dummies (reference Rwkv7Model)."""
    from llm_tpu.convert.hf_llama import convert_hf_auto

    rng = np.random.default_rng(31)
    E, L, D, V, r = 32, 2, 8, 61, 4
    H = E // D
    sd = {
        "model.embeddings.weight": rng.normal(size=(V, E)) * 0.2,
        "model.layers.0.pre_norm.weight": 1 + rng.normal(size=E) * 0.05,
        "model.layers.0.pre_norm.bias": rng.normal(size=E) * 0.02,
        "model.ln_out.weight": 1 + rng.normal(size=E) * 0.05,
        "model.ln_out.bias": rng.normal(size=E) * 0.02,
        "head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        h = f"model.layers.{i}."
        for nm in ("ln1", "ln2"):
            sd[h + nm + ".weight"] = 1 + rng.normal(size=E) * 0.05
            sd[h + nm + ".bias"] = rng.normal(size=E) * 0.02
        at = h + "attention."
        sd[at + "x_x"] = 0.5 + rng.normal(size=(6, E)) * 0.1
        sd[at + "w0"] = -0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd[at + "w1"] = rng.normal(size=(E, r)) * 0.2
        sd[at + "w2"] = rng.normal(size=(r, E)) * 0.2
        sd[at + "a0"] = rng.normal(size=(1, 1, E)) * 0.1
        sd[at + "a1"] = rng.normal(size=(E, r)) * 0.2
        sd[at + "a2"] = rng.normal(size=(r, E)) * 0.2
        if i > 0:
            sd[at + "v0"] = rng.normal(size=(1, 1, E)) * 0.1
            sd[at + "v1"] = rng.normal(size=(E, r)) * 0.2
            sd[at + "v2"] = rng.normal(size=(r, E)) * 0.2
        sd[at + "g1"] = rng.normal(size=(E, r)) * 0.2
        sd[at + "g2"] = rng.normal(size=(r, E)) * 0.2
        sd[at + "k_k"] = 0.8 + rng.normal(size=(1, 1, E)) * 0.05
        sd[at + "k_a"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.05
        sd[at + "r_k"] = rng.normal(size=(H, D)) * 0.1
        for nm in ("key", "value", "receptance", "output"):
            sd[at + nm + ".weight"] = rng.normal(size=(E, E)) * 0.2
        sd[at + "ln_x.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[at + "ln_x.bias"] = rng.normal(size=E) * 0.02
        ff = h + "feed_forward."
        sd[ff + "x_k"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd[ff + "key.weight"] = rng.normal(size=(E * 2, E)) * 0.2
        sd[ff + "value.weight"] = rng.normal(size=(E, E * 2)) * 0.2
    cfg = dict(model_type="rwkv7", hidden_size=E, num_hidden_layers=L,
               head_size=D, intermediate_size=E * 2,
               layer_norm_epsilon=1e-5, vocab_size=V,
               lora_rank_decay=r, lora_rank_iclr=r,
               lora_rank_value_residual_mix=r, lora_rank_gate=r,
               name_or_path="stub")
    p = str(tmp_path / "rwkv7_hf.gguf")
    convert_hf_auto(_Stub(cfg, sd), p, vocab=_test_vocab(V))
    r_ = GGUFReader(p)
    names = set(r_.tensors)
    assert "blk.0.time_mix_v1.weight" in names  # layer-0 dummy from a1
    assert r_.akey("{arch}.attention.decay_lora_rank") == r

    toks = [3, 1, 4, 1, 5, 9, 2]
    full = Context(r_, n_cells=8, dtype=jnp.float32)
    assert full.decode(Batch.text(toks, seq_id=0)) == 0
    ref = np.asarray(full.get_logits())
    assert np.isfinite(ref).all()
    ctx = Context(GGUFReader(p), n_cells=8, dtype=jnp.float32)
    for i, t in enumerate(toks):
        assert ctx.decode(Batch.one(t, pos=i, seq_id=0)) == 0
    np.testing.assert_allclose(np.asarray(ctx.get_logits()), ref,
                               atol=2e-4, rtol=1e-4)


def test_convert_hf_rwkv6qwen2_and_arwkv7(tmp_path):
    """qrwkv (rkvwg->wkvrg chunk permute, proj biases) and rwkv_hybrid
    (qwen2 FFN + x_x, fixed lora ranks) converter dispatch."""
    from llm_tpu.convert.hf_llama import convert_hf_auto

    rng = np.random.default_rng(32)
    E, L, D, V, r, dd, ff = 32, 2, 8, 61, 4, 8, 48
    H = E // D
    sd = {
        "model.embed_tokens.weight": rng.normal(size=(V, E)) * 0.2,
        "model.norm.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        h = f"model.layers.{i}."
        at = h + "self_attn."
        sd[h + "input_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd[h + "post_attention_layernorm.weight"] = \
            1 + rng.normal(size=E) * 0.05
        sd[at + "time_maa_x"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        for nm in "wkvrg":
            sd[at + f"time_maa_{nm}"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd[at + "time_maa_w1"] = rng.normal(size=(E, 5 * r)) * 0.2
        sd[at + "time_maa_w2"] = rng.normal(size=(5, r, E)) * 0.2
        sd[at + "time_decay"] = -2 + rng.normal(size=(1, 1, E)) * 0.1
        sd[at + "time_decay_w1"] = rng.normal(size=(E, dd)) * 0.2
        sd[at + "time_decay_w2"] = rng.normal(size=(dd, E)) * 0.2
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj", "gate"):
            n = E if nm in ("q_proj", "o_proj", "gate") else 2 * D
            sd[at + nm + ".weight"] = rng.normal(size=(n, E) if nm != "o_proj"
                                                 else (E, E)) * 0.2
            if nm != "gate":
                sd[at + nm + ".bias"] = rng.normal(size=n if nm != "o_proj"
                                                   else E) * 0.05
        for nm in ("gate", "up", "down"):
            shp = (ff, E) if nm != "down" else (E, ff)
            sd[h + f"mlp.{nm}_proj.weight"] = rng.normal(size=shp) * 0.2
    cfg = dict(model_type="rwkv6qwen2", hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=2,
               intermediate_size=ff, rms_norm_eps=1e-5, vocab_size=V,
               name_or_path="stub")
    p = str(tmp_path / "qrwkv.gguf")
    convert_hf_auto(_Stub(cfg, sd), p, vocab=_test_vocab(V))
    r_ = GGUFReader(p)
    assert r_.architecture == "rwkv6qwen2"
    assert "blk.0.time_mix_receptance.bias" in set(r_.tensors)
    ctx = Context(r_, n_cells=8, dtype=jnp.float32)
    assert ctx.decode(Batch.text([3, 1, 4, 1, 5], seq_id=0)) == 0
    assert np.isfinite(ctx.get_logits()).all()

    # arwkv7: rwkv7 time mix under qwen2 layer norms/FFN
    sd2 = {
        "model.embed_tokens.weight": rng.normal(size=(V, E)) * 0.2,
        "model.norm.weight": 1 + rng.normal(size=E) * 0.05,
        "lm_head.weight": rng.normal(size=(V, E)) * 0.15,
    }
    for i in range(L):
        h = f"model.layers.{i}."
        at = h + "self_attn.time_mixer."
        sd2[h + "input_layernorm.weight"] = 1 + rng.normal(size=E) * 0.05
        sd2[h + "post_attention_layernorm.weight"] = \
            1 + rng.normal(size=E) * 0.05
        sd2[at + "x_x"] = 0.5 + rng.normal(size=(6, E)) * 0.1
        sd2[at + "w0"] = -0.5 + rng.normal(size=(1, 1, E)) * 0.1
        sd2[at + "w1"] = rng.normal(size=(E, r)) * 0.2
        sd2[at + "w2"] = rng.normal(size=(r, E)) * 0.2
        sd2[at + "a0"] = rng.normal(size=(1, 1, E)) * 0.1
        sd2[at + "a1"] = rng.normal(size=(E, r)) * 0.2
        sd2[at + "a2"] = rng.normal(size=(r, E)) * 0.2
        if i > 0:
            sd2[at + "v0"] = rng.normal(size=(1, 1, E)) * 0.1
            sd2[at + "v1"] = rng.normal(size=(E, r)) * 0.2
            sd2[at + "v2"] = rng.normal(size=(r, E)) * 0.2
        sd2[at + "g1"] = rng.normal(size=(E, r)) * 0.2
        sd2[at + "g2"] = rng.normal(size=(r, E)) * 0.2
        sd2[at + "k_k"] = 0.8 + rng.normal(size=(1, 1, E)) * 0.05
        sd2[at + "k_a"] = 0.5 + rng.normal(size=(1, 1, E)) * 0.05
        sd2[at + "r_k"] = rng.normal(size=(H, D)) * 0.1
        for nm in ("key", "value", "receptance", "output"):
            sd2[at + nm + ".weight"] = rng.normal(size=(E, E)) * 0.2
        sd2[at + "ln_x.weight"] = 1 + rng.normal(size=E) * 0.05
        sd2[at + "ln_x.bias"] = rng.normal(size=E) * 0.02
        for nm in ("gate", "up", "down"):
            shp = (ff, E) if nm != "down" else (E, ff)
            sd2[h + f"mlp.{nm}_proj.weight"] = rng.normal(size=shp) * 0.2
    cfg2 = dict(model_type="rwkv_hybrid", hidden_size=E,
                num_hidden_layers=L, head_size=D, intermediate_size=ff,
                rms_norm_eps=1e-5, vocab_size=V, wkv_has_gate=True,
                wkv_version=7, name_or_path="stub")
    p2 = str(tmp_path / "arwkv7.gguf")
    convert_hf_auto(_Stub(cfg2, sd2), p2, vocab=_test_vocab(V))
    r2 = GGUFReader(p2)
    assert r2.architecture == "arwkv7"
    assert r2.akey("{arch}.token_shift_count") == 1
    ctx2 = Context(r2, n_cells=8, dtype=jnp.float32)
    assert ctx2.decode(Batch.text([3, 1, 4, 1, 5], seq_id=0)) == 0
    assert np.isfinite(ctx2.get_logits()).all()
