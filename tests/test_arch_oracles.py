"""Pure-numpy numeric oracles for registry archs with no installed HF class.

minicpm/baichuan/xverse/orion/exaone/internlm2 previously had config-mapping
smoke tests only (no numeric ground truth — transformers ships these archs
as trust_remote_code, unavailable offline). Here each arch's decoder math is
transcribed in float64 numpy directly from the reference graph builder
(cited per test) and compared against the engine's f32 logits on a
hand-built random-weight GGUF. The oracle shares no code with the engine,
so it catches wrong norm kinds, rope modes, ALiBi slopes, and scale factors.

Reference builders: llm_build_baichuan (llama-model.cpp:5393, 13B ALiBi via
hparams :686-689), llm_build_xverse (:5515), llm_build_orion (:8340),
llm_build_internlm2 (:8467), llm_build_exaone (:12528), minicpm ->
llm_build_granite (:13409, dispatch :15011) with the scale hparams of
llama-model.cpp:634-639. Rope modes: llama_model_rope_type
(llama-model.cpp:15170-15231).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.gguf.constants import Keys
from llm_tpu.gguf.reader import GGUFReader
from llm_tpu.gguf.writer import GGUFWriter
from llm_tpu.models.config import config_from_gguf
from llm_tpu.runtime.batch import Batch
from llm_tpu.runtime.engine import Context

TOKENS = [3, 1, 4, 1, 5, 9, 2, 6]


# ------------------------------------------------------------ gguf builder

def _write(path, arch, *, E=64, L=2, H=4, KV=2, FF=96, V=97, ln=False,
           extra_kv=(), seed=11):
    """Hand-build a random-weight GGUF with the standard llama tensor set;
    returns the tensor dict for the oracle."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch=arch)
    a = arch
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), L)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), KV)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.Attention.LAYERNORM_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)
    for k, v in extra_kv:
        w.add_kv(k, v)

    hd = E // H
    ten = {}

    def t(name, shape, scale=0.12, off=None):
        arr = (rng.normal(size=shape) * scale).astype(np.float32)
        if off is not None:
            arr = arr + np.float32(off)
        ten[name] = arr
        w.add_tensor(name, arr)

    t("token_embd.weight", (V, E), 0.2)
    t("output_norm.weight", (E,), 0.04, off=1.0)
    if ln:
        t("output_norm.bias", (E,), 0.04)
    t("output.weight", (V, E))
    for il in range(L):
        p = f"blk.{il}."
        t(p + "attn_norm.weight", (E,), 0.04, off=1.0)
        if ln:
            t(p + "attn_norm.bias", (E,), 0.04)
        t(p + "attn_q.weight", (E, E))
        t(p + "attn_k.weight", (KV * hd, E))
        t(p + "attn_v.weight", (KV * hd, E))
        t(p + "attn_output.weight", (E, E))
        t(p + "ffn_norm.weight", (E,), 0.04, off=1.0)
        if ln:
            t(p + "ffn_norm.bias", (E,), 0.04)
        t(p + "ffn_gate.weight", (FF, E))
        t(p + "ffn_up.weight", (FF, E))
        t(p + "ffn_down.weight", (E, FF))
    w.write()
    return ten


# ------------------------------------------------------------ numpy oracle

def _norm(x, w, b=None, eps=1e-5):
    if b is None:  # RMS (build_norm LLM_NORM_RMS)
        return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * w
    mu = np.mean(x, -1, keepdims=True)
    var = np.mean((x - mu) ** 2, -1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _rope(x, pos, n_rot, base, neox):
    """ggml_rope_ext, NORM (consecutive pairs) / NEOX (half-offset pairs)."""
    T = x.shape[0]
    half = n_rot // 2
    inv = base ** (-2.0 * np.arange(half) / n_rot)
    ang = pos[:, None].astype(np.float64) * inv[None, :]
    cos = np.cos(ang)[:, None, :]
    sin = np.sin(ang)[:, None, :]
    out = x.copy()
    if neox:
        a, b = x[..., :half], x[..., half:n_rot]
    else:
        a, b = x[..., 0:n_rot:2], x[..., 1:n_rot:2]
    ra = a * cos - b * sin
    rb = a * sin + b * cos
    if neox:
        out[..., :half], out[..., half:n_rot] = ra, rb
    else:
        out[..., 0:n_rot:2], out[..., 1:n_rot:2] = ra, rb
    return out


def _alibi_slopes(n_head, max_bias):
    """ggml_soft_max_ext slope schedule (ggml-cpu ops soft_max)."""
    n2 = 2 ** int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-max_bias / 2.0 / n2)
    return np.array([m0 ** (h + 1) if h < n2
                     else m1 ** (2 * (h - n2) + 1) for h in range(n_head)])


def _oracle_logits(ten, tokens, *, H, KV, ln=False, neox=False, rope=True,
                   base=10000.0, emb_scale=1.0, res_scale=1.0,
                   logit_scale=1.0, alibi_max=0.0):
    """Transcription of the shared reference decoder recipe (rmsnorm/ln ->
    qkv -> rope|alibi -> causal attn -> o -> +res*s -> norm -> silu-gated
    ffn -> +res*s; final norm -> lm_head * logit_scale)."""
    E = ten["token_embd.weight"].shape[1]
    hd = E // H
    T = len(tokens)
    pos = np.arange(T)
    L = max(int(k.split(".")[1]) for k in ten if k.startswith("blk.")) + 1

    f8 = np.float64
    x = ten["token_embd.weight"][tokens].astype(f8) * emb_scale
    mask = np.triu(np.full((T, T), -np.inf), 1)  # causal
    slopes = _alibi_slopes(H, alibi_max) if alibi_max else None
    for il in range(L):
        p = f"blk.{il}."
        g = lambda n: ten[p + n].astype(f8)  # noqa: E731
        gb = (lambda n: g(n)) if ln else (lambda n: None)
        h = _norm(x, g("attn_norm.weight"),
                  gb("attn_norm.bias") if ln else None)
        q = (h @ g("attn_q.weight").T).reshape(T, H, hd)
        k = (h @ g("attn_k.weight").T).reshape(T, KV, hd)
        v = (h @ g("attn_v.weight").T).reshape(T, KV, hd)
        if rope:
            q = _rope(q, pos, hd, base, neox)
            k = _rope(k, pos, hd, base, neox)
        k = np.repeat(k, H // KV, axis=1)
        v = np.repeat(v, H // KV, axis=1)
        att = np.einsum("qhd,khd->hqk", q, k) * (hd ** -0.5)
        if slopes is not None:
            # set_input_kq_mask ALiBi values: slope_h * -|pos_q - pos_k|
            att = att + slopes[:, None, None] * (
                -np.abs(pos[:, None] - pos[None, :]))[None]
        att = att + mask[None]
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", att, v).reshape(T, E)
        x = x + (o @ g("attn_output.weight").T) * res_scale
        h = _norm(x, g("ffn_norm.weight"), gb("ffn_norm.bias") if ln else None)
        gate = h @ g("ffn_gate.weight").T
        up = h @ g("ffn_up.weight").T
        silu = gate / (1.0 + np.exp(-gate)) * up
        x = x + (silu @ g("ffn_down.weight").T) * res_scale
    x = _norm(x, ten["output_norm.weight"].astype(f8),
              ten["output_norm.bias"].astype(f8) if ln else None)
    return (x @ ten["output.weight"].astype(f8).T) * logit_scale


# ------------------------------------------------------------------ tests

def _engine_logits(path, arch):
    r = GGUFReader(path)
    cfg = config_from_gguf(r)
    assert cfg.arch == arch
    ctx = Context(r, n_cells=32, dtype=jnp.float32)
    b = Batch()
    for i, t in enumerate(TOKENS):
        b.add(t, i, (0,), logits=True)
    assert ctx.decode(b) == 0
    return np.stack([ctx.get_logits(i) for i in range(len(TOKENS))])


def _compare(path, arch, ten, **kw):
    ours = _engine_logits(path, arch)
    ref = _oracle_logits(ten, TOKENS, **kw)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)


def test_baichuan_7b_oracle(tmp_path):
    """baichuan 7B profile: NORM rope, RMS norms, bias-free llama recipe
    (llm_build_baichuan LLM_TYPE_7B branch)."""
    p = str(tmp_path / "m.gguf")
    ten = _write(p, "baichuan")
    _compare(p, "baichuan", ten, H=4, KV=2)


def test_baichuan_13b_alibi_oracle(tmp_path):
    """baichuan 13B profile (n_layer==40): rope skipped, ALiBi max_bias 8.0
    (llama-model.cpp:686-689 + LLM_TYPE_13B rope switch)."""
    p = str(tmp_path / "m.gguf")
    ten = _write(p, "baichuan", E=32, L=40, H=4, KV=4, FF=48)
    _compare(p, "baichuan", ten, H=4, KV=4, rope=False, alibi_max=8.0)


def test_xverse_oracle(tmp_path):
    """xverse: llama recipe, NORM rope (llm_build_xverse)."""
    p = str(tmp_path / "m.gguf")
    ten = _write(p, "xverse")
    _compare(p, "xverse", ten, H=4, KV=2)


def test_internlm2_oracle(tmp_path):
    """internlm2: llama recipe, NORM rope (llm_build_internlm2)."""
    p = str(tmp_path / "m.gguf")
    ten = _write(p, "internlm2")
    _compare(p, "internlm2", ten, H=4, KV=2)


def test_exaone_oracle(tmp_path):
    """exaone: llama recipe with NEOX rope (llm_build_exaone;
    llama_model_rope_type NEOX case)."""
    p = str(tmp_path / "m.gguf")
    ten = _write(p, "exaone")
    _compare(p, "exaone", ten, H=4, KV=2, neox=True)


def test_orion_oracle(tmp_path):
    """orion: LayerNorm(+bias) everywhere, NEOX rope (llm_build_orion)."""
    p = str(tmp_path / "m.gguf")
    ten = _write(p, "orion", ln=True)
    _compare(p, "orion", ten, H=4, KV=2, ln=True, neox=True)


def test_minicpm_oracle(tmp_path):
    """minicpm rides llm_build_granite: embd*scale_emb, residual*scale,
    logits DIVIDED by f_logit_scale (ggml_scale(cur, 1/f_logit_scale),
    llama-model.cpp:13589). The logit division is the regression this
    oracle exists for."""
    p = str(tmp_path / "m.gguf")
    L = 2
    res = 1.4 / np.sqrt(L)
    ten = _write(p, "minicpm", L=L, extra_kv=[
        ("minicpm.embedding_scale", 12.0),
        ("minicpm.residual_scale", float(res)),
        ("minicpm.logit_scale", 2.0),
    ])
    _compare(p, "minicpm", ten, H=4, KV=2, emb_scale=12.0,
             res_scale=float(res), logit_scale=0.5)


# ----------------------------------------- fused-qkv + bias archs

def _write_fused(path, arch, *, E=64, L=2, H=4, KV=None, FF=96, V=97,
                 ln=False, ffn_bias=False, extra_kv=(), seed=13):
    """Hand-build a GGUF with the fused attn_qkv(+bias) tensor layout the
    reference converters emit for qwen1/jais/gpt2-family archs."""
    KV = H if KV is None else KV
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch=arch)
    a = arch
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), L)
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), FF)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), KV)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.Attention.LAYERNORM_EPS.format(arch=a), 1e-5)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), V)
    for k, v in extra_kv:
        w.add_kv(k, v)

    hd = E // H
    ten = {}

    def t(name, shape, scale=0.12, off=None):
        arr = (rng.normal(size=shape) * scale).astype(np.float32)
        if off is not None:
            arr = arr + np.float32(off)
        ten[name] = arr
        w.add_tensor(name, arr)

    t("token_embd.weight", (V, E), 0.2)
    t("output_norm.weight", (E,), 0.04, off=1.0)
    if ln:
        t("output_norm.bias", (E,), 0.04)
    t("output.weight", (V, E))
    for il in range(L):
        p = f"blk.{il}."
        t(p + "attn_norm.weight", (E,), 0.04, off=1.0)
        if ln:
            t(p + "attn_norm.bias", (E,), 0.04)
        t(p + "attn_qkv.weight", (E + 2 * KV * hd, E))
        t(p + "attn_qkv.bias", (E + 2 * KV * hd,), 0.05)
        t(p + "attn_output.weight", (E, E))
        if ln:
            t(p + "attn_output.bias", (E,), 0.05)
        t(p + "ffn_norm.weight", (E,), 0.04, off=1.0)
        if ln:
            t(p + "ffn_norm.bias", (E,), 0.04)
        t(p + "ffn_gate.weight", (FF, E))
        t(p + "ffn_up.weight", (FF, E))
        t(p + "ffn_down.weight", (E, FF))
        if ffn_bias:
            t(p + "ffn_gate.bias", (FF,), 0.05)
            t(p + "ffn_up.bias", (FF,), 0.05)
            t(p + "ffn_down.bias", (E,), 0.05)
    w.write()
    return ten


def _oracle_fused(ten, tokens, *, H, KV, ln=False, neox=False, rope=True,
                  base=10000.0, alibi_max=0.0, attn_scale=None,
                  ffn_bias=False, o_bias=False):
    """Fused-qkv variant of the oracle: cur = x@Wqkv^T + b, split rows
    [q | k | v] (llm_build_qwen / llm_build_jais views)."""
    E = ten["token_embd.weight"].shape[1]
    hd = E // H
    T = len(tokens)
    pos = np.arange(T)
    L = max(int(k.split(".")[1]) for k in ten if k.startswith("blk.")) + 1
    f8 = np.float64
    x = ten["token_embd.weight"][tokens].astype(f8)
    mask = np.triu(np.full((T, T), -np.inf), 1)
    slopes = _alibi_slopes(H, alibi_max) if alibi_max else None
    scale = attn_scale if attn_scale is not None else hd ** -0.5
    for il in range(L):
        p = f"blk.{il}."
        g = lambda n: ten[p + n].astype(f8)  # noqa: E731
        h = _norm(x, g("attn_norm.weight"),
                  g("attn_norm.bias") if ln else None)
        qkv = h @ g("attn_qkv.weight").T + g("attn_qkv.bias")
        q = qkv[:, :E].reshape(T, H, hd)
        k = qkv[:, E:E + KV * hd].reshape(T, KV, hd)
        v = qkv[:, E + KV * hd:].reshape(T, KV, hd)
        if rope:
            q = _rope(q, pos, hd, base, neox)
            k = _rope(k, pos, hd, base, neox)
        k = np.repeat(k, H // KV, axis=1)
        v = np.repeat(v, H // KV, axis=1)
        att = np.einsum("qhd,khd->hqk", q, k) * scale
        if slopes is not None:
            att = att + slopes[:, None, None] * (
                -np.abs(pos[:, None] - pos[None, :]))[None]
        att = att + mask[None]
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", att, v).reshape(T, E)
        o = o @ g("attn_output.weight").T
        if o_bias:
            o = o + g("attn_output.bias")
        x = x + o
        h = _norm(x, g("ffn_norm.weight"), g("ffn_norm.bias") if ln else None)
        gate = h @ g("ffn_gate.weight").T
        up = h @ g("ffn_up.weight").T
        if ffn_bias:
            gate = gate + g("ffn_gate.bias")
            up = up + g("ffn_up.bias")
        silu = gate / (1.0 + np.exp(-gate)) * up
        dn = silu @ g("ffn_down.weight").T
        if ffn_bias:
            dn = dn + g("ffn_down.bias")
        x = x + dn
    x = _norm(x, ten["output_norm.weight"].astype(f8),
              ten["output_norm.bias"].astype(f8) if ln else None)
    return x @ ten["output.weight"].astype(f8).T


def test_qwen1_oracle(tmp_path):
    """qwen (v1): fused wqkv + bias, NEOX rope, RMS norms, silu FFN
    (llm_build_qwen, llama-model.cpp:6125)."""
    p = str(tmp_path / "m.gguf")
    ten = _write_fused(p, "qwen")
    ours = _engine_logits(p, "qwen")
    ref = _oracle_fused(ten, TOKENS, H=4, KV=4, neox=True)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)


def test_jais_oracle(tmp_path):
    """jais: fused qkv + biases, LayerNorm(+bias), NO rope + ALiBi,
    gated-silu FFN WITH biases, and kq scale 1/n_embd_head (not 1/sqrt)
    (llm_build_jais, llama-model.cpp:12528-area; hparams :1396-1397)."""
    p = str(tmp_path / "m.gguf")
    E, H = 64, 4
    ten = _write_fused(p, "jais", ln=True, ffn_bias=True, extra_kv=[
        ("jais.attention.max_alibi_bias", 8.0)])
    ours = _engine_logits(p, "jais")
    ref = _oracle_fused(ten, TOKENS, H=H, KV=H, ln=True, rope=False,
                        alibi_max=8.0, attn_scale=1.0 / (E // H),
                        ffn_bias=True, o_bias=True)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)
