"""Unit tests for the ops layer (rope / norms / qmm / attention masks) —
the analogue of the reference's test-backend-ops + test-rope."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.gguf.constants import GGMLType
from llm_tpu.ops.attention import attention, build_attn_bias
from llm_tpu.ops.norms import layer_norm, rms_norm
from llm_tpu.ops.qmatmul import qembed, qmm
from llm_tpu.ops.rope import (
    ROPE_TYPE_NEOX,
    ROPE_TYPE_NORM,
    RopeParams,
    apply_rope,
    rope_angles,
)
from llm_tpu.quant import codecs
from llm_tpu.quant.qtensor import dequantize_qtensor, qtensor_from_gguf


def test_rope_neox_matches_manual():
    D, T = 8, 3
    p = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX, freq_base=10000.0)
    pos = jnp.asarray([0, 1, 5], jnp.int32)
    cos, sin = rope_angles(pos, p)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(T, 1, D)), jnp.float32)
    out = apply_rope(x, cos, sin, p.mode, D)

    inv = 10000.0 ** (-2 * np.arange(D // 2) / D)
    theta = np.asarray(pos)[:, None] * inv
    c, s = np.cos(theta), np.sin(theta)
    xn = np.asarray(x)[:, 0]
    want0 = xn[:, : D // 2] * c - xn[:, D // 2 :] * s
    want1 = xn[:, : D // 2] * s + xn[:, D // 2 :] * c
    want = np.concatenate([want0, want1], -1)
    np.testing.assert_allclose(np.asarray(out)[:, 0], want, atol=1e-5)


def test_rope_norm_pairs():
    D = 4
    p = RopeParams(n_dims=D, mode=ROPE_TYPE_NORM)
    pos = jnp.asarray([2], jnp.int32)
    cos, sin = rope_angles(pos, p)
    x = jnp.asarray([[[1.0, 2.0, 3.0, 4.0]]], jnp.float32)
    out = np.asarray(apply_rope(x, cos, sin, p.mode, D))[0, 0]
    inv = 10000.0 ** (-2 * np.arange(2) / D)
    th = 2 * inv
    want = np.array(
        [
            1 * np.cos(th[0]) - 2 * np.sin(th[0]),
            1 * np.sin(th[0]) + 2 * np.cos(th[0]),
            3 * np.cos(th[1]) - 4 * np.sin(th[1]),
            3 * np.sin(th[1]) + 4 * np.cos(th[1]),
        ]
    )
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_rope_yarn_runs_and_scales():
    p = RopeParams(
        n_dims=16, mode=ROPE_TYPE_NEOX, freq_scale=0.25, ext_factor=1.0,
        attn_factor=1.0, n_ctx_orig=2048,
    )
    cos, sin = rope_angles(jnp.asarray([100], jnp.int32), p)
    assert np.isfinite(np.asarray(cos)).all() and np.isfinite(np.asarray(sin)).all()
    # yarn magnitude scaling: mscale = 1 + 0.1*ln(1/freq_scale)
    mag = np.sqrt(np.asarray(cos) ** 2 + np.asarray(sin) ** 2)
    np.testing.assert_allclose(mag, 1 + 0.1 * np.log(4.0), rtol=1e-5)


def test_rms_norm():
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=16).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layer_norm():
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), None, None, 1e-5))
    want = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K])
def test_qmm_matches_dequant_matmul(qtype):
    rng = np.random.default_rng(3)
    K, N, T = 256, 64, 5
    w = rng.normal(size=(N, K)).astype(np.float32)
    x = rng.normal(size=(T, K)).astype(np.float32)
    qt = qtensor_from_gguf(codecs.quantize(w, qtype), qtype, (K, N))
    got = np.asarray(qmm(jnp.asarray(x), qt, dtype=jnp.float32))
    want = x @ dequantize_qtensor(qt).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qembed_matches_rows():
    rng = np.random.default_rng(4)
    V, K = 64, 256
    w = rng.normal(size=(V, K)).astype(np.float32)
    qt = qtensor_from_gguf(codecs.quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (K, V),
                           kmajor=False)
    ids = jnp.asarray([0, 5, 63], jnp.int32)
    got = np.asarray(qembed(qt, ids, dtype=jnp.float32))
    want = dequantize_qtensor(qt)[np.asarray(ids)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_attn_bias_masks():
    tok_pos = jnp.asarray([3, 4], jnp.int32)
    tok_seq = jnp.asarray([0, 1], jnp.int32)
    cell_pos = jnp.asarray([0, 1, 5, 2], jnp.int32)
    bits = jnp.asarray([1, 1, 1, 2], jnp.uint32)  # cells 0-2: seq0; cell 3: seq1
    bias = np.asarray(build_attn_bias(tok_pos, tok_seq, cell_pos, bits))
    # token0 (seq0,pos3): cells 0,1 allowed; cell2 pos5>3 masked; cell3 seq1 masked
    assert bias[0, 0] == 0 and bias[0, 1] == 0
    assert bias[0, 2] == -np.inf and bias[0, 3] == -np.inf
    # token1 (seq1,pos4): only cell3 allowed
    assert list(bias[1] == 0) == [False, False, False, True]


def test_attn_bias_swa():
    tok_pos = jnp.asarray([10], jnp.int32)
    tok_seq = jnp.zeros(1, jnp.int32)
    cell_pos = jnp.asarray([5, 7, 10], jnp.int32)
    bits = jnp.ones(3, jnp.uint32)
    bias = np.asarray(
        build_attn_bias(tok_pos, tok_seq, cell_pos, bits, swa_window=4)
    )
    # window 4: pos delta must be < 4 -> cells at 7,10 visible; 5 masked
    assert bias[0, 0] == -np.inf and bias[0, 1] == 0 and bias[0, 2] == 0


def test_attention_gqa_matches_naive():
    rng = np.random.default_rng(5)
    T, S, H, Hkv, D = 2, 6, 4, 2, 8
    q = rng.normal(size=(T, H, D)).astype(np.float32)
    k = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    bias = np.zeros((T, S), np.float32)
    bias[0, 4:] = -np.inf
    got = np.asarray(
        attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), 0.3)
    )
    rep = H // Hkv
    want = np.zeros((T, H, D), np.float32)
    for h in range(H):
        kk, vv = k[:, h // rep], v[:, h // rep]
        sc = q[:, h] @ kk.T * 0.3 + bias
        p = np.exp(sc - sc.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want[:, h] = p @ vv
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_softcap():
    q = jnp.ones((1, 1, 4))
    k = jnp.ones((2, 1, 4))
    v = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 4)), jnp.float32)
    bias = jnp.zeros((1, 2))
    out_nocap = np.asarray(attention(q, k, v, bias, 1.0))
    out_cap = np.asarray(attention(q, k, v, bias, 1.0, softcap=1.0))
    # equal scores -> softmax uniform either way
    np.testing.assert_allclose(out_nocap, out_cap, atol=1e-6)
