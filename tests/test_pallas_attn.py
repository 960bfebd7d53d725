"""Fused decode-attention kernel vs the XLA attention reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_tpu.ops.attention import attention, build_attn_bias
from llm_tpu.ops.pallas_attn import expand_tables, flash_decode, rope_companion
from llm_tpu.ops.rope import (ROPE_TYPE_NEOX, ROPE_TYPE_NORM, RopeParams,
                              apply_rope, rope_angles)


def _hm(x):
    """[S, Hkv, D] test fixture -> the HEAD-MAJOR [Hkv, S, D] cache layout
    the fused kernels consume (round-5 layout migration)."""
    return jnp.swapaxes(x, 0, 1)


@pytest.mark.parametrize("mode", [ROPE_TYPE_NEOX, ROPE_TYPE_NORM],
                         ids=["neox", "norm"])
@pytest.mark.parametrize("shape", [
    (1, 8, 2, 256, 256, 128),   # decode, exact blocks
    (2, 8, 2, 300, 250, 128),   # ragged tail + masked cells
    (8, 4, 4, 384, 384, 128),   # MHA, multi-token
    (2, 8, 2, 256, 200, 64),    # sub-lane head dim (LLM_TPU_FLASH_ANYDIM)
], ids=["decode", "ragged", "mha", "d64"])
def test_flash_decode_matches_xla(mode, shape):
    T, H, Hkv, S, nvalid, D = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    tok_pos = jnp.asarray(np.arange(T) + 5, jnp.int32)
    tok_seq = jnp.zeros(T, jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 9, jnp.int32)
    cbits = jnp.asarray((np.arange(S) < nvalid).astype(np.uint32))
    rp = RopeParams(n_dims=D, mode=mode)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cbits)
    scale = D ** -0.5

    qro = apply_rope(q, cos_t, sin_t, mode, D)
    kro = apply_rope(k, cos_c, sin_c, mode, D)
    want = np.asarray(attention(qro, kro, v, bias, scale))

    cf, sf = expand_tables(cos_c, sin_c, mode, D)
    got = np.asarray(flash_decode(
        qro, rope_companion(qro, mode), _hm(k.astype(jnp.bfloat16)),
        _hm(v.astype(jnp.bfloat16)), cf.astype(jnp.bfloat16),
        sf.astype(jnp.bfloat16), bias, scale, sblk=256, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_flash_decode_softcap():
    T, H, Hkv, S, D = 1, 4, 2, 256, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    tok_pos = jnp.asarray([9], jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 11, jnp.int32)
    cbits = jnp.ones(S, jnp.uint32)
    rp = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, jnp.zeros(T, jnp.int32), cell_pos, cbits)
    qro = apply_rope(q, cos_t, sin_t, ROPE_TYPE_NEOX, D)
    kro = apply_rope(k, cos_c, sin_c, ROPE_TYPE_NEOX, D)
    want = np.asarray(attention(qro, kro, v, bias, D ** -0.5, softcap=30.0))
    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D)
    got = np.asarray(flash_decode(
        qro, rope_companion(qro, ROPE_TYPE_NEOX), _hm(k.astype(jnp.bfloat16)),
        _hm(v.astype(jnp.bfloat16)), cf.astype(jnp.bfloat16),
        sf.astype(jnp.bfloat16), bias, D ** -0.5, softcap=30.0,
        sblk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_flash_decode_q8_cache():
    """Quantized KV (int8 + per-head scales) matches the dense-cache path."""
    T, H, Hkv, S, D = 2, 8, 2, 300, 128
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    kf = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    vf = rng.normal(size=(S, Hkv, D)).astype(np.float32)

    def q8(x):
        amax = np.abs(x).max(axis=-1, keepdims=True)
        sc = amax / 127.0
        qv = np.clip(np.round(x / np.maximum(sc, 1e-9)), -127, 127).astype(np.int8)
        return jnp.asarray(qv), jnp.asarray(sc.astype(np.float32), jnp.bfloat16)

    kq, ksc = q8(kf)
    vq, vsc = q8(vf)
    kd = np.asarray(kq, np.float32) * np.asarray(ksc, np.float32)
    vd = np.asarray(vq, np.float32) * np.asarray(vsc, np.float32)

    tok_pos = jnp.asarray([7, 8], jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 9, jnp.int32)
    cbits = jnp.asarray((np.arange(S) < 280).astype(np.uint32))
    rp = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, jnp.zeros(T, jnp.int32), cell_pos, cbits)
    qro = apply_rope(q, cos_t, sin_t, ROPE_TYPE_NEOX, D)
    kro = apply_rope(jnp.asarray(kd), cos_c, sin_c, ROPE_TYPE_NEOX, D)
    want = np.asarray(attention(qro, kro, jnp.asarray(vd), bias, D ** -0.5))

    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D)
    got = np.asarray(flash_decode(
        qro, rope_companion(qro, ROPE_TYPE_NEOX), (_hm(kq), _hm(ksc)), (_hm(vq), _hm(vsc)),
        cf.astype(jnp.bfloat16), sf.astype(jnp.bfloat16), bias, D ** -0.5,
        sblk=256, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("mode", [ROPE_TYPE_NEOX, ROPE_TYPE_NORM],
                         ids=["neox", "norm"])
@pytest.mark.parametrize("shape", [
    (32, 8, 2, 256, 256, 16, 128),   # GQA, multiple T and S blocks
    (64, 4, 4, 300, 260, 32, 128),   # ragged S tail + masked cells
    (128, 8, 8, 384, 384, 128, 384), # MHA, single blocks
], ids=["gqa", "ragged", "mha"])
def test_flash_prefill_matches_xla(mode, shape):
    from llm_tpu.ops.pallas_attn import flash_prefill

    T, H, Hkv, S, nvalid, tblk, sblk = shape
    D = 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    tok_pos = jnp.asarray(np.arange(T) + 5, jnp.int32)
    tok_seq = jnp.zeros(T, jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 9, jnp.int32)
    cbits = jnp.asarray((np.arange(S) < nvalid).astype(np.uint32))
    rp = RopeParams(n_dims=D, mode=mode)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cbits)
    scale = D ** -0.5

    qro = apply_rope(q, cos_t, sin_t, mode, D)
    kro = apply_rope(k, cos_c, sin_c, mode, D)
    want = np.asarray(attention(qro, kro, v, bias, scale))

    cf, sf = expand_tables(cos_c, sin_c, mode, D)
    got = np.asarray(flash_prefill(
        qro, rope_companion(qro, mode), _hm(k.astype(jnp.bfloat16)),
        _hm(v.astype(jnp.bfloat16)), cf.astype(jnp.bfloat16),
        sf.astype(jnp.bfloat16), bias, scale, tblk=tblk, sblk=sblk,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_flash_prefill_q8_softcap():
    """Quantized KV (per-head scales) + softcap through the prefill kernel."""
    from llm_tpu.ops.pallas_attn import flash_prefill

    T, H, Hkv, S, D = 32, 4, 2, 256, 128
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    kf = rng.normal(size=(S, Hkv, D)).astype(np.float32)
    vf = rng.normal(size=(S, Hkv, D)).astype(np.float32)

    def q8(a):
        amax = np.abs(a).max(axis=-1, keepdims=True)
        sc = amax / 127.0
        qq = np.clip(np.round(a / sc), -127, 127).astype(np.int8)
        return jnp.asarray(qq), jnp.asarray(sc, jnp.bfloat16)

    kq, ks = q8(kf)
    vq, vs = q8(vf)
    kd = np.asarray(kq, np.float32) * np.asarray(ks, np.float32)
    vd = np.asarray(vq, np.float32) * np.asarray(vs, np.float32)

    tok_pos = jnp.asarray(np.arange(T) + 3, jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 11, jnp.int32)
    cbits = jnp.ones(S, jnp.uint32)
    rp = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, jnp.zeros(T, jnp.int32), cell_pos, cbits)
    qro = apply_rope(q, cos_t, sin_t, ROPE_TYPE_NEOX, D)
    kro = apply_rope(jnp.asarray(kd), cos_c, sin_c, ROPE_TYPE_NEOX, D)
    want = np.asarray(attention(qro, kro, jnp.asarray(vd), bias, D ** -0.5,
                                softcap=30.0))
    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D)
    got = np.asarray(flash_prefill(
        qro, rope_companion(qro, ROPE_TYPE_NEOX), (_hm(kq), _hm(ks)), (_hm(vq), _hm(vs)),
        cf.astype(jnp.bfloat16), sf.astype(jnp.bfloat16), bias, D ** -0.5,
        softcap=30.0, tblk=16, sblk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


# ----------------------- hard-arch coverage: ALiBi / MLA / M-RoPE / dims

def _alibi_slopes(H, max_bias=8.0):
    import math

    n2 = 2 ** math.floor(math.log2(H))
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-max_bias / 2.0 / n2)
    return jnp.asarray(
        [m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1)
         for h in range(H)], jnp.float32)


@pytest.mark.parametrize("prefill", [False, True], ids=["decode", "prefill"])
def test_flash_alibi_matches_xla(prefill):
    """In-kernel ALiBi (mpt/bloom/jais/refact class): rope NONE tables +
    slope*(pos_q-pos_k) == the unfused path's alibi term
    (fattn-common.cuh slope handling)."""
    from llm_tpu.ops.pallas_attn import flash_prefill
    from llm_tpu.ops.rope import ROPE_TYPE_NONE

    T, H, Hkv, S, D = (16, 4, 2, 256, 128) if prefill else (2, 4, 2, 256, 128)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    tok_pos = jnp.asarray(np.arange(T) + 40, jnp.int32)
    tok_seq = jnp.zeros(T, jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 56, jnp.int32)
    cbits = jnp.asarray((np.arange(S) < 200).astype(np.uint32))
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cbits)
    slopes = _alibi_slopes(H)
    scale = D ** -0.5

    want = np.asarray(attention(q, k, v, bias, scale, alibi_slopes=slopes,
                                cell_pos=cell_pos, tok_pos=tok_pos))

    cf, sf = expand_tables(jnp.zeros((S, D // 2)), jnp.zeros((S, D // 2)),
                           ROPE_TYPE_NONE, D)
    dist = (tok_pos[:, None] - cell_pos[None, :]).astype(jnp.float32)
    fn = flash_prefill if prefill else flash_decode
    kw = dict(tblk=8, sblk=128) if prefill else dict(sblk=128)
    got = np.asarray(fn(
        q, rope_companion(q, ROPE_TYPE_NONE), _hm(k.astype(jnp.bfloat16)),
        _hm(v.astype(jnp.bfloat16)), cf.astype(jnp.bfloat16),
        sf.astype(jnp.bfloat16), bias, scale, interpret=True,
        alibi_slopes=slopes, dist=dist, **kw))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("dims", [
    (192, 128, 64),   # deepseek2 MLA: Dk 192 (64 rope + 128 nope), Dv 128
    (128, 128, 32),   # partial rotary (stablelm/phi2 class)
], ids=["mla", "partial"])
def test_flash_partial_rotary_and_mla(dims):
    """Dk != Dv with leading-n_dims partial rope: identity cos/sin fill on
    the unrotated tail reproduces the unfused path (fattn-mma-f16.cuh
    template-dims analogue)."""
    D, Dv, nd = dims
    T, H, Hkv, S = 2, 4, 2, 256
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, Dv)), jnp.float32)
    tok_pos = jnp.asarray(np.arange(T) + 11, jnp.int32)
    tok_seq = jnp.zeros(T, jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 13, jnp.int32)
    cbits = jnp.asarray((np.arange(S) < 220).astype(np.uint32))
    rp = RopeParams(n_dims=nd, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cbits)
    scale = D ** -0.5

    qro = apply_rope(q, cos_t, sin_t, ROPE_TYPE_NEOX, nd)
    kro = apply_rope(k, cos_c, sin_c, ROPE_TYPE_NEOX, nd)
    want = np.asarray(attention(qro, kro, v, bias, scale))

    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D, n_dims=nd)
    got = np.asarray(flash_decode(
        qro, rope_companion(qro, ROPE_TYPE_NEOX, n_dims=nd),
        _hm(k.astype(jnp.bfloat16)), _hm(v.astype(jnp.bfloat16)),
        cf.astype(jnp.bfloat16), sf.astype(jnp.bfloat16), bias, scale,
        sblk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_flash_mrope_tables():
    """M-RoPE (qwen2vl): per-cell multi-section angle tables ride the same
    rope-folded kernel — the fold identity holds for ANY per-(cell, dim)
    angles (ggml_mrope_cache_init semantics)."""
    from llm_tpu.ops.rope import mrope_angles

    T, H, Hkv, S, D = 2, 4, 2, 128, 128
    sections = (16, 24, 24, 0)  # pairs; sums to D/2
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    # (t, h, w, e) position streams, one 4-vector per token/cell
    tok_mpos = jnp.asarray(rng.integers(0, 40, size=(T, 4)), jnp.int32)
    cell_mpos = jnp.asarray(rng.integers(0, 40, size=(S, 4)), jnp.int32)
    tok_pos = tok_mpos[:, 0]
    tok_seq = jnp.zeros(T, jnp.int32)
    cell_pos = cell_mpos[:, 0]
    cbits = jnp.ones(S, jnp.uint32)
    rp = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = mrope_angles(tok_mpos, sections, rp, None)
    cos_c, sin_c = mrope_angles(cell_mpos, sections, rp, None)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cbits)
    scale = D ** -0.5

    qro = apply_rope(q, cos_t, sin_t, ROPE_TYPE_NEOX, D)
    kro = apply_rope(k, cos_c, sin_c, ROPE_TYPE_NEOX, D)
    want = np.asarray(attention(qro, kro, v, bias, scale))

    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D)
    got = np.asarray(flash_decode(
        qro, rope_companion(qro, ROPE_TYPE_NEOX), _hm(k.astype(jnp.bfloat16)),
        _hm(v.astype(jnp.bfloat16)), cf.astype(jnp.bfloat16),
        sf.astype(jnp.bfloat16), bias, scale, sblk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("D", [80, 96], ids=["d80", "d96"])
def test_flash_head_dim_80_96(D):
    """head_dim 80/96 (gpt2-large/phi2/gemma-class geometries) through the
    interpret path."""
    T, H, Hkv, S = 2, 4, 2, 128
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, D)), jnp.float32)
    tok_pos = jnp.asarray(np.arange(T) + 3, jnp.int32)
    tok_seq = jnp.zeros(T, jnp.int32)
    cell_pos = jnp.asarray(np.arange(S) % 7, jnp.int32)
    cbits = jnp.ones(S, jnp.uint32)
    rp = RopeParams(n_dims=D, mode=ROPE_TYPE_NEOX)
    cos_t, sin_t = rope_angles(tok_pos, rp)
    cos_c, sin_c = rope_angles(cell_pos, rp)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cbits)
    scale = D ** -0.5

    qro = apply_rope(q, cos_t, sin_t, ROPE_TYPE_NEOX, D)
    kro = apply_rope(k, cos_c, sin_c, ROPE_TYPE_NEOX, D)
    want = np.asarray(attention(qro, kro, v, bias, scale))

    cf, sf = expand_tables(cos_c, sin_c, ROPE_TYPE_NEOX, D)
    got = np.asarray(flash_decode(
        qro, rope_companion(qro, ROPE_TYPE_NEOX), _hm(k.astype(jnp.bfloat16)),
        _hm(v.astype(jnp.bfloat16)), cf.astype(jnp.bfloat16),
        sf.astype(jnp.bfloat16), bias, scale, sblk=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
