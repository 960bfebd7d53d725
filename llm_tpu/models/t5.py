"""T5 encoder-decoder graphs (cross-attention capability class).

Parity targets: llm_build_t5_enc / llm_build_t5_dec
(/root/reference/src/llama-model.cpp:11749,11850) and the relative-position
bucket function (llama_relative_position_bucket,
/root/reference/src/llama-graph.cpp:1682): bidirectional buckets for the
encoder, causal buckets for decoder self-attention, NO bias on
cross-attention; attention scale fixed at 1.0; RMS norms; ReLU FFN (or
parallel gated-GELU when ffn_gate exists — t5 v1.1).

TPU-first design: the encoder is one jitted bidirectional pass (no cache);
cross-attention K/V are projected ONCE from the encoder output and stay
resident; decoder self-attention runs over the standard cell-table cache
with the rel-pos bias computed in-graph from cell metadata (positions),
so ubatched decode and the trash-cell padding scheme carry over unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from ..ops.qmatmul import qembed, qmm
from .config import ModelConfig

REL_MAX_DISTANCE = 128  # llama-graph.cpp:1684


def rel_bucket(qpos, kpos, n_buckets: int, bidirectional: bool):
    """Vectorized llama_relative_position_bucket: qpos [T], kpos [S] ->
    buckets [T, S] int32. The relative position is key - query (HF
    memory_position - context_position; the reference passes the key pos
    as x), so causal attention sees positive distances into the past."""
    rel = kpos[None, :] - qpos[:, None]
    nb = n_buckets >> 1 if bidirectional else n_buckets
    if bidirectional:
        extra = (rel > 0).astype(jnp.int32) * nb
        rel = jnp.abs(rel)
    else:
        extra = jnp.zeros_like(rel)
        rel = -jnp.minimum(rel, 0)
    max_exact = nb >> 1
    relf = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = jnp.floor(
        max_exact
        + jnp.log(relf / max_exact)
        * (nb - max_exact) / jnp.log(REL_MAX_DISTANCE / max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return extra + jnp.where(rel < max_exact, rel, large)


def _pos_bias(qpos, kpos, rel_b, n_buckets: int, bidirectional: bool):
    """attn_rel_b [n_buckets, H] -> additive bias [H, T, S] f32."""
    buckets = rel_bucket(qpos, kpos, n_buckets, bidirectional)  # [T, S]
    return jnp.take(rel_b, buckets, axis=0).transpose(2, 0, 1).astype(jnp.float32)


def _attn(q, k, v, bias):
    """[T,H,D] x [S,H,D] with additive bias [H,T,S] (+ mask folded in);
    scale 1.0 (llm_build_t5: kq_scale = 1.0f)."""
    scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    scores = scores + bias
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hts,shd->thd", p, v.astype(jnp.float32))


def _t5_ffn(h, layer, dtype):
    """ReLU FFN, or parallel gated-GELU when ffn_gate exists (t5 v1.1) —
    llm_build_t5: LLM_FFN_GELU/PAR vs LLM_FFN_RELU/SEQ."""
    up = qmm(h, layer["ffn_up"], out_dtype=jnp.float32)
    if "ffn_gate" in layer:
        g = jax.nn.gelu(qmm(h, layer["ffn_gate"]).astype(jnp.float32),
                        approximate=True)
        cur = g * up
    else:
        cur = jax.nn.relu(up)
    return qmm(cur.astype(dtype), layer["ffn_down"], out_dtype=dtype)


def _heads(x, H, D):
    return x.reshape(x.shape[0], H, D)


def t5_encode(params: dict, cfg: ModelConfig, tokens: jnp.ndarray,
              dtype=jnp.bfloat16) -> jnp.ndarray:
    """Bidirectional encoder pass over [S] tokens -> [S, E] f32 hidden
    (llm_build_t5_enc)."""
    H, D = cfg.n_heads, cfg.head_dim
    S = tokens.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)
    x = qembed(params["tok_embd"], tokens, dtype=dtype)
    enc = params["enc_layers"]
    rel0 = enc[0]["attn_rel_b"]
    bias = _pos_bias(pos, pos, rel0, cfg.t5_rel_buckets, bidirectional=True)
    for layer in enc:
        if "attn_rel_b" in layer and layer["attn_rel_b"] is not rel0:
            # umt5: every layer carries its own relative-position bias
            bias = _pos_bias(pos, pos, layer["attn_rel_b"],
                             cfg.t5_rel_buckets, bidirectional=True)
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = _heads(qmm(h, layer["attn_q"], out_dtype=dtype), H, D)
        k = _heads(qmm(h, layer["attn_k"], out_dtype=dtype), H, D)
        v = _heads(qmm(h, layer["attn_v"], out_dtype=dtype), H, D)
        att = _attn(q, k, v, bias).reshape(S, H * D).astype(dtype)
        x = x + qmm(att, layer["attn_output"], out_dtype=dtype)
        h2 = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + _t5_ffn(h2, layer, dtype)
    return rms_norm(x, params["enc_output_norm"], cfg.rms_eps).astype(jnp.float32)


def t5_cross_kv(params: dict, cfg: ModelConfig, enc_h: jnp.ndarray,
                dtype=jnp.bfloat16):
    """Project encoder output into per-decoder-layer cross K/V once
    (the decoder then reuses them for every generated token)."""
    H, D = cfg.n_heads, cfg.head_dim
    ks, vs = [], []
    for layer in params["dec_layers"]:
        ks.append(_heads(qmm(enc_h.astype(dtype), layer["cross_attn_k"],
                             out_dtype=dtype), H, D))
        vs.append(_heads(qmm(enc_h.astype(dtype), layer["cross_attn_v"],
                             out_dtype=dtype), H, D))
    return ks, vs


def t5_decode_step(
    params: dict,
    cfg: ModelConfig,
    kv_k: list,  # per-layer [S, H, D] self-attn cache
    kv_v: list,
    cross_k: list,  # per-layer [S_enc, H, D]
    cross_v: list,
    enc_valid: jnp.ndarray,  # [S_enc] bool/int — encoder padding mask
    tokens: jnp.ndarray,  # [T]
    tok_pos: jnp.ndarray,  # [T]
    write_idx: jnp.ndarray,  # [T] cache cells
    cell_pos: jnp.ndarray,  # [S]
    cell_used: jnp.ndarray,  # [S] 1 where the cell holds a live token
    out_idx: jnp.ndarray,  # [O]
    dtype=jnp.bfloat16,
):
    """Decoder step over the cell cache (llm_build_t5_dec): self-attention
    with causal rel-pos bias + cross-attention over the encoder output."""
    H, D = cfg.n_heads, cfg.head_dim
    T = tokens.shape[0]
    x = qembed(params["tok_embd"], tokens, dtype=dtype)

    dec = params["dec_layers"]
    rel0 = dec[0]["attn_rel_b"]
    # causal + used-cell mask folded into the bias
    ok = (cell_pos[None, :] <= tok_pos[:, None]) & (cell_used[None, :] > 0)

    def _self_bias(rel_b):
        b = _pos_bias(tok_pos, cell_pos, rel_b, cfg.t5_rel_buckets,
                      bidirectional=False)
        return jnp.where(ok[None], b, -1e30)

    bias = _self_bias(rel0)
    cbias = jnp.where((enc_valid > 0)[None, None, :], 0.0, -1e30)
    cbias = jnp.broadcast_to(cbias, (H, T, enc_valid.shape[0]))

    new_k, new_v = [], []
    for il, layer in enumerate(dec):
        if "attn_rel_b" in layer and layer["attn_rel_b"] is not rel0:
            bias = _self_bias(layer["attn_rel_b"])  # umt5 per-layer bias
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = _heads(qmm(h, layer["attn_q"], out_dtype=dtype), H, D)
        k = _heads(qmm(h, layer["attn_k"], out_dtype=dtype), H, D)
        v = _heads(qmm(h, layer["attn_v"], out_dtype=dtype), H, D)
        k_cache = kv_k[il].at[write_idx].set(k.astype(kv_k[il].dtype))
        v_cache = kv_v[il].at[write_idx].set(v.astype(kv_v[il].dtype))
        new_k.append(k_cache)
        new_v.append(v_cache)
        att = _attn(q, k_cache.astype(dtype), v_cache.astype(dtype), bias)
        att = att.reshape(T, H * D).astype(dtype)
        x = x + qmm(att, layer["attn_output"], out_dtype=dtype)

        # cross-attention over the encoder sequence (no positional bias)
        h = rms_norm(x, layer["cross_attn_norm"], cfg.rms_eps)
        q = _heads(qmm(h, layer["cross_attn_q"], out_dtype=dtype), H, D)
        catt = _attn(q, cross_k[il], cross_v[il], cbias)
        catt = catt.reshape(T, H * D).astype(dtype)
        x = x + qmm(catt, layer["cross_attn_output"], out_dtype=dtype)

        h2 = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + _t5_ffn(h2, layer, dtype)

    x = rms_norm(x, params["dec_output_norm"], cfg.rms_eps)
    hs = jnp.take(x, out_idx, axis=0)
    out_w = params.get("output") if params.get("output") is not None else params["tok_embd"]
    logits = qmm(hs, out_w)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits, new_k, new_v, hs.astype(jnp.float32)
