"""Cache-aware masked attention (XLA path).

Behavioral parity target: the reference's attention assembly in
/root/reference/src/llama-graph.cpp:1046-1114 (KQ · soft_max_ext(mask, scale,
softcap) · V with f32 precision) and the KQ-mask semantics of the unified KV
cache (seq membership + causality + optional sliding window,
/root/reference/src/llama-kv-cache-unified.h:160,218).

TPU-first differences:
  * the mask is never built on the host — it's computed in-jit from the
    cache's cell metadata (positions + sequence bit-sets), so the only
    host->device traffic per step is O(S) metadata, not O(T*S) masks;
  * K is stored UNROPED in the cache and rotated on read with the cell
    positions. This makes the reference's K-shift graph
    (build_graph_shift, llama-kv-cache-unified.h:229) unnecessary:
    context-shift / self-extend become pure metadata edits.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = float("-inf")


def build_attn_bias(
    tok_pos: jnp.ndarray,  # [T] int32 position of each new token
    tok_seq: jnp.ndarray,  # [T] int32 sequence id of each new token
    cell_pos: jnp.ndarray,  # [S] int32 position stored in each cache cell
    cell_seq_bits: jnp.ndarray,  # [S] uint32 (seqs<32) or [S, W] uint32 planes
    swa_window: int = 0,
    causal: bool = True,
    swa_chunked: bool = False,
) -> jnp.ndarray:
    """Additive f32 bias [T, S]: 0 where attention is allowed, -inf elsewhere.

    cell_seq_bits is the per-cell sequence-membership bit-set: a flat [S]
    uint32 vector (sequences 0-31) or [S, W] uint32 planes covering W*32
    sequences (MAX_SEQS=64 ships [S, 2] — TPUs have no 64-bit int lanes).
    Unused cells have cell_seq_bits == 0 and are masked automatically.
    """
    if cell_seq_bits.ndim == 2:
        # pick each token's word then its bit: [S, T] gather over words
        word = jnp.take(cell_seq_bits, tok_seq >> 5, axis=1)  # [S, T]
        seq_ok = ((word.T >> (tok_seq[:, None].astype(jnp.uint32) & 31)) & 1) > 0
    else:
        seq_ok = ((cell_seq_bits[None, :] >> tok_seq[:, None].astype(jnp.uint32)) & 1) > 0
    allowed = seq_ok
    if causal:
        allowed = allowed & (cell_pos[None, :] <= tok_pos[:, None])
    if swa_window > 0 and swa_chunked:
        # LLAMA_SWA_TYPE_CHUNKED (llama4): attend only within the token's
        # own window-aligned chunk (is_masked_swa: pos_k >=
        # (pos_q / n_swa) * n_swa)
        chunk_start = (tok_pos[:, None] // swa_window) * swa_window
        allowed = allowed & (cell_pos[None, :] >= chunk_start)
    elif swa_window > 0:
        # SWA per the reference's is_masked_swa: pos delta must be < window
        allowed = allowed & ((tok_pos[:, None] - cell_pos[None, :]) < swa_window)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


def attention(
    q: jnp.ndarray,  # [T, H, D]
    k: jnp.ndarray,  # [S, Hkv, D]
    v: jnp.ndarray,  # [S, Hkv, Dv]
    bias: jnp.ndarray,  # [T, S] additive f32
    scale: float,
    softcap: float = 0.0,
    alibi_slopes: jnp.ndarray | None = None,  # [H] (max_bias path)
    cell_pos: jnp.ndarray | None = None,
    tok_pos: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Grouped-query attention with f32 softmax. Returns [T, H, Dv]."""
    T, H, D = q.shape
    S, Hkv, _ = k.shape
    rep = H // Hkv

    qf = q.astype(jnp.float32).reshape(T, Hkv, rep, D)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("tgrd,sgd->tgrs", qf, kf) * scale  # [T, Hkv, rep, S]
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    scores = scores + bias[:, None, None, :]
    if alibi_slopes is not None:
        # ALiBi: slope_h * -(tok_pos - cell_pos), ggml soft_max_ext max_bias path
        dist = (tok_pos[:, None] - cell_pos[None, :]).astype(jnp.float32)
        slopes = alibi_slopes.reshape(Hkv, rep)
        scores = scores - slopes[None, :, :, None] * dist[:, None, None, :]

    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)  # rows that are fully masked stay finite
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)

    vf = v.astype(jnp.float32)
    out = jnp.einsum("tgrs,sgd->tgrd", p, vf)
    return out.reshape(T, H, -1)
