"""BERT-family encoder (embedding / reranker models).

Parity target: llm_build_bert (/root/reference/src/llama-model.cpp:6249):
token + type-row-0 + learned position embeddings -> embed LayerNorm; N
post-norm blocks (bidirectional attention with q/k/v/out biases, no rope,
no cache; attn_output_norm after the residual; GELU FFN; layer_output_norm)
— plus the CLS pooler / rank-classifier heads used for embeddings and
/rerank (LLM_TENSOR_CLS / CLS_OUT).

Variants riding the same graph (llm_build_bert branches):
- nomic-bert: fused qkv, NEOX rope, gated-silu FFN, no position embeddings
- nomic-bert-moe: + qkv bias and GELU MoE on every odd layer
  (LLM_KV_MOE_EVERY_N_LAYERS == 2); even layers keep the BERT GELU FFN
- jina-bert-v2: bidirectional ALiBi (-slope*|i-j|), optional flat qk
  LayerNorms, gated-GELU FFN (split ffn_up when no gate tensor), second
  post-attention residual+norm (attn_norm_2)
- neo-bert (llm_build_neo_bert :6445): PRE-norm RMS blocks, fused qkv,
  rope, packed-SWIGLU ffn_up, final enc.output_norm"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.codecs import dequantize_tensor
from .config import ModelConfig


def load_bert_params(reader) -> dict:
    names = set(reader.tensors)

    def d(name, dtype=jnp.float32):
        ti = reader.tensors[name]
        return jnp.asarray(
            dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape), dtype)

    from .config import config_from_gguf

    cfg = config_from_gguf(reader)
    p: dict = {"layers": [{} for _ in range(cfg.n_layers)]}

    def opt(dst, key, name):
        if name in names:
            dst[key] = d(name)

    p["tok_embd"] = d("token_embd.weight")
    opt(p, "type_embd", "token_types.weight")
    opt(p, "pos_embd", "position_embd.weight")
    opt(p, "tok_norm", "token_embd_norm.weight")
    opt(p, "tok_norm_b", "token_embd_norm.bias")
    opt(p, "output_norm_enc", "enc.output_norm.weight")  # neo-bert
    opt(p, "cls", "cls.weight")
    opt(p, "cls_b", "cls.bias")
    opt(p, "cls_out", "cls.output.weight")
    opt(p, "cls_out_b", "cls.output.bias")
    for il in range(cfg.n_layers):
        L = p["layers"][il]
        for base in ("attn_q", "attn_k", "attn_v", "attn_qkv", "attn_output",
                     "attn_norm", "attn_q_norm", "attn_k_norm",
                     "attn_output_norm", "attn_norm_2", "ffn_norm",
                     "ffn_up", "ffn_gate", "ffn_down", "ffn_gate_inp",
                     "ffn_up_exps", "ffn_down_exps", "layer_output_norm"):
            opt(L, base, f"blk.{il}.{base}.weight")
            opt(L, base + "_b", f"blk.{il}.{base}.bias")
    return p, cfg


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) / jnp.sqrt(var + eps)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    return out


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    out = xf / jnp.sqrt((xf ** 2).mean(-1, keepdims=True) + eps)
    return out * w if w is not None else out


def _alibi_slopes(n_heads: int, max_bias: float):
    n2 = 2 ** int(np.floor(np.log2(n_heads)))
    m0 = 2.0 ** (-max_bias / n2)
    m1 = 2.0 ** (-max_bias / 2.0 / n2)
    return jnp.asarray(
        [m0 ** (i + 1) if i < n2 else m1 ** (2 * (i - n2) + 1)
         for i in range(n_heads)], jnp.float32)


def bert_encode(params: dict, cfg: ModelConfig, tokens: jnp.ndarray):
    """tokens [T] -> hidden states [T, E] (bidirectional, no cache)."""
    arch = cfg.arch
    T = tokens.shape[0]
    eps = cfg.rms_eps
    neo = arch == "neo-bert"
    moe_n = cfg.moe_every_n
    x = jnp.take(params["tok_embd"], tokens, axis=0).astype(jnp.float32)
    if "type_embd" in params:
        x = x + params["type_embd"][0]  # token type 0 ("sentence A")
    if "pos_embd" in params:
        x = x + params["pos_embd"][:T]
    if "tok_norm" in params:
        x = _ln(x, params.get("tok_norm"), params.get("tok_norm_b"), eps)

    H, Hkv = cfg.n_heads, cfg.n_kv_heads or cfg.n_heads
    D = cfg.head_dim or cfg.n_embd // H
    scale = D ** -0.5
    rope_on = cfg.rope.n_dims > 0 and arch in (
        "nomic-bert", "nomic-bert-moe", "neo-bert")
    if rope_on:
        from ..ops.rope import apply_rope, rope_angles

        pos = jnp.arange(T, dtype=jnp.int32)
        cos_t, sin_t = rope_angles(pos, cfg.rope, None)
    bias = None
    if cfg.alibi_max_bias > 0.0:  # jina: bidirectional -slope*|i-j|
        dist = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :])
        bias = -_alibi_slopes(H, cfg.alibi_max_bias)[:, None, None] \
            * dist.astype(jnp.float32)

    for il, L in enumerate(params["layers"]):
        inp = x
        h = _rms(x, L.get("attn_norm"), eps) if neo else x
        if "attn_qkv" in L:
            qkv = h @ L["attn_qkv"].T + L.get("attn_qkv_b", 0.0)
            nq, nk = H * D, Hkv * D
            q, k, v = qkv[:, :nq], qkv[:, nq:nq + nk], qkv[:, nq + nk:]
        else:
            q = h @ L["attn_q"].T + L.get("attn_q_b", 0.0)
            k = h @ L["attn_k"].T + L.get("attn_k_b", 0.0)
            v = h @ L["attn_v"].T + L.get("attn_v_b", 0.0)
        if "attn_q_norm" in L:  # jina: LayerNorm over the flat q/k vectors
            q = _ln(q, L["attn_q_norm"], L.get("attn_q_norm_b"), eps)
            k = _ln(k, L["attn_k_norm"], L.get("attn_k_norm_b"), eps)
        q = q.reshape(T, H, D)
        k = k.reshape(T, Hkv, D)
        v = v.reshape(T, Hkv, D)
        if rope_on:
            q = apply_rope(q, cos_t, sin_t, cfg.rope.mode, cfg.rope.n_dims)
            k = apply_rope(k, cos_t, sin_t, cfg.rope.mode, cfg.rope.n_dims)
        if Hkv != H:
            k = jnp.repeat(k, H // Hkv, axis=1)
            v = jnp.repeat(v, H // Hkv, axis=1)
        scores = jnp.einsum("qhd,khd->hqk", q * scale, k)
        if bias is not None:
            scores = scores + bias
        att = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(T, H * D)
        o = o @ L["attn_output"].T + L.get("attn_output_b", 0.0)
        if neo:
            x = inp + o
            ffn_inp = x
            hf = _rms(x, L.get("ffn_norm"), eps)
            # packed SWIGLU: ffn_up rows are [gate; up] (LLM_FFN_SWIGLU)
            gu = hf @ L["ffn_up"].T
            g, u = jnp.split(gu, 2, axis=-1)
            dn = (jax.nn.silu(g) * u) @ L["ffn_down"].T
            x = ffn_inp + dn
            continue
        x = _ln(inp + o, L.get("attn_output_norm"),
                L.get("attn_output_norm_b"), eps)
        if "attn_norm_2" in L:  # jina: second input residual + norm
            x = _ln(x + inp, L["attn_norm_2"], L.get("attn_norm_2_b"), eps)
        ffn_inp = x
        if moe_n > 0 and il % moe_n == 1 and "ffn_gate_inp" in L:
            # nomic-bert-moe: GELU MoE without a gate projection
            probs = jax.nn.softmax(ffn_inp @ L["ffn_gate_inp"].T, axis=-1)
            topw, topi = jax.lax.top_k(probs, cfg.n_expert_used)
            upw = L["ffn_up_exps"][topi]        # [T, k, FF, E]
            dnw = L["ffn_down_exps"][topi]      # [T, k, E, FF]
            up = jax.nn.gelu(
                jnp.einsum("te,tkfe->tkf", ffn_inp, upw), approximate=False)
            dn = jnp.einsum("tkf,tkef->tke", up, dnw)
            dn = jnp.sum(dn * topw[..., None], axis=1)
        elif "ffn_gate" in L:  # nomic silu / jina gelu gated
            act = (jax.nn.gelu if arch == "jina-bert-v2"
                   else jax.nn.silu)
            g = act(ffn_inp @ L["ffn_gate"].T)
            u = ffn_inp @ L["ffn_up"].T
            dn = (g * u) @ L["ffn_down"].T + L.get("ffn_down_b", 0.0)
        elif arch == "jina-bert-v2":  # GEGLU: split packed ffn_up
            gu = ffn_inp @ L["ffn_up"].T
            g, u = jnp.split(gu, 2, axis=-1)
            dn = (jax.nn.gelu(g) * u) @ L["ffn_down"].T \
                + L.get("ffn_down_b", 0.0)
        else:
            up = ffn_inp @ L["ffn_up"].T + L.get("ffn_up_b", 0.0)
            up = jax.nn.gelu(up, approximate=False)
            dn = up @ L["ffn_down"].T + L.get("ffn_down_b", 0.0)
        x = _ln(ffn_inp + dn, L.get("layer_output_norm"),
                L.get("layer_output_norm_b"), eps)
    if neo:
        x = _rms(x, params.get("output_norm_enc"), eps)
    return x


def bert_pool(params: dict, hidden, pooling: str = "mean"):
    """Pooling over [T, E] (llama pooling_type semantics: mean/cls/last/rank)."""
    if pooling == "cls":
        return hidden[0]
    if pooling == "last":
        return hidden[-1]
    if pooling == "rank":
        # classifier head: score = cls.output(tanh(cls(h_cls)))
        h = hidden[0]
        if "cls" in params:
            h = jnp.tanh(h @ params["cls"].T + params.get("cls_b", 0.0))
        if "cls_out" in params:
            h = h @ params["cls_out"].T + params.get("cls_out_b", 0.0)
        return h
    return hidden.mean(axis=0)


class BertContext:
    """Minimal encoder-only context: encode() + rerank scoring (the
    llama_encode path; no KV cache, no decode)."""

    def __init__(self, reader, dtype=jnp.float32):
        self.params, self.cfg = load_bert_params(reader)
        self._enc = {}

    def _encode_fn(self, T):
        if T not in self._enc:
            cfg = self.cfg
            self._enc[T] = jax.jit(
                lambda p, t: bert_encode(p, cfg, t))
        return self._enc[T]

    def encode(self, tokens: list[int], pooling: str = "mean", seq_id: int = 0):
        t = jnp.asarray(tokens, jnp.int32)
        hidden = self._encode_fn(len(tokens))(self.params, t)
        return np.asarray(bert_pool(self.params, hidden, pooling))

    def rerank_score(self, tokens: list[int]) -> float:
        return float(np.asarray(self.encode(tokens, pooling="rank")).reshape(-1)[0])
