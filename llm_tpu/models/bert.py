"""BERT-family encoder (embedding / reranker models).

Parity target: llm_build_bert (/root/reference/src/llama-model.cpp:6249):
token + type-row-0 + learned position embeddings -> embed LayerNorm; N
post-norm blocks (bidirectional attention with q/k/v/out biases, no rope,
no cache; attn_output_norm after the residual; GELU FFN; layer_output_norm)
— plus the CLS pooler / rank-classifier heads used for embeddings and
/rerank (LLM_TENSOR_CLS / CLS_OUT)."""

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
    opt(p, "cls", "cls.weight")
    opt(p, "cls_b", "cls.bias")
    opt(p, "cls_out", "cls.output.weight")
    opt(p, "cls_out_b", "cls.output.bias")
    for il in range(cfg.n_layers):
        L = p["layers"][il]
        for base in ("attn_q", "attn_k", "attn_v", "attn_output",
                     "attn_output_norm", "ffn_up", "ffn_down",
                     "layer_output_norm"):
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


def bert_encode(params: dict, cfg: ModelConfig, tokens: jnp.ndarray):
    """tokens [T] -> hidden states [T, E] (bidirectional, no cache)."""
    T = tokens.shape[0]
    eps = cfg.rms_eps
    x = jnp.take(params["tok_embd"], tokens, axis=0).astype(jnp.float32)
    if "type_embd" in params:
        x = x + params["type_embd"][0]  # token type 0 ("sentence A")
    if "pos_embd" in params:
        x = x + params["pos_embd"][:T]
    x = _ln(x, params.get("tok_norm"), params.get("tok_norm_b"), eps)

    H = cfg.n_heads
    D = cfg.n_embd // H
    scale = D ** -0.5
    for L in params["layers"]:
        q = (x @ L["attn_q"].T + L.get("attn_q_b", 0.0)).reshape(T, H, D)
        k = (x @ L["attn_k"].T + L.get("attn_k_b", 0.0)).reshape(T, H, D)
        v = (x @ L["attn_v"].T + L.get("attn_v_b", 0.0)).reshape(T, H, D)
        att = jax.nn.softmax(jnp.einsum("qhd,khd->hqk", q * scale, k), axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(T, H * D)
        o = o @ L["attn_output"].T + L.get("attn_output_b", 0.0)
        x = _ln(x + o, L.get("attn_output_norm"), L.get("attn_output_norm_b"), eps)

        up = x @ L["ffn_up"].T + L.get("ffn_up_b", 0.0)
        up = jax.nn.gelu(up, approximate=False)
        dn = up @ L["ffn_down"].T + L.get("ffn_down_b", 0.0)
        x = _ln(x + dn, L.get("layer_output_norm"), L.get("layer_output_norm_b"), eps)
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
