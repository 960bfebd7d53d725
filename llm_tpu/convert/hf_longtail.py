"""HF -> GGUF converters for the renamed/fused-tensor architectures.

Parity targets: convert_hf_to_gguf.py QwenModel / ChatGLMModel /
CodeShellModel / RefactModel / JaisModel / OpenELMModel / PlamoModel /
GrokModel / BailingMoeModel and the gguf-py tensor_mapping rows for each.
These classes are trust_remote_code-only in the installed transformers, so
the converters accept any object with .config and .state_dict() (the same
duck-typing the rest of convert/ uses)."""

from __future__ import annotations

import math

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter
from .hf_llama import permute_qk


def _sd(model):
    return {k: v.detach().cpu().float().numpy()
            for k, v in model.state_dict().items()}


def _base_kv(w, a, *, ctx, E, L, FF, H, KV, eps, V, rms=True, rot=None,
             freq=None):
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(ctx))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(E))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(L))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a),
             [int(f) for f in FF] if isinstance(FF, (list, tuple)) else int(FF))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a),
             [int(h) for h in H] if isinstance(H, (list, tuple)) else int(H))
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a),
             [int(h) for h in KV] if isinstance(KV, (list, tuple)) else int(KV))
    key = (Keys.Attention.LAYERNORM_RMS_EPS if rms
           else Keys.Attention.LAYERNORM_EPS)
    w.add_kv(key.format(arch=a), float(eps))
    if rot is not None:
        w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), int(rot))
    if freq is not None:
        w.add_kv(Keys.Rope.FREQ_BASE.format(arch=a), float(freq))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(V))


def _finish(w, vocab):
    if vocab:
        for k, v in vocab.items():
            w.add_kv(k, v)
    w.write()


def convert_hf_qwen1(model, path, out_type=GGMLType.F32, vocab=None):
    """QWenLMHeadModel -> qwen arch: fused qkv+bias, NEOX rope, gated silu
    with half-width w1/w2 (reference QwenModel: ff = intermediate_size//2)."""
    c = model.config
    sd = _sd(model)
    a = "qwen"
    E = int(c.hidden_size)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "seq_length", 8192), E=E,
             L=c.num_hidden_layers, FF=int(c.intermediate_size) // 2,
             H=c.num_attention_heads, KV=c.num_attention_heads,
             eps=getattr(c, "layer_norm_epsilon", 1e-6), V=c.vocab_size,
             rot=E // int(c.num_attention_heads),
             freq=getattr(c, "rotary_emb_base", 10000.0))

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["transformer.wte.weight"])
    put("output_norm.weight", sd["transformer.ln_f.weight"])
    put("output.weight", sd["lm_head.weight"])
    for il in range(c.num_hidden_layers):
        h = f"transformer.h.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "ln_1.weight"])
        put(b + "attn_qkv.weight", sd[h + "attn.c_attn.weight"])
        put(b + "attn_qkv.bias", sd[h + "attn.c_attn.bias"])
        put(b + "attn_output.weight", sd[h + "attn.c_proj.weight"])
        put(b + "ffn_norm.weight", sd[h + "ln_2.weight"])
        put(b + "ffn_gate.weight", sd[h + "mlp.w2.weight"])
        put(b + "ffn_up.weight", sd[h + "mlp.w1.weight"])
        put(b + "ffn_down.weight", sd[h + "mlp.c_proj.weight"])
    _finish(w, vocab)
    return path


def convert_hf_chatglm(model, path, out_type=GGMLType.F32, vocab=None):
    """ChatGLMModel (glm-2/3/4 pre-hf) -> chatglm arch: fused qkv+bias,
    fused swiglu dense_h_to_4h, half-dim rotary (reference ChatGLMModel)."""
    c = model.config
    sd = _sd(model)
    a = "chatglm"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    kv = int(getattr(c, "multi_query_group_num",
                     getattr(c, "num_key_value_heads", H)))
    head_dim = int(getattr(c, "kv_channels", E // H))
    freq = 10000.0 * float(getattr(c, "rope_ratio", 1.0))
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "seq_length", E), E=E,
             L=int(getattr(c, "num_layers", 0)
                   or getattr(c, "num_hidden_layers")),
             FF=getattr(c, "ffn_hidden_size",
                        getattr(c, "intermediate_size", 4 * E)),
             H=H, KV=kv, eps=getattr(c, "layernorm_epsilon", 1e-5),
             V=getattr(c, "padded_vocab_size", c.vocab_size),
             rot=int(head_dim * getattr(c, "partial_rotary_factor", 0.5)),
             freq=freq)

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    L = int(getattr(c, "num_layers", 0) or getattr(c, "num_hidden_layers"))
    put("token_embd.weight",
        sd["transformer.embedding.word_embeddings.weight"])
    put("output_norm.weight", sd["transformer.encoder.final_layernorm.weight"])
    put("output.weight", sd["transformer.output_layer.weight"])
    for il in range(L):
        h = f"transformer.encoder.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "input_layernorm.weight"])
        put(b + "attn_qkv.weight", sd[h + "self_attention.query_key_value.weight"])
        if h + "self_attention.query_key_value.bias" in sd:
            put(b + "attn_qkv.bias", sd[h + "self_attention.query_key_value.bias"])
        put(b + "attn_output.weight", sd[h + "self_attention.dense.weight"])
        put(b + "ffn_norm.weight", sd[h + "post_attention_layernorm.weight"])
        put(b + "ffn_up.weight", sd[h + "mlp.dense_h_to_4h.weight"])
        put(b + "ffn_down.weight", sd[h + "mlp.dense_4h_to_h.weight"])
    _finish(w, vocab)
    return path


def convert_hf_codeshell(model, path, out_type=GGMLType.F32, vocab=None):
    """CodeShellForCausalLM -> codeshell arch: starcoder tensors (LN+bias,
    fused MQA qkv, gelu) with NEOX rope (reference CodeShellModel)."""
    c = model.config
    sd = _sd(model)
    a = "codeshell"
    E = int(getattr(c, "hidden_size", 0) or getattr(c, "n_embd"))
    H = int(getattr(c, "num_attention_heads", 0) or getattr(c, "n_head"))
    L = int(getattr(c, "num_hidden_layers", 0) or getattr(c, "n_layer"))
    kv = int(getattr(c, "num_query_groups", 1))
    hd = E // H
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "n_positions", 8192), E=E, L=L,
             FF=getattr(c, "n_inner", None) or 4 * E, H=H, KV=kv,
             eps=getattr(c, "layer_norm_epsilon", 1e-5), V=c.vocab_size,
             rms=False, rot=hd,
             freq=getattr(c, "rope_theta", 10000.0))

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["transformer.wte.weight"])
    put("output_norm.weight", sd["transformer.ln_f.weight"])
    put("output_norm.bias", sd["transformer.ln_f.bias"])
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"])
    for il in range(L):
        h = f"transformer.h.{il}."
        b = f"blk.{il}."
        for hf, gg in (("ln_1", "attn_norm"), ("ln_2", "ffn_norm")):
            put(b + gg + ".weight", sd[h + hf + ".weight"])
            put(b + gg + ".bias", sd[h + hf + ".bias"])
        for hf, gg in (("attn.c_attn", "attn_qkv"),
                       ("attn.c_proj", "attn_output"),
                       ("mlp.c_fc", "ffn_up"), ("mlp.c_proj", "ffn_down")):
            put(b + gg + ".weight", sd[h + hf + ".weight"])
            if h + hf + ".bias" in sd:
                put(b + gg + ".bias", sd[h + hf + ".bias"])
    _finish(w, vocab)
    return path


def convert_hf_refact(model, path, out_type=GGMLType.F32, vocab=None):
    """GPTRefactForCausalLM -> refact arch: MQA with fused kv split, fused
    gate_up split at the 2/3-rounded ff dim, ALiBi (reference RefactModel)."""
    c = model.config
    sd = _sd(model)
    a = "refact"
    E = int(getattr(c, "n_embd", 0) or getattr(c, "hidden_size"))
    H = int(getattr(c, "n_head", 0) or getattr(c, "num_attention_heads"))
    L = int(getattr(c, "n_layer", 0) or getattr(c, "num_hidden_layers"))
    hd = E // H
    # ff dim recomputed exactly as the checkpoint builder did
    inner = 4 * E
    hidden = int(2 * inner / 3)
    ff = 256 * ((hidden + 256 - 1) // 256)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "n_positions", 4096), E=E, L=L, FF=ff,
             H=H, KV=1, eps=getattr(c, "layer_norm_epsilon", 1e-6),
             V=c.vocab_size)

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["transformer.wte.weight"])
    put("output_norm.weight", sd["ln_f.weight"]
        if "ln_f.weight" in sd else sd["transformer.ln_f.weight"])
    put("output.weight", sd["lm_head.weight"])
    for il in range(L):
        h = f"transformer.h.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "ln_1.weight"])
        put(b + "ffn_norm.weight", sd[h + "ln_2.weight"])
        put(b + "attn_q.weight", sd[h + "attn.q.weight"])
        kvw = sd[h + "attn.kv.weight"]
        put(b + "attn_k.weight", np.ascontiguousarray(kvw[:hd]))
        put(b + "attn_v.weight", np.ascontiguousarray(kvw[hd:]))
        put(b + "attn_output.weight", sd[h + "attn.c_proj.weight"])
        gu = sd[h + "mlp.gate_up_proj.weight"]
        put(b + "ffn_gate.weight", np.ascontiguousarray(gu[:ff]))
        put(b + "ffn_up.weight", np.ascontiguousarray(gu[ff:]))
        put(b + "ffn_down.weight", sd[h + "mlp.c_proj.weight"])
    _finish(w, vocab)
    return path


def convert_hf_jais(model, path, out_type=GGMLType.F32, vocab=None):
    """JAISLMHeadModel -> jais arch: gpt2 Conv1D transposes, muP embedding/
    output scales folded into the tensors, ALiBi max bias recovered from the
    precomputed slopes (reference JaisModel)."""
    c = model.config
    sd = _sd(model)
    a = "jais"
    E = int(getattr(c, "n_embd", 0) or getattr(c, "hidden_size"))
    H = int(getattr(c, "n_head", 0) or getattr(c, "num_attention_heads"))
    L = int(getattr(c, "n_layer", 0) or getattr(c, "num_hidden_layers"))
    emb_scale = float(getattr(c, "mup_embeddings_scale", 0.0)
                      or getattr(c, "embeddings_scale", 1.0))
    width_scale = 1.0
    if getattr(c, "mup_output_alpha", None) is not None:
        width_scale = float(c.mup_output_alpha) * float(c.mup_width_scale)
    elif getattr(c, "width_scale", None) is not None:
        width_scale = float(c.width_scale)

    max_alibi = 8.0
    for k in sd:
        if k.endswith("relative_pe.slopes"):
            closest = 2 ** math.floor(math.log2(H))
            max_alibi = -round(math.log2(float(sd[k][0])) * closest)
            break

    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "n_positions", 2048), E=E, L=L,
             FF=getattr(c, "n_inner", None) or 4 * E, H=H, KV=H,
             eps=getattr(c, "layer_norm_epsilon", 1e-5), V=c.vocab_size,
             rms=False)
    w.add_kv(f"{a}.attention.max_alibi_bias", float(max_alibi))

    def put(n, arr):
        w.add_tensor(n, np.ascontiguousarray(arr),
                     ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["transformer.wte.weight"] * emb_scale)
    put("output_norm.weight", sd["transformer.ln_f.weight"])
    put("output_norm.bias", sd["transformer.ln_f.bias"])
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"] * width_scale)
    else:  # tied head rides the scaled embedding; undo emb scale
        put("output.weight",
            sd["transformer.wte.weight"] * width_scale)
    for il in range(L):
        h = f"transformer.h.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "ln_1.weight"])
        put(b + "attn_norm.bias", sd[h + "ln_1.bias"])
        put(b + "ffn_norm.weight", sd[h + "ln_2.weight"])
        put(b + "ffn_norm.bias", sd[h + "ln_2.bias"])
        for hf, gg in (("attn.c_attn", "attn_qkv"),
                       ("attn.c_proj", "attn_output"),
                       ("mlp.c_fc", "ffn_up"), ("mlp.c_fc2", "ffn_gate"),
                       ("mlp.c_proj", "ffn_down")):
            put(b + gg + ".weight", sd[h + hf + ".weight"].T)
            if h + hf + ".bias" in sd:
                put(b + gg + ".bias", sd[h + hf + ".bias"])
    _finish(w, vocab)
    return path


def _make_divisible(v, divisor: int) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def convert_hf_openelm(model, path, out_type=GGMLType.F32, vocab=None):
    """OpenELMForCausalLM -> openelm arch: per-layer head/kv/ff arrays,
    fused qkv, per-head RMS qk-norm, split proj_1 (reference OpenELMModel)."""
    c = model.config
    sd = _sd(model)
    a = "openelm"
    E = int(c.model_dim)
    L = int(c.num_transformer_layers)
    heads = [int(h) for h in c.num_query_heads]
    kvs = [int(h) for h in c.num_kv_heads]
    hd = int(c.head_dim)
    ffs = [_make_divisible(m * E, int(c.ffn_dim_divisor))
           for m in c.ffn_multipliers]
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=int(c.max_context_length), E=E, L=L, FF=ffs,
             H=heads, KV=kvs, eps=1e-6, V=int(c.vocab_size), rot=hd,
             freq=float(getattr(c, "rope_freq_constant", 10000.0)))
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), hd)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), hd)

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["transformer.token_embeddings.weight"])
    put("output_norm.weight", sd["transformer.norm.weight"])
    for il in range(L):
        h = f"transformer.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "attn_norm.weight"])
        put(b + "attn_qkv.weight", sd[h + "attn.qkv_proj.weight"])
        put(b + "attn_output.weight", sd[h + "attn.out_proj.weight"])
        put(b + "attn_q_norm.weight", sd[h + "attn.q_norm.weight"])
        put(b + "attn_k_norm.weight", sd[h + "attn.k_norm.weight"])
        put(b + "ffn_norm.weight", sd[h + "ffn_norm.weight"])
        p1 = sd[h + "ffn.proj_1.weight"]
        put(b + "ffn_gate.weight", np.ascontiguousarray(p1[:ffs[il]]))
        put(b + "ffn_up.weight", np.ascontiguousarray(p1[ffs[il]:]))
        put(b + "ffn_down.weight", sd[h + "ffn.proj_2.weight"])
    _finish(w, vocab)
    return path


def convert_hf_plamo(model, path, out_type=GGMLType.F32, vocab=None):
    """PlamoForCausalLM -> plamo arch: model.layers.layers.* naming, the
    grouped-query interleave shuffle on q/k (reference PlamoModel
    shuffle_attn_q_weight generalized to the config's head counts)."""
    c = model.config
    sd = _sd(model)
    a = "plamo"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    kv = int(getattr(c, "num_key_value_heads", H) or H)
    hd = E // H
    L = int(c.num_hidden_layers)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "max_position_embeddings", 4096), E=E,
             L=L, FF=c.intermediate_size, H=H, KV=kv,
             eps=getattr(c, "rms_norm_eps", 1e-6), V=c.vocab_size, rot=hd)

    def shuffle_q(x):
        # plamo checkpoints store q heads as [group, kv] — regroup to
        # [kv, group] for GQA broadcasting (reference shuffle_attn_q_weight,
        # generalized from the hardcoded 13b shapes)
        return np.ascontiguousarray(
            x.reshape(H // kv, kv, hd, E).swapaxes(0, 1).reshape(H * hd, E))

    def shuffle_o(x):
        # inverse column shuffle on the output projection
        return np.ascontiguousarray(
            x.reshape(E, H // kv, kv, hd).transpose(0, 2, 1, 3)
            .reshape(E, H * hd))

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    put("output_norm.weight", sd["model.norm.weight"])
    put("output.weight", sd["lm_head.weight"])
    for il in range(L):
        h = f"model.layers.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "norm.weight"])
        put(b + "attn_q.weight", shuffle_q(sd[h + "self_attn.q_proj.weight"]))
        put(b + "attn_k.weight", sd[h + "self_attn.k_proj.weight"])
        put(b + "attn_v.weight", sd[h + "self_attn.v_proj.weight"])
        put(b + "attn_output.weight", shuffle_o(sd[h + "self_attn.o_proj.weight"]))
        put(b + "ffn_gate.weight", sd[h + "mlp.gate_proj.weight"])
        put(b + "ffn_up.weight", sd[h + "mlp.up_proj.weight"])
        put(b + "ffn_down.weight", sd[h + "mlp.down_proj.weight"])
    _finish(w, vocab)
    return path


def convert_hf_grok(model, path, out_type=GGMLType.F32, vocab=None):
    """GrokForCausalLM -> grok arch: transformer.decoder_layer.* naming,
    post-norm remaps (rms_norm_1/2/3), per-expert moe.N.linear* merged into
    stacked expert tensors (reference GrokModel)."""
    c = model.config
    sd = _sd(model)
    a = "grok"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    kv = int(getattr(c, "num_key_value_heads", H))
    L = int(c.num_hidden_layers)
    NE = int(getattr(c, "num_local_experts", 8))
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "max_position_embeddings", 8192), E=E,
             L=L, FF=c.intermediate_size, H=H, KV=kv,
             eps=getattr(c, "rms_norm_eps", 1e-5), V=c.vocab_size,
             rot=E // H)
    w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), NE)
    w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a),
             int(getattr(c, "num_experts_per_tok", 2)))

    def put(n, arr):
        w.add_tensor(n, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["transformer.in_out_embed.weight"])
    put("output_norm.weight", sd["transformer.rms_norm.weight"])
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"])
    for il in range(L):
        h = f"transformer.decoder_layer.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "rms_norm.weight"])
        put(b + "attn_out_norm.weight", sd[h + "rms_norm_1.weight"])
        put(b + "ffn_norm.weight", sd[h + "rms_norm_2.weight"])
        put(b + "layer_out_norm.weight", sd[h + "rms_norm_3.weight"])
        put(b + "attn_q.weight", sd[h + "multi_head_attention.query.weight"])
        put(b + "attn_k.weight", sd[h + "multi_head_attention.key.weight"])
        put(b + "attn_v.weight", sd[h + "multi_head_attention.value.weight"])
        put(b + "attn_output.weight",
            sd[h + "multi_head_attention.linear.weight"])
        put(b + "ffn_gate_inp.weight", sd[h + "router.weight"])
        for hf, gg in (("linear", "ffn_gate_exps"),
                       ("linear_v", "ffn_up_exps"),
                       ("linear_1", "ffn_down_exps")):
            stack = np.stack([sd[f"{h}moe.{e}.{hf}.weight"]
                              for e in range(NE)])
            w.add_tensor(b + gg + ".weight", stack, ggml_type=GGMLType.F32)
    _finish(w, vocab)
    return path


def convert_hf_bailingmoe(model, path, out_type=GGMLType.F32, vocab=None):
    """BailingMoeForCausalLM -> bailingmoe arch: fused query_key_value
    split with the NORM-rope permute, deepseek-v1-style MoE with ungated
    shared experts (reference BailingMoeModel)."""
    c = model.config
    sd = _sd(model)
    a = "bailingmoe"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    kv = int(getattr(c, "num_key_value_heads", H))
    hd = int(getattr(c, "head_dim", 0) or E // H)
    L = int(c.num_hidden_layers)
    NE = int(c.num_experts)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "max_position_embeddings", 4096), E=E,
             L=L, FF=c.intermediate_size, H=H, KV=kv,
             eps=getattr(c, "rms_norm_eps", 1e-6), V=c.vocab_size, rot=hd,
             freq=getattr(c, "rope_theta", 10000.0))
    w.add_kv(f"{a}.leading_dense_block_count",
             int(getattr(c, "first_k_dense_replace", 0)))
    w.add_kv(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH.format(arch=a),
             int(c.moe_intermediate_size))
    w.add_kv(f"{a}.expert_weights_scale", 1.0)
    w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), NE)
    w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a),
             int(getattr(c, "num_experts_per_tok", 2)))
    w.add_kv(f"{a}.expert_shared_count",
             int(getattr(c, "num_shared_experts", 0)))
    w.add_kv(f"{a}.expert_weights_norm", bool(getattr(c, "norm_topk_prob", False)))

    def put(n, arr):
        w.add_tensor(n, np.ascontiguousarray(arr),
                     ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["model.word_embeddings.weight"])
    put("output_norm.weight", sd["model.norm.weight"])
    put("output.weight", sd["lm_head.weight"])
    for il in range(L):
        h = f"model.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "input_layernorm.weight"])
        put(b + "ffn_norm.weight", sd[h + "post_attention_layernorm.weight"])
        qkv = sd[h + "attention.query_key_value.weight"]
        q, k, v = np.split(qkv, [H * hd, H * hd + kv * hd])
        put(b + "attn_q.weight", permute_qk(q, H))
        put(b + "attn_k.weight", permute_qk(k, kv))
        put(b + "attn_v.weight", v)
        put(b + "attn_output.weight", sd[h + "attention.dense.weight"])
        if h + "mlp.gate.weight" in sd:  # MoE layer
            put(b + "ffn_gate_inp.weight", sd[h + "mlp.gate.weight"])
            for hf, gg in (("gate_proj", "ffn_gate_exps"),
                           ("up_proj", "ffn_up_exps"),
                           ("down_proj", "ffn_down_exps")):
                stack = np.stack([sd[f"{h}mlp.experts.{e}.{hf}.weight"]
                                  for e in range(NE)])
                w.add_tensor(b + gg + ".weight", stack,
                             ggml_type=GGMLType.F32)
            for hf, gg in (("gate_proj", "ffn_gate_shexp"),
                           ("up_proj", "ffn_up_shexp"),
                           ("down_proj", "ffn_down_shexp")):
                key = f"{h}mlp.shared_experts.{hf}.weight"
                if key in sd:
                    put(b + gg + ".weight", sd[key])
        else:  # leading dense layer
            put(b + "ffn_gate.weight", sd[h + "mlp.gate_proj.weight"])
            put(b + "ffn_up.weight", sd[h + "mlp.up_proj.weight"])
            put(b + "ffn_down.weight", sd[h + "mlp.down_proj.weight"])
    _finish(w, vocab)
    return path


# ------------------------------------------------------------- bert family

def convert_hf_bert_family(model, path, vocab=None, mt=None):
    """Roberta/Camembert/XLMRoberta/DistilBert -> bert arch.

    Parity: convert_hf_to_gguf.py RobertaModel (position_embd trimmed by
    pad_token_id+1, ctx reduced), DistilBertModel (1e-12 eps, q_lin/k_lin
    naming, no token types), XLMRobertaModel (same trim, UGM vocab);
    CLS heads per tensor_mapping CLS/CLS_OUT rows."""
    c = model.config
    mt = mt or c.model_type
    sd = {k: v.detach().cpu().float().numpy()
          for k, v in model.state_dict().items()}
    a = "bert"
    w = GGUFWriter(path, arch=a)
    E = int(getattr(c, "hidden_size", 0) or getattr(c, "dim"))
    H = int(getattr(c, "num_attention_heads", 0) or getattr(c, "n_heads"))
    L = int(getattr(c, "num_hidden_layers", 0) or getattr(c, "n_layers"))
    FF = int(getattr(c, "intermediate_size", 0) or getattr(c, "hidden_dim"))
    V = int(c.vocab_size)
    ctx = int(c.max_position_embeddings)
    roberta_like = mt in ("roberta", "xlm-roberta", "camembert")
    off = 0
    if roberta_like and getattr(c, "pad_token_id", None) is not None:
        off = 1 + int(c.pad_token_id)
        ctx -= off
    eps = 1e-12 if mt == "distilbert" else float(
        getattr(c, "layer_norm_eps", 1e-12))
    _base_kv(w, a, ctx=ctx, E=E, L=L, FF=FF, H=H, KV=H, eps=eps, V=V,
             rms=True)
    w.add_kv(f"{a}.attention.causal", False)
    w.add_kv(f"{a}.pooling_type", 1)  # MEAN
    tcount = int(getattr(c, "type_vocab_size", 1) or 1)
    if mt != "distilbert":
        w.add_kv(f"{a}.attention.token_type_count", tcount)

    # strip the model prefix ("roberta.", "bert.", "distilbert.")
    for pre in ("roberta.", "bert.", "distilbert."):
        if any(k.startswith(pre) for k in sd):
            sd = {(k[len(pre):] if k.startswith(pre) else k): v
                  for k, v in sd.items()}
            break

    def put(n, arr):
        w.add_tensor(n, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    if mt == "distilbert":
        put("token_embd.weight", sd["embeddings.word_embeddings.weight"])
        put("position_embd.weight", sd["embeddings.position_embeddings.weight"])
        put("token_embd_norm.weight", sd["embeddings.LayerNorm.weight"])
        put("token_embd_norm.bias", sd["embeddings.LayerNorm.bias"])
        for il in range(L):
            b = f"transformer.layer.{il}."
            g = f"blk.{il}."
            for hf, gg in (("attention.q_lin", "attn_q"),
                           ("attention.k_lin", "attn_k"),
                           ("attention.v_lin", "attn_v"),
                           ("attention.out_lin", "attn_output"),
                           ("sa_layer_norm", "attn_output_norm"),
                           ("ffn.lin1", "ffn_up"), ("ffn.lin2", "ffn_down"),
                           ("output_layer_norm", "layer_output_norm")):
                put(g + gg + ".weight", sd[b + hf + ".weight"])
                put(g + gg + ".bias", sd[b + hf + ".bias"])
    else:
        put("token_embd.weight", sd["embeddings.word_embeddings.weight"])
        pe = sd["embeddings.position_embeddings.weight"]
        put("position_embd.weight", pe[off:] if off else pe)
        put("token_types.weight", sd["embeddings.token_type_embeddings.weight"])
        put("token_embd_norm.weight", sd["embeddings.LayerNorm.weight"])
        put("token_embd_norm.bias", sd["embeddings.LayerNorm.bias"])
        for il in range(L):
            b = f"encoder.layer.{il}."
            g = f"blk.{il}."
            for hf, gg in (("attention.self.query", "attn_q"),
                           ("attention.self.key", "attn_k"),
                           ("attention.self.value", "attn_v"),
                           ("attention.output.dense", "attn_output"),
                           ("attention.output.LayerNorm", "attn_output_norm"),
                           ("intermediate.dense", "ffn_up"),
                           ("output.dense", "ffn_down"),
                           ("output.LayerNorm", "layer_output_norm")):
                put(g + gg + ".weight", sd[b + hf + ".weight"])
                put(g + gg + ".bias", sd[b + hf + ".bias"])
    # classification heads (tensor_mapping CLS / CLS_OUT)
    for hf, gg in (("classifier.dense", "cls"), ("pre_classifier", "cls"),
                   ("classifier.out_proj", "cls.output")):
        if hf + ".weight" in sd:
            put(gg + ".weight", sd[hf + ".weight"])
            put(gg + ".bias", sd[hf + ".bias"])
    if "classifier.weight" in sd and "classifier.dense.weight" not in sd:
        put("cls.output.weight" if "pre_classifier.weight" in sd
            else "cls.weight", sd["classifier.weight"])
        put("cls.output.bias" if "pre_classifier.weight" in sd
            else "cls.bias", sd["classifier.bias"])
    _finish(w, vocab)
    return path


def convert_hf_nomic_bert(model, path, out_type=GGMLType.F32, vocab=None):
    """NomicBertModel -> nomic-bert / nomic-bert-moe: fused Wqkv, NEOX
    rope, fc11/fc12 swiglu (or every-Nth-layer GELU MoE with viewed
    expert weights), post-norm (reference NomicBertModel)."""
    c = model.config
    sd = _sd(model)
    moe = bool(getattr(c, "moe_every_n_layers", 0))
    a = "nomic-bert-moe" if moe else "nomic-bert"
    E = int(getattr(c, "n_embd", 0) or getattr(c, "hidden_size"))
    H = int(getattr(c, "n_head", 0) or getattr(c, "num_attention_heads"))
    L = int(getattr(c, "n_layer", 0) or getattr(c, "num_hidden_layers"))
    FF = int(getattr(c, "n_inner", 0) or getattr(c, "intermediate_size"))
    npos = int(getattr(c, "n_positions", 2048))
    mtp = int(getattr(c, "max_trained_positions", 2048))
    # reference NomicBertModel n_positions clamp
    ctx = 2048 if (npos, mtp) == (8192, 2048) else 512
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=ctx, E=E, L=L, FF=FF, H=H, KV=H,
             eps=getattr(c, "layer_norm_epsilon", 1e-12), V=c.vocab_size,
             rot=E // H, freq=getattr(c, "rotary_emb_base", 1000.0))
    w.add_kv(f"{a}.attention.causal", False)
    w.add_kv(f"{a}.pooling_type", 1)
    if moe:
        w.add_kv(f"{a}.moe_every_n_layers", int(c.moe_every_n_layers))
        w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), int(c.num_experts))
        w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a),
                 int(getattr(c, "moe_top_k", 2)))

    def put(n, arr):
        w.add_tensor(n, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd["embeddings.word_embeddings.weight"])
    if "embeddings.token_type_embeddings.weight" in sd:
        put("token_types.weight",
            sd["embeddings.token_type_embeddings.weight"])
    put("token_embd_norm.weight", sd["emb_ln.weight"])
    put("token_embd_norm.bias", sd["emb_ln.bias"])
    NE = int(getattr(c, "num_experts", 0) or 0)
    for il in range(L):
        b = f"encoder.layers.{il}."
        g = f"blk.{il}."
        put(g + "attn_qkv.weight", sd[b + "attn.Wqkv.weight"])
        if b + "attn.Wqkv.bias" in sd:
            put(g + "attn_qkv.bias", sd[b + "attn.Wqkv.bias"])
        put(g + "attn_output.weight", sd[b + "attn.out_proj.weight"])
        if b + "attn.out_proj.bias" in sd:
            put(g + "attn_output.bias", sd[b + "attn.out_proj.bias"])
        put(g + "attn_output_norm.weight", sd[b + "norm1.weight"])
        put(g + "attn_output_norm.bias", sd[b + "norm1.bias"])
        put(g + "layer_output_norm.weight", sd[b + "norm2.weight"])
        put(g + "layer_output_norm.bias", sd[b + "norm2.bias"])
        if b + "mlp.experts.mlp.w1" in sd:  # MoE layer: flat experts
            put(g + "ffn_gate_inp.weight", sd[b + "mlp.router.layer.weight"])
            put(g + "ffn_up_exps.weight",
                sd[b + "mlp.experts.mlp.w1"].reshape(NE, FF, E))
            put(g + "ffn_down_exps.weight",
                sd[b + "mlp.experts.mlp.w2"].reshape(NE, FF, E)
                .transpose(0, 2, 1))
        elif b + "mlp.fc11.weight" in sd:  # swiglu dense
            put(g + "ffn_up.weight", sd[b + "mlp.fc11.weight"])
            put(g + "ffn_gate.weight", sd[b + "mlp.fc12.weight"])
            put(g + "ffn_down.weight", sd[b + "mlp.fc2.weight"])
        else:  # moe model's dense GELU layers (fc1/fc2 with bias)
            put(g + "ffn_up.weight", sd[b + "mlp.fc1.weight"])
            if b + "mlp.fc1.bias" in sd:
                put(g + "ffn_up.bias", sd[b + "mlp.fc1.bias"])
            put(g + "ffn_down.weight", sd[b + "mlp.fc2.weight"])
            if b + "mlp.fc2.bias" in sd:
                put(g + "ffn_down.bias", sd[b + "mlp.fc2.bias"])
    _finish(w, vocab)
    return path


def convert_hf_jina_bert_v2(model, path, out_type=GGMLType.F32, vocab=None):
    """JinaBertModel -> jina-bert-v2: bidirectional ALiBi, optional flat
    qk LayerNorms, GEGLU gated_layers split (reference JinaBertV2Model +
    tensor_mapping jina rows)."""
    c = model.config
    sd = _sd(model)
    a = "jina-bert-v2"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    L = int(c.num_hidden_layers)
    FF = int(c.intermediate_size)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=c.max_position_embeddings, E=E, L=L, FF=FF, H=H,
             KV=H, eps=getattr(c, "layer_norm_eps", 1e-12), V=c.vocab_size)
    w.add_kv(f"{a}.attention.causal", False)
    w.add_kv(f"{a}.pooling_type", 1)
    w.add_kv(f"{a}.attention.max_alibi_bias", 8.0)

    for pre in ("bert.", "roberta."):
        if any(k.startswith(pre) for k in sd):
            sd = {(k[len(pre):] if k.startswith(pre) else k): v
                  for k, v in sd.items()}
            break

    def put(n, arr):
        w.add_tensor(n, np.ascontiguousarray(np.asarray(arr, np.float32)),
                     ggml_type=GGMLType.F32)

    put("token_embd.weight", sd["embeddings.word_embeddings.weight"])
    if "embeddings.token_type_embeddings.weight" in sd:
        put("token_types.weight",
            sd["embeddings.token_type_embeddings.weight"])
    put("token_embd_norm.weight", sd["embeddings.LayerNorm.weight"])
    put("token_embd_norm.bias", sd["embeddings.LayerNorm.bias"])
    for il in range(L):
        b = f"encoder.layer.{il}."
        g = f"blk.{il}."
        if b + "mixer.Wqkv.weight" in sd:  # fused variant
            qkv = sd[b + "mixer.Wqkv.weight"]
            qw, kw, vw = np.split(qkv, 3)
            names = ("attn_q", "attn_k", "attn_v")
            for nm, arr in zip(names, (qw, kw, vw)):
                put(g + nm + ".weight", arr)
            if b + "mixer.Wqkv.bias" in sd:
                qb, kb, vb = np.split(sd[b + "mixer.Wqkv.bias"], 3)
                for nm, arr in zip(names, (qb, kb, vb)):
                    put(g + nm + ".bias", arr)
            put(g + "attn_output.weight", sd[b + "mixer.out_proj.weight"])
            if b + "mixer.out_proj.bias" in sd:
                put(g + "attn_output.bias", sd[b + "mixer.out_proj.bias"])
        else:
            for hf, gg in (("attention.self.query", "attn_q"),
                           ("attention.self.key", "attn_k"),
                           ("attention.self.value", "attn_v"),
                           ("attention.output.dense", "attn_output")):
                put(g + gg + ".weight", sd[b + hf + ".weight"])
                if b + hf + ".bias" in sd:
                    put(g + gg + ".bias", sd[b + hf + ".bias"])
            for hf, gg in (("attention.self.layer_norm_q", "attn_q_norm"),
                           ("attention.self.layer_norm_k", "attn_k_norm")):
                if b + hf + ".weight" in sd:
                    put(g + gg + ".weight", sd[b + hf + ".weight"])
                    put(g + gg + ".bias", sd[b + hf + ".bias"])
        put(g + "attn_output_norm.weight",
            sd[b + "attention.output.LayerNorm.weight"])
        put(g + "attn_output_norm.bias",
            sd[b + "attention.output.LayerNorm.bias"])
        gl = sd[b + "mlp.gated_layers.weight"]
        put(g + "ffn_gate.weight", gl[:FF])
        put(g + "ffn_up.weight", gl[FF:])
        put(g + "ffn_down.weight", sd[b + "mlp.wo.weight"])
        if b + "mlp.wo.bias" in sd:
            put(g + "ffn_down.bias", sd[b + "mlp.wo.bias"])
        put(g + "layer_output_norm.weight",
            sd[b + "mlp.layernorm.weight"])
        put(g + "layer_output_norm.bias", sd[b + "mlp.layernorm.bias"])
    _finish(w, vocab)
    return path


def convert_hf_neo_bert(model, path, out_type=GGMLType.F32, vocab=None):
    """NeoBERT -> neo-bert: pre-norm RMS blocks, fused qkv, packed w12
    SWIGLU, ff = 2/3 intermediate, CLS pooling (reference NeoBert)."""
    c = model.config
    sd = _sd(model)
    sd = {(k[6:] if k.startswith("model.") else k): v
          for k, v in sd.items() if not k.startswith("decoder.")}
    a = "neo-bert"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    L = int(c.num_hidden_layers)
    FF = int(2 * c.intermediate_size / 3)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=c.max_position_embeddings, E=E, L=L, FF=FF, H=H,
             KV=H, eps=getattr(c, "norm_eps", 1e-6), V=c.vocab_size,
             rot=E // H, freq=10000.0)
    w.add_kv(f"{a}.attention.causal", False)
    w.add_kv(f"{a}.pooling_type", 3)  # CLS

    def put(n, arr):
        w.add_tensor(n, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd["encoder.weight"])
    put("enc.output_norm.weight", sd["layer_norm.weight"])
    for il in range(L):
        b = f"transformer_encoder.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "attention_norm.weight"])
        put(g + "attn_qkv.weight", sd[b + "qkv.weight"])
        put(g + "attn_output.weight", sd[b + "wo.weight"])
        put(g + "ffn_norm.weight", sd[b + "ffn_norm.weight"])
        put(g + "ffn_up.weight", sd[b + "ffn.w12.weight"])
        put(g + "ffn_down.weight", sd[b + "ffn.w3.weight"])
    for hf, gg in (("dense", "cls"),):
        if hf + ".weight" in sd:
            put(gg + ".weight", sd[hf + ".weight"])
            put(gg + ".bias", sd[hf + ".bias"])
    _finish(w, vocab)
    return path


# ------------------------------------------------------------- rwkv family

def _rwkv_put(w, out_type):
    def put(n, arr, q=False):
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        w.add_tensor(n, arr,
                     ggml_type=out_type if (q and arr.ndim == 2) else GGMLType.F32)
    return put


def convert_hf_rwkv6(model, path, out_type=GGMLType.F32, vocab=None):
    """Rwkv6ForCausalLM -> rwkv6 arch: fused [w,k,v,r,g] lerp stack,
    transposed time_maa_w1/w2 + decay LoRA, 2^(i//rescale) folds on
    time_mix_output/channel_mix_value (reference Rwkv6Model)."""
    c = model.config
    sd = _sd(model)
    a = "rwkv6"
    E = int(c.hidden_size)
    L = int(c.num_hidden_layers)
    D = int(getattr(c, "head_size", 64))
    resc = int(getattr(c, "rescale_every", 6))
    FF = int(getattr(c, "intermediate_size", None)
             or (E * 3.5) // 32 * 32)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=1 << 20, E=E, L=L, FF=FF, H=0, KV=0,
             eps=getattr(c, "layer_norm_epsilon", 1e-5),
             V=int(c.vocab_size))
    w.add_kv(f"{a}.rescale_every_n_layers", resc)
    w.add_kv(f"{a}.wkv.head_size", D)
    w.add_kv(f"{a}.time_mix_extra_dim", 64 if E == 4096 else 32)
    w.add_kv(f"{a}.time_decay_extra_dim", 128 if E == 4096 else 64)
    put = _rwkv_put(w, out_type)

    put("token_embd.weight", sd["rwkv.embeddings.weight"])
    put("token_embd_norm.weight", sd["rwkv.blocks.0.pre_ln.weight"])
    put("token_embd_norm.bias", sd["rwkv.blocks.0.pre_ln.bias"])
    put("output_norm.weight", sd["rwkv.ln_out.weight"])
    put("output_norm.bias", sd["rwkv.ln_out.bias"])
    put("output.weight", sd["head.weight"], q=True)
    for il in range(L):
        h = f"rwkv.blocks.{il}."
        b = f"blk.{il}."
        scale = 2.0 ** int(il // resc) if resc > 0 else 1.0
        put(b + "attn_norm.weight", sd[h + "ln1.weight"])
        put(b + "attn_norm.bias", sd[h + "ln1.bias"])
        put(b + "attn_norm_2.weight", sd[h + "ln2.weight"])
        put(b + "attn_norm_2.bias", sd[h + "ln2.bias"])
        at = h + "attention."
        put(b + "time_mix_lerp_x.weight", sd[at + "time_maa_x"].squeeze())
        put(b + "time_mix_lerp_fused.weight",
            np.stack([sd[at + f"time_maa_{i}"].squeeze()
                      for i in "wkvrg"])[:, None, None, :])
        put(b + "time_mix_w1.weight", sd[at + "time_maa_w1"].T)
        put(b + "time_mix_w2.weight",
            sd[at + "time_maa_w2"].transpose(0, 2, 1))
        put(b + "time_mix_first.weight", sd[at + "time_faaaa"])
        put(b + "time_mix_decay.weight", sd[at + "time_decay"].squeeze())
        put(b + "time_mix_decay_w1.weight", sd[at + "time_decay_w1"].T)
        put(b + "time_mix_decay_w2.weight", sd[at + "time_decay_w2"].T)
        for nm in ("key", "value", "receptance", "gate"):
            put(b + f"time_mix_{nm}.weight", sd[at + nm + ".weight"], q=True)
        put(b + "time_mix_output.weight",
            sd[at + "output.weight"] / scale, q=True)
        put(b + "time_mix_ln.weight", sd[at + "ln_x.weight"])
        put(b + "time_mix_ln.bias", sd[at + "ln_x.bias"])
        ffp = h + "feed_forward."
        put(b + "channel_mix_lerp_k.weight", sd[ffp + "time_maa_k"].squeeze())
        put(b + "channel_mix_lerp_r.weight", sd[ffp + "time_maa_r"].squeeze())
        put(b + "channel_mix_key.weight", sd[ffp + "key.weight"], q=True)
        put(b + "channel_mix_receptance.weight",
            sd[ffp + "receptance.weight"], q=True)
        put(b + "channel_mix_value.weight",
            sd[ffp + "value.weight"] / scale, q=True)
    _finish(w, vocab)
    return path


def convert_hf_rwkv6qwen2(model, path, out_type=GGMLType.F32, vocab=None):
    """RWKV6Qwen2ForCausalLM -> rwkv6qwen2: q/k/v/o_proj with biases onto
    the time-mix slots, rkvwg->wkvrg w1/w2 chunk permute, qwen2 gated FFN
    (reference RWKV6Qwen2Model)."""
    c = model.config
    sd = _sd(model)
    a = "rwkv6qwen2"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    L = int(c.num_hidden_layers)
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=1 << 20, E=E, L=L, FF=int(c.intermediate_size),
             H=0, KV=int(c.num_key_value_heads),
             eps=getattr(c, "rms_norm_eps", 1e-6), V=int(c.vocab_size))
    w.add_kv(f"{a}.wkv.head_size", E // H)
    w.add_kv(f"{a}.token_shift_count", 1)
    put = _rwkv_put(w, out_type)

    def permute_rkvwg(x, w2=False):
        # checkpoint chunks ordered r,k,v,w,g -> graph order w,k,v,r,g
        v = x.reshape(5, -1, x.shape[-1])
        v = np.stack([v[3], v[1], v[2], v[0], v[4]])
        return v if w2 else v.reshape(-1, x.shape[-1])

    put("token_embd.weight", sd["model.embed_tokens.weight"], q=True)
    put("output_norm.weight", sd["model.norm.weight"])
    put("output.weight",
        sd.get("lm_head.weight", sd["model.embed_tokens.weight"]), q=True)
    for il in range(L):
        h = f"model.layers.{il}."
        b = f"blk.{il}."
        at = h + "self_attn."
        put(b + "attn_norm.weight", sd[h + "input_layernorm.weight"])
        put(b + "ffn_norm.weight",
            sd[h + "post_attention_layernorm.weight"])
        put(b + "time_mix_lerp_x.weight", sd[at + "time_maa_x"].squeeze())
        put(b + "time_mix_lerp_fused.weight",
            np.stack([sd[at + f"time_maa_{i}"].squeeze()
                      for i in "wkvrg"])[:, None, :])
        put(b + "time_mix_w1.weight", permute_rkvwg(sd[at + "time_maa_w1"].T))
        put(b + "time_mix_w2.weight",
            permute_rkvwg(sd[at + "time_maa_w2"].transpose(0, 2, 1), w2=True))
        put(b + "time_mix_decay.weight", sd[at + "time_decay"].squeeze())
        put(b + "time_mix_decay_w1.weight", sd[at + "time_decay_w1"].T)
        put(b + "time_mix_decay_w2.weight", sd[at + "time_decay_w2"].T)
        for hf, gg in (("q_proj", "receptance"), ("k_proj", "key"),
                       ("v_proj", "value"), ("o_proj", "output"),
                       ("gate", "gate")):
            put(b + f"time_mix_{gg}.weight", sd[at + hf + ".weight"], q=True)
            if at + hf + ".bias" in sd:
                put(b + f"time_mix_{gg}.bias", sd[at + hf + ".bias"])
        for nm in ("gate", "up", "down"):
            put(b + f"ffn_{nm}.weight", sd[h + f"mlp.{nm}_proj.weight"],
                q=True)
    _finish(w, vocab)
    return path


def _rwkv7_lora_ranks(c, E):
    def calc(exp, mult):
        return max(1, round(E ** exp * mult / 32)) * 32

    return (int(getattr(c, "lora_rank_decay", None)
                or getattr(c, "decay_low_rank_dim", None)
                or calc(0.5, 1.8)),
            int(getattr(c, "lora_rank_iclr", None)
                or getattr(c, "a_low_rank_dim", None) or calc(0.5, 1.8)),
            int(getattr(c, "lora_rank_value_residual_mix", None)
                or getattr(c, "v_low_rank_dim", None) or calc(0.5, 1.3)),
            int(getattr(c, "lora_rank_gate", None)
                or getattr(c, "gate_low_rank_dim", None) or calc(0.8, 0.6)))


def convert_hf_rwkv7(model, path, out_type=GGMLType.F32, vocab=None,
                     arch="rwkv7"):
    """Rwkv7ForCausalLM / RwkvHybridForCausalLM -> rwkv7 / arwkv7:
    [r,w,k,v,a,g] x_x lerp stack, transposed LoRA pairs, flattened r_k,
    layer-0 a->v dummy copy (reference Rwkv7Model / ARwkv7Model)."""
    c = model.config
    sd = _sd(model)
    hybrid = arch == "arwkv7"
    # unify fla/rwkv naming the way the reference does
    uni = {}
    for k, v in sd.items():
        if k.startswith("decoder."):
            continue
        k = k.replace("blocks", "layers").replace("ffn.", "feed_forward.")
        k = k.replace("self_attn.", "attention.").replace(
            "attn.", "attention.")
        k = k.replace("time_mixer.", "")
        k = k.replace("_lora.lora.0.weight", "1.weight_pretransposed")
        k = k.replace("_lora.lora.2.weight", "2.weight_pretransposed")
        k = k.replace("_lora.lora.2.bias", "0.weight")
        k = k.replace("feed_forward_norm", "ln2").replace("g_norm", "ln_x")
        uni[k] = v
    sd = uni
    a = arch
    E = int(c.hidden_size)
    L = int(c.num_hidden_layers)
    D = int(getattr(c, "head_size", 0) or getattr(c, "head_dim", 64))
    eps = float(getattr(c, "layer_norm_epsilon", 0)
                or getattr(c, "norm_eps", 0)
                or getattr(c, "rms_norm_eps", 1e-5))
    FF = int(getattr(c, "intermediate_size", None) or E * 4)
    rd, ri, rv, rg = ((64, 64, 32, 128) if hybrid
                      else _rwkv7_lora_ranks(c, E))
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=1 << 20, E=E, L=L, FF=FF, H=0, KV=0, eps=eps,
             V=int(c.vocab_size))
    w.add_kv(f"{a}.wkv.head_size", D)
    w.add_kv(f"{a}.attention.decay_lora_rank", rd)
    w.add_kv(f"{a}.attention.iclr_lora_rank", ri)
    w.add_kv(f"{a}.attention.value_residual_mix_lora_rank", rv)
    w.add_kv(f"{a}.attention.gate_lora_rank", rg)
    if hybrid:
        w.add_kv(f"{a}.token_shift_count", 1)
    put = _rwkv_put(w, out_type)

    gate = any("attention.g1" in k or "attention.x_g" in k for k in sd)
    lerp = ["r", "w", "k", "v", "a"] + (["g"] if gate else [])

    if hybrid:
        put("token_embd.weight", sd["model.embed_tokens.weight"], q=True)
        put("output_norm.weight", sd["model.norm.weight"])
        put("output.weight",
            sd.get("lm_head.weight", sd["model.embed_tokens.weight"]),
            q=True)
    else:
        put("token_embd.weight", sd["model.embeddings.weight"], q=True)
        for nm in ("model.layers.0.pre_ln", "model.pre_ln",
                   "model.layers.0.pre_norm"):
            if nm + ".weight" in sd:
                put("token_embd_norm.weight", sd[nm + ".weight"])
                put("token_embd_norm.bias", sd[nm + ".bias"])
                break
        put("output_norm.weight", sd["model.ln_out.weight"])
        put("output_norm.bias", sd["model.ln_out.bias"])
        put("output.weight", sd["head.weight"], q=True)

    def tr(key):
        # fla lora layers come pre-transposed; plain params need .T
        if key + "_pretransposed" in sd:
            return sd[key + "_pretransposed"]
        return sd[key].T

    for il in range(L):
        h = f"model.layers.{il}."
        b = f"blk.{il}."
        at = h + "attention."
        if hybrid:
            put(b + "attn_norm.weight", sd[h + "input_layernorm.weight"])
            put(b + "ffn_norm.weight",
                sd[h + "post_attention_layernorm.weight"])
        else:
            put(b + "attn_norm.weight", sd[h + "ln1.weight"])
            put(b + "attn_norm.bias", sd[h + "ln1.bias"])
            put(b + "attn_norm_2.weight", sd[h + "ln2.weight"])
            put(b + "attn_norm_2.bias", sd[h + "ln2.bias"])
        if at + "x_x" in sd:  # already concatenated
            put(b + "time_mix_lerp_fused.weight",
                sd[at + "x_x"].reshape(len(lerp), 1, 1, E))
        else:
            put(b + "time_mix_lerp_fused.weight",
                np.stack([sd[at + f"x_{i}"].squeeze() for i in lerp])
                [:, None, None, :])
        put(b + "time_mix_w0.weight", sd[at + "w0"].squeeze())
        put(b + "time_mix_w1.weight", tr(at + "w1"))
        put(b + "time_mix_w2.weight", tr(at + "w2"))
        put(b + "time_mix_a0.weight", sd[at + "a0"].squeeze())
        put(b + "time_mix_a1.weight", tr(at + "a1"))
        put(b + "time_mix_a2.weight", tr(at + "a2"))
        if il == 0:
            # dummy v0/v1/v2 on the first layer: the reference copies the
            # a-lora (unused at runtime; v_first short-circuits)
            put(b + "time_mix_v0.weight", sd[at + "a0"].squeeze())
            put(b + "time_mix_v1.weight", tr(at + "a1"))
            put(b + "time_mix_v2.weight", tr(at + "a2"))
        else:
            put(b + "time_mix_v0.weight", sd[at + "v0"].squeeze())
            put(b + "time_mix_v1.weight", tr(at + "v1"))
            put(b + "time_mix_v2.weight", tr(at + "v2"))
        if gate:
            put(b + "time_mix_g1.weight", tr(at + "g1"))
            put(b + "time_mix_g2.weight", tr(at + "g2"))
        put(b + "time_mix_k_k.weight", sd[at + "k_k"].squeeze())
        put(b + "time_mix_k_a.weight", sd[at + "k_a"].squeeze())
        put(b + "time_mix_r_k.weight", sd[at + "r_k"].reshape(-1))
        for hf, gg in (("key", "key"), ("k_proj", "key"),
                       ("value", "value"), ("v_proj", "value"),
                       ("receptance", "receptance"),
                       ("r_proj", "receptance"), ("q_proj", "receptance"),
                       ("output", "output"), ("o_proj", "output")):
            if at + hf + ".weight" in sd:
                put(b + f"time_mix_{gg}.weight", sd[at + hf + ".weight"],
                    q=True)
        put(b + "time_mix_ln.weight", sd[at + "ln_x.weight"])
        if at + "ln_x.bias" in sd:
            put(b + "time_mix_ln.bias", sd[at + "ln_x.bias"])
        ffp = h + "feed_forward."
        if hybrid:  # qwen2-style gated FFN
            for nm in ("gate", "up", "down"):
                put(b + f"ffn_{nm}.weight", sd[h + f"mlp.{nm}_proj.weight"],
                    q=True)
        else:
            put(b + "channel_mix_lerp_k.weight", sd[ffp + "x_k"].squeeze())
            put(b + "channel_mix_key.weight", sd[ffp + "key.weight"], q=True)
            put(b + "channel_mix_value.weight", sd[ffp + "value.weight"],
                q=True)
    _finish(w, vocab)
    return path


def convert_hf_llama4(model, path, out_type=GGMLType.F32, vocab=None):
    """Llama4ForCausalLM / ForConditionalGeneration text tower -> llama4:
    intermediate_size_mlp as the dense ff, fused experts.gate_up_proj
    split with the [NE, E, 2F] transpose, shared expert, interleaved MoE
    step, NO qk permute (reference Llama4Model: undo_permute = False)."""
    c = model.config
    if hasattr(c, "text_config"):
        c = c.text_config
    sd = _sd(model)
    if any(k.startswith("language_model.") for k in sd):
        sd = {k[len("language_model."):]: v for k, v in sd.items()
              if k.startswith("language_model.")}
    a = "llama4"
    E = int(c.hidden_size)
    H = int(c.num_attention_heads)
    kv = int(c.num_key_value_heads)
    hd = int(getattr(c, "head_dim", 0) or E // H)
    L = int(c.num_hidden_layers)
    NE = int(c.num_local_experts)
    step = int(getattr(c, "interleave_moe_layer_step", 1) or 1)
    ff_moe = int(c.intermediate_size)
    ff_dense = int(getattr(c, "intermediate_size_mlp", ff_moe))
    w = GGUFWriter(path, arch=a)
    _base_kv(w, a, ctx=getattr(c, "max_position_embeddings", 8192), E=E,
             L=L, FF=ff_dense, H=H, KV=kv,
             eps=getattr(c, "rms_norm_eps", 1e-5), V=int(c.vocab_size),
             rot=hd, freq=getattr(c, "rope_theta", 500000.0))
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), hd)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), hd)
    w.add_kv(f"{a}.interleave_moe_layer_step", step)
    w.add_kv(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH.format(arch=a), ff_moe)
    w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), NE)
    w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a),
             int(getattr(c, "num_experts_per_tok", 1)))
    w.add_kv(Keys.Attention.SLIDING_WINDOW.format(arch=a),
             int(getattr(c, "attention_chunk_size", 8192)))
    w.add_kv(f"{a}.attn_temperature_floor_scale",
             int(getattr(c, "floor_scale", 8192)))

    def put(n, arr, q=True):
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        w.add_tensor(n, arr,
                     ggml_type=out_type if (q and arr.ndim == 2)
                     else GGMLType.F32)

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    put("output_norm.weight", sd["model.norm.weight"], q=False)
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"])
    for il in range(L):
        h = f"model.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[h + "input_layernorm.weight"], q=False)
        put(b + "ffn_norm.weight",
            sd[h + "post_attention_layernorm.weight"], q=False)
        for nm in ("q", "k", "v", "o"):
            gg = "attn_output" if nm == "o" else f"attn_{nm}"
            put(b + gg + ".weight", sd[h + f"self_attn.{nm}_proj.weight"])
        fp = h + "feed_forward."
        if fp + "router.weight" in sd:  # MoE layer
            put(b + "ffn_gate_inp.weight", sd[fp + "router.weight"])
            gu = np.asarray(sd[fp + "experts.gate_up_proj"], np.float32)
            gu = gu.swapaxes(-1, -2)  # [NE, 2F, E]
            F = gu.shape[1] // 2
            w.add_tensor(b + "ffn_gate_exps.weight",
                         np.ascontiguousarray(gu[:, :F]),
                         ggml_type=GGMLType.F32)
            w.add_tensor(b + "ffn_up_exps.weight",
                         np.ascontiguousarray(gu[:, F:]),
                         ggml_type=GGMLType.F32)
            dn = np.asarray(sd[fp + "experts.down_proj"], np.float32)
            w.add_tensor(b + "ffn_down_exps.weight",
                         np.ascontiguousarray(dn.swapaxes(-1, -2)),
                         ggml_type=GGMLType.F32)
            for nm in ("gate", "up", "down"):
                put(b + f"ffn_{nm}_shexp.weight",
                    sd[fp + f"shared_expert.{nm}_proj.weight"])
        else:  # dense layer
            for nm in ("gate", "up", "down"):
                key = fp + f"{nm}_proj.weight"
                if key not in sd:
                    key = fp + f"mlp.{nm}_proj.weight"
                put(b + f"ffn_{nm}.weight", sd[key])
    _finish(w, vocab)
    return path


def convert_hf_wavtokenizer(model, path, out_type=GGMLType.F32, vocab=None):
    """WavTokenizerDec -> wavtokenizer-dec GGUF: codebook embed (vq
    bookkeeping skipped), backbone.embed conv1d, posnet resnet/attn/norm
    blocks by tensor presence, convnext stack, head.out ISTFT head
    (reference WavTokenizerDecModel + tensor_mapping wavtokenizer rows)."""
    c = model.config
    sd = _sd(model)
    a = "wavtokenizer-dec"
    codebook = None
    for k in sd:
        if k.endswith("_codebook.embed") or k.endswith("codebook.embed"):
            codebook = sd[k]
            break
    if codebook is None:
        raise ValueError("no codebook.embed tensor in the state dict")
    V, feat = codebook.shape
    cn_embd = int(getattr(c, "hidden_size", 0)
                  or sd["backbone.final_layer_norm.weight"].shape[0])
    pos_embd = int(sd["backbone.embed.weight"].shape[0])
    n_posnet = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("backbone.posnet."))
    n_convnext = 1 + max(int(k.split(".")[2]) for k in sd
                         if k.startswith("backbone.convnext."))
    w = GGUFWriter(path, arch=a)
    w.add_kv(f"{a}.context_length", 8192)
    w.add_kv(f"{a}.embedding_length", cn_embd)
    w.add_kv(f"{a}.block_count", 0)
    w.add_kv(f"{a}.feed_forward_length", int(getattr(c, "n_ff", 0) or 0))
    w.add_kv(f"{a}.attention.head_count", 1)
    w.add_kv(f"{a}.features_length", feat)
    w.add_kv(f"{a}.posnet.embedding_length", pos_embd)
    w.add_kv(f"{a}.posnet.block_count", n_posnet)
    w.add_kv(f"{a}.convnext.embedding_length", cn_embd)
    w.add_kv(f"{a}.convnext.block_count", n_convnext)
    w.add_kv(f"{a}.attention.layer_norm_epsilon",
             float(getattr(c, "layer_norm_epsilon", 1e-6)))
    w.add_kv(f"{a}.attention.group_norm_epsilon",
             float(getattr(c, "group_norm_epsilon", 1e-6)))
    w.add_kv(f"{a}.attention.group_norm_groups",
             int(getattr(c, "group_norm_groups", 32)))
    w.add_kv(f"{a}.vocab_size", V)

    def put(n, arr):
        w.add_tensor(n, np.ascontiguousarray(np.asarray(arr, np.float32)),
                     ggml_type=GGMLType.F32)

    put("token_embd.weight", codebook)
    put("conv1d.weight", sd["backbone.embed.weight"])
    put("conv1d.bias", sd["backbone.embed.bias"])
    put("token_embd_norm.weight", sd["backbone.norm.weight"])
    put("token_embd_norm.bias", sd["backbone.norm.bias"])
    put("output_norm.weight", sd["backbone.final_layer_norm.weight"])
    put("output_norm.bias", sd["backbone.final_layer_norm.bias"])
    put("output.weight", sd["head.out.weight"])
    if "head.out.bias" in sd:
        put("output.bias", sd["head.out.bias"])
    for il in range(n_posnet):
        h = f"backbone.posnet.{il}."
        b = f"posnet.{il}."
        if h + "q.weight" in sd:  # attention block
            put(b + "attn_norm.weight", sd[h + "norm.weight"])
            put(b + "attn_norm.bias", sd[h + "norm.bias"])
            for hf, gg in (("q", "attn_q"), ("k", "attn_k"),
                           ("v", "attn_v"), ("proj_out", "attn_output")):
                put(b + gg + ".weight", sd[h + hf + ".weight"])
                put(b + gg + ".bias", sd[h + hf + ".bias"])
        elif h + "conv1.weight" in sd:  # resnet block
            for nm in ("norm1", "norm2", "conv1", "conv2"):
                put(b + nm + ".weight", sd[h + nm + ".weight"])
                put(b + nm + ".bias", sd[h + nm + ".bias"])
        else:  # final group norm
            put(b + "norm.weight", sd[h + "norm.weight"])
            put(b + "norm.bias", sd[h + "norm.bias"])
    for il in range(n_convnext):
        h = f"backbone.convnext.{il}."
        b = f"convnext.{il}."
        for hf, gg in (("dwconv", "dw"), ("norm", "norm"),
                       ("pwconv1", "pw1"), ("pwconv2", "pw2")):
            put(b + gg + ".weight", sd[h + hf + ".weight"])
            put(b + gg + ".bias", sd[h + hf + ".bias"])
        put(b + "gamma.weight", sd[h + "gamma"])
    _finish(w, vocab)
    return path
