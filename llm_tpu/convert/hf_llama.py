"""HF transformers -> GGUF converter (llama-family).

Parity target: convert_hf_to_gguf.py's LlamaModel path (QK weight
permutation for NORM-style RoPE, tensor-name mapping, metadata keys). This
is an independent implementation against the GGUF spec; it accepts an
in-memory transformers model (state_dict) so it also works offline.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half layout -> GGUF NORM (interleaved-pair) layout."""
    out_dim = w.shape[0]
    head_dim = out_dim // n_head
    return (
        w.reshape(n_head, 2, head_dim // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


# NORM-rope archs whose HF weights use rotate-half layout store permuted
# q/k (reference LlamaModel/GraniteModel/MiniCPMModel/DeepseekModel/
# BailingMoeModel/ArcticModel converters all permute); glm4 / cohere /
# ernie apply interleaved rotary natively — no permute. Shared with the
# PEFT LoRA importer (q/k lora_b rows ride the same permute).
PERMUTED_QK_ARCHS = ("llama", "mixtral", "olmo", "arcee", "chameleon",
                     "granite", "granitemoe", "minicpm", "deepseek",
                     "bailingmoe", "arctic", "deci")


# gemma2-style layer naming (pre/post norms around both blocks)
_HF_GEMMA2_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "attn_post_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "ffn_post_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

_HF_PHI3_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attn.qkv_proj.weight": "attn_qkv.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

_HF_OLMO2_MAP = {
    # olmo2 is post-norm: norms apply AFTER attn/mlp, before the residual
    "post_attention_layernorm.weight": "attn_post_norm.weight",
    "post_feedforward_layernorm.weight": "ffn_post_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

_HF_STARCODER2_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.bias": "attn_output.bias",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
}

# glm4 "sandwich" norms: post_self_attn -> attn_post_norm (after attention,
# before residual); post_attention -> ffn_norm (pre-MLP); post_mlp ->
# ffn_post_norm; fused gate_up lands in ffn_up (llm_build_glm4 layout)
_HF_GLM4_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_self_attn_layernorm.weight": "attn_post_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_mlp_layernorm.weight": "ffn_post_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

# gemma3n layer naming (Gemma3nTextDecoderLayer; reference Gemma3NModel
# converter tensor map)
_HF_GEMMA3N_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "attn_post_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "ffn_post_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "altup.correct_output_scale": "altup_correct_scale.weight",
    "altup.correction_coefs.weight": "altup_correct_coef.weight",
    "altup.prediction_coefs.weight": "altup_predict_coef.weight",
    "altup.modality_router.weight": "altup_router.weight",
    "altup.router_norm.weight": "altup_router_norm.weight",
    "laurel.linear_left.weight": "laurel_l.weight",
    "laurel.linear_right.weight": "laurel_r.weight",
    "laurel.post_laurel_norm.weight": "laurel_post_norm.weight",
    "per_layer_input_gate.weight": "per_layer_inp_gate.weight",
    "per_layer_projection.weight": "per_layer_proj.weight",
    "post_per_layer_input_norm.weight": "per_layer_post_norm.weight",
}

_HF_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "self_attn.attn_sub_norm.weight": "attn_sub_norm.weight",
    "mlp.ffn_sub_norm.weight": "ffn_sub_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


def convert_hf_llama(
    model,
    path: str,
    arch: str = "llama",
    out_type: GGMLType = GGMLType.F32,
    vocab: dict | None = None,
):
    """Write a transformers *LlamaForCausalLM-style* model to GGUF.

    `vocab`: optional dict with tokenizer metadata (tokens, scores, types,
    merges, special ids) to embed; tests pass None and read logits only.
    """
    hf_cfg = model.config
    if hasattr(hf_cfg, "thinker_config"):
        # Qwen2.5-Omni: the LM lives under thinker_config.text_config and
        # the weights under thinker.* (reference Qwen2VLModel registration
        # of Qwen2_5OmniModel, convert_hf_to_gguf.py:2792-2826)
        hf_cfg = hf_cfg.thinker_config
    composite = hasattr(hf_cfg, "text_config") and hasattr(
        getattr(hf_cfg, "text_config"), "num_hidden_layers")
    if arch in ("qwen2vl", "gemma3n") or composite:
        # composite VL config: the LM hparams live in text_config, and the
        # decoder weights under model.language_model.* / model.text_model.*
        # (reference Qwen2VLModel / Mistral3 / SmolVLM converters export the
        # text model)
        hf_cfg = getattr(hf_cfg, "text_config", hf_cfg)
    if arch == "dbrx":  # nested DbrxConfig sections -> flat attributes
        hf_cfg.intermediate_size = hf_cfg.ffn_config.ffn_hidden_size
        hf_cfg.rope_theta = hf_cfg.attn_config.rope_theta
        hf_cfg.num_key_value_heads = hf_cfg.attn_config.kv_n_heads
        hf_cfg.num_experts = hf_cfg.ffn_config.moe_num_experts
        hf_cfg.num_experts_per_tok = hf_cfg.ffn_config.moe_top_k
    n_head = hf_cfg.num_attention_heads
    n_kv = getattr(hf_cfg, "num_key_value_heads", n_head)
    head_dim = getattr(hf_cfg, "head_dim", None) or hf_cfg.hidden_size // n_head

    is_gemma2 = arch in ("gemma", "gemma2", "gemma3")  # gemma stores (1+w) norms
    layer_map = _HF_LAYER_MAP
    if arch == "gemma3":
        layer_map = dict(_HF_GEMMA2_MAP)
        layer_map["self_attn.q_norm.weight"] = "attn_q_norm.weight"
        layer_map["self_attn.k_norm.weight"] = "attn_k_norm.weight"
    elif arch == "gemma2":
        layer_map = _HF_GEMMA2_MAP
    elif arch == "phi3":
        layer_map = _HF_PHI3_MAP
    elif arch == "olmo2":
        layer_map = _HF_OLMO2_MAP
    elif arch == "starcoder2":
        layer_map = _HF_STARCODER2_MAP
    elif arch in ("glm4", "chatglm"):
        layer_map = _HF_GLM4_MAP
    elif arch == "chameleon":
        layer_map = dict(_HF_LAYER_MAP)
        layer_map["self_attn.q_norm.bias"] = "attn_q_norm.bias"
        layer_map["self_attn.k_norm.bias"] = "attn_k_norm.bias"
    elif arch == "gemma3n":
        layer_map = _HF_GEMMA3N_MAP
    elif arch == "arctic":
        # parallel-residual MoE: post_attention_layernorm feeds the MoE
        # branch (ffn_norm_exps) while residual_layernorm/residual_mlp is
        # the dense FFN (reference ArcticModel arch_block_mappings_cfg)
        layer_map = dict(_HF_LAYER_MAP)
        layer_map["post_attention_layernorm.weight"] = "ffn_norm_exps.weight"
        layer_map["residual_layernorm.weight"] = "ffn_norm.weight"
        layer_map["residual_mlp.w1.weight"] = "ffn_gate.weight"
        layer_map["residual_mlp.w3.weight"] = "ffn_up.weight"
        layer_map["residual_mlp.w2.weight"] = "ffn_down.weight"

    w = GGUFWriter(path, arch=arch)
    a = arch
    w.add_kv(Keys.General.NAME, getattr(hf_cfg, "name_or_path", "hf-model") or "hf-model")
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.max_position_embeddings))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.hidden_size))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    _ff = hf_cfg.intermediate_size
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a),
             [int(v) for v in _ff] if isinstance(_ff, (list, tuple))
             else int(_ff))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(n_head))
    kv_per_layer = getattr(hf_cfg, "num_key_value_heads_per_layer", None)
    if arch == "deci" and kv_per_layer is not None:
        # DeciLM variable GQA: per-layer kv-head array (reference DeciModel)
        w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a),
                 [int(v) for v in kv_per_layer])
    else:
        w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), int(n_kv))
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), int(head_dim))
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), int(head_dim))
    eps = getattr(hf_cfg, "rms_norm_eps", None)
    if eps is None:
        eps = getattr(hf_cfg, "layer_norm_eps", None) or getattr(
            hf_cfg, "norm_epsilon", None) or getattr(
            hf_cfg, "norm_eps", None) or getattr(
            hf_cfg, "layer_norm_epsilon", 1e-5)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), float(eps))
    w.add_kv(Keys.Rope.FREQ_BASE.format(arch=a), float(getattr(hf_cfg, "rope_theta", 10000.0)))
    rot_pct = float(getattr(hf_cfg, "partial_rotary_factor",
                            getattr(hf_cfg, "rotary_pct", 1.0)) or 1.0)
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), int(head_dim * rot_pct))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if arch == "gemma2":
        w.add_kv("gemma2.attn_logit_softcapping",
                 float(getattr(hf_cfg, "attn_logit_softcapping", 50.0)))
        w.add_kv("gemma2.final_logit_softcapping",
                 float(getattr(hf_cfg, "final_logit_softcapping", 30.0)))
        w.add_kv(Keys.Attention.SLIDING_WINDOW.format(arch=a),
                 int(getattr(hf_cfg, "sliding_window", 4096)))
        qpas = float(getattr(hf_cfg, "query_pre_attn_scalar", head_dim))
        w.add_kv(Keys.Attention.SCALE.format(arch=a), qpas ** -0.5)

    if arch == "gemma3":
        w.add_kv(Keys.Attention.SLIDING_WINDOW.format(arch=a),
                 int(getattr(hf_cfg, "sliding_window", 1024)))
        qpas = float(getattr(hf_cfg, "query_pre_attn_scalar", 256))
        w.add_kv(Keys.Attention.SCALE.format(arch=a), qpas ** -0.5)
    if arch == "dots1":
        w.add_kv("dots1.expert_gating_func", 2)
        w.add_kv("dots1.expert_weights_scale",
                 float(getattr(hf_cfg, "routed_scaling_factor", 1.0)))
        w.add_kv("dots1.expert_weights_norm",
                 bool(getattr(hf_cfg, "norm_topk_prob", True)))
        w.add_kv("dots1.expert_feed_forward_length",
                 int(getattr(hf_cfg, "moe_intermediate_size", 0)))
        w.add_kv("dots1.leading_dense_block_count",
                 int(getattr(hf_cfg, "first_k_dense_replace", 0)))
    if arch in ("granite", "granitemoe"):
        w.add_kv(f"{a}.embedding_scale", float(hf_cfg.embedding_multiplier))
        w.add_kv(f"{a}.residual_scale", float(hf_cfg.residual_multiplier))
        w.add_kv(f"{a}.logit_scale", float(hf_cfg.logits_scaling))
        w.add_kv(Keys.Attention.SCALE.format(arch=a),
                 float(hf_cfg.attention_multiplier))
        sff = getattr(hf_cfg, "shared_intermediate_size", None)
        if sff:  # granitemoeshared (reference set_gguf_parameters)
            w.add_kv(f"{a}.expert_shared_feed_forward_length", int(sff))
    if arch == "chameleon":
        # reference ChameleonModel converter records swin_norm; qk-norms
        # are written per-head below (llama.cpp stores {head_dim, n_head})
        w.add_kv(f"{a}.swin_norm", bool(getattr(hf_cfg, "swin_norm", False)))
    if arch == "gemma3n":
        # reference Gemma3NModel.set_gguf_parameters
        import math

        w.add_kv(f"{a}.altup.num_inputs", int(hf_cfg.altup_num_inputs))
        w.add_kv(f"{a}.altup.active_idx", int(hf_cfg.altup_active_idx))
        w.add_kv(f"{a}.embedding_length_per_layer_input",
                 int(hf_cfg.hidden_size_per_layer_input))
        w.add_kv(f"{a}.attention.shared_kv_layers",
                 int(hf_cfg.num_kv_shared_layers))
        w.add_kv(Keys.Attention.SLIDING_WINDOW.format(arch=a),
                 int(hf_cfg.sliding_window))
        w.add_kv(f"{a}.final_logit_softcapping",
                 float(getattr(hf_cfg, "final_logit_softcapping", 30.0)))
        # std multipliers: normal icdf of each layer's target sparsity
        import torch as _t

        nd = _t.distributions.normal.Normal(0, 1)
        w.add_kv(f"{a}.activation_sparsity_scale", [
            float(nd.icdf(_t.tensor(float(s))).item()) if s > 0 else 0.0
            for s in hf_cfg.activation_sparsity_pattern
        ])
        w.add_kv(f"{a}.attention.sliding_window_pattern",
                 [t == "sliding_attention" for t in hf_cfg.layer_types])
    if arch == "qwen2vl":
        sect = (getattr(hf_cfg, "rope_scaling", None) or {}).get(
            "mrope_section", [16, 24, 24])
        w.add_kv(f"{a}.rope.dimension_sections",
                 [int(s) for s in sect] + [0] * (4 - len(sect)))
    if arch == "phi3":
        # longrope: factor pair + attn scaling (reference Phi3MiniModel
        # converter: rope_factors_long/short tensors,
        # attn_factor = sqrt(1 + log(scale)/log(orig_ctx)))
        rs = getattr(hf_cfg, "rope_scaling", None) or {}
        if rs.get("type", rs.get("rope_type")) == "longrope":
            import math

            orig = int(getattr(hf_cfg, "original_max_position_embeddings",
                               hf_cfg.max_position_embeddings))
            scale = hf_cfg.max_position_embeddings / orig
            attn_f = (math.sqrt(1.0 + math.log(scale) / math.log(orig))
                      if scale > 1.0 else 1.0)
            w.add_kv(Keys.Rope.SCALING_ORIG_CTX.format(arch=a), orig)
            w.add_kv(Keys.Rope.SCALING_ATTN_FACTOR.format(arch=a),
                     float(attn_f))
            w.add_tensor("rope_factors_long.weight",
                         np.asarray(rs["long_factor"], np.float32))
            w.add_tensor("rope_factors_short.weight",
                         np.asarray(rs["short_factor"], np.float32))
    if arch in ("command-r", "cohere", "cohere2"):
        w.add_kv(f"{a}.logit_scale", float(getattr(hf_cfg, "logit_scale", 1.0)))
    if arch == "cohere2":
        w.add_kv(Keys.Attention.SLIDING_WINDOW.format(arch=a),
                 int(getattr(hf_cfg, "sliding_window", 4096)))

    n_expert = int(getattr(hf_cfg, "num_local_experts", 0)
                   or getattr(hf_cfg, "num_experts", 0)
                   or getattr(hf_cfg, "n_routed_experts", 0) or 0)
    if n_expert:
        w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), n_expert)
        w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a),
                 int(getattr(hf_cfg, "num_experts_per_tok", 2)))
    if arch in ("deepseek", "bailingmoe"):
        # deepseek v1-style MoE hparams (reference DeepseekModel/
        # BailingMoeModel set_gguf_parameters)
        w.add_kv(f"{a}.leading_dense_block_count",
                 int(getattr(hf_cfg, "first_k_dense_replace", 0)))
        if getattr(hf_cfg, "moe_intermediate_size", None):
            w.add_kv(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH.format(arch=a),
                     int(hf_cfg.moe_intermediate_size))
        w.add_kv(f"{a}.expert_shared_count",
                 int(getattr(hf_cfg, "n_shared_experts", 0)
                     or getattr(hf_cfg, "num_shared_experts", 0) or 0))
        w.add_kv(f"{a}.expert_weights_scale",
                 float(getattr(hf_cfg, "routed_scaling_factor", 1.0)))
        if getattr(hf_cfg, "norm_topk_prob", None) is not None:
            w.add_kv(f"{a}.expert_weights_norm", bool(hf_cfg.norm_topk_prob))

    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    if arch == "qwen2vl" or composite:
        # strip the text-tower prefix (both the nested "model.language_model."
        # and the top-level "language_model.model." layouts); drop
        # vision/audio/projector towers
        _tower = ("visual.", "vision_tower.", "vision_model.",
                  "multi_modal_projector.", "connector.", "audio_tower.",
                  "talker.", "token2wav.")
        sd = {k.removeprefix("thinker.")
               .replace("model.language_model.", "model.")
               .replace("language_model.model.", "model.")
               .replace("language_model.lm_head.", "lm_head.")
               .replace("model.text_model.", "model."): v
              for k, v in sd.items()
              if not any(("." + t) in k or k.startswith(t)
                         or k.startswith("thinker." + t) for t in _tower)}
    if arch == "dbrx":
        # rename dbrx's transformer.blocks.* scheme onto the llama-ish one
        # (fused Wqkv -> attn_qkv via the phi3-style map entry)
        sd = {
            k.replace("transformer.wte.", "model.embed_tokens.")
             .replace("transformer.norm_f.", "model.norm.")
             .replace("transformer.blocks.", "model.layers.")
             .replace(".norm_attn_norm.norm_1.", ".input_layernorm.")
             .replace(".norm_attn_norm.norm_2.", ".post_attention_layernorm.")
             .replace(".norm_attn_norm.attn.Wqkv.", ".self_attn.qkv_proj.")
             .replace(".norm_attn_norm.attn.out_proj.", ".self_attn.o_proj."): v
            for k, v in sd.items()
        }
        layer_map = dict(_HF_LAYER_MAP)
        layer_map["self_attn.qkv_proj.weight"] = "attn_qkv.weight"

    def put(name: str, arr: np.ndarray):
        if is_gemma2 and ("norm" in name):
            arr = arr + 1.0  # gemma stores (1 + w) on disk
        elif arch == "nemotron" and "norm" in name and name.endswith(".weight"):
            arr = arr + 1.0  # layernorm1p folded into the stored weight
        w.add_tensor(name, arr, ggml_type=out_type if arr.ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    if "model.norm.weight" in sd:
        put("output_norm.weight", sd["model.norm.weight"])
    if "model.norm.bias" in sd:
        put("output_norm.bias", sd["model.norm.bias"])
    if "lm_head.weight" in sd and not getattr(hf_cfg, "tie_word_embeddings", False):
        put("output.weight", sd["lm_head.weight"])

    permute = arch in PERMUTED_QK_ARCHS
    for il in range(hf_cfg.num_hidden_layers):
        pre = f"model.layers.{il}."
        il_kv = int(kv_per_layer[il]) if (
            arch == "deci" and kv_per_layer is not None) else n_kv
        for hf_suffix, gg_suffix in layer_map.items():
            key = pre + hf_suffix
            if key not in sd:
                continue
            arr = sd[key]
            if permute and hf_suffix == "self_attn.q_proj.weight":
                arr = permute_qk(arr, n_head)
            elif permute and hf_suffix == "self_attn.k_proj.weight":
                arr = permute_qk(arr, il_kv)
            elif permute and hf_suffix == "self_attn.q_proj.bias":
                arr = permute_qk(arr, n_head)
            elif permute and hf_suffix == "self_attn.k_proj.bias":
                arr = permute_qk(arr, il_kv)
            elif arch == "chameleon" and hf_suffix.startswith(
                    ("self_attn.q_norm.", "self_attn.k_norm.")):
                # HF stores per-head (n_head, head_dim) qk-norm affines;
                # they ride the same within-head interleave permute as the
                # projections (reference ChameleonModel converter)
                reps = n_head if ".q_norm." in hf_suffix else n_kv
                arr = permute_qk(arr.reshape(-1), reps).reshape(reps, -1)
            put(f"blk.{il}.{gg_suffix}", arr)

        # MoE (qwen2moe/deepseek-v1-style): router + experts + shared expert
        q2_gate = pre + "mlp.gate.weight"
        if q2_gate in sd and arch != "dots1" \
                and pre + "mlp.experts.0.gate_proj.weight" in sd:
            put(f"blk.{il}.ffn_gate_inp.weight", sd[q2_gate])
            n_exp = int(getattr(hf_cfg, "num_experts", 0)
                        or getattr(hf_cfg, "n_routed_experts", 0))
            for hf_w, gg in (("gate_proj", "ffn_gate_exps"),
                             ("up_proj", "ffn_up_exps"),
                             ("down_proj", "ffn_down_exps")):
                stack = np.stack([
                    sd[f"{pre}mlp.experts.{e}.{hf_w}.weight"]
                    for e in range(n_exp)
                ])
                w.add_tensor(f"blk.{il}.{gg}.weight", stack,
                             ggml_type=GGMLType.F32)
            if pre + "mlp.shared_expert.gate_proj.weight" in sd:  # qwen2moe
                put(f"blk.{il}.ffn_gate_shexp.weight",
                    sd[pre + "mlp.shared_expert.gate_proj.weight"])
                put(f"blk.{il}.ffn_up_shexp.weight",
                    sd[pre + "mlp.shared_expert.up_proj.weight"])
                put(f"blk.{il}.ffn_down_shexp.weight",
                    sd[pre + "mlp.shared_expert.down_proj.weight"])
                put(f"blk.{il}.ffn_gate_inp_shexp.weight",
                    sd[pre + "mlp.shared_expert_gate.weight"])
            elif pre + "mlp.shared_experts.gate_proj.weight" in sd:
                # deepseek v1 / bailingmoe: ungated shared experts
                put(f"blk.{il}.ffn_gate_shexp.weight",
                    sd[pre + "mlp.shared_experts.gate_proj.weight"])
                put(f"blk.{il}.ffn_up_shexp.weight",
                    sd[pre + "mlp.shared_experts.up_proj.weight"])
                put(f"blk.{il}.ffn_down_shexp.weight",
                    sd[pre + "mlp.shared_experts.down_proj.weight"])

        # MoE (dbrx): flat expert params w1(gate)/v1(up)/w2(down, transposed)
        dbrx_w1 = pre + "ffn.experts.mlp.w1"
        if dbrx_w1 in sd:
            n_exp = int(hf_cfg.num_experts)
            ff = int(hf_cfg.intermediate_size)
            d = int(hf_cfg.hidden_size)
            put(f"blk.{il}.ffn_gate_inp.weight",
                sd[pre + "ffn.router.layer.weight"])
            w.add_tensor(f"blk.{il}.ffn_gate_exps.weight",
                         sd[dbrx_w1].reshape(n_exp, ff, d),
                         ggml_type=GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_up_exps.weight",
                         sd[pre + "ffn.experts.mlp.v1"].reshape(n_exp, ff, d),
                         ggml_type=GGMLType.F32)
            w.add_tensor(
                f"blk.{il}.ffn_down_exps.weight",
                np.ascontiguousarray(
                    sd[pre + "ffn.experts.mlp.w2"].reshape(n_exp, ff, d)
                    .transpose(0, 2, 1)),
                ggml_type=GGMLType.F32)

        # MoE (granitemoe): fused input_linear [E, 2ff, d] -> gate/up stacks
        gm_router = pre + "block_sparse_moe.router.layer.weight"
        if gm_router in sd:
            put(f"blk.{il}.ffn_gate_inp.weight", sd[gm_router])
            lin = sd[pre + "block_sparse_moe.input_linear.weight"]
            ff = lin.shape[-2] // 2
            w.add_tensor(f"blk.{il}.ffn_gate_exps.weight",
                         np.ascontiguousarray(lin[:, :ff]),
                         ggml_type=GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_up_exps.weight",
                         np.ascontiguousarray(lin[:, ff:]),
                         ggml_type=GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_down_exps.weight",
                         sd[pre + "block_sparse_moe.output_linear.weight"],
                         ggml_type=GGMLType.F32)
            # granitemoeshared: fused shared_mlp.input_linear [2*shared_ff, d]
            # splits into gate/up shexp (reference GraniteMoeModel
            # modify_tensors shared_mlp branch)
            sh = pre + "shared_mlp.input_linear.weight"
            if sh in sd:
                lin = sd[sh]
                sff = lin.shape[0] // 2
                put(f"blk.{il}.ffn_gate_shexp.weight",
                    np.ascontiguousarray(lin[:sff]))
                put(f"blk.{il}.ffn_up_shexp.weight",
                    np.ascontiguousarray(lin[sff:]))
                put(f"blk.{il}.ffn_down_shexp.weight",
                    sd[pre + "shared_mlp.output_linear.weight"])

        # MoE (dots1/deepseek-v3-style): mlp.gate + per-expert tensors +
        # selection bias + ungated shared experts
        d1_gate = pre + "mlp.gate.weight"
        if arch == "dots1" and d1_gate in sd \
                and pre + "mlp.experts.0.gate_proj.weight" in sd:
            put(f"blk.{il}.ffn_gate_inp.weight", sd[d1_gate])
            if pre + "mlp.gate.e_score_correction_bias" in sd:
                w.add_tensor(f"blk.{il}.exp_probs_b.bias",
                             sd[pre + "mlp.gate.e_score_correction_bias"],
                             ggml_type=GGMLType.F32)
            n_exp = int(getattr(hf_cfg, "n_routed_experts"))
            for hf_w, gg in (("gate_proj", "ffn_gate_exps"),
                             ("up_proj", "ffn_up_exps"),
                             ("down_proj", "ffn_down_exps")):
                stack = np.stack([
                    sd[f"{pre}mlp.experts.{e}.{hf_w}.weight"]
                    for e in range(n_exp)
                ])
                w.add_tensor(f"blk.{il}.{gg}.weight", stack,
                             ggml_type=GGMLType.F32)
            if pre + "mlp.shared_experts.gate_proj.weight" in sd:
                put(f"blk.{il}.ffn_gate_shexp.weight",
                    sd[pre + "mlp.shared_experts.gate_proj.weight"])
                put(f"blk.{il}.ffn_up_shexp.weight",
                    sd[pre + "mlp.shared_experts.up_proj.weight"])
                put(f"blk.{il}.ffn_down_shexp.weight",
                    sd[pre + "mlp.shared_experts.down_proj.weight"])

        # MoE (mixtral-style): router + stacked expert tensors
        gate_key = pre + "block_sparse_moe.gate.weight"
        if gate_key in sd:
            put(f"blk.{il}.ffn_gate_inp.weight", sd[gate_key])
            for hf_w, gg in (("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                             ("w2", "ffn_down_exps")):
                stack = np.stack([
                    sd[f"{pre}block_sparse_moe.experts.{e}.{hf_w}.weight"]
                    for e in range(n_expert)
                ])  # [n_expert, n_out, K] -> GGUF ne (K, n_out, n_expert)
                w.add_tensor(f"blk.{il}.{gg}.weight", stack,
                             ggml_type=GGMLType.F32)

    if arch == "gemma3n":
        # global altup/per-layer tensors (Gemma3nTextModel attributes)
        put("per_layer_token_embd.weight",
            sd["model.embed_tokens_per_layer.weight"])
        put("per_layer_model_proj.weight",
            sd["model.per_layer_model_projection.weight"])
        put("per_layer_proj_norm.weight",
            sd["model.per_layer_projection_norm.weight"])
        n_alt = int(hf_cfg.altup_num_inputs)
        for hf_base, gg in (("altup_projections", "altup_proj"),
                            ("altup_unembed_projections", "altup_unembd_proj")):
            stack = np.stack([sd[f"model.{hf_base}.{i}.weight"]
                              for i in range(n_alt - 1)])
            w.add_tensor(f"{gg}.weight", stack, ggml_type=GGMLType.F32)

    w.write()
    return path


def convert_hf_mamba(
    model,
    path: str,
    out_type: GGMLType = GGMLType.F32,
    vocab: dict | None = None,
):
    """HF Mamba/FalconMambaForCausalLM -> GGUF (parity: convert_hf_to_gguf.py
    MambaModel: A_log -> -exp(A_log), conv1d weight squeezed, ssm.* keys;
    falcon_mamba adds ssm.dt_b_c_rms)."""
    import numpy as np

    hf_cfg = model.config
    a = "mamba"
    w = GGUFWriter(path, arch=a)
    d_model = int(hf_cfg.hidden_size)
    d_inner = int(getattr(hf_cfg, "intermediate_size", 2 * d_model))
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 1 << 20)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), d_model)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), 0)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), 0)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), 0)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)))
    w.add_kv(Keys.SSM.CONV_KERNEL.format(arch=a), int(hf_cfg.conv_kernel))
    w.add_kv(Keys.SSM.INNER_SIZE.format(arch=a), d_inner)
    w.add_kv(Keys.SSM.STATE_SIZE.format(arch=a), int(hf_cfg.state_size))
    w.add_kv(Keys.SSM.TIME_STEP_RANK.format(arch=a), int(hf_cfg.time_step_rank))
    if getattr(hf_cfg, "model_type", "mamba") == "falcon_mamba":
        # falcon-mamba RMS-normalizes dt/B/C inside the mixer
        w.add_kv(Keys.SSM.DT_B_C_RMS.format(arch=a),
                 bool(getattr(hf_cfg, "mixer_rms_eps", 1e-6) is not None))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def put(name: str, arr, qtype=None):
        w.add_tensor(name, arr, ggml_type=qtype or (out_type if arr.ndim == 2 else GGMLType.F32))

    put("token_embd.weight", sd["backbone.embeddings.weight"])
    put("output_norm.weight", sd["backbone.norm_f.weight"])
    if "lm_head.weight" in sd and not getattr(hf_cfg, "tie_word_embeddings", True):
        put("output.weight", sd["lm_head.weight"])

    for il in range(hf_cfg.num_hidden_layers):
        pre = f"backbone.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[pre + "norm.weight"])
        put(b + "ssm_in.weight", sd[pre + "mixer.in_proj.weight"])
        put(b + "ssm_conv1d.weight", sd[pre + "mixer.conv1d.weight"][:, 0, :],
            qtype=GGMLType.F32)
        put(b + "ssm_conv1d.bias", sd[pre + "mixer.conv1d.bias"])
        put(b + "ssm_x.weight", sd[pre + "mixer.x_proj.weight"])
        put(b + "ssm_dt.weight", sd[pre + "mixer.dt_proj.weight"])
        put(b + "ssm_dt.bias", sd[pre + "mixer.dt_proj.bias"])
        put(b + "ssm_a.weight", -np.exp(sd[pre + "mixer.A_log"]), qtype=GGMLType.F32)
        put(b + "ssm_d.weight", sd[pre + "mixer.D"])
        put(b + "ssm_out.weight", sd[pre + "mixer.out_proj.weight"])

    w.write()
    return path


def convert_hf_mamba2(
    model,
    path: str,
    out_type: GGMLType = GGMLType.F32,
    vocab: dict | None = None,
):
    """HF Mamba2ForCausalLM -> GGUF (parity: convert_hf_to_gguf.py
    Mamba2Model: dt_rank = n_head = d_inner // head_dim, A_log -> -exp,
    conv1d squeezed, ssm_norm reshaped to [n_group, d_inner/n_group])."""
    import numpy as np

    hf_cfg = model.config
    a = "mamba2"
    w = GGUFWriter(path, arch=a)
    d_model = int(hf_cfg.hidden_size)
    d_inner = int(hf_cfg.expand * d_model)
    d_state = int(hf_cfg.state_size)
    head_dim = int(hf_cfg.head_dim)
    n_group = int(hf_cfg.n_groups)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 1 << 20)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), d_model)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), 0)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), 0)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), 0)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)))
    w.add_kv(Keys.SSM.CONV_KERNEL.format(arch=a), int(hf_cfg.conv_kernel))
    w.add_kv(Keys.SSM.INNER_SIZE.format(arch=a), d_inner)
    w.add_kv(Keys.SSM.STATE_SIZE.format(arch=a), d_state)
    w.add_kv(Keys.SSM.TIME_STEP_RANK.format(arch=a), d_inner // head_dim)
    w.add_kv(Keys.SSM.GROUP_COUNT.format(arch=a), n_group)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def put(name: str, arr, qtype=None):
        w.add_tensor(name, arr, ggml_type=qtype or (out_type if arr.ndim == 2 else GGMLType.F32))

    put("token_embd.weight", sd["backbone.embeddings.weight"])
    put("output_norm.weight", sd["backbone.norm_f.weight"])
    if "lm_head.weight" in sd and not getattr(hf_cfg, "tie_word_embeddings", True):
        put("output.weight", sd["lm_head.weight"])

    for il in range(hf_cfg.num_hidden_layers):
        pre = f"backbone.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[pre + "norm.weight"])
        put(b + "ssm_in.weight", sd[pre + "mixer.in_proj.weight"])
        put(b + "ssm_conv1d.weight", sd[pre + "mixer.conv1d.weight"][:, 0, :],
            qtype=GGMLType.F32)
        put(b + "ssm_conv1d.bias", sd[pre + "mixer.conv1d.bias"])
        put(b + "ssm_dt.bias", sd[pre + "mixer.dt_bias"])
        put(b + "ssm_a.weight",
            -np.exp(sd[pre + "mixer.A_log"])[:, None], qtype=GGMLType.F32)
        put(b + "ssm_d.weight", sd[pre + "mixer.D"][:, None],
            qtype=GGMLType.F32)
        put(b + "ssm_norm.weight",
            sd[pre + "mixer.norm.weight"].reshape(n_group, d_inner // n_group),
            qtype=GGMLType.F32)
        put(b + "ssm_out.weight", sd[pre + "mixer.out_proj.weight"])

    w.write()
    return path


def convert_hf_t5(
    model,
    path: str,
    out_type: GGMLType = GGMLType.F32,
    vocab: dict | None = None,
):
    """HF T5/MT5/UMT5ForConditionalGeneration or T5EncoderModel -> GGUF
    (parity: convert_hf_to_gguf.py T5Model/T5EncoderModel; tensor names per
    llama-arch.cpp T5 table: enc.blk.N.* / dec.blk.N.* with attn_o /
    cross_attn_* / attn_rel_b; umt5 writes a rel_b per layer)."""
    import numpy as np

    hf_cfg = model.config
    enc_only = not any(k.startswith("decoder.")
                       for k in model.state_dict().keys())
    a = "t5encoder" if enc_only else "t5"
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 512)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.d_model))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), int(hf_cfg.d_ff))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(hf_cfg.num_heads))
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), int(hf_cfg.num_heads))
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), int(hf_cfg.d_kv))
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), int(hf_cfg.d_kv))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_epsilon))
    w.add_kv(f"{a}.attention.relative_buckets_count",
             int(hf_cfg.relative_attention_num_buckets))
    if not enc_only:
        w.add_kv(f"{a}.decoder_start_token_id",
                 int(hf_cfg.decoder_start_token_id))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def put(name, arr, qtype=None):
        w.add_tensor(name, arr, ggml_type=qtype or (out_type if arr.ndim == 2 else GGMLType.F32))

    put("token_embd.weight", sd["shared.weight"]
        if "shared.weight" in sd else sd["encoder.embed_tokens.weight"])
    put("enc.output_norm.weight", sd["encoder.final_layer_norm.weight"])
    if not enc_only:
        put("dec.output_norm.weight", sd["decoder.final_layer_norm.weight"])
    if "lm_head.weight" in sd and not getattr(hf_cfg, "tie_word_embeddings", True):
        put("output.weight", sd["lm_head.weight"])

    for il in range(hf_cfg.num_layers):
        e = f"encoder.block.{il}."
        b = f"enc.blk.{il}."
        put(b + "attn_q.weight", sd[e + "layer.0.SelfAttention.q.weight"])
        put(b + "attn_k.weight", sd[e + "layer.0.SelfAttention.k.weight"])
        put(b + "attn_v.weight", sd[e + "layer.0.SelfAttention.v.weight"])
        put(b + "attn_o.weight", sd[e + "layer.0.SelfAttention.o.weight"])
        put(b + "attn_norm.weight", sd[e + "layer.0.layer_norm.weight"])
        rk = e + "layer.0.SelfAttention.relative_attention_bias.weight"
        if rk in sd:
            put(b + "attn_rel_b.weight", sd[rk], qtype=GGMLType.F32)
        if e + "layer.1.DenseReluDense.wi.weight" in sd:
            put(b + "ffn_up.weight", sd[e + "layer.1.DenseReluDense.wi.weight"])
        else:  # gated (t5 v1.1): wi_0 = gate, wi_1 = up
            put(b + "ffn_gate.weight", sd[e + "layer.1.DenseReluDense.wi_0.weight"])
            put(b + "ffn_up.weight", sd[e + "layer.1.DenseReluDense.wi_1.weight"])
        put(b + "ffn_down.weight", sd[e + "layer.1.DenseReluDense.wo.weight"])
        put(b + "ffn_norm.weight", sd[e + "layer.1.layer_norm.weight"])
        if enc_only:
            continue

        d = f"decoder.block.{il}."
        b = f"dec.blk.{il}."
        put(b + "attn_q.weight", sd[d + "layer.0.SelfAttention.q.weight"])
        put(b + "attn_k.weight", sd[d + "layer.0.SelfAttention.k.weight"])
        put(b + "attn_v.weight", sd[d + "layer.0.SelfAttention.v.weight"])
        put(b + "attn_o.weight", sd[d + "layer.0.SelfAttention.o.weight"])
        put(b + "attn_norm.weight", sd[d + "layer.0.layer_norm.weight"])
        rk = d + "layer.0.SelfAttention.relative_attention_bias.weight"
        if rk in sd:
            put(b + "attn_rel_b.weight", sd[rk], qtype=GGMLType.F32)
        put(b + "cross_attn_q.weight", sd[d + "layer.1.EncDecAttention.q.weight"])
        put(b + "cross_attn_k.weight", sd[d + "layer.1.EncDecAttention.k.weight"])
        put(b + "cross_attn_v.weight", sd[d + "layer.1.EncDecAttention.v.weight"])
        put(b + "cross_attn_o.weight", sd[d + "layer.1.EncDecAttention.o.weight"])
        put(b + "cross_attn_norm.weight", sd[d + "layer.1.layer_norm.weight"])
        if d + "layer.2.DenseReluDense.wi.weight" in sd:
            put(b + "ffn_up.weight", sd[d + "layer.2.DenseReluDense.wi.weight"])
        else:
            put(b + "ffn_gate.weight", sd[d + "layer.2.DenseReluDense.wi_0.weight"])
            put(b + "ffn_up.weight", sd[d + "layer.2.DenseReluDense.wi_1.weight"])
        put(b + "ffn_down.weight", sd[d + "layer.2.DenseReluDense.wo.weight"])
        put(b + "ffn_norm.weight", sd[d + "layer.2.layer_norm.weight"])

    w.write()
    return path


def convert_hf_clip_mmproj(
    vision_model,
    path: str,
    proj_w0=None, proj_b0=None, proj_w2=None, proj_b2=None,
):
    """HF CLIPVisionModel (+ llava MLP projector weights) -> mmproj GGUF
    (tensor/key names: /root/reference/tools/mtmd/clip-impl.h:19-96)."""
    import numpy as np

    cfg = vision_model.config
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "mlp")
    w.add_kv("clip.use_gelu", False)  # original CLIP uses quick-gelu
    w.add_kv("clip.vision.image_size", int(cfg.image_size))
    w.add_kv("clip.vision.patch_size", int(cfg.patch_size))
    w.add_kv("clip.vision.embedding_length", int(cfg.hidden_size))
    w.add_kv("clip.vision.block_count", int(cfg.num_hidden_layers))
    w.add_kv("clip.vision.attention.head_count", int(cfg.num_attention_heads))
    w.add_kv("clip.vision.feed_forward_length", int(cfg.intermediate_size))
    w.add_kv("clip.vision.projection_dim", int(getattr(cfg, "projection_dim", 768)))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", float(cfg.layer_norm_eps))
    w.add_kv("clip.vision.image_mean", [0.48145466, 0.4578275, 0.40821073])
    w.add_kv("clip.vision.image_std", [0.26862954, 0.26130258, 0.27577711])

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in vision_model.state_dict().items()}
    pre = "vision_model."

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("v.patch_embd.weight", sd[pre + "embeddings.patch_embedding.weight"])
    put("v.class_embd", sd[pre + "embeddings.class_embedding"])
    put("v.position_embd.weight", sd[pre + "embeddings.position_embedding.weight"])
    put("v.pre_ln.weight", sd[pre + "pre_layrnorm.weight"])
    put("v.pre_ln.bias", sd[pre + "pre_layrnorm.bias"])
    put("v.post_ln.weight", sd[pre + "post_layernorm.weight"])
    put("v.post_ln.bias", sd[pre + "post_layernorm.bias"])
    for il in range(cfg.num_hidden_layers):
        b = f"{pre}encoder.layers.{il}."
        g = f"v.blk.{il}."
        for hf, gg in (
            ("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
            ("self_attn.v_proj", "attn_v"), ("self_attn.out_proj", "attn_out"),
            ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"),
            ("layer_norm1", "ln1"), ("layer_norm2", "ln2"),
        ):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            put(g + gg + ".bias", sd[b + hf + ".bias"])
    if proj_w0 is not None:
        put("mm.0.weight", proj_w0)
        put("mm.0.bias", proj_b0)
        put("mm.2.weight", proj_w2)
        put("mm.2.bias", proj_b2)
    w.write()
    return path


def convert_hf_qwen2vl_mmproj(visual, path: str):
    """HF Qwen2/Qwen2.5 vision transformer -> mmproj GGUF in the
    reference's qwen2vl_merger / qwen2.5vl_merger conventions (clip.cpp
    build_qwen2vl / clip-impl.h: dual patch-conv slices, split qkv, merger
    ln_q stored as v.post_ln, merger mlp as mm.0/mm.1; 2.5 adds RMS norms,
    gated-silu MLP and the n_wa_pattern window-attention key)."""
    w = GGUFWriter(path, arch="clip")
    _write_qwen2vl_vision(w, visual)
    w.write()
    return path


def _write_qwen2vl_vision(w, visual, projector: str | None = None):
    """Add the qwen2vl/qwen2.5vl vision tower keys+tensors to an open
    GGUFWriter (shared by the VL mmproj and the Qwen2.5-Omni combined
    mmproj). Handles both the fused attn.qkv layout (Qwen2/2.5-VL) and the
    split attn.q/k/v layout (Qwen2.5-Omni visual)."""
    import numpy as np

    cfg = visual.config
    is_25 = hasattr(cfg, "fullatt_block_indexes")
    E = int(cfg.embed_dim if hasattr(cfg, "embed_dim") else cfg.hidden_size)
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type",
             projector or ("qwen2.5vl_merger" if is_25 else "qwen2vl_merger"))
    w.add_kv("clip.use_gelu", False)  # vision MLP act is quick-gelu
    w.add_kv("clip.vision.image_size", 28 * 16)  # dynamic; nominal value
    w.add_kv("clip.vision.patch_size", int(cfg.patch_size))
    w.add_kv("clip.vision.embedding_length", E)
    w.add_kv("clip.vision.block_count", int(cfg.depth))
    w.add_kv("clip.vision.attention.head_count", int(cfg.num_heads))
    w.add_kv("clip.vision.feed_forward_length",
             int(getattr(cfg, "intermediate_size", 0))
             or int(round(E * float(getattr(cfg, "mlp_ratio", 4.0)))))
    w.add_kv("clip.vision.projection_dim",
             int(getattr(cfg, "out_hidden_size", 0))
             or int(cfg.hidden_size))
    if is_25:
        # window pattern: fullatt_block_indexes -> every n-th block
        # (reference converter computes KEY_WIN_ATTN_PATTERN the same way)
        fab = list(cfg.fullatt_block_indexes)
        pat = fab[0] + 1 if fab else 0
        w.add_kv("clip.vision.n_wa_pattern", int(pat))
        w.add_kv("clip.vision.window_size", int(cfg.window_size))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_kv("clip.vision.spatial_merge_size",
             int(cfg.spatial_merge_size))
    w.add_kv("clip.vision.temporal_patch_size",
             int(cfg.temporal_patch_size))
    w.add_kv("clip.vision.image_mean", [0.48145466, 0.4578275, 0.40821073])
    w.add_kv("clip.vision.image_std", [0.26862954, 0.26130258, 0.27577711])

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in visual.state_dict().items()}

    def put(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, dtype=np.float32),
                     ggml_type=GGMLType.F32)

    # conv3d kernel [E, C, T, P, P] -> two temporal conv2d slices
    pk = sd["patch_embed.proj.weight"]
    put("v.patch_embd.weight", pk[:, :, 0])
    put("v.patch_embd.weight.1", pk[:, :, 1])
    for il in range(int(cfg.depth)):
        b = f"blocks.{il}."
        g = f"v.blk.{il}."
        if b + "attn.qkv.weight" in sd:
            qkv_w = sd[b + "attn.qkv.weight"]
            qkv_b = sd[b + "attn.qkv.bias"]
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                put(g + nm + ".weight", qkv_w[j * E:(j + 1) * E])
                put(g + nm + ".bias", qkv_b[j * E:(j + 1) * E])
        else:  # Qwen2.5-Omni split layout
            for hf, nm in (("attn.q", "attn_q"), ("attn.k", "attn_k"),
                           ("attn.v", "attn_v")):
                put(g + nm + ".weight", sd[b + hf + ".weight"])
                put(g + nm + ".bias", sd[b + hf + ".bias"])
        put(g + "attn_out.weight", sd[b + "attn.proj.weight"])
        put(g + "attn_out.bias", sd[b + "attn.proj.bias"])
        put(g + "ln1.weight", sd[b + "norm1.weight"])
        put(g + "ln2.weight", sd[b + "norm2.weight"])
        if is_25:  # RMS norms, gated-silu MLP
            put(g + "ffn_gate.weight", sd[b + "mlp.gate_proj.weight"])
            put(g + "ffn_gate.bias", sd[b + "mlp.gate_proj.bias"])
            put(g + "ffn_up.weight", sd[b + "mlp.up_proj.weight"])
            put(g + "ffn_up.bias", sd[b + "mlp.up_proj.bias"])
            put(g + "ffn_down.weight", sd[b + "mlp.down_proj.weight"])
            put(g + "ffn_down.bias", sd[b + "mlp.down_proj.bias"])
        else:
            put(g + "ln1.bias", sd[b + "norm1.bias"])
            put(g + "ln2.bias", sd[b + "norm2.bias"])
            put(g + "ffn_up.weight", sd[b + "mlp.fc1.weight"])
            put(g + "ffn_up.bias", sd[b + "mlp.fc1.bias"])
            put(g + "ffn_down.weight", sd[b + "mlp.fc2.weight"])
            put(g + "ffn_down.bias", sd[b + "mlp.fc2.bias"])
    put("v.post_ln.weight", sd["merger.ln_q.weight"])
    if not is_25:
        put("v.post_ln.bias", sd["merger.ln_q.bias"])
    put("mm.0.weight", sd["merger.mlp.0.weight"])
    put("mm.0.bias", sd["merger.mlp.0.bias"])
    put("mm.1.weight", sd["merger.mlp.2.weight"])
    put("mm.1.bias", sd["merger.mlp.2.bias"])


def convert_hf_qwen25omni_mmproj(thinker, path: str):
    """HF Qwen2_5OmniThinker -> ONE combined vision+audio mmproj GGUF
    (reference Qwen25OmniModel converter, convert_hf_to_gguf.py:2906-2963:
    projector_type "qwen2.5o", generated SinusoidsPositionEmbedding for the
    audio tower, audio_bos_eos_token dropped; clip.cpp resolves "qwen2.5o"
    to the 2.5-VL merger / qwen2a graphs per modality, clip.cpp:2088)."""
    import numpy as np

    w = GGUFWriter(path, arch="clip")
    _write_qwen2vl_vision(w, thinker.visual, projector="qwen2.5o")

    enc = thinker.audio_tower
    acfg = enc.config
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.num_mel_bins", int(acfg.num_mel_bins))
    w.add_kv("clip.audio.embedding_length", int(acfg.d_model))
    w.add_kv("clip.audio.block_count", int(acfg.encoder_layers))
    w.add_kv("clip.audio.attention.head_count",
             int(acfg.encoder_attention_heads))
    w.add_kv("clip.audio.feed_forward_length", int(acfg.encoder_ffn_dim))
    w.add_kv("clip.audio.attention.layer_norm_epsilon",
             float(getattr(acfg, "layer_norm_eps", 1e-5)))

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in enc.state_dict().items()}

    def put(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, dtype=np.float32),
                     ggml_type=GGMLType.F32)

    put("a.conv1d.1.weight", sd["conv1.weight"])
    put("a.conv1d.1.bias", sd["conv1.bias"])
    put("a.conv1d.2.weight", sd["conv2.weight"])
    put("a.conv1d.2.bias", sd["conv2.bias"])
    # SinusoidsPositionEmbedding is generated, not stored (reference
    # generate_extra_tensors): sin|cos over 1500 positions
    channels = int(acfg.d_model)
    log_inc = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2, dtype=np.float64))
    t = np.arange(1500, dtype=np.float64)[:, None] * inv[None, :]
    put("a.position_embd.weight",
        np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32))
    put("a.post_ln.weight", sd["ln_post.weight"])
    put("a.post_ln.bias", sd["ln_post.bias"])
    for il in range(int(acfg.encoder_layers)):
        b = f"layers.{il}."
        g = f"a.blk.{il}."
        for hf, gg in (
            ("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
            ("self_attn.v_proj", "attn_v"), ("self_attn.out_proj", "attn_out"),
            ("fc1", "ffn_up"), ("fc2", "ffn_down"),
            ("self_attn_layer_norm", "ln1"), ("final_layer_norm", "ln2"),
        ):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            if b + hf + ".bias" in sd:
                put(g + gg + ".bias", sd[b + hf + ".bias"])
    put("mm.a.fc.weight", sd["proj.weight"])
    put("mm.a.fc.bias", sd["proj.bias"])
    w.write()
    return path


def convert_hf_whisper_mmproj(
    encoder,
    path: str,
    fc_w=None, fc_b=None,
):
    """HF WhisperEncoder -> audio mmproj GGUF with a qwen2a fc projector
    (tensor names: /root/reference/tools/mtmd/clip-impl.h:107-112)."""
    import numpy as np

    cfg = encoder.config
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.projector_type", "qwen2a")
    w.add_kv("clip.audio.num_mel_bins", int(cfg.num_mel_bins))
    w.add_kv("clip.audio.embedding_length", int(cfg.d_model))
    w.add_kv("clip.audio.block_count", int(cfg.encoder_layers))
    w.add_kv("clip.audio.attention.head_count", int(cfg.encoder_attention_heads))
    w.add_kv("clip.audio.feed_forward_length", int(cfg.encoder_ffn_dim))
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)

    sd = {k: v.detach().cpu().float().numpy() for k, v in encoder.state_dict().items()}
    pre = "" if "conv1.weight" in sd else "encoder."

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("a.conv1d.1.weight", sd[pre + "conv1.weight"])  # [out, in, k]
    put("a.conv1d.1.bias", sd[pre + "conv1.bias"])
    put("a.conv1d.2.weight", sd[pre + "conv2.weight"])
    put("a.conv1d.2.bias", sd[pre + "conv2.bias"])
    put("a.position_embd.weight", sd[pre + "embed_positions.weight"])
    put("a.post_ln.weight", sd[pre + "layer_norm.weight"])
    put("a.post_ln.bias", sd[pre + "layer_norm.bias"])
    for il in range(cfg.encoder_layers):
        b = f"{pre}layers.{il}."
        g = f"a.blk.{il}."
        for hf, gg in (
            ("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
            ("self_attn.v_proj", "attn_v"), ("self_attn.out_proj", "attn_out"),
            ("fc1", "ffn_up"), ("fc2", "ffn_down"),
            ("self_attn_layer_norm", "ln1"), ("final_layer_norm", "ln2"),
        ):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            if b + hf + ".bias" in sd:
                put(g + gg + ".bias", sd[b + hf + ".bias"])
    if fc_w is not None:
        put("mm.a.fc.weight", fc_w)
        put("mm.a.fc.bias", fc_b)
    w.write()
    return path


def _deinterleave_pe(w: "np.ndarray", rope_dim: int, n_groups: int):
    """Reorder rope-part output rows from HF deepseek's interleaved pair
    layout to split halves, so standard NEOX rotation reproduces HF's
    pair-transposed rotary (modeling_deepseek.apply_rotary_pos_emb)."""
    import numpy as np

    w = w.copy()
    rows_per = w.shape[0] // n_groups
    for g in range(n_groups):
        blk = w[g * rows_per: g * rows_per + rope_dim]
        w[g * rows_per: g * rows_per + rope_dim] = np.concatenate(
            [blk[0::2], blk[1::2]])
    return w


def convert_hf_deepseek2(model, path: str, out_type: GGMLType = GGMLType.F32,
                         vocab: dict | None = None, arch: str = "deepseek2"):
    """HF DeepseekV2/V3ForCausalLM -> GGUF (deepseek2 arch): MLA projections
    with [rope|nope] head layout, leading dense layers, routed+shared MoE.
    minicpm3 (q+kv lora) and plm (kv lora, no-gate relu2 FFN) share the MLA
    layout and ride the same path with arch overridden."""
    import numpy as np

    hf_cfg = model.config
    a = arch
    n_head = int(hf_cfg.num_attention_heads)
    rope_dim = int(hf_cfg.qk_rope_head_dim)
    nope_dim = int(hf_cfg.qk_nope_head_dim)
    v_dim = int(hf_cfg.v_head_dim)
    qk_dim = rope_dim + nope_dim

    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.max_position_embeddings))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.hidden_size))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), int(hf_cfg.intermediate_size))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), n_head)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), n_head)
    w.add_kv(Keys.Attention.KEY_LENGTH.format(arch=a), qk_dim)
    w.add_kv(Keys.Attention.VALUE_LENGTH.format(arch=a), v_dim)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), float(hf_cfg.rms_norm_eps))
    w.add_kv(Keys.Rope.FREQ_BASE.format(arch=a), float(getattr(hf_cfg, "rope_theta", 10000.0)))
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), rope_dim)
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    w.add_kv(f"{a}.attention.kv_lora_rank", int(hf_cfg.kv_lora_rank))
    # marker: pe rows already [rope|nope] + de-interleaved (the loader's
    # _mla_external_fixup must NOT transform again)
    w.add_kv(f"{a}.rope_pe_deinterleaved", True)
    rs = getattr(hf_cfg, "rope_scaling", None) or {}
    if rs.get("type", rs.get("rope_type")) == "yarn":
        # reference DeepseekV2Model converter: yarn factor/orig ctx +
        # yarn_log_multiplier = 0.1 * mscale_all_dim
        w.add_kv(Keys.Rope.SCALING_TYPE.format(arch=a), "yarn")
        w.add_kv(Keys.Rope.SCALING_FACTOR.format(arch=a),
                 float(rs["factor"]))
        w.add_kv(Keys.Rope.SCALING_ORIG_CTX.format(arch=a),
                 int(rs["original_max_position_embeddings"]))
        w.add_kv(f"{a}.rope.scaling.yarn_log_multiplier",
                 0.1 * float(rs.get("mscale_all_dim", 1.0)))
    if getattr(hf_cfg, "q_lora_rank", None):
        w.add_kv(f"{a}.attention.q_lora_rank", int(hf_cfg.q_lora_rank))
    w.add_kv(f"{a}.leading_dense_block_count", int(getattr(hf_cfg, "first_k_dense_replace", 0)))
    n_expert = int(getattr(hf_cfg, "n_routed_experts", 0) or 0)
    if n_expert:
        w.add_kv(Keys.LLM.EXPERT_COUNT.format(arch=a), n_expert)
        w.add_kv(Keys.LLM.EXPERT_USED_COUNT.format(arch=a),
                 int(hf_cfg.num_experts_per_tok))
        w.add_kv(Keys.LLM.EXPERT_FEED_FORWARD_LENGTH.format(arch=a),
                 int(hf_cfg.moe_intermediate_size))
        w.add_kv(f"{a}.expert_shared_count", int(getattr(hf_cfg, "n_shared_experts", 0)))
        w.add_kv(f"{a}.expert_weights_scale",
                 float(getattr(hf_cfg, "routed_scaling_factor", 1.0)))
        w.add_kv(f"{a}.expert_weights_norm",
                 bool(getattr(hf_cfg, "norm_topk_prob", False)))
        # DeepSeek-V3: sigmoid selection (reference DeepseekV2Model converter
        # maps scoring_func -> EXPERT_GATING_FUNC)
        if getattr(hf_cfg, "scoring_func", "softmax") == "sigmoid":
            w.add_kv(f"{a}.expert_gating_func", 2)
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32),
                     ggml_type=out_type if np.asarray(arr).ndim == 2 else GGMLType.F32)

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    put("output_norm.weight", sd["model.norm.weight"])
    if "lm_head.weight" in sd and not getattr(hf_cfg, "tie_word_embeddings", False):
        put("output.weight", sd["lm_head.weight"])

    for il in range(hf_cfg.num_hidden_layers):
        pre = f"model.layers.{il}."
        b = f"blk.{il}."
        put(b + "attn_norm.weight", sd[pre + "input_layernorm.weight"])
        put(b + "ffn_norm.weight", sd[pre + "post_attention_layernorm.weight"])
        if pre + "self_attn.q_a_proj.weight" in sd:
            qb = sd[pre + "self_attn.q_b_proj.weight"]  # [H*qk_dim, q_rank]
            # reorder each head to [rope|nope] and de-interleave the pe rows
            qb = qb.reshape(n_head, qk_dim, -1)
            qb = np.concatenate([qb[:, nope_dim:], qb[:, :nope_dim]], axis=1)
            qb = qb.reshape(n_head * qk_dim, -1)
            qb = _deinterleave_pe(qb, rope_dim, n_head)
            put(b + "attn_q_a.weight", sd[pre + "self_attn.q_a_proj.weight"])
            put(b + "attn_q_a_norm.weight", sd[pre + "self_attn.q_a_layernorm.weight"])
            put(b + "attn_q_b.weight", qb)
        else:
            q = sd[pre + "self_attn.q_proj.weight"].reshape(n_head, qk_dim, -1)
            q = np.concatenate([q[:, nope_dim:], q[:, :nope_dim]], axis=1)
            q = q.reshape(n_head * qk_dim, -1)
            q = _deinterleave_pe(q, rope_dim, n_head)
            put(b + "attn_q.weight", q)
        kva = sd[pre + "self_attn.kv_a_proj_with_mqa.weight"]  # [rank+rope, E]
        rank = int(hf_cfg.kv_lora_rank)
        pe = kva[rank:]
        pe = np.concatenate([pe[0::2], pe[1::2]])  # de-interleave
        put(b + "attn_kv_a_mqa.weight", np.concatenate([kva[:rank], pe]))
        put(b + "attn_kv_a_norm.weight", sd[pre + "self_attn.kv_a_layernorm.weight"])
        put(b + "attn_kv_b.weight", sd[pre + "self_attn.kv_b_proj.weight"])
        put(b + "attn_output.weight", sd[pre + "self_attn.o_proj.weight"])

        if pre + "mlp.gate.weight" in sd:  # routed MoE layer
            put(b + "ffn_gate_inp.weight", sd[pre + "mlp.gate.weight"])
            if pre + "mlp.gate.e_score_correction_bias" in sd:  # v3
                w.add_tensor(b + "exp_probs_b.bias",
                             sd[pre + "mlp.gate.e_score_correction_bias"],
                             ggml_type=GGMLType.F32)
            for hf_w, gg in (("gate_proj", "ffn_gate_exps"),
                             ("up_proj", "ffn_up_exps"),
                             ("down_proj", "ffn_down_exps")):
                stack = np.stack([sd[f"{pre}mlp.experts.{e}.{hf_w}.weight"]
                                  for e in range(n_expert)])
                w.add_tensor(b + gg + ".weight", stack, ggml_type=GGMLType.F32)
            put(b + "ffn_gate_shexp.weight", sd[pre + "mlp.shared_experts.gate_proj.weight"])
            put(b + "ffn_up_shexp.weight", sd[pre + "mlp.shared_experts.up_proj.weight"])
            put(b + "ffn_down_shexp.weight", sd[pre + "mlp.shared_experts.down_proj.weight"])
        else:  # leading dense layer (plm: no-gate relu2 FFN)
            if pre + "mlp.gate_proj.weight" in sd:
                put(b + "ffn_gate.weight", sd[pre + "mlp.gate_proj.weight"])
            put(b + "ffn_up.weight", sd[pre + "mlp.up_proj.weight"])
            put(b + "ffn_down.weight", sd[pre + "mlp.down_proj.weight"])

    w.write()
    return path


def convert_hf_bert(model, path: str, vocab: dict | None = None,
                    cls_w=None, cls_b=None, cls_out_w=None, cls_out_b=None):
    """HF BertModel -> GGUF (bert arch tensor names, llama-arch.cpp BERT)."""
    import numpy as np

    hf_cfg = model.config
    a = "bert"
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.max_position_embeddings))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.hidden_size))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), int(hf_cfg.intermediate_size))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(hf_cfg.num_attention_heads))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a), float(hf_cfg.layer_norm_eps))
    w.add_kv(f"{a}.attention.causal", False)
    w.add_kv(f"{a}.pooling_type", 1)  # LLAMA_POOLING_TYPE_MEAN
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "" if "embeddings.word_embeddings.weight" in sd else "bert."

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd[pre + "embeddings.word_embeddings.weight"])
    put("token_types.weight", sd[pre + "embeddings.token_type_embeddings.weight"])
    put("position_embd.weight", sd[pre + "embeddings.position_embeddings.weight"])
    put("token_embd_norm.weight", sd[pre + "embeddings.LayerNorm.weight"])
    put("token_embd_norm.bias", sd[pre + "embeddings.LayerNorm.bias"])
    for il in range(hf_cfg.num_hidden_layers):
        b = f"{pre}encoder.layer.{il}."
        g = f"blk.{il}."
        for hf, gg in (
            ("attention.self.query", "attn_q"), ("attention.self.key", "attn_k"),
            ("attention.self.value", "attn_v"),
            ("attention.output.dense", "attn_output"),
            ("attention.output.LayerNorm", "attn_output_norm"),
            ("intermediate.dense", "ffn_up"), ("output.dense", "ffn_down"),
            ("output.LayerNorm", "layer_output_norm"),
        ):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            put(g + gg + ".bias", sd[b + hf + ".bias"])
    if cls_w is not None:
        put("cls.weight", cls_w)
        put("cls.bias", cls_b)
        put("cls.output.weight", cls_out_w)
        put("cls.output.bias", cls_out_b)
    w.write()
    return path


def convert_hf_gpt2(model, path: str, vocab: dict | None = None):
    """HF GPT2LMHeadModel -> GGUF (gpt2 arch): learned positions, fused
    qkv, LN+biases; HF Conv1D weights are stored transposed."""
    import numpy as np

    hf_cfg = model.config
    a = "gpt2"
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.n_positions))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.n_embd))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.n_layer))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a),
             int(getattr(hf_cfg, "n_inner", None) or 4 * hf_cfg.n_embd))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(hf_cfg.n_head))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_epsilon))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "transformer." if "transformer.wte.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd[pre + "wte.weight"])
    put("position_embd.weight", sd[pre + "wpe.weight"])
    put("output_norm.weight", sd[pre + "ln_f.weight"])
    put("output_norm.bias", sd[pre + "ln_f.bias"])
    for il in range(hf_cfg.n_layer):
        b = f"{pre}h.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "ln_1.weight"])
        put(g + "attn_norm.bias", sd[b + "ln_1.bias"])
        put(g + "attn_qkv.weight", sd[b + "attn.c_attn.weight"].T)  # Conv1D
        put(g + "attn_qkv.bias", sd[b + "attn.c_attn.bias"])
        put(g + "attn_output.weight", sd[b + "attn.c_proj.weight"].T)
        put(g + "attn_output.bias", sd[b + "attn.c_proj.bias"])
        put(g + "ffn_norm.weight", sd[b + "ln_2.weight"])
        put(g + "ffn_norm.bias", sd[b + "ln_2.bias"])
        put(g + "ffn_up.weight", sd[b + "mlp.c_fc.weight"].T)
        put(g + "ffn_up.bias", sd[b + "mlp.c_fc.bias"])
        put(g + "ffn_down.weight", sd[b + "mlp.c_proj.weight"].T)
        put(g + "ffn_down.bias", sd[b + "mlp.c_proj.bias"])
    w.write()
    return path


def convert_hf_mpt(model, path: str, vocab: dict | None = None):
    """HF MptForCausalLM -> GGUF (mpt arch): ALiBi, fused qkv, bias-less LN."""
    import numpy as np

    hf_cfg = model.config
    a = "mpt"
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.max_seq_len))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.d_model))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.n_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a),
             int(hf_cfg.d_model * hf_cfg.expansion_ratio))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(hf_cfg.n_heads))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{a}.attention.max_alibi_bias",
             float(hf_cfg.attn_config.alibi_bias_max))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "transformer." if "transformer.wte.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd[pre + "wte.weight"])
    put("output_norm.weight", sd[pre + "norm_f.weight"])
    for il in range(hf_cfg.n_layers):
        b = f"{pre}blocks.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "norm_1.weight"])
        put(g + "attn_qkv.weight", sd[b + "attn.Wqkv.weight"])
        put(g + "attn_output.weight", sd[b + "attn.out_proj.weight"])
        put(g + "ffn_norm.weight", sd[b + "norm_2.weight"])
        put(g + "ffn_up.weight", sd[b + "ffn.up_proj.weight"])
        put(g + "ffn_down.weight", sd[b + "ffn.down_proj.weight"])
    w.write()
    return path


def convert_hf_phi2(model, path: str, vocab: dict | None = None):
    """HF PhiForCausalLM (phi-2) -> GGUF: parallel residual, partial rotary,
    LN + biases everywhere, lm_head with bias folded? (phi2 lm_head has bias
    — stored as output.bias)."""
    import numpy as np

    hf_cfg = model.config
    a = "phi2"
    n_head = int(hf_cfg.num_attention_heads)
    head_dim = hf_cfg.hidden_size // n_head
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.max_position_embeddings))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.hidden_size))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), int(hf_cfg.intermediate_size))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), n_head)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a),
             int(getattr(hf_cfg, "num_key_value_heads", n_head)))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_eps))
    w.add_kv(Keys.Rope.FREQ_BASE.format(arch=a), float(hf_cfg.rope_theta))
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a),
             int(head_dim * float(getattr(hf_cfg, "partial_rotary_factor", 0.4))))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd["model.embed_tokens.weight"])
    put("output_norm.weight", sd["model.final_layernorm.weight"])
    put("output_norm.bias", sd["model.final_layernorm.bias"])
    put("output.weight", sd["lm_head.weight"])
    if "lm_head.bias" in sd:
        put("output.bias", sd["lm_head.bias"])
    for il in range(hf_cfg.num_hidden_layers):
        b = f"model.layers.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "input_layernorm.weight"])
        put(g + "attn_norm.bias", sd[b + "input_layernorm.bias"])
        for hf, gg in (("self_attn.q_proj", "attn_q"),
                       ("self_attn.k_proj", "attn_k"),
                       ("self_attn.v_proj", "attn_v"),
                       ("self_attn.dense", "attn_output"),
                       ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down")):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            put(g + gg + ".bias", sd[b + hf + ".bias"])
    w.write()
    return path


def convert_hf_falcon(model, path: str, vocab: dict | None = None):
    """HF FalconForCausalLM (7B-style: multi_query, parallel_attn,
    new_decoder_architecture=False) -> GGUF falcon arch."""
    import numpy as np

    hf_cfg = model.config
    assert not getattr(hf_cfg, "new_decoder_architecture", False), \
        "only the falcon-7b decoder layout is supported"
    a = "falcon"
    n_head = int(hf_cfg.num_attention_heads)
    n_kv = 1 if hf_cfg.multi_query else n_head
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.hidden_size))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), 4 * int(hf_cfg.hidden_size))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), n_head)
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a), n_kv)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_epsilon))
    w.add_kv(Keys.Rope.FREQ_BASE.format(arch=a), float(getattr(hf_cfg, "rope_theta", 10000.0)))
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a),
             int(hf_cfg.hidden_size // n_head))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "transformer." if "transformer.word_embeddings.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd[pre + "word_embeddings.weight"])
    put("output_norm.weight", sd[pre + "ln_f.weight"])
    put("output_norm.bias", sd[pre + "ln_f.bias"])
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"])
    for il in range(hf_cfg.num_hidden_layers):
        b = f"{pre}h.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "input_layernorm.weight"])
        put(g + "attn_norm.bias", sd[b + "input_layernorm.bias"])
        put(g + "attn_qkv.weight", sd[b + "self_attention.query_key_value.weight"])
        put(g + "attn_output.weight", sd[b + "self_attention.dense.weight"])
        put(g + "ffn_up.weight", sd[b + "mlp.dense_h_to_4h.weight"])
        put(g + "ffn_down.weight", sd[b + "mlp.dense_4h_to_h.weight"])
    w.write()
    return path


def convert_hf_bloom(model, path: str, vocab: dict | None = None):
    """HF BloomForCausalLM -> GGUF (bloom arch): ALiBi, embedding LN,
    fused QKV de-interleaved from HF's [H, 3, D] row layout."""
    import numpy as np

    hf_cfg = model.config
    a = "bloom"
    H = int(hf_cfg.n_head)
    E = int(hf_cfg.hidden_size)
    D = E // H
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), 2048)
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.n_layer))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), 4 * E)
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_epsilon))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "transformer." if "transformer.word_embeddings.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    def split_qkv(wm):
        # rows [H, 3, D, ...] -> [q(H*D); k(H*D); v(H*D)]
        x = wm.reshape(H, 3, D, *wm.shape[1:])
        return np.concatenate([x[:, 0], x[:, 1], x[:, 2]]).reshape(
            3 * H * D, *wm.shape[1:])

    put("token_embd.weight", sd[pre + "word_embeddings.weight"])
    put("token_embd_norm.weight", sd[pre + "word_embeddings_layernorm.weight"])
    put("token_embd_norm.bias", sd[pre + "word_embeddings_layernorm.bias"])
    put("output_norm.weight", sd[pre + "ln_f.weight"])
    put("output_norm.bias", sd[pre + "ln_f.bias"])
    if "lm_head.weight" in sd and not getattr(hf_cfg, "tie_word_embeddings", True):
        put("output.weight", sd["lm_head.weight"])
    for il in range(hf_cfg.n_layer):
        b = f"{pre}h.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "input_layernorm.weight"])
        put(g + "attn_norm.bias", sd[b + "input_layernorm.bias"])
        put(g + "attn_qkv.weight",
            split_qkv(sd[b + "self_attention.query_key_value.weight"]))
        put(g + "attn_qkv.bias",
            split_qkv(sd[b + "self_attention.query_key_value.bias"]))
        put(g + "attn_output.weight", sd[b + "self_attention.dense.weight"])
        put(g + "attn_output.bias", sd[b + "self_attention.dense.bias"])
        put(g + "ffn_norm.weight", sd[b + "post_attention_layernorm.weight"])
        put(g + "ffn_norm.bias", sd[b + "post_attention_layernorm.bias"])
        put(g + "ffn_up.weight", sd[b + "mlp.dense_h_to_4h.weight"])
        put(g + "ffn_up.bias", sd[b + "mlp.dense_h_to_4h.bias"])
        put(g + "ffn_down.weight", sd[b + "mlp.dense_4h_to_h.weight"])
        put(g + "ffn_down.bias", sd[b + "mlp.dense_4h_to_h.bias"])
    w.write()
    return path


def convert_hf_gptneox(model, path: str, vocab: dict | None = None):
    """HF GPTNeoXForCausalLM -> GGUF (gptneox arch): partial rotary,
    parallel residual, fused QKV de-interleaved from [H, 3, D] rows."""
    import numpy as np

    hf_cfg = model.config
    a = "gptneox"
    H = int(hf_cfg.num_attention_heads)
    E = int(hf_cfg.hidden_size)
    D = E // H
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.max_position_embeddings))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), E)
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.num_hidden_layers))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a), int(hf_cfg.intermediate_size))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), H)
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_eps))
    w.add_kv(Keys.Rope.FREQ_BASE.format(arch=a), float(getattr(hf_cfg, "rope_theta", 10000.0)))
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a),
             int(D * float(getattr(hf_cfg, "rotary_pct", 0.25))))
    w.add_kv(f"{a}.use_parallel_residual",
             bool(getattr(hf_cfg, "use_parallel_residual", True)))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "gpt_neox." if "gpt_neox.embed_in.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    def split_qkv(wm):
        x = wm.reshape(H, 3, D, *wm.shape[1:])
        return np.concatenate([x[:, 0], x[:, 1], x[:, 2]]).reshape(
            3 * H * D, *wm.shape[1:])

    put("token_embd.weight", sd[pre + "embed_in.weight"])
    put("output_norm.weight", sd[pre + "final_layer_norm.weight"])
    put("output_norm.bias", sd[pre + "final_layer_norm.bias"])
    put("output.weight", sd["embed_out.weight"])
    for il in range(hf_cfg.num_hidden_layers):
        b = f"{pre}layers.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "input_layernorm.weight"])
        put(g + "attn_norm.bias", sd[b + "input_layernorm.bias"])
        put(g + "ffn_norm.weight", sd[b + "post_attention_layernorm.weight"])
        put(g + "ffn_norm.bias", sd[b + "post_attention_layernorm.bias"])
        put(g + "attn_qkv.weight", split_qkv(sd[b + "attention.query_key_value.weight"]))
        put(g + "attn_qkv.bias", split_qkv(sd[b + "attention.query_key_value.bias"]))
        put(g + "attn_output.weight", sd[b + "attention.dense.weight"])
        put(g + "attn_output.bias", sd[b + "attention.dense.bias"])
        put(g + "ffn_up.weight", sd[b + "mlp.dense_h_to_4h.weight"])
        put(g + "ffn_up.bias", sd[b + "mlp.dense_h_to_4h.bias"])
        put(g + "ffn_down.weight", sd[b + "mlp.dense_4h_to_h.weight"])
        put(g + "ffn_down.bias", sd[b + "mlp.dense_4h_to_h.bias"])
    w.write()
    return path


def convert_hf_gptj(model, path: str, vocab: dict | None = None):
    """HF GPTJForCausalLM -> GGUF (gptj arch): interleaved partial rotary,
    shared-norm parallel residual, biased lm_head."""
    import numpy as np

    hf_cfg = model.config
    a = "gptj"
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.n_positions))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.n_embd))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.n_layer))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a),
             int(getattr(hf_cfg, "n_inner", None) or 4 * hf_cfg.n_embd))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(hf_cfg.n_head))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_epsilon))
    w.add_kv(Keys.Rope.DIMENSION_COUNT.format(arch=a), int(hf_cfg.rotary_dim))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "transformer." if "transformer.wte.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd[pre + "wte.weight"])
    put("output_norm.weight", sd[pre + "ln_f.weight"])
    put("output_norm.bias", sd[pre + "ln_f.bias"])
    put("output.weight", sd["lm_head.weight"])
    if "lm_head.bias" in sd:
        put("output.bias", sd["lm_head.bias"])
    for il in range(hf_cfg.n_layer):
        b = f"{pre}h.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "ln_1.weight"])
        put(g + "attn_norm.bias", sd[b + "ln_1.bias"])
        put(g + "attn_q.weight", sd[b + "attn.q_proj.weight"])
        put(g + "attn_k.weight", sd[b + "attn.k_proj.weight"])
        put(g + "attn_v.weight", sd[b + "attn.v_proj.weight"])
        put(g + "attn_output.weight", sd[b + "attn.out_proj.weight"])
        put(g + "ffn_up.weight", sd[b + "mlp.fc_in.weight"])
        put(g + "ffn_up.bias", sd[b + "mlp.fc_in.bias"])
        put(g + "ffn_down.weight", sd[b + "mlp.fc_out.weight"])
        put(g + "ffn_down.bias", sd[b + "mlp.fc_out.bias"])
    w.write()
    return path


def convert_hf_starcoder(model, path: str, vocab: dict | None = None):
    """HF GPTBigCodeForCausalLM -> GGUF (starcoder arch): multi-query
    attention with fused [q | k | v] rows, learned positions, LN+biases."""
    import numpy as np

    hf_cfg = model.config
    a = "starcoder"
    w = GGUFWriter(path, arch=a)
    w.add_kv(Keys.LLM.CONTEXT_LENGTH.format(arch=a), int(hf_cfg.n_positions))
    w.add_kv(Keys.LLM.EMBEDDING_LENGTH.format(arch=a), int(hf_cfg.n_embd))
    w.add_kv(Keys.LLM.BLOCK_COUNT.format(arch=a), int(hf_cfg.n_layer))
    w.add_kv(Keys.LLM.FEED_FORWARD_LENGTH.format(arch=a),
             int(getattr(hf_cfg, "n_inner", None) or 4 * hf_cfg.n_embd))
    w.add_kv(Keys.Attention.HEAD_COUNT.format(arch=a), int(hf_cfg.n_head))
    w.add_kv(Keys.Attention.HEAD_COUNT_KV.format(arch=a),
             1 if hf_cfg.multi_query else int(hf_cfg.n_head))
    w.add_kv(Keys.Attention.LAYERNORM_RMS_EPS.format(arch=a),
             float(hf_cfg.layer_norm_epsilon))
    w.add_kv(Keys.LLM.VOCAB_SIZE.format(arch=a), int(hf_cfg.vocab_size))
    if vocab:
        for key, val in vocab.items():
            w.add_kv(key, val)

    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    pre = "transformer." if "transformer.wte.weight" in sd else ""

    def put(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), ggml_type=GGMLType.F32)

    put("token_embd.weight", sd[pre + "wte.weight"])
    put("position_embd.weight", sd[pre + "wpe.weight"])
    put("output_norm.weight", sd[pre + "ln_f.weight"])
    put("output_norm.bias", sd[pre + "ln_f.bias"])
    for il in range(hf_cfg.n_layer):
        b = f"{pre}h.{il}."
        g = f"blk.{il}."
        put(g + "attn_norm.weight", sd[b + "ln_1.weight"])
        put(g + "attn_norm.bias", sd[b + "ln_1.bias"])
        put(g + "attn_qkv.weight", sd[b + "attn.c_attn.weight"])
        put(g + "attn_qkv.bias", sd[b + "attn.c_attn.bias"])
        put(g + "attn_output.weight", sd[b + "attn.c_proj.weight"])
        put(g + "attn_output.bias", sd[b + "attn.c_proj.bias"])
        put(g + "ffn_norm.weight", sd[b + "ln_2.weight"])
        put(g + "ffn_norm.bias", sd[b + "ln_2.bias"])
        put(g + "ffn_up.weight", sd[b + "mlp.c_fc.weight"])
        put(g + "ffn_up.bias", sd[b + "mlp.c_fc.bias"])
        put(g + "ffn_down.weight", sd[b + "mlp.c_proj.weight"])
        put(g + "ffn_down.bias", sd[b + "mlp.c_proj.bias"])
    w.write()
    return path


# HF config.model_type -> (converter fn, our arch string) — the analogue of
# convert_hf_to_gguf.py's @ModelBase.register dispatch table.
_MODEL_TYPE_ARCH = {
    "llama": "llama",
    "mistral": "llama",
    "mixtral": "mixtral",
    "qwen2": "qwen2",
    "qwen2_moe": "qwen2moe",
    "qwen3": "qwen3",
    "qwen3_moe": "qwen3moe",
    "gemma": "gemma",
    "gemma2": "gemma2",
    "gemma3_text": "gemma3",
    "gemma3": "gemma3",
    "phi3": "phi3",
    "phimoe": "phimoe",
    "olmo": "olmo",
    "olmo2": "olmo2",
    "olmoe": "olmoe",
    "granite": "granite",
    "granitemoe": "granitemoe",
    "starcoder2": "starcoder2",
    "cohere": "command-r",
    "cohere2": "cohere2",
    "stablelm": "stablelm",
    "glm4": "glm4",
    "dbrx": "dbrx",
    "nemotron": "nemotron",
    "arcee": "arcee",
    "ernie4_5": "ernie4_5",
    "dots1": "dots1",
    "bitnet": "bitnet",
    "exaone": "exaone",
    "internlm2": "internlm2",
    "baichuan": "baichuan",
    "xverse": "xverse",
    "orion": "orion",
    "minicpm": "minicpm",
    "chameleon": "chameleon",
    "gemma3n": "gemma3n",
    "gemma3n_text": "gemma3n",
    "qwen2_vl": "qwen2vl",
    "qwen2_5_vl": "qwen2vl",
    "qwen2_5_omni": "qwen2vl",
    "qwen2_5_omni_thinker": "qwen2vl",
    # round-3 long tail (reference @ModelBase.register coverage)
    "glm": "glm4",
    "internlm3": "llama",
    "stablelm_epoch": "stablelm",
    "granitemoeshared": "granitemoe",
    "mistral3": "llama",
    "qwen2_audio": "qwen2",
    "ultravox": "llama",
    "idefics3": "llama",
    "smolvlm": "llama",
    "llava": "llama",
    "deci": "deci",
    "arctic": "arctic",
    "deepseek": "deepseek",
    "helium": "llama",
}

# model_types handled by dedicated converter functions in convert_hf_auto
_DEDICATED = ("gpt2", "mpt", "phi", "falcon", "bloom", "gpt_neox",
              "gptj", "gpt_bigcode",
              "mamba", "mamba2", "falcon_mamba", "t5", "mt5", "umt5",
              "t5encoder", "deepseek_v2", "deepseek_v3", "minicpm3", "plm",
              "qwen", "chatglm", "codeshell", "gpt_refact", "jais",
              "openelm", "plamo", "grok-1", "bailing_moe",
              "bert", "roberta", "xlm-roberta", "camembert", "distilbert",
              "nomic_bert", "jina_bert_v2", "neobert",
              "rwkv6", "rwkv6qwen2", "rwkv7", "rwkv_hybrid", "llama4", "llama4_text", "wavtokenizer-dec")


def convert_hf_auto(model, path: str, out_type: GGMLType = GGMLType.F32,
                    vocab: dict | None = None, tokenizer=None,
                    pre: str | None = None) -> str:
    """Dispatch on config.model_type like the reference's converter
    registry (convert_hf_to_gguf.py ModelBase.register). Architectures with
    dedicated converters (mamba/mamba2/t5/clip) route to them.

    Pass a HF tokenizer as `tokenizer=` to embed its vocab, with the
    pre-tokenizer auto-detected from the hash registry (`pre=` overrides
    detection for fingerprints not yet registered)."""
    if vocab is None and tokenizer is not None:
        from .pre_tokenizers import vocab_from_hf

        is_spm = getattr(tokenizer, "vocab_files_names", {}).get(
            "vocab_file", "").endswith(".model")
        vocab = vocab_from_hf(tokenizer, model="llama" if is_spm else "gpt2",
                              pre=pre)
    mt = getattr(model.config, "model_type", "llama")
    if mt in ("mamba", "falcon_mamba"):
        # falcon_mamba rides the mamba arch (reference FalconMambaModel)
        return convert_hf_mamba(model, path, out_type=out_type, vocab=vocab)
    if mt == "mamba2":
        return convert_hf_mamba2(model, path, out_type=out_type, vocab=vocab)
    if mt in ("t5", "mt5", "umt5", "t5encoder"):
        return convert_hf_t5(model, path, out_type=out_type, vocab=vocab)
    if mt in ("deepseek_v2", "deepseek_v3"):
        return convert_hf_deepseek2(model, path, out_type=out_type,
                                    vocab=vocab)
    if mt == "minicpm3":
        return convert_hf_deepseek2(model, path, out_type=out_type,
                                    vocab=vocab, arch="minicpm3")
    if mt == "plm":
        return convert_hf_deepseek2(model, path, out_type=out_type,
                                    vocab=vocab, arch="plm")
    _classic = {"gpt2": convert_hf_gpt2, "mpt": convert_hf_mpt,
                "phi": convert_hf_phi2, "falcon": convert_hf_falcon,
                "bloom": convert_hf_bloom, "gpt_neox": convert_hf_gptneox,
                "gptj": convert_hf_gptj, "gpt_bigcode": convert_hf_starcoder}
    if mt in _classic:
        return _classic[mt](model, path, vocab=vocab)
    if mt in ("rwkv7", "rwkv_hybrid"):
        from .hf_longtail import convert_hf_rwkv7

        return convert_hf_rwkv7(
            model, path, out_type=out_type, vocab=vocab,
            arch="arwkv7" if mt == "rwkv_hybrid" else "rwkv7")
    if mt in ("roberta", "xlm-roberta", "camembert", "distilbert"):
        from .hf_longtail import convert_hf_bert_family

        return convert_hf_bert_family(model, path, vocab=vocab, mt=mt)
    if mt == "bert":
        return convert_hf_bert(model, path, vocab=vocab)
    _renamed = {"qwen": "convert_hf_qwen1", "chatglm": "convert_hf_chatglm",
                "codeshell": "convert_hf_codeshell",
                "gpt_refact": "convert_hf_refact", "jais": "convert_hf_jais",
                "openelm": "convert_hf_openelm", "plamo": "convert_hf_plamo",
                "grok-1": "convert_hf_grok",
                "bailing_moe": "convert_hf_bailingmoe",
                "rwkv6": "convert_hf_rwkv6",
                "llama4": "convert_hf_llama4",
                "wavtokenizer-dec": "convert_hf_wavtokenizer",
                "llama4_text": "convert_hf_llama4",
                "rwkv6qwen2": "convert_hf_rwkv6qwen2",
                "nomic_bert": "convert_hf_nomic_bert",
                "jina_bert_v2": "convert_hf_jina_bert_v2",
                "neobert": "convert_hf_neo_bert"}
    if mt in _renamed:
        from . import hf_longtail

        return getattr(hf_longtail, _renamed[mt])(
            model, path, out_type=out_type, vocab=vocab)
    arch = _MODEL_TYPE_ARCH.get(mt)
    if arch is None:
        raise ValueError(
            f"unsupported model_type {mt!r}; supported: "
            f"{sorted(_MODEL_TYPE_ARCH) + sorted(_DEDICATED)}")
    return convert_hf_llama(model, path, arch=arch, out_type=out_type,
                            vocab=vocab)


def convert_hf_idefics3_mmproj(vision_model, connector, path: str,
                               scale_factor: int):
    """HF Idefics3VisionTransformer + Idefics3Connector -> mmproj GGUF
    (reference conventions: siglip tower tensors, pixel-shuffle scale in
    clip.vision.projector.scale_factor, projection as mm.model.fc)."""
    import numpy as np

    cfg = vision_model.config
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "idefics3")
    w.add_kv("clip.use_gelu", True)
    w.add_kv("clip.vision.image_size", int(cfg.image_size))
    w.add_kv("clip.vision.patch_size", int(cfg.patch_size))
    w.add_kv("clip.vision.embedding_length", int(cfg.hidden_size))
    w.add_kv("clip.vision.block_count", int(cfg.num_hidden_layers))
    w.add_kv("clip.vision.attention.head_count", int(cfg.num_attention_heads))
    w.add_kv("clip.vision.feed_forward_length", int(cfg.intermediate_size))
    w.add_kv("clip.vision.projection_dim", int(cfg.hidden_size))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(cfg.layer_norm_eps))
    w.add_kv("clip.vision.projector.scale_factor", int(scale_factor))
    w.add_kv("clip.vision.image_mean", [0.5, 0.5, 0.5])
    w.add_kv("clip.vision.image_std", [0.5, 0.5, 0.5])

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in vision_model.state_dict().items()}

    def put(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, dtype=np.float32),
                     ggml_type=GGMLType.F32)

    put("v.patch_embd.weight", sd["embeddings.patch_embedding.weight"])
    put("v.patch_embd.bias", sd["embeddings.patch_embedding.bias"])
    put("v.position_embd.weight", sd["embeddings.position_embedding.weight"])
    put("v.post_ln.weight", sd["post_layernorm.weight"])
    put("v.post_ln.bias", sd["post_layernorm.bias"])
    for il in range(int(cfg.num_hidden_layers)):
        b = f"encoder.layers.{il}."
        g = f"v.blk.{il}."
        for hf, gg in (
            ("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
            ("self_attn.v_proj", "attn_v"), ("self_attn.out_proj", "attn_out"),
            ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"),
            ("layer_norm1", "ln1"), ("layer_norm2", "ln2"),
        ):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            put(g + gg + ".bias", sd[b + hf + ".bias"])
    proj = connector.modality_projection.proj.weight.detach().float().numpy()
    put("mm.model.fc.weight", proj)
    w.write()
    return path


def convert_hf_internvl_mmproj(vision_model, projector, path: str,
                               downsample_ratio: float = 0.5):
    """HF InternVLVisionModel + InternVLMultiModalProjector -> mmproj GGUF
    (reference InternVisionModel converter, convert_hf_to_gguf.py:2966-3024;
    graph parity clip.cpp build_internvl:895-960: projector_type "internvl",
    layer-scale ls1/ls2, pixel-shuffle scale_factor = 1/downsample_ratio,
    projector stored as mm.0 (LayerNorm) / mm.1 / mm.3).

    Accepts both the HF split-qkv layout (attention.{q,k,v}_proj) and the
    OpenGVLab fused layout (attn.qkv) the reference converter splits."""
    import numpy as np

    cfg = vision_model.config
    img = cfg.image_size
    img = int(img[0]) if isinstance(img, (list, tuple)) else int(img)
    ps = cfg.patch_size
    ps = int(ps[0]) if isinstance(ps, (list, tuple)) else int(ps)
    act = str(getattr(cfg, "hidden_act", "gelu"))
    w = GGUFWriter(path, arch="clip")
    w.add_kv("clip.has_vision_encoder", True)
    w.add_kv("clip.projector_type", "internvl")
    w.add_kv("clip.use_silu", act == "silu")
    w.add_kv("clip.use_gelu", act.startswith("gelu"))
    w.add_kv("clip.vision.image_size", img)
    w.add_kv("clip.vision.patch_size", ps)
    w.add_kv("clip.vision.embedding_length", int(cfg.hidden_size))
    w.add_kv("clip.vision.block_count", int(cfg.num_hidden_layers))
    w.add_kv("clip.vision.attention.head_count", int(cfg.num_attention_heads))
    w.add_kv("clip.vision.feed_forward_length", int(cfg.intermediate_size))
    w.add_kv("clip.vision.projection_dim", int(cfg.hidden_size))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(getattr(cfg, "layer_norm_eps", 1e-6)))
    w.add_kv("clip.vision.projector.scale_factor",
             int(round(1.0 / downsample_ratio)))
    w.add_kv("clip.vision.image_mean", [0.485, 0.456, 0.406])  # imagenet
    w.add_kv("clip.vision.image_std", [0.229, 0.224, 0.225])

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in vision_model.state_dict().items()}

    def put(name, arr):
        w.add_tensor(name, np.ascontiguousarray(arr, dtype=np.float32),
                     ggml_type=GGMLType.F32)

    put("v.patch_embd.weight",
        sd["embeddings.patch_embeddings.projection.weight"])
    put("v.patch_embd.bias",
        sd["embeddings.patch_embeddings.projection.bias"])
    put("v.class_embd", sd["embeddings.cls_token"].reshape(-1))
    put("v.position_embd.weight",
        sd["embeddings.position_embeddings"].reshape(
            sd["embeddings.position_embeddings"].shape[-2:]))
    E = int(cfg.hidden_size)
    for il in range(int(cfg.num_hidden_layers)):
        b = f"encoder.layer.{il}."
        g = f"v.blk.{il}."
        if b + "attn.qkv.weight" in sd:  # OpenGVLab fused layout
            qkv_w = sd[b + "attn.qkv.weight"]
            for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                put(g + nm + ".weight", qkv_w[j * E:(j + 1) * E])
                if b + "attn.qkv.bias" in sd:
                    put(g + nm + ".bias",
                        sd[b + "attn.qkv.bias"][j * E:(j + 1) * E])
            put(g + "attn_out.weight", sd[b + "attn.proj.weight"])
            put(g + "attn_out.bias", sd[b + "attn.proj.bias"])
        else:  # HF split layout
            for hf, gg in (("attention.q_proj", "attn_q"),
                           ("attention.k_proj", "attn_k"),
                           ("attention.v_proj", "attn_v"),
                           ("attention.projection_layer", "attn_out")):
                put(g + gg + ".weight", sd[b + hf + ".weight"])
                if b + hf + ".bias" in sd:
                    put(g + gg + ".bias", sd[b + hf + ".bias"])
        for hf, gg in (("attention.q_norm", "attn_q_norm"),
                       ("attention.k_norm", "attn_k_norm")):
            if b + hf + ".weight" in sd:  # 6B-ViT qk RMS norm
                put(g + gg + ".weight", sd[b + hf + ".weight"])
        for hf, gg in (("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"),
                       ("layernorm_before", "ln1"),
                       ("layernorm_after", "ln2")):
            put(g + gg + ".weight", sd[b + hf + ".weight"])
            put(g + gg + ".bias", sd[b + hf + ".bias"])
        put(g + "ls1.weight", sd[b + "lambda_1"])
        put(g + "ls2.weight", sd[b + "lambda_2"])
    psd = {k: v.detach().cpu().float().numpy()
           for k, v in projector.state_dict().items()}
    put("mm.0.weight", psd["layer_norm.weight"])
    put("mm.0.bias", psd["layer_norm.bias"])
    put("mm.1.weight", psd["linear_1.weight"])
    put("mm.1.bias", psd["linear_1.bias"])
    put("mm.3.weight", psd["linear_2.weight"])
    put("mm.3.bias", psd["linear_2.bias"])
    w.write()
    return path
