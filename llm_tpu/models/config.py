"""Model hyperparameters, read from GGUF metadata.

Parity target: the reference's per-arch hparams loading
(/root/reference/src/llama-hparams.h, llama-model.cpp load_hparams) reduced
to the data actually needed by the decoder graphs. The config is a frozen
(hashable) dataclass so it can be a static argument to jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..gguf.constants import Keys
from ..ops.rope import ROPE_TYPE_NEOX, ROPE_TYPE_NORM, RopeParams

# rope layout per architecture (reference: llama_model_rope_type,
# src/llama-model.cpp — NORM archs keep GGUF's pre-permuted QK weights)
_ROPE_MODE = {
    "llama": ROPE_TYPE_NORM,
    "llama4": ROPE_TYPE_NORM,
    "minicpm": ROPE_TYPE_NORM,
    "granite": ROPE_TYPE_NORM,
    "deci": ROPE_TYPE_NORM,
    "qwen2": ROPE_TYPE_NEOX,
    "qwen2moe": ROPE_TYPE_NEOX,
    "qwen3": ROPE_TYPE_NEOX,
    "qwen3moe": ROPE_TYPE_NEOX,
    "gemma": ROPE_TYPE_NEOX,
    "gemma2": ROPE_TYPE_NEOX,
    "gemma3": ROPE_TYPE_NEOX,
    "phi3": ROPE_TYPE_NEOX,
    "stablelm": ROPE_TYPE_NEOX,
    "starcoder2": ROPE_TYPE_NEOX,
    "olmo2": ROPE_TYPE_NEOX,
    "olmoe": ROPE_TYPE_NEOX,
    "mixtral": ROPE_TYPE_NORM,
    "command-r": ROPE_TYPE_NORM,
    "phi2": ROPE_TYPE_NEOX,
    "gptneox": ROPE_TYPE_NEOX,
    "gptj": ROPE_TYPE_NORM,
    "cohere2": ROPE_TYPE_NORM,
    "olmo": ROPE_TYPE_NORM,
    "arcee": ROPE_TYPE_NORM,
    "ernie4_5": ROPE_TYPE_NORM,
    "glm4": ROPE_TYPE_NORM,
    "chatglm": ROPE_TYPE_NORM,
    "nemotron": ROPE_TYPE_NEOX,
    "dbrx": ROPE_TYPE_NEOX,
    "phimoe": ROPE_TYPE_NEOX,
    "dots1": ROPE_TYPE_NEOX,
    "bitnet": ROPE_TYPE_NEOX,
    "granitemoe": ROPE_TYPE_NORM,
    "internlm2": ROPE_TYPE_NORM,
    "baichuan": ROPE_TYPE_NORM,
    "xverse": ROPE_TYPE_NORM,
    "orion": ROPE_TYPE_NEOX,
    "exaone": ROPE_TYPE_NEOX,
    # llama_model_rope_type: NORM group
    "arctic": ROPE_TYPE_NORM,
    "deepseek": ROPE_TYPE_NORM,
    "plm": ROPE_TYPE_NORM,
    "chameleon": ROPE_TYPE_NORM,
    "bailingmoe": ROPE_TYPE_NORM,
    # NEOX group
    "grok": ROPE_TYPE_NEOX,
    "qwen": ROPE_TYPE_NEOX,
    "plamo": ROPE_TYPE_NEOX,
    "openelm": ROPE_TYPE_NEOX,
    "codeshell": ROPE_TYPE_NEOX,
    "minicpm3": ROPE_TYPE_NEOX,
    # MROPE: multi-section positions; with equal position streams (the
    # text-only decode path) it is numerically identical to NEOX rope
    "qwen2vl": ROPE_TYPE_NEOX,
    # encoder family (llm_build_bert / llm_build_neo_bert)
    "nomic-bert": ROPE_TYPE_NEOX,
    "nomic-bert-moe": ROPE_TYPE_NEOX,
    "neo-bert": ROPE_TYPE_NORM,
}


@dataclass(frozen=True)
class ModelConfig:
    arch: str
    vocab_size: int
    n_embd: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    head_dim: int  # key length per head
    head_dim_v: int  # value length per head
    n_ff: int
    rms_eps: float = 1e-5
    rope: RopeParams = field(default_factory=lambda: RopeParams(n_dims=0))
    attn_scale: float | None = None  # None -> 1/sqrt(head_dim)
    tie_embeddings: bool = False
    norm_kind: str = "rms"  # "rms" | "ln"
    act: str = "silu"  # "silu" | "gelu" | "relu2"
    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    expert_weights_norm: bool = False
    expert_weights_scale: float = 1.0
    n_ff_expert: int = 0
    expert_gating_func: str = "softmax"  # "softmax" | "sigmoid" (DeepSeek-V3
    # style selection; reference llama_expert_gating_func_type)
    ep_cf: float = 0.0  # MoE capacity factor (0 = exact). Part of the
    # compiled program's identity: the engine folds it into cfg at
    # construction instead of reading env at trace time (--ep-capacity-factor)
    # attention extras
    qk_norm: bool = False  # qwen3/gemma3-style per-head RMS norm on q/k
    qk_norm_full: bool = False  # olmo2-style norm over the FULL q/k vector
    qk_norm_ln: bool = False  # chameleon: per-head LayerNorm(+bias) on q/k
    nonparam_norm: bool = False  # olmo: LayerNorm with no learned params
    residual_scale: float = 1.0  # granite residual_multiplier / minicpm depth scale
    parallel_residual: bool = False  # command-r: attn + ffn share the input norm
    attn_softcap: float = 0.0
    final_softcap: float = 0.0
    swa_window: int = 0
    swa_pattern: int = 0  # every Nth layer is full-attention (0 = no SWA)
    rope_swa: RopeParams | None = None  # separate rope for SWA layers (gemma3)
    nope_global_layers: bool = False  # cohere2: global layers skip rope
    swa_chunked: bool = False  # llama4 LLAMA_SWA_TYPE_CHUNKED: attend within
    # the current position chunk of swa_window instead of a sliding delta
    attn_temp_scale: float = 0.0  # llama4 temperature tuning on nope layers
    attn_temp_floor: int = 8192  # llama4 n_attn_temp_floor_scale
    qk_l2_norm: bool = False  # llama4 weightless L2 qk norm on rope layers
    expert_weight_before: bool = False  # llama4: router weight scales the
    # expert input instead of the expert output (weight_before_ffn)
    embedding_scale: float = 1.0
    logit_scale: float = 1.0
    attn_bias: bool = False  # qkv biases present (qwen2)
    alibi_max_bias: float = 0.0  # ALiBi slopes (mpt; ggml soft_max_ext max_bias)
    context_length: int = 0
    # state-space models (mamba family; llama-hparams.h ssm_* fields)
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0
    ssm_n_group: int = 0
    ssm_dt_b_c_rms: bool = False
    # rwkv6 (llama-hparams wkv_head_size / rescale_every_n_layers)
    wkv_head_size: int = 0
    rescale_every_n: int = 0
    # deepseek2 MLA (llama-hparams n_lora_q/n_lora_kv; head layout
    # [rope | nope] after the converter's pe de-interleave)
    kv_lora_rank: int = 0
    q_lora_rank: int = 0
    qk_rope_dim: int = 0
    # t5 encoder-decoder (llama-hparams n_rel_attn_bkts; dec start token)
    t5_rel_buckets: int = 0
    dec_start_token: int = -1
    # nomic-bert-moe: MoE FFN every Nth layer (LLM_KV_MOE_EVERY_N_LAYERS)
    moe_every_n: int = 0
    # gemma3n (llm_build_gemma3n_iswa): alternating-updates streams,
    # per-layer input embeddings, shared-KV tail layers, activation
    # sparsity std-multipliers per layer
    altup_n: int = 0  # altup.num_inputs
    altup_act: int = 0  # altup.active_idx
    n_embd_altup: int = 0  # embedding_length_per_layer_input
    n_kv_layers: int = 0  # layers that OWN a KV cache (0 = all)
    act_sparsity: tuple | None = None  # per-layer gaussian-topk std mults
    # explicit per-layer SWA flags (attention.sliding_window_pattern);
    # overrides the swa_pattern modulo rule when present
    swa_layers: tuple | None = None
    # qwen2vl M-RoPE pair-section widths (rope.dimension_sections);
    # non-None routes positions as (t, h, w, e) 4-vectors
    rope_sections: tuple | None = None
    # per-layer head counts (openelm/deci: GGUF stores head_count as an
    # array — llama-hparams.h n_head_arr/n_head_kv_arr)
    n_heads_list: tuple | None = None
    n_kv_heads_list: tuple | None = None
    # fused-projection TP interleave factor: >1 when fused QKV / gate-up
    # planes were re-laid out shard-major so they can shard over a tp mesh
    # axis (parallel/sharding.interleave for the layout contract). The
    # forward graph un-interleaves with a [T, tp, N/tp] reshape-slice.
    fused_tp: int = 1

    def heads_at(self, il: int) -> int:
        return self.n_heads_list[il] if self.n_heads_list else self.n_heads

    def kv_heads_at(self, il: int) -> int:
        return (self.n_kv_heads_list[il] if self.n_kv_heads_list
                else self.n_kv_heads)

    @property
    def is_recurrent(self) -> bool:
        return self.ssm_d_state > 0 or self.wkv_head_size > 0

    @property
    def is_enc_dec(self) -> bool:
        return self.arch in ("t5", "t5encoder")

    @property
    def n_rep(self) -> int:
        return self.n_heads // self.n_kv_heads

    def layer_is_swa(self, il: int) -> bool:
        if self.swa_window <= 0:
            return False
        if self.swa_layers is not None:  # explicit per-layer pattern
            return bool(self.swa_layers[il])
        if self.swa_pattern <= 0:
            return False
        # iSWA: layers where (il+1) % pattern != 0 use the sliding window
        return (il + 1) % self.swa_pattern != 0


def _ak(reader, template, default=None):
    return reader.akey(template, default)


def config_from_gguf(reader) -> ModelConfig:
    arch = reader.architecture
    n_embd = int(_ak(reader, Keys.LLM.EMBEDDING_LENGTH))
    n_layers = int(_ak(reader, Keys.LLM.BLOCK_COUNT))
    def _is_arr(v):  # array-valued KV (numpy array or list)
        return hasattr(v, "__len__") and not isinstance(v, (str, bytes))

    heads_raw = _ak(reader, Keys.Attention.HEAD_COUNT, 0)
    heads_list = kv_list = None
    if _is_arr(heads_raw):  # openelm/deci per-layer arrays
        heads_list = tuple(int(x) for x in heads_raw)
        n_heads = max(heads_list)
    else:
        n_heads = int(heads_raw or 0)
    kv_raw = _ak(reader, Keys.Attention.HEAD_COUNT_KV, heads_raw)
    if _is_arr(kv_raw):
        kv_list = tuple(int(x) for x in kv_raw)
        n_kv = max(kv_list)
    else:
        n_kv = int(kv_raw or 0)
        if heads_list is not None:
            kv_list = tuple(n_kv for _ in heads_list)
    head_dim = int(
        _ak(reader, Keys.Attention.KEY_LENGTH, n_embd // n_heads if n_heads else 0) or 0
    )
    head_dim_v = int(_ak(reader, Keys.Attention.VALUE_LENGTH, head_dim) or 0)
    n_ff_raw = _ak(reader, Keys.LLM.FEED_FORWARD_LENGTH, 0)
    n_ff = (max(int(x) for x in n_ff_raw)
            if _is_arr(n_ff_raw) else int(n_ff_raw or 0))
    vocab = _ak(reader, Keys.LLM.VOCAB_SIZE)
    if vocab is None:
        toks = reader.get(Keys.Tokenizer.LIST)
        vocab = len(toks) if toks is not None else 0
    ctx_len = int(_ak(reader, Keys.LLM.CONTEXT_LENGTH, 0))

    rot = int(_ak(reader, Keys.Rope.DIMENSION_COUNT, head_dim))
    scaling_type = _ak(reader, Keys.Rope.SCALING_TYPE, "none") or "none"
    factor = float(_ak(reader, Keys.Rope.SCALING_FACTOR, 1.0) or 1.0)
    freq_scale = 1.0 / factor if scaling_type in ("linear", "yarn") and factor else 1.0
    ext_factor = 1.0 if scaling_type == "yarn" else 0.0
    ext_factor = float(_ak(reader, "{arch}.rope.scaling.extrapolation_factor", ext_factor) or ext_factor)
    rope = RopeParams(
        n_dims=rot,
        mode=_ROPE_MODE.get(arch, ROPE_TYPE_NEOX),
        freq_base=float(_ak(reader, Keys.Rope.FREQ_BASE, 10000.0)),
        freq_scale=freq_scale,
        ext_factor=ext_factor if scaling_type == "yarn" else 0.0,
        attn_factor=float(_ak(reader, Keys.Rope.SCALING_ATTN_FACTOR, 1.0) or 1.0),
        beta_fast=float(_ak(reader, Keys.Rope.SCALING_BETA_FAST, 32.0) or 32.0),
        beta_slow=float(_ak(reader, Keys.Rope.SCALING_BETA_SLOW, 1.0) or 1.0),
        n_ctx_orig=int(_ak(reader, Keys.Rope.SCALING_ORIG_CTX, ctx_len) or ctx_len),
    )

    cfg = ModelConfig(
        arch=arch,
        vocab_size=int(vocab),
        n_embd=n_embd,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_kv,
        head_dim=head_dim,
        head_dim_v=head_dim_v,
        n_ff=n_ff,
        rms_eps=float(_ak(reader, Keys.Attention.LAYERNORM_RMS_EPS, 1e-5) or 1e-5),
        rope=rope,
        n_expert=int(_ak(reader, Keys.LLM.EXPERT_COUNT, 0) or 0),
        n_expert_used=int(_ak(reader, Keys.LLM.EXPERT_USED_COUNT, 0) or 0),
        n_ff_expert=int(_ak(reader, Keys.LLM.EXPERT_FEED_FORWARD_LENGTH, 0) or 0),
        swa_window=int(_ak(reader, Keys.Attention.SLIDING_WINDOW, 0) or 0),
        context_length=ctx_len,
        n_heads_list=heads_list,
        n_kv_heads_list=kv_list,
    )
    if arch == "openelm":
        # fused qkv ordered [q|k|v] per layer-varying head counts, per-head
        # RMS qk-norm, NEOX rope (llm_build_openelm :10749)
        cfg = replace(cfg, qk_norm=True)

    # per-arch adjustments (parity: load_hparams per-arch cases,
    # /root/reference/src/llama-model.cpp)
    if arch in ("qwen2", "qwen2moe"):
        cfg = replace(cfg, attn_bias=True)
    if cfg.n_expert > 0 and arch in ("llama", "mixtral", "qwen3moe"):
        # mixtral/qwen3moe normalize the top-k router weights (qwen2moe
        # does not: norm_topk_prob=false)
        cfg = replace(cfg, expert_weights_norm=True)
    if arch in ("qwen3", "qwen3moe"):
        cfg = replace(cfg, qk_norm=True)
    if arch == "llama4":
        # chunked ISWA (3 chunked + 1 full), nope + temperature tuning on
        # the full layers, weightless qk L2 norm except 128E, sigmoid
        # routing with shared experts (llama-model.cpp LLM_ARCH_LLAMA4
        # case + llm_build_llama_iswa; the reference hardcodes n_swa 8192 —
        # we honor the sliding-window KV when the converter recorded the
        # checkpoint's attention_chunk_size)
        cfg = replace(
            cfg,
            swa_window=int(_ak(reader, Keys.Attention.SLIDING_WINDOW, 8192)
                           or 8192),
            swa_pattern=4, swa_chunked=True,
            nope_global_layers=True, attn_temp_scale=0.1,
            attn_temp_floor=int(_ak(
                reader, "{arch}.attn_temperature_floor_scale", 8192) or 8192),
            qk_l2_norm=cfg.n_expert != 128,
            expert_gating_func="sigmoid", expert_weights_norm=False,
            expert_weight_before=True)
    if arch == "olmoe":
        cfg = replace(cfg, qk_norm_full=True, expert_weights_norm=True)
    if arch in ("gemma", "gemma2", "gemma3"):
        cfg = replace(cfg, act="gelu", embedding_scale=float(n_embd) ** 0.5)
    if arch == "gemma2":
        # 27B (46 layers) scales by n_embd/n_head (llama-model.cpp:999)
        attn_scale = (
            (n_embd / n_heads) ** -0.5 if n_layers == 46 else head_dim ** -0.5
        )
        cfg = replace(
            cfg,
            swa_window=int(_ak(reader, Keys.Attention.SLIDING_WINDOW, 4096) or 4096),
            swa_pattern=2,
            attn_softcap=float(_ak(reader, "{arch}.attn_logit_softcapping", 50.0) or 50.0),
            final_softcap=float(_ak(reader, "{arch}.final_logit_softcapping", 30.0) or 30.0),
            attn_scale=attn_scale,
        )
    if arch == "gemma3":
        # SWA layers rope at base 10000/scale 1 (llama-model.cpp:1008);
        # global layers use the checkpoint's rope base (typically 1e6)
        cfg = replace(
            cfg, qk_norm=True, swa_pattern=6,
            swa_window=int(_ak(reader, Keys.Attention.SLIDING_WINDOW, 1024) or 1024),
            attn_scale=float(_ak(reader, Keys.Attention.SCALE, 0.0625) or 0.0625),
            rope_swa=replace(rope, freq_base=10000.0, freq_scale=1.0,
                             ext_factor=0.0),
        )
    if arch == "granite":
        # granite multipliers (llama-model.cpp granite case: f_embedding_scale,
        # f_residual_scale, f_attention_scale, f_logit_scale)
        cfg = replace(
            cfg,
            embedding_scale=float(_ak(reader, "{arch}.embedding_scale", 1.0) or 1.0),
            residual_scale=float(_ak(reader, "{arch}.residual_scale", 1.0) or 1.0),
            logit_scale=1.0 / float(_ak(reader, "{arch}.logit_scale", 1.0) or 1.0),
            attn_scale=float(_ak(reader, Keys.Attention.SCALE, 0.0) or 0.0) or None,
        )
    if arch == "minicpm":
        # minicpm rides llm_build_granite: embeddings scaled by scale_emb,
        # residuals by scale_depth/sqrt(n_layer), logits DIVIDED by
        # f_logit_scale = n_embd/dim_model_base (ggml_scale(cur,
        # 1.0f/hparams.f_logit_scale), llama-model.cpp:13589)
        cfg = replace(
            cfg,
            embedding_scale=float(_ak(reader, "{arch}.embedding_scale", 12.0) or 12.0),
            residual_scale=float(_ak(reader, "{arch}.residual_scale", 0.0) or 0.0)
            or 1.4 / (n_layers ** 0.5),
            logit_scale=1.0
            / (float(_ak(reader, "{arch}.logit_scale", 0.0) or 0.0) or 1.0),
        )
    if arch == "baichuan" and n_layers == 40:
        # baichuan-13B: no rope, ALiBi slopes with max_bias hardcoded 8.0
        # (llama-model.cpp:686-689; llm_build_baichuan LLM_TYPE_13B skips
        # ggml_rope_ext)
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(cfg, rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0),
                      alibi_max_bias=8.0)
    if arch == "olmo2":
        # post-norm block: no input norms, RMS over the full q/k vectors
        cfg = replace(cfg, qk_norm_full=True)
    if arch == "starcoder":
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(cfg, norm_kind="ln", act="gelu",
                      rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0))
    if arch == "gpt2":
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(cfg, norm_kind="ln", act="gelu",
                      rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0))
    if arch == "gptj":
        cfg = replace(cfg, norm_kind="ln", act="gelu", parallel_residual=True)
    if arch == "gptneox":
        # use_parallel_residual is the common case (pythia); the converter
        # records the flag
        par = bool(_ak(reader, "{arch}.use_parallel_residual", True))
        cfg = replace(cfg, norm_kind="ln", act="gelu", parallel_residual=par)
    if arch == "bloom":
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(
            cfg, norm_kind="ln", act="gelu",
            rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0),
            alibi_max_bias=8.0,
        )
    if arch == "mpt":
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(
            cfg, norm_kind="ln", act="gelu",
            rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0),
            alibi_max_bias=float(
                _ak(reader, "{arch}.attention.max_alibi_bias", 8.0) or 8.0),
        )
    if arch == "starcoder2":
        cfg = replace(cfg, norm_kind="ln", act="gelu", attn_bias=True)
    if arch == "cohere2":
        # iSWA pattern 4; global (every 4th) layers have NO positional
        # encoding (llama-model.cpp:1139-1151, build_cohere2_iswa)
        cfg = replace(
            cfg,
            norm_kind="ln",
            parallel_residual=True,
            swa_pattern=4,
            swa_window=int(_ak(reader, Keys.Attention.SLIDING_WINDOW, 4096) or 4096),
            logit_scale=float(_ak(reader, "{arch}.logit_scale", 1.0) or 1.0),
            nope_global_layers=True,
        )
    if arch in ("command-r", "cohere"):
        cfg = replace(
            cfg,
            norm_kind="ln",
            parallel_residual=True,
            logit_scale=float(_ak(reader, "{arch}.logit_scale", 1.0) or 1.0),
        )
    if arch == "dbrx":
        # fused qkv, LN(weight-only) norms, normalized softmax top-k MoE
        # (llm_build_dbrx; DbrxModel converter)
        cfg = replace(cfg, norm_kind="ln", expert_weights_norm=True)
    if arch == "phimoe":
        # phi3 graph family + LayerNorm(+bias) + unnormalized softmax top-k
        # (llm_build_phi3<MoE>, llama-model.cpp:14845)
        cfg = replace(cfg, norm_kind="ln")
    if arch == "granitemoe":
        cfg = replace(
            cfg,
            embedding_scale=float(_ak(reader, "{arch}.embedding_scale", 1.0) or 1.0),
            residual_scale=float(_ak(reader, "{arch}.residual_scale", 1.0) or 1.0),
            logit_scale=1.0 / float(_ak(reader, "{arch}.logit_scale", 1.0) or 1.0),
            attn_scale=float(_ak(reader, Keys.Attention.SCALE, 0.0) or 0.0) or None,
            expert_weights_norm=True,
        )
    if arch == "dots1":
        # deepseek-v3-style routing: sigmoid scores + selection bias
        # (exp_probs_b) + normalized weights * routed scale; qk norms;
        # leading dense layers carry plain FFN tensors (llm_build_dots1)
        gf = int(_ak(reader, "{arch}.expert_gating_func", 2) or 2)
        cfg = replace(
            cfg,
            qk_norm=True,
            expert_gating_func="sigmoid" if gf == 2 else "softmax",
            expert_weights_norm=bool(_ak(reader, "{arch}.expert_weights_norm", True)),
            expert_weights_scale=float(_ak(reader, "{arch}.expert_weights_scale", 1.0) or 1.0),
        )
    if arch == "orion":
        # LayerNorm(+bias) norms, standard gated FFN (llm_build_orion)
        cfg = replace(cfg, norm_kind="ln")
    if arch == "olmo":
        # llama graph with non-parametric LayerNorm
        # (llm_build_olmo, llama-model.cpp:3289 "norm params removed")
        cfg = replace(cfg, norm_kind="ln", nonparam_norm=True)
    if arch == "nemotron":
        # LayerNorm(+bias) norms, squared-relu FFN without a gate
        # (llm_build_nemotron, llama-model.cpp:12399)
        cfg = replace(cfg, norm_kind="ln", act="relu2")
    if arch == "arcee":
        # llama with squared-relu no-gate FFN (llm_build_arcee :14528)
        cfg = replace(cfg, act="relu2")
    # ernie4_5: plain llama graph (llm_build_ernie4_5 :14398) — defaults
    # glm4: sandwich norms (attn/ffn post-norms) + fused gate-up, handled by
    # the tensor presence (llm_build_glm4 :12248)
    if arch == "falcon":
        cfg = replace(cfg, norm_kind="ln", act="gelu", parallel_residual=True)
    if arch == "phi2":
        cfg = replace(cfg, norm_kind="ln", act="gelu", parallel_residual=True,
                      attn_bias=True)
    if arch == "stablelm":
        cfg = replace(cfg, norm_kind="ln", attn_bias=True)
    if arch in ("t5", "t5encoder"):
        # fixed 1.0 attention scale; relative-position buckets; tied head
        # scales logits by d_model^-0.5 (llm_build_t5, HF T5 semantics)
        tied = "output.weight" not in reader.tensors
        cfg = replace(
            cfg,
            attn_scale=1.0,
            t5_rel_buckets=int(_ak(reader, "{arch}.attention.relative_buckets_count", 32) or 32),
            dec_start_token=int(_ak(reader, "{arch}.decoder_start_token_id", 0) or 0),
            logit_scale=(n_embd ** -0.5) if tied else 1.0,
        )
    if arch == "bitnet":
        # BitNet b1.58: squared-relu gated FFN + attn/ffn sub-norms before
        # the output projections (llm_build_bitnet, llama-model.cpp:3634)
        cfg = replace(cfg, act="relu2")
    if arch == "deepseek2":
        rope_dim = int(_ak(reader, Keys.Rope.DIMENSION_COUNT, 64) or 64)
        mscale_all = float(_ak(reader, "{arch}.rope.scaling.yarn_log_multiplier", 0.0) or 0.0)
        # llama.cpp MLA-cache GGUFs store key/value_length as the
        # compressed-cache dims and carry the true head dims in *_mla keys
        # (DeepseekV2Model converter: add_key_length(kv_lora+rope) +
        # add_key_length_mla(nope+rope))
        k_mla = _ak(reader, "{arch}.attention.key_length_mla")
        if k_mla is not None:
            head_dim = int(k_mla)
            head_dim_v = int(_ak(reader, "{arch}.attention.value_length_mla",
                                 head_dim) or head_dim)
            cfg = replace(cfg, head_dim=head_dim, head_dim_v=head_dim_v)
        cfg = replace(
            cfg,
            kv_lora_rank=int(_ak(reader, "{arch}.attention.kv_lora_rank", 512) or 512),
            q_lora_rank=int(_ak(reader, "{arch}.attention.q_lora_rank", 0) or 0),
            qk_rope_dim=rope_dim,
            n_expert_used=int(_ak(reader, Keys.LLM.EXPERT_USED_COUNT, 0) or 0),
            expert_weights_scale=float(_ak(reader, "{arch}.expert_weights_scale", 1.0) or 1.0),
            expert_weights_norm=bool(_ak(reader, "{arch}.expert_weights_norm", False)),
            # DeepSeek-V3 checkpoints ride the same arch with sigmoid
            # selection + exp_probs_b bias (llama_expert_gating_func_type)
            expert_gating_func="sigmoid" if int(
                _ak(reader, "{arch}.expert_gating_func", 1) or 1) == 2
            else "softmax",
            rope=replace(rope, mode=ROPE_TYPE_NEOX, n_dims=rope_dim),
            attn_scale=(head_dim ** -0.5),
            # non-MLA-cache mode: K/V expand to full heads (llm_build_deepseek2)
            n_kv_heads=n_heads,
        )
        if rope.ext_factor != 0.0 and rope.freq_scale != 1.0:
            # deepseek2 YaRN pre-scaling (llm_build_deepseek2 :11341-11345):
            # the whole magnitude correction moves into kq_scale
            # (mscale^2/sqrt(Dk), with the model's yarn_log_mul) while the
            # rope itself is made magnitude-NEUTRAL by an attn_factor that
            # cancels the generic 1+0.1*ln(1/fs) yarn term
            import math as _m

            _L = _m.log(1.0 / rope.freq_scale)
            _mscale = rope.attn_factor * (1.0 + mscale_all * _L)
            cfg = replace(
                cfg,
                attn_scale=_mscale * _mscale / _m.sqrt(head_dim),
                rope=replace(cfg.rope, attn_factor=1.0 / (1.0 + 0.1 * _L)),
            )
    if arch in ("rwkv7", "arwkv7"):
        cfg = replace(
            cfg,
            norm_kind="ln",
            wkv_head_size=int(_ak(reader, "{arch}.wkv.head_size", 64) or 64),
        )
    if arch == "rwkv6":
        cfg = replace(
            cfg,
            norm_kind="ln",
            wkv_head_size=int(_ak(reader, "{arch}.wkv.head_size", 64) or 64),
            rescale_every_n=int(_ak(reader, "{arch}.rescale_every_n_layers", 6) or 6),
        )
    if arch == "rwkv6qwen2":
        # qwen2 shell with rwkv6 token mixing + gated linear attention
        # (llm_build_rwkv6qwen2, llama-model.cpp:12969); RMS norms, no
        # channel mix, no rescale
        cfg = replace(
            cfg,
            wkv_head_size=int(_ak(reader, "{arch}.wkv.head_size", 64) or 64),
        )
    if arch in ("mamba", "mamba2", "falcon-mamba"):
        d_inner = int(_ak(reader, Keys.SSM.INNER_SIZE, 2 * n_embd) or 2 * n_embd)
        cfg = replace(
            cfg,
            ssm_d_conv=int(_ak(reader, Keys.SSM.CONV_KERNEL, 4) or 4),
            ssm_d_inner=d_inner,
            ssm_d_state=int(_ak(reader, Keys.SSM.STATE_SIZE, 16) or 16),
            ssm_dt_rank=int(
                _ak(reader, Keys.SSM.TIME_STEP_RANK, (n_embd + 15) // 16)
                or (n_embd + 15) // 16
            ),
            ssm_n_group=int(_ak(reader, Keys.SSM.GROUP_COUNT, 0) or 0),
            ssm_dt_b_c_rms=bool(_ak(reader, Keys.SSM.DT_B_C_RMS, False)),
        )
    if arch == "qwen":
        # qwen1: fused qkv+bias (MHA), NEOX rope, gated silu
        # (llm_build_qwen, llama-model.cpp:6947)
        cfg = replace(cfg, attn_bias=True)
    # qwen2vl: qwen2 graph with M-RoPE (llm_build_qwen2vl :7181); the
    # text-only position stream makes MROPE == NEOX, handled by _ROPE_MODE
    if arch == "qwen2vl":
        sect = _ak(reader, "{arch}.rope.dimension_sections")
        cfg = replace(
            cfg, attn_bias=True,
            rope_sections=(tuple(int(x) for x in sect)
                           if _is_arr(sect) else None))
    if arch == "plamo":
        # parallel block sharing the attention norm; gated silu
        # (llm_build_plamo :7999 — ffn input is the attn-normed x)
        cfg = replace(cfg, parallel_residual=True)
    if arch == "codeshell":
        # starcoder lineage (LN+bias, fused qkv+bias, gelu FFN) with NEOX
        # rope instead of learned positions (llm_build_codeshell :8224)
        cfg = replace(cfg, norm_kind="ln", act="gelu")
    if arch == "refact":
        # RMS norms + ALiBi MQA, no rope (llm_build_refact :6150;
        # load_hparams hardcodes f_max_alibi_bias = 8.0)
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(cfg, alibi_max_bias=8.0,
                      rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0))
    if arch == "jais":
        # gpt2-style LN+bias + fused qkv + ALiBi + gated silu FFN with
        # biases; kq scale is 1/n_embd_head, NOT 1/sqrt
        # (llm_build_jais :12020)
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(
            cfg, norm_kind="ln",
            rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0),
            alibi_max_bias=float(
                _ak(reader, "{arch}.attention.max_alibi_bias", 8.0) or 8.0),
            attn_scale=1.0 / float(head_dim),
        )
    if arch == "deepseek":
        # deepseek v1: llama attention + MoE with leading dense layers,
        # softmax gating scaled by expert_weights_scale, shared experts
        # (llm_build_deepseek :11164)
        cfg = replace(
            cfg,
            expert_weights_scale=float(
                _ak(reader, "{arch}.expert_weights_scale", 1.0) or 1.0),
        )
    if arch == "bailingmoe":
        # head dim is n_rot (build reshapes q/k/v by n_rot) and the kq
        # scale follows it; MoE like deepseek v1 plus optional weight norm
        # (llm_build_bailingmoe :14104)
        cfg = replace(
            cfg,
            head_dim=rot, head_dim_v=rot,
            attn_bias=True,
            attn_scale=float(rot) ** -0.5,
            expert_weights_scale=float(
                _ak(reader, "{arch}.expert_weights_scale", 1.0) or 1.0),
            expert_weights_norm=bool(
                _ak(reader, "{arch}.expert_weights_norm", False)),
        )
    if arch == "grok":
        # embeddings x 78.38367176906169, GELU MoE with normalized weights,
        # post-attention and post-MoE norms, logits x 1/sqrt(3)
        # (llm_build_grok :5752)
        cfg = replace(
            cfg, act="gelu",
            embedding_scale=78.38367176906169,
            logit_scale=0.5773502691896257,
            expert_weights_norm=True,
        )
    if arch == "arctic":
        # dense FFN residual + parallel MoE over the layer input normed by
        # ffn_norm_exps (llm_build_arctic :11026); n_ff_expert mirrors n_ff
        cfg = replace(cfg, expert_weights_norm=True,
                      n_ff_expert=cfg.n_ff_expert or cfg.n_ff)
    if arch == "chameleon":
        # llama graph + per-head LayerNorm(+bias) qk-norm (torch-default
        # 1e-5 eps); swin_norm checkpoints post-norm instead — the loader
        # remaps attn/ffn norms to post-norm slots (llm_build_chameleon
        # :13603, load_hparams LLM_KV_SWIN_NORM)
        cfg = replace(cfg, qk_norm_ln=True)
    if arch == "minicpm3":
        # MLA attention (q+kv loras) with minicpm's scale_embd/scale_depth/
        # dim_model_base multipliers (llm_build_minicpm3 :8594)
        rope_dim = int(_ak(reader, Keys.Rope.DIMENSION_COUNT, 32) or 32)
        cfg = replace(
            cfg,
            kv_lora_rank=int(_ak(reader, "{arch}.attention.kv_lora_rank", 256) or 256),
            q_lora_rank=int(_ak(reader, "{arch}.attention.q_lora_rank", 768) or 768),
            qk_rope_dim=rope_dim,
            rope=replace(rope, mode=ROPE_TYPE_NEOX, n_dims=rope_dim),
            # build_minicpm3 hardcodes scale_embd=12, scale_depth=1.4,
            # n_embd_base=256 (llama-model.cpp:8596-8599)
            embedding_scale=12.0,
            residual_scale=1.4 / (n_layers ** 0.5),
            logit_scale=256.0 / n_embd,
            n_kv_heads=n_heads,
        )
    if arch == "plm":
        # kv-lora MLA with a plain q projection + squared-relu no-gate FFN
        # (llm_build_plm :13932)
        rope_dim = int(_ak(reader, Keys.Rope.DIMENSION_COUNT, 32) or 32)
        cfg = replace(
            cfg,
            kv_lora_rank=int(_ak(reader, "{arch}.attention.kv_lora_rank", 512) or 512),
            qk_rope_dim=rope_dim,
            rope=replace(rope, n_dims=rope_dim),
            act="relu2",
            n_kv_heads=n_heads,
        )
    if arch == "gemma3n":
        # iSWA pattern 5 with per-layer override, SWA rope at base 10000,
        # attention scale 1.0, altup streams + per-layer inputs + shared-KV
        # tail (load_hparams GEMMA3N + llm_build_gemma3n_iswa; the altup
        # dims ride the converter's KVs with llama-hparams.h defaults)
        swa_pat = _ak(reader, "{arch}.attention.sliding_window_pattern")
        shared = int(_ak(reader, "{arch}.attention.shared_kv_layers", 0) or 0)
        spars = _ak(reader, "{arch}.activation_sparsity_scale")
        cfg = replace(
            cfg,
            act="gelu",
            qk_norm=True,
            attn_scale=1.0,
            embedding_scale=float(n_embd) ** 0.5,
            final_softcap=float(
                _ak(reader, "{arch}.final_logit_softcapping", 30.0) or 30.0),
            swa_pattern=5,
            swa_window=int(_ak(reader, Keys.Attention.SLIDING_WINDOW, 512) or 512),
            swa_layers=(tuple(bool(b) for b in swa_pat)
                        if _is_arr(swa_pat) else None),
            rope_swa=replace(rope, freq_base=10000.0, freq_scale=1.0,
                             ext_factor=0.0),
            altup_n=int(_ak(reader, "{arch}.altup.num_inputs", 4) or 4),
            altup_act=int(_ak(reader, "{arch}.altup.active_idx", 0) or 0),
            n_embd_altup=int(_ak(
                reader, "{arch}.embedding_length_per_layer_input", 256) or 256),
            n_kv_layers=(n_layers - shared) if shared else min(20, n_layers),
            act_sparsity=(tuple(float(s) for s in spars)
                          if _is_arr(spars) else None),
        )
    if arch == "nomic-bert-moe":
        cfg = replace(cfg, moe_every_n=int(
            _ak(reader, "{arch}.moe_every_n_layers", 0) or 0))
    if arch == "jina-bert-v2":
        # bidirectional ALiBi encoder, no rope (llm_build_bert JINA branch;
        # load_hparams hardcodes f_max_alibi_bias = 8.0)
        from ..ops.rope import ROPE_TYPE_NONE

        cfg = replace(cfg, alibi_max_bias=8.0,
                      rope=replace(rope, mode=ROPE_TYPE_NONE, n_dims=0))
    explicit_scale = _ak(reader, Keys.Attention.SCALE)
    if explicit_scale is not None and arch not in ("gemma3",):
        cfg = replace(cfg, attn_scale=float(explicit_scale))
    return cfg
