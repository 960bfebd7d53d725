"""The decoder-stack forward graph for llama-family architectures.

Parity target: llm_build_llama (/root/reference/src/llama-model.cpp:4898-5052)
— per layer: RMSNorm -> QKV (+bias) -> RoPE -> attention over the unified
cache -> residual -> RMSNorm -> SwiGLU FFN (or MoE) -> residual; final norm
-> lm_head. Variants (qwen2 bias, qwen3 qk-norm, gemma2 softcaps/SWA) fold
into ModelConfig flags, mirroring how the reference's 67 builders share
llm_graph_context helpers (/root/reference/src/llama-graph.cpp).

This is ONE jit-compiled pure function per (T, S) bucket instead of the
reference's per-ubatch graph rebuild (SURVEY.md §3.1 hot loop (d)): the
whole model is a single XLA program, weights stay resident, the KV cache is
donated and updated in place via indexed scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention, build_attn_bias
from ..ops.norms import layer_norm, rms_norm
from ..ops.qmatmul import qembed, qmm
from ..ops.rope import apply_rope, rope_angles
from .config import ModelConfig

KV_QUANT_GROUP = 32


def _kv_write(cache, idx, val):
    """Scatter new K/V rows into the HEAD-MAJOR [Hkv, S, D] cache; quantizes
    when the cache is a (q8, scales) pair (reference's quantized-KV cpy
    path). val is token-major [T, Hkv, D]. mode="drop": padding tokens carry
    write_idx == n_cells (out of bounds on the S axis) and their rows are
    DISCARDED — this keeps the cache exactly n_cells rows (no trash row
    unaligning every attention tile)."""
    if isinstance(cache, tuple):
        q8, sc = cache
        t, h, d = val.shape
        g = d // sc.shape[-1]
        vf = val.astype(jnp.float32).reshape(t, h, d // g, g)
        amax = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
        scale = amax / 127.0
        inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
        qv = jnp.clip(jnp.round(vf * inv), -127, 127).astype(jnp.int8)
        return (
            q8.at[:, idx].set(qv.reshape(t, h, d).swapaxes(0, 1),
                              mode="drop"),
            sc.at[:, idx].set(
                scale.reshape(t, h, d // g).swapaxes(0, 1).astype(sc.dtype),
                mode="drop"),
        )
    return cache.at[:, idx].set(val.astype(cache.dtype).swapaxes(0, 1),
                                mode="drop")


def _kv_read(cache, dtype):
    """Dequantize + return the cache CELL-MAJOR [S, Hkv, D] — the layout the
    unfused attention() fallback consumes. The fused kernels read the
    head-major planes directly and never come through here."""
    if isinstance(cache, tuple):
        q8, sc = cache
        h, s, d = q8.shape
        g = d // sc.shape[-1]
        vf = q8.astype(jnp.float32).reshape(h, s, d // g, g) * sc.astype(jnp.float32)[..., None]
        return vf.reshape(h, s, d).swapaxes(0, 1).astype(dtype)
    return cache.swapaxes(0, 1).astype(dtype)


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


def _norm(x, w, cfg: ModelConfig, b=None):
    if cfg.norm_kind == "rms":
        return rms_norm(x, w, cfg.rms_eps)
    return layer_norm(x, w, b, cfg.rms_eps)


def _maybe_add(x, b):
    return x if b is None else x + b.astype(x.dtype)


def _split_fused(out, splits, tpf: int):
    """Slice a fused projection's output columns back into segments.

    tpf > 1: the fused weight was interleaved shard-major for a tp-way
    mesh (parallel/sharding.interleave_fused) — columns run
    [q_0 k_0 v_0 | q_1 k_1 v_1 | ...], so recover segment s by a
    [T, tpf, N/tpf] reshape + inner slice + flatten. The reshape factors
    the tp-sharded axis, so under GSPMD this is metadata-only (no
    collectives) and each shard keeps exactly its own heads."""
    T = out.shape[0]
    if tpf <= 1:
        off = 0
        segs = []
        for n in splits:
            segs.append(out[:, off: off + n])
            off += n
        return segs
    o3 = out.reshape(T, tpf, -1)
    off = 0
    segs = []
    for n in splits:
        c = n // tpf
        segs.append(o3[:, :, off: off + c].reshape(T, n))
        off += c
    return segs


def _proj(h, layer, key, dtype=None):
    """Projection matmul with optional LoRA delta (build_lora_mm parity,
    /root/reference/src/llama-graph.h:517)."""
    y = qmm(h, layer[key], out_dtype=dtype)
    lora = layer.get(key + ".lora")
    if lora is not None:
        a, b, s = lora
        delta = qmm(qmm(h, a), b)  # (x @ A^T) @ B^T, rows layout
        y = y + (s * delta).astype(y.dtype)
    return y


def _ffn(h, layer, cfg: ModelConfig, collect=None):
    act = ACTIVATIONS[cfg.act]
    if "ffn_gateup_fused" in layer:
        gu = qmm(h, layer["ffn_gateup_fused"])
        ng = cfg.n_ff
        g, up = _split_fused(gu, (ng, ng), cfg.fused_tp)
        cur = (act(g) * up).astype(h.dtype)
    else:
        gate = layer.get("ffn_gate")
        up = _maybe_add(_proj(h, layer, "ffn_up", h.dtype), layer.get("ffn_up_b"))
        if gate is not None:
            g = act(_maybe_add(_proj(h, layer, "ffn_gate"),
                               layer.get("ffn_gate_b")))
            cur = (g * up.astype(jnp.float32)).astype(h.dtype)
        else:
            cur = act(up.astype(jnp.float32)).astype(h.dtype)
    if "ffn_sub_norm" in layer:  # bitnet: RMS sub-norm before down_proj
        cur = rms_norm(cur, layer["ffn_sub_norm"], cfg.rms_eps)
    if collect is not None:
        collect("ffn_down", cur)
    return _maybe_add(_proj(cur, layer, "ffn_down", h.dtype),
                      layer.get("ffn_down_b"))


def _gather_experts(stack, topi, dtype):
    """[T, k] expert ids -> dequantized weights [T, k, n_out, K]. stack is a
    dense [E, n_out, K] array or a stacked-expert QTensor (loader keeps
    quantized experts at their stored bit-width)."""
    from ..ops.qmatmul import dequant_expert_rows
    from ..quant.qtensor import QTensor

    if isinstance(stack, QTensor):
        return dequant_expert_rows(stack, topi, dtype=dtype)
    return stack[topi].astype(dtype)


def _moe_ffn(h, layer, cfg: ModelConfig):
    """Mixture-of-experts FFN (parity: build_moe_ffn,
    /root/reference/src/llama-graph.h:550). Dense compute over top-k experts
    gathered per token; expert stacks may be quantized planes. The
    all-to-all EP path engages when an expert-parallel mesh is active."""
    T = h.shape[0]
    router_logits = qmm(h, layer["ffn_gate_inp"])  # [T, n_expert]
    if cfg.expert_gating_func == "sigmoid":
        probs = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    # DeepSeek-V3 selection bias: biases WHICH experts are picked, while
    # the mixing weights stay unbiased (build_moe_ffn exp_probs_b)
    sel = probs
    if "ffn_exp_probs_b" in layer:
        sel = probs + layer["ffn_exp_probs_b"].astype(jnp.float32)
    _, topi = jax.lax.top_k(sel, cfg.n_expert_used)  # [T, k]
    topw = jnp.take_along_axis(probs, topi, axis=-1)
    if cfg.expert_weights_norm:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    topw = topw * cfg.expert_weights_scale

    # gather expert weights per (token, k): dense einsum over gathered planes
    act = ACTIVATIONS[cfg.act]

    if cfg.expert_weight_before:
        # llama4: sigmoid-ed router weight scales the expert INPUT
        # (build_moe_ffn weight_before_ffn). With the usual k=1 this is a
        # per-token input scale and every dispatch path applies unchanged.
        if cfg.n_expert_used == 1:
            h = (h.astype(jnp.float32) * topw[:, :1]).astype(h.dtype)
            topw = jnp.ones_like(topw)
        else:
            cdtype = jnp.float32 if h.dtype == jnp.float32 else jnp.bfloat16
            hk = (h.astype(jnp.float32)[:, None, :]
                  * topw[..., None]).astype(cdtype)  # [T, k, K]
            upw = jnp.swapaxes(_gather_experts(layer["ffn_up_exps"], topi,
                                               cdtype), -1, -2)
            up = jnp.einsum("tki,tkin->tkn", hk, upw)
            if "ffn_gate_exps" in layer:
                gw = jnp.swapaxes(_gather_experts(layer["ffn_gate_exps"],
                                                  topi, cdtype), -1, -2)
                g = act(jnp.einsum("tki,tkin->tkn", hk, gw)
                        .astype(jnp.float32))
                cur = (g * up.astype(jnp.float32)).astype(cdtype)
            else:
                cur = act(up.astype(jnp.float32)).astype(cdtype)
            dw = jnp.swapaxes(_gather_experts(layer["ffn_down_exps"], topi,
                                              cdtype), -1, -2)
            out = jnp.einsum("tkf,tkfe->tke", cur, dw)
            return jnp.sum(out.astype(jnp.float32), axis=1).astype(h.dtype)

    from ..parallel.moe import ep_mesh, moe_ffn_ep, moe_ffn_grouped

    mesh, axis = ep_mesh()
    if mesh is not None and cfg.n_expert % mesh.shape[axis] == 0:
        return moe_ffn_ep(
            h, layer["ffn_up_exps"], layer.get("ffn_gate_exps"),
            layer["ffn_down_exps"], topi, topw.astype(jnp.float32), act,
            mesh, axis, cf=cfg.ep_cf,
        ).astype(h.dtype)

    import os as _os

    if T > 8 and _os.environ.get("LLM_TPU_MOE_GROUPED", "1") != "0":
        # prefill: token-routed grouped dispatch — per-expert bucket
        # matmuls stream each expert's weights from HBM once, instead of
        # the per-assignment gather below that materializes [T, k, N, K]
        # dequantized planes (O(T*k*N*K) bytes at real prefill sizes).
        # LLM_TPU_MOE_GROUPED=0 forces the gather path (bench A/B).
        return moe_ffn_grouped(
            h, layer["ffn_up_exps"], layer.get("ffn_gate_exps"),
            layer["ffn_down_exps"], topi, topw.astype(jnp.float32), act,
            cf=cfg.ep_cf,
        ).astype(h.dtype)

    cdtype = jnp.float32 if h.dtype == jnp.float32 else jnp.bfloat16

    def expert_mm(stack, x_tk):
        wk = _gather_experts(stack, topi, cdtype)  # [T, k, n_out, K]
        return jnp.einsum("tk,tekn->ten", x_tk.astype(cdtype),
                          jnp.swapaxes(wk, -1, -2))

    up = expert_mm(layer["ffn_up_exps"], h)
    if "ffn_gate_exps" in layer:
        g = act(expert_mm(layer["ffn_gate_exps"], h).astype(jnp.float32))
        cur = (g * up.astype(jnp.float32)).astype(h.dtype)
    else:
        cur = act(up.astype(jnp.float32)).astype(h.dtype)
    downw = _gather_experts(layer["ffn_down_exps"], topi, cdtype)
    out = jnp.einsum("ten,tekn->tek", cur.astype(cdtype), downw)
    out = jnp.sum(out.astype(jnp.float32) * topw[..., None], axis=1)
    return out.astype(h.dtype)


def forward(
    params: dict,
    cfg: ModelConfig,
    kv_k: list,
    kv_v: list,
    tokens: jnp.ndarray,  # [T] int32
    tok_pos: jnp.ndarray,  # [T] int32
    tok_seq: jnp.ndarray,  # [T] int32
    write_idx: jnp.ndarray,  # [T] int32 cache cells to scatter K/V into
    cell_pos: jnp.ndarray,  # [S] int32
    cell_seq_bits: jnp.ndarray,  # [S] uint32
    out_idx: jnp.ndarray,  # [O] int32 rows for which to compute logits
    dtype=jnp.bfloat16,
    collect_acts: bool = False,
    collect_hidden: bool = False,
    input_embd=None,  # [T, E] rows that REPLACE token embeddings (multimodal)
    swa_cell_pos=None,  # [Ss] int32 — ISWA dual cache: SWA layers' own cells
    swa_cell_seq_bits=None,  # [Ss] / [Ss, W] uint32
    swa_write_idx=None,  # [T] int32 scatter targets in the SWA ring
    tok_mpos=None,  # [T, 4] int32 M-RoPE positions (qwen2vl)
    cell_mpos=None,  # [S, 4] int32 M-RoPE positions per cache cell
):
    """One decode/prefill step. Returns (logits [O, vocab] f32, kv_k, kv_v,
    hidden [O, E] f32). With collect_acts=True a 5th element is returned:
    per-layer dicts of per-channel activation sums-of-squares — the data the
    reference's imatrix collector gathers via its eval callback
    (tools/imatrix/imatrix.cpp:42-83)."""
    acts: list = []
    hiddens: list = []  # per-layer hidden rows (cvector-generator input)

    def _collect(store, name, val):
        if collect_acts:
            store[name] = jnp.sum(
                val.astype(jnp.float32) ** 2, axis=tuple(range(val.ndim - 1))
            )
    cfg_rope = cfg.rope
    ff = params.get("rope_freqs")

    if input_embd is not None:
        x = input_embd.astype(dtype)
    else:
        x = qembed(params["tok_embd"], tokens, dtype=dtype)
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(dtype)
    if "pos_embd" in params:  # learned absolute positions (gpt2-style)
        x = x + jnp.take(params["pos_embd"], tok_pos, axis=0).astype(dtype)
    if "tok_norm" in params:  # embedding layer norm (bloom-style)
        x = _norm(x, params["tok_norm"], cfg, params.get("tok_norm_b"))

    # ISWA dual cache (llama-kv-cache-unified-iswa.*): SWA layers read/write
    # their own small ring; without it they alias the full table (swa_full).
    dual = swa_cell_pos is not None
    c_pos_swa = swa_cell_pos if dual else cell_pos
    c_bits_swa = swa_cell_seq_bits if dual else cell_seq_bits

    if cfg.rope_sections is not None and tok_mpos is not None:
        # qwen2vl M-RoPE: angles from (t, h, w, e) position streams
        # (ggml_mrope_cache_init semantics; ops/rope.py mrope_angles)
        from ..ops.rope import mrope_angles

        cos_t, sin_t = mrope_angles(tok_mpos, cfg.rope_sections, cfg_rope, ff)
        cos_c, sin_c = mrope_angles(cell_mpos, cfg.rope_sections, cfg_rope, ff)
    else:
        cos_t, sin_t = rope_angles(tok_pos, cfg_rope, ff)
        cos_c, sin_c = rope_angles(cell_pos, cfg_rope, ff)
    if cfg.rope_swa is not None:  # gemma3: SWA layers rope at their own base
        cos_t2, sin_t2 = rope_angles(tok_pos, cfg.rope_swa, ff)
    if cfg.rope_swa is not None or dual:
        cos_c2, sin_c2 = rope_angles(c_pos_swa, cfg.rope_swa or cfg_rope, ff)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cell_seq_bits)
    bias_swa = None
    if cfg.swa_window > 0:
        bias_swa = build_attn_bias(
            tok_pos, tok_seq, c_pos_swa, c_bits_swa,
            swa_window=cfg.swa_window, swa_chunked=cfg.swa_chunked,
        )

    scale = cfg.attn_scale if cfg.attn_scale is not None else cfg.head_dim ** -0.5
    H, Hkv, Dk, Dv = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.head_dim_v
    T = tokens.shape[0]

    alibi = None
    if cfg.alibi_max_bias > 0.0:
        # ggml soft_max_ext max_bias slope schedule (ggml-cpu ops soft_max)
        import math

        n2 = 2 ** math.floor(math.log2(H))
        m0 = 2.0 ** (-cfg.alibi_max_bias / n2)
        m1 = 2.0 ** (-cfg.alibi_max_bias / 2.0 / n2)
        slopes = [m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1)
                  for h in range(H)]
        alibi = jnp.asarray(slopes, jnp.float32)

    # fused attention path (ops/pallas_attn.py): flash_decode for small T,
    # flash_prefill (T-tiled) for prompt processing; full rotation,
    # dense bf16/f32 or per-head-scale q8 cache.
    # LLM_TPU_FLASH: "1" (default, both), "decode" (decode only), "0" (off)
    import os

    _flash_env = os.environ.get("LLM_TPU_FLASH", "1")
    # kv_k is a per-layer list (python loop) or a stacked [L, ...] array /
    # (q8, scales) pair (lax.scan path)
    kv_sample = kv_k[0] if isinstance(kv_k, list) else kv_k
    kv_is_q8 = isinstance(kv_sample, tuple)
    def _dim_ok(d):
        # any 8-multiple head dim (64/80/96/128/192 MLA...) rides the fused
        # kernels: hardware-validated round 4 (Mosaic compile + decode on
        # v5e for ALiBi hd64, hd80, partial-rotary hd128 — BENCH_r04
        # flash_* rows). LLM_TPU_FLASH_ANYDIM=0 restores the 128-only gate.
        if os.environ.get("LLM_TPU_FLASH_ANYDIM") == "0":
            return d % 128 == 0
        return d % 8 == 0

    # LLM_TPU_FLASH_FORCE=interpret runs the fused kernels in Pallas
    # interpret mode on any backend — the CPU e2e harness for kernel wiring
    _flash_force = os.environ.get("LLM_TPU_FLASH_FORCE") == "interpret"
    use_flash = (
        _flash_env != "0"
        and not (_flash_env == "decode" and T > 8)
        and (jax.default_backend() == "tpu" or _flash_force)
        # ALiBi (in-kernel slopes), partial rotary / MLA Dk!=Dv (identity
        # cos/sin fill), M-RoPE (per-cell angle tables) and rope-NONE all
        # ride the same rope-folded kernel now; see
        # tests/test_pallas_attn.py hard-arch coverage
        and _dim_ok(Dk) and _dim_ok(Dv)
        and cfg_rope.mode in (-1, 0, 2)
        # llama4 composes with the kernels as-is: the chunked-SWA mask is
        # part of the additive bias the kernels consume, attn-temp scaling
        # multiplies q before the call, and the weightless qk L2 norm
        # commutes with the on-read rotation (rope is orthogonal, so
        # rms(rope(k)) == rope(rms(k)) — k is normalized pre-cache);
        # e2e: tests/test_flash_e2e.py::test_flash_e2e_llama4
        and (
            not kv_is_q8
            or kv_sample[1].shape[-1] == 1  # q8 cache with per-head scales
        )
    )
    # chained-matmul fast path (ops/pallas_qmm_chain.py): whole layer tail
    # (o_proj -> residual -> ffn_norm -> gate+up -> swiglu -> down ->
    # residual) and the norm->QKV / final-norm->lm_head heads each run as
    # ONE Pallas launch — decode is launch-bound at small batch
    # (docs/PERF.md). Hardware A/B (round 4, docs/bench_r4_hw_capture.log):
    # the chain wins its isolated microbench (479 vs 522 us) but LOSES 7%
    # e2e (96.4 vs 103.7 t/s tg128) — the monolithic launch blocks XLA's
    # cross-kernel weight-stream overlap — so it is opt-IN: LLM_TPU_CHAIN=1
    # enables; LLM_TPU_CHAIN_FORCE=interpret is the CPU e2e harness.
    _chain_force = os.environ.get("LLM_TPU_CHAIN_FORCE") == "interpret"
    use_chain = (
        os.environ.get("LLM_TPU_CHAIN", "0") == "1"
        and (jax.default_backend() == "tpu" or _chain_force)
        and T <= 8
        and not collect_acts and not collect_hidden
        and cfg.norm_kind == "rms" and not cfg.parallel_residual
        and cfg.residual_scale == 1.0 and not cfg.nonparam_norm
        and cfg.act in ("silu", "gelu")
        and cfg.fused_tp <= 1
    )
    if use_chain:
        from ..ops.pallas_qmm_chain import (head_eligible, layer_tail,
                                            norm_mm, tail_eligible)

    if use_flash:
        from ..ops.pallas_attn import (expand_tables, flash_decode,
                                       flash_prefill, rope_companion)

        fattn = flash_decode if T <= 8 else flash_prefill

        nd = cfg_rope.n_dims
        cos_cf, sin_cf = expand_tables(cos_c, sin_c, cfg_rope.mode, Dk,
                                       n_dims=nd)
        cos_cf = cos_cf.astype(dtype)
        sin_cf = sin_cf.astype(dtype)
        if cfg.rope_swa is not None or dual:
            cos_cf2, sin_cf2 = expand_tables(cos_c2, sin_c2, cfg_rope.mode,
                                             Dk, n_dims=nd)
            cos_cf2 = cos_cf2.astype(dtype)
            sin_cf2 = sin_cf2.astype(dtype)
        flash_dist = None
        if alibi is not None:
            flash_dist = (tok_pos[:, None] - cell_pos[None, :]).astype(
                jnp.float32)

    def _layer_body(x, layer, kv_k_l, kv_v_l, is_swa, layer_acts,
                    H=H, Hkv=Hkv):
        """One decoder layer; returns (x, k_cache, v_cache). Shared between
        the per-layer python loop and the lax.scan path. H/Hkv default to
        the model-wide counts; openelm-style per-layer counts override."""
        swa_rope = cfg.rope_swa is not None and is_swa
        swa_tab = is_swa and (cfg.rope_swa is not None or dual)
        nope = cfg.nope_global_layers and not is_swa  # cohere2 NoPE layers
        x_in = x  # layer input (arctic's MoE branch reads it)
        # post-norm archs (olmo2) carry no input norms: attend over x
        # directly; olmo-style nonparam_norm normalizes without weights
        h = _norm(x, layer.get("attn_norm"), cfg, layer.get("attn_norm_b")) \
            if ("attn_norm" in layer or cfg.nonparam_norm) else x
        _collect(layer_acts, "attn_qkv", h)

        qkv_chain = None
        if use_chain and head_eligible(layer):
            qkv_chain = norm_mm(
                x, layer["attn_norm"], layer["attn_qkv_fused"],
                eps=cfg.rms_eps, compute_dtype=dtype, out_dtype=dtype,
                interpret=_chain_force)

        if qkv_chain is not None:
            q, k, v = _split_fused(qkv_chain, (H * Dk, Hkv * Dk, Hkv * Dv),
                                   cfg.fused_tp)
        elif "attn_qkv_fused" in layer and "attn_qkv_fused_b" in layer:
            # gpt2/bloom-style fused qkv with a fused bias
            qkv = qmm(h, layer["attn_qkv_fused"], out_dtype=dtype)
            qkv = qkv + layer["attn_qkv_fused_b"].astype(qkv.dtype)
            q, k, v = _split_fused(qkv, (H * Dk, Hkv * Dk, Hkv * Dv),
                                   cfg.fused_tp)
        elif cfg.kv_lora_rank > 0:
            # deepseek2 MLA (llm_build_deepseek2): low-rank Q/KV projections;
            # K/Q are laid out [rope_pe | nope] so the shared rope machinery
            # rotates the leading qk_rope_dim dims
            rope_d = cfg.qk_rope_dim
            nope_d = Dk - rope_d
            if "attn_q_a" in layer:
                qa = rms_norm(qmm(h, layer["attn_q_a"], out_dtype=dtype),
                              layer.get("attn_q_a_norm"), cfg.rms_eps)
                q = qmm(qa, layer["attn_q_b"], out_dtype=dtype)
            else:  # lite: direct q projection
                q = qmm(h, layer["attn_q"], out_dtype=dtype)
            q = q.reshape(T, H, Dk)

            kvc_pe = qmm(h, layer["attn_kv_a_mqa"], out_dtype=dtype)
            kvc = rms_norm(kvc_pe[:, : cfg.kv_lora_rank],
                           layer.get("attn_kv_a_norm"), cfg.rms_eps)
            k_pe = kvc_pe[:, cfg.kv_lora_rank:]  # [T, rope_d], 1 shared head
            kvb = qmm(kvc, layer["attn_kv_b"], out_dtype=dtype)
            kvb = kvb.reshape(T, H, nope_d + Dv)
            k_nope, v = kvb[..., :nope_d], kvb[..., nope_d:]
            k = jnp.concatenate(
                [jnp.broadcast_to(k_pe[:, None, :], (T, H, rope_d)), k_nope],
                axis=-1)
            v = v.reshape(T, H, Dv)
        elif "attn_qkv_fused" in layer:
            qkv = qmm(h, layer["attn_qkv_fused"], out_dtype=dtype)
            q, k, v = _split_fused(qkv, (H * Dk, Hkv * Dk, Hkv * Dv),
                                   cfg.fused_tp)
            q = _maybe_add(q, layer.get("attn_q_b"))
            k = _maybe_add(k, layer.get("attn_k_b"))
            v = _maybe_add(v, layer.get("attn_v_b"))
        else:
            q = _maybe_add(_proj(h, layer, "attn_q", dtype), layer.get("attn_q_b"))
            k = _maybe_add(_proj(h, layer, "attn_k", dtype), layer.get("attn_k_b"))
            v = _maybe_add(_proj(h, layer, "attn_v", dtype), layer.get("attn_v_b"))
        q = q.reshape(T, H, Dk)
        k = k.reshape(T, Hkv, Dk)
        v = v.reshape(T, Hkv, Dv)

        if cfg.qk_norm_full:
            # olmo2: RMS over the full flattened q/k vector (not per head)
            q = rms_norm(q.reshape(T, -1), layer.get("attn_q_norm"),
                         cfg.rms_eps).reshape(T, H, Dk)
            k = rms_norm(k.reshape(T, -1), layer.get("attn_k_norm"),
                         cfg.rms_eps).reshape(T, Hkv, Dk)
        elif cfg.qk_norm:
            q = rms_norm(q, layer.get("attn_q_norm"), cfg.rms_eps)
            k = rms_norm(k, layer.get("attn_k_norm"), cfg.rms_eps)
        elif cfg.qk_norm_ln and "attn_q_norm" in layer:
            # chameleon: per-head LayerNorm(+bias) on q/k at torch-default
            # 1e-5 eps (llm_build_chameleon; load_hparams sets f_norm_eps)
            def _hln(t, w, b):
                tf = t.astype(jnp.float32)
                mu = tf.mean(-1, keepdims=True)
                var = ((tf - mu) ** 2).mean(-1, keepdims=True)
                out = (tf - mu) / jnp.sqrt(var + 1e-5) * w.astype(jnp.float32)
                if b is not None:
                    out = out + b.astype(jnp.float32)
                return out.astype(t.dtype)

            q = _hln(q, layer["attn_q_norm"], layer.get("attn_q_norm_b"))
            k = _hln(k, layer["attn_k_norm"], layer.get("attn_k_norm_b"))

        if not nope:
            q = apply_rope(q, cos_t2 if swa_rope else cos_t,
                           sin_t2 if swa_rope else sin_t,
                           cfg_rope.mode, cfg_rope.n_dims)
            if cfg.qk_l2_norm:
                # Llama4TextL2Norm: weightless RMS on roped q/k
                q = rms_norm(q, None, cfg.rms_eps)
                k = rms_norm(k, None, cfg.rms_eps)
        elif cfg.attn_temp_scale > 0.0:
            # llama4 temperature tuning (llm_graph_input_attn_temp):
            # q *= log(floor((pos+1)/floor_scale) + 1) * scale + 1
            tscale = (jnp.log(jnp.floor(
                (tok_pos.astype(jnp.float32) + 1.0) / cfg.attn_temp_floor)
                + 1.0) * cfg.attn_temp_scale + 1.0)
            q = (q.astype(jnp.float32) * tscale[:, None, None]).astype(q.dtype)
        # K enters the cache UNROPED; rotated on read with cell positions.
        widx_l = swa_write_idx if (dual and is_swa) else write_idx
        k_cache = _kv_write(kv_k_l, widx_l, k)
        v_cache = _kv_write(kv_v_l, widx_l, v)

        layer_bias = bias_swa if (bias_swa is not None and is_swa) else bias
        if use_flash:
            if nope or cfg_rope.mode == -1:
                c_id = jnp.ones_like(cos_cf)
                s_id = jnp.zeros_like(sin_cf)
                att = fattn(q, jnp.zeros_like(q), k_cache, v_cache,
                            c_id, s_id, layer_bias, scale,
                            softcap=cfg.attn_softcap, interpret=_flash_force,
                            alibi_slopes=alibi, dist=flash_dist)
            else:
                att = fattn(
                    q, rope_companion(q, cfg_rope.mode, n_dims=nd),
                    k_cache, v_cache,
                    cos_cf2 if swa_tab else cos_cf,
                    sin_cf2 if swa_tab else sin_cf,
                    layer_bias, scale, softcap=cfg.attn_softcap,
                    interpret=_flash_force,
                    alibi_slopes=alibi, dist=flash_dist,
                )
        else:
            k_raw = _kv_read(k_cache, dtype)
            k_all = k_raw if nope else apply_rope(
                k_raw,
                cos_c2 if swa_tab else cos_c,
                sin_c2 if swa_tab else sin_c,
                cfg_rope.mode, cfg_rope.n_dims,
            )
            att = attention(
                q, k_all, _kv_read(v_cache, dtype), layer_bias, scale,
                softcap=cfg.attn_softcap, alibi_slopes=alibi,
                cell_pos=c_pos_swa if (dual and is_swa) else cell_pos,
                tok_pos=tok_pos,
            )
        att = att.reshape(T, H * Dv)
        if use_chain and tail_eligible(layer):
            out = layer_tail(
                att, x, layer["ffn_norm"], layer["attn_output"],
                layer["ffn_gateup_fused"], layer["ffn_down"],
                eps=cfg.rms_eps, act=cfg.act, compute_dtype=dtype,
                interpret=_chain_force)
            if out is not None:
                if "cvec" in layer:
                    out = out + layer["cvec"].astype(out.dtype)
                return out, k_cache, v_cache
        if "attn_sub_norm" in layer:  # bitnet: RMS sub-norm before o_proj
            att = rms_norm(att, layer["attn_sub_norm"], cfg.rms_eps)
        _collect(layer_acts, "attn_output", att)
        attn_out = _proj(att, layer, "attn_output", dtype)
        attn_out = _maybe_add(attn_out, layer.get("attn_output_b"))
        if "attn_post_norm" in layer:  # gemma2/olmo2 post-norm before residual
            attn_out = _norm(attn_out, layer["attn_post_norm"], cfg)
        if cfg.residual_scale != 1.0:
            attn_out = attn_out * cfg.residual_scale
        if cfg.parallel_residual:
            # parallel block: command-r shares the attn norm; gptneox/phi2
            # style uses its own ffn_norm when the tensor exists
            ffn_in = _norm(x, layer["ffn_norm"], cfg, layer.get("ffn_norm_b")) \
                if "ffn_norm" in layer else h
        else:
            x = x + attn_out
            ffn_in = _norm(x, layer.get("ffn_norm"), cfg, layer.get("ffn_norm_b")) \
                if ("ffn_norm" in layer or cfg.nonparam_norm) else x
        h2 = ffn_in
        _collect(layer_acts, "ffn_gateup", h2)
        if (cfg.n_expert > 0 and "ffn_gate_inp" in layer
                and "ffn_norm_exps" not in layer):
            ffn_out = _moe_ffn(h2, layer, cfg)
            if "ffn_up_shexp" in layer:  # shared expert (qwen2moe-style)
                shared = _ffn(
                    h2,
                    {
                        "ffn_gate": layer.get("ffn_gate_shexp"),
                        "ffn_up": layer["ffn_up_shexp"],
                        "ffn_down": layer["ffn_down_shexp"],
                    },
                    cfg,
                )
                if "ffn_gate_inp_shexp" in layer:
                    # sigmoid gate on the shared expert (llm_build_qwen2moe)
                    gate = jax.nn.sigmoid(
                        qmm(h2, layer["ffn_gate_inp_shexp"]).astype(jnp.float32))
                    shared = (shared.astype(jnp.float32) * gate).astype(shared.dtype)
                ffn_out = ffn_out + shared
        else:
            ffn_out = _ffn(
                h2, layer, cfg,
                collect=(lambda n, v, s=layer_acts: _collect(s, n, v))
                if collect_acts else None,
            )
        if "ffn_norm_exps" in layer:
            # arctic (llm_build_arctic): the MoE runs in PARALLEL with the
            # dense FFN, reading the LAYER INPUT through its own norm; both
            # join the residual stream
            moe_in = _norm(x_in, layer["ffn_norm_exps"], cfg)
            ffn_out = ffn_out + _moe_ffn(moe_in, layer, cfg)
        if "ffn_post_norm" in layer:
            ffn_out = _norm(ffn_out, layer["ffn_post_norm"], cfg)
        if cfg.residual_scale != 1.0:
            ffn_out = ffn_out * cfg.residual_scale
        x = x + ffn_out + attn_out if cfg.parallel_residual else x + ffn_out
        if "cvec" in layer:  # control-vector steering (build_cvec parity)
            x = x + layer["cvec"].astype(x.dtype)
        return x, k_cache, v_cache

    layers_stacked = params.get("layers_stacked")
    if (layers_stacked is not None and not collect_acts
            and not collect_hidden and cfg.swa_pattern == 0 and not dual
            and cfg.n_expert == 0):
        # homogeneous decoder stack: ONE scanned layer body — the program
        # (and its compile time) no longer grows with n_layers. Weight
        # planes stay OUTSIDE the scan and are indexed inside the Pallas
        # kernels by a scalar-prefetch layer id (StackedWeight) — slicing
        # them through scan xs would copy the full weights every step.
        # Small leaves (norms, biases) and the KV cache ride scan xs.
        from ..ops.qmatmul import StackedWeight
        from ..quant.qtensor import QTensor

        big, small = {}, {}
        for key, val in layers_stacked.items():
            if isinstance(val, QTensor) or getattr(val, "ndim", 0) >= 3:
                big[key] = val
            else:
                small[key] = val

        def _scan_step(x, xs):
            il, small_l, kk, vv = xs
            layer = dict(small_l)
            for key, w in big.items():
                layer[key] = StackedWeight(w, il)
            x, nk, nv = _layer_body(x, layer, kk, vv, False, {})
            return x, (nk, nv)

        lids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        x, (new_k, new_v) = jax.lax.scan(
            _scan_step, x, (lids, small, kv_k, kv_v))
    else:
        new_k, new_v = [], []
        for il, layer in enumerate(params["layers"]):
            layer_acts: dict = {}
            x, kc, vc = _layer_body(x, layer, kv_k[il], kv_v[il],
                                    cfg.layer_is_swa(il), layer_acts,
                                    H=cfg.heads_at(il), Hkv=cfg.kv_heads_at(il))
            new_k.append(kc)
            new_v.append(vc)
            acts.append(layer_acts)
            if collect_hidden:
                hiddens.append(jnp.take(x, out_idx, axis=0).astype(jnp.float32))

    out_w = params.get("output") if params.get("output") is not None else params["tok_embd"]
    logits = None
    if (use_chain and params.get("output_norm") is not None
            and "output_norm_b" not in params):
        from ..ops.pallas_qmm_chain import _is_kmajor_qt

        if _is_kmajor_qt(out_w):
            # fused final-norm + lm_head: norm only the output rows
            hs_pre = jnp.take(x, out_idx, axis=0)
            logits = norm_mm(
                hs_pre, params["output_norm"], out_w, eps=cfg.rms_eps,
                compute_dtype=dtype, out_dtype=jnp.float32,
                interpret=_chain_force)
            if logits is not None:
                hs = rms_norm(hs_pre, params["output_norm"], cfg.rms_eps)
    if logits is None:
        x = _norm(x, params.get("output_norm"), cfg, params.get("output_norm_b"))
        hs = jnp.take(x, out_idx, axis=0)
        logits = qmm(hs, out_w)  # f32
    if "output_b" in params:
        logits = logits + params["output_b"]
    if "output.lora" in params:
        a, b, s = params["output.lora"]
        logits = logits + s * qmm(qmm(hs, a), b)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    if collect_hidden:
        return logits, new_k, new_v, hs.astype(jnp.float32), hiddens
    if collect_acts:
        return logits, new_k, new_v, hs.astype(jnp.float32), acts
    return logits, new_k, new_v, hs.astype(jnp.float32)
