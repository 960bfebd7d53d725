"""Build model params (a pytree of QTensors / dense arrays) from a GGUF file.

Parity target: the reference's model loader
(/root/reference/src/llama-model-loader.cpp: tensor-name -> weight map,
create_tensor + load_all_data) — here the GGUF mmap views are unpacked
straight into TPU-friendly QTensor planes (quant/qtensor.py) or dense jnp
arrays; there is no backend-buffer placement step because XLA owns memory.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..quant.codecs import dequantize_tensor
from ..quant.qtensor import concat_qtensors, qtensor_from_gguf, supported_plane_types
from .config import ModelConfig, config_from_gguf

_BLK_RE = re.compile(r"^blk\.(\d+)\.(.+?)\.(weight|bias)$")
_T5_RE = re.compile(r"^(enc|dec)\.blk\.(\d+)\.(.+?)\.(weight|bias)$")

_PLANE_TYPES = set(supported_plane_types())


def _to_dense(reader: GGUFReader, name: str, dtype) -> jnp.ndarray:
    ti = reader.tensors[name]
    arr = dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape)
    return jnp.asarray(arr, dtype=dtype)


def _load_matrix(reader: GGUFReader, name: str, dense_dtype, use_planes: bool,
                 kmajor: bool = True):
    """2-D weight: QTensor planes when quantized (and enabled), dense otherwise."""
    ti = reader.tensors[name]
    if use_planes and ti.ggml_type in _PLANE_TYPES and len(ti.shape) == 2:
        return qtensor_from_gguf(reader.data(name), ti.ggml_type, ti.shape,
                                 kmajor=kmajor)
    return _to_dense(reader, name, dense_dtype)


def _permute_out(w, idx):
    """Permute the OUT dim of a weight ([out, in] dense, or the lane/N axis
    of K-major quantized planes — an exact per-column move)."""
    import dataclasses

    from ..quant.qtensor import QTensor

    if isinstance(w, QTensor):
        assert w.kmajor
        return dataclasses.replace(
            w, qs=w.qs[:, idx], scales=w.scales[:, idx],
            mins=None if w.mins is None else w.mins[:, idx])
    return w[jnp.asarray(idx)] if hasattr(w, "at") else w[idx]


def _mla_external_fixup(layers: list[dict], cfg) -> None:
    """Rewrite llama.cpp MLA tensor layouts into our internal convention.

    External GGUFs (reference DeepseekV2/MiniCPM3/PLM converters) keep the
    HF per-head order [nope | rope]; deepseek2/plm additionally store the
    rope dims INTERLEAVED (reference applies NORM rope directly,
    llama_model_rope_type). Our MLA forward wants [rope | nope] with
    half-layout (NEOX) rope, the layout our own converter emits (marked
    with {arch}.rope_pe_deinterleaved). New-style MLA-cache GGUFs split
    attn_kv_b into per-head attn_k_b (transposed) / attn_v_b — fold them
    back (llama-model.cpp deepseek2 create_tensor wk_b/wv_b)."""
    import numpy as np

    rope = cfg.qk_rope_dim
    Dk = cfg.head_dim
    nope = Dk - rope
    Dv = cfg.head_dim_v
    H = cfg.n_heads
    interleaved = cfg.arch in ("deepseek2", "plm")  # NORM-rope family
    half = np.concatenate([2 * np.arange(rope // 2),
                           2 * np.arange(rope // 2) + 1]) \
        if interleaved else np.arange(rope)
    head = np.concatenate([nope + half, np.arange(nope)])
    qidx = (np.arange(H)[:, None] * Dk + head[None, :]).reshape(-1)
    kidx = None
    if interleaved:
        kidx = np.concatenate([np.arange(cfg.kv_lora_rank),
                               cfg.kv_lora_rank + half])
    for L in layers:
        if "attn_k_b" in L and "attn_kv_b" not in L:
            # [H, kv_lora, nope] (k^T per head) + [H, Dv, kv_lora]
            kb = np.asarray(L.pop("attn_k_b"), np.float32)
            vb = np.asarray(L.pop("attn_v_b"), np.float32)
            kv = np.concatenate([np.swapaxes(kb, 1, 2), vb], axis=1)
            L["attn_kv_b"] = jnp.asarray(kv.reshape(H * (nope + Dv), -1))
        for key in ("attn_q", "attn_q_b"):
            if key in L:
                L[key] = _permute_out(L[key], qidx)
        if kidx is not None and "attn_kv_a_mqa" in L:
            L["attn_kv_a_mqa"] = _permute_out(L["attn_kv_a_mqa"], kidx)


def _fuse_projections(layers: list[dict]) -> None:
    """Fuse QKV and gate+up into single QTensors when the quant recipes
    match — fewer, larger fused-matmul launches (decode is launch-bound at
    small batch). The forward graph slices the fused outputs."""
    import jax

    for layer in layers:
        if all(k in layer for k in ("attn_q", "attn_k", "attn_v")):
            fused = (
                concat_qtensors([layer["attn_q"], layer["attn_k"], layer["attn_v"]])
                if all(not isinstance(layer[k], jax.Array)
                       for k in ("attn_q", "attn_k", "attn_v"))
                else None
            )
            if fused is not None:
                layer["attn_qkv_fused"] = fused
                del layer["attn_q"], layer["attn_k"], layer["attn_v"]
        if "ffn_gate" in layer and "ffn_up" in layer:
            fused = (
                concat_qtensors([layer["ffn_gate"], layer["ffn_up"]])
                if not isinstance(layer["ffn_gate"], jax.Array)
                and not isinstance(layer["ffn_up"], jax.Array)
                else None
            )
            if fused is not None:
                layer["ffn_gateup_fused"] = fused
                del layer["ffn_gate"], layer["ffn_up"]


def stack_layers(layers: list[dict]):
    """Stack homogeneous per-layer param dicts into one pytree with a
    leading n_layers dim (leaves [L, ...]; QTensor meta preserved) for the
    lax.scan decoder path — the compiled program stops growing with depth.
    Returns None when layers are not uniform (mixed keys/shapes/quant
    recipes)."""
    import jax

    if not layers:
        return None
    keys = set(layers[0].keys())
    if any(set(l.keys()) != keys for l in layers):
        return None
    try:
        return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    except (ValueError, TypeError):
        return None


def load_params(
    reader: GGUFReader,
    dense_dtype=jnp.bfloat16,
    use_planes: bool = True,
    fuse: bool = True,
    scan_layers: bool = False,
    progress_callback=None,
) -> tuple[dict, ModelConfig]:
    """Returns (params, config). params layout documented in
    models/transformer.py::forward.

    progress_callback(frac) -> bool: called as tensors load (the reference's
    llama_progress_callback, llama.h:314-317); returning False cancels the
    load (test-model-load-cancel semantics) by raising InterruptedError."""
    cfg = config_from_gguf(reader)

    layers: list[dict] = [{} for _ in range(cfg.n_layers)]
    params: dict = {"layers": layers}
    # chameleon swin_norm: post-norm tensor remap (LLM_KV_SWIN_NORM)
    swin_norm = bool(reader.akey("{arch}.swin_norm", False))
    if cfg.is_enc_dec:
        params["enc_layers"] = [{} for _ in range(cfg.n_layers)]
        params["dec_layers"] = [{} for _ in range(cfg.n_layers)]

    n_total = max(1, len(reader.tensors))
    for i_tensor, (name, ti) in enumerate(reader.tensors.items()):
        if progress_callback is not None:
            if progress_callback(i_tensor / n_total) is False:
                raise InterruptedError("model load cancelled")
        m5 = _T5_RE.match(name) if cfg.is_enc_dec else None
        if m5:
            side, il, base, kind = (m5.group(1), int(m5.group(2)),
                                    m5.group(3), m5.group(4))
            if il >= cfg.n_layers:
                continue
            key = {"attn_o": "attn_output",
                   "cross_attn_o": "cross_attn_output"}.get(base, base)
            if kind == "bias":
                key += "_b"
            tgt = params["enc_layers" if side == "enc" else "dec_layers"][il]
            if base == "attn_rel_b" or kind == "bias" or len(ti.shape) == 1:
                tgt[key] = _to_dense(reader, name, jnp.float32)
            else:
                tgt[key] = _load_matrix(reader, name, dense_dtype, use_planes)
            continue
        if name == "enc.output_norm.weight":
            params["enc_output_norm"] = _to_dense(reader, name, jnp.float32)
            continue
        if name == "dec.output_norm.weight":
            params["dec_output_norm"] = _to_dense(reader, name, jnp.float32)
            continue
        m = _BLK_RE.match(name)
        if m:
            il, base, kind = int(m.group(1)), m.group(2), m.group(3)
            if il >= cfg.n_layers:
                continue
            key = base if kind == "weight" else base + "_b"
            if base == "attn_qkv":
                key = "attn_qkv_fused" if kind == "weight" else "attn_qkv_fused_b"
            elif base == "exp_probs_b":
                key = "ffn_exp_probs_b"  # expert-selection bias (DeepSeek-V3)
            elif base == "attn_out_norm":
                # grok: post-attention norm before the residual — same slot
                # as gemma2's attn_post_norm (llm_build_grok)
                key = "attn_post_norm" if kind == "weight" else "attn_post_norm_b"
            elif base == "layer_out_norm":
                key = "ffn_post_norm" if kind == "weight" else "ffn_post_norm_b"
            elif swin_norm and base in ("attn_norm", "ffn_norm"):
                # chameleon swin_norm: norms move AFTER attention/FFN
                # (llm_build_chameleon hparams.swin_norm branches)
                key = ("attn_post_norm" if base == "attn_norm"
                       else "ffn_post_norm") + ("" if kind == "weight" else "_b")
            elif kind == "weight" and base == "ffn_up" and cfg.arch in (
                    "phi3", "phimoe", "glm4", "chatglm"):
                key = "ffn_gateup_fused"  # GGUF packs [gate; up] in ffn_up
            if base.startswith(("time_mix_", "channel_mix_")):
                # rwkv6 tensors: big projections as matrices, everything
                # else (lerps, decay, first, w2, ln) dense f32
                rwkv_mats = {
                    "time_mix_key", "time_mix_value", "time_mix_receptance",
                    "time_mix_gate", "time_mix_output", "time_mix_w1",
                    "time_mix_decay_w1", "channel_mix_key",
                    "channel_mix_value", "channel_mix_receptance",
                }
                if base in rwkv_mats and kind == "weight":
                    layers[il][key] = _load_matrix(reader, name, dense_dtype, use_planes)
                else:
                    arr = np.asarray(
                        dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape),
                        np.float32)
                    if base != "time_mix_w2":
                        arr = np.squeeze(arr)
                    layers[il][key] = jnp.asarray(arr)
            elif base == "ssm_conv1d" and kind == "weight":
                # ne (d_conv, d_inner) -> [d_conv, d_inner] dense f32
                layers[il][key] = _to_dense(reader, name, jnp.float32).T
            elif base == "ssm_norm":
                # mamba2 grouped gate-norm weights [G, d_inner/G], dense f32
                layers[il][key] = _to_dense(reader, name, jnp.float32)
            elif base in ("ssm_a", "ssm_d"):
                # A decay factors / D skips stay f32 (mamba2 stores them
                # as (n_head, 1) 2-D tensors)
                layers[il][key] = _to_dense(reader, name, jnp.float32)
            elif kind == "bias" or len(ti.shape) == 1:
                layers[il][key] = _to_dense(reader, name, jnp.float32)
            elif base in ("attn_k_b", "attn_v_b"):
                # MLA-cache split wk_b/wv_b (3-D per-head); folded back into
                # attn_kv_b by _mla_external_fixup
                layers[il][key] = _to_dense(reader, name, jnp.float32)
            elif len(ti.shape) == 3:
                # expert stacks: quantized planes with a leading expert dim
                # when possible (the MoE paths gather+dequant per routed
                # expert), dense [n_expert, n_out, K] otherwise
                if use_planes and ti.ggml_type in _PLANE_TYPES:
                    from ..quant.qtensor import expert_qtensor_from_gguf

                    layers[il][key] = expert_qtensor_from_gguf(
                        reader.data(name), ti.ggml_type, ti.shape)
                else:
                    layers[il][key] = _to_dense(reader, name, dense_dtype)
            elif base in ("attn_q_norm", "attn_k_norm"):
                layers[il][key] = _to_dense(reader, name, jnp.float32)
            else:
                layers[il][key] = _load_matrix(reader, name, dense_dtype, use_planes)
            continue

        if name == "token_embd.weight":
            # rows layout for token gathers (kmajor=False)
            params["tok_embd"] = _load_matrix(
                reader, name, dense_dtype, use_planes, kmajor=False)
        elif name == "output.weight":
            params["output"] = _load_matrix(reader, name, dense_dtype, use_planes)
        elif name == "output.bias":
            params["output_b"] = _to_dense(reader, name, jnp.float32)
        elif name == "output_norm.weight":
            params["output_norm"] = _to_dense(reader, name, jnp.float32)
        elif name == "output_norm.bias":
            params["output_norm_b"] = _to_dense(reader, name, jnp.float32)
        elif name == "token_embd_norm.weight":
            params["tok_norm"] = _to_dense(reader, name, jnp.float32)
        elif name == "token_embd_norm.bias":
            params["tok_norm_b"] = _to_dense(reader, name, jnp.float32)
        elif name == "position_embd.weight":
            params["pos_embd"] = _to_dense(reader, name, jnp.float32)
        elif name == "per_layer_token_embd.weight":
            # gemma3n: [vocab, n_layer*n_embd_altup] row-gathered per token
            params["per_layer_token_embd"] = _load_matrix(
                reader, name, dense_dtype, use_planes, kmajor=False)
        elif name == "per_layer_model_proj.weight":
            params["per_layer_model_proj"] = _load_matrix(
                reader, name, dense_dtype, use_planes)
        elif name == "per_layer_proj_norm.weight":
            params["per_layer_proj_norm"] = _to_dense(reader, name, jnp.float32)
        elif name in ("altup_proj.weight", "altup_unembd_proj.weight"):
            # [n_altup-1, n_embd, n_embd] dense stacks (small vs the model)
            params[name.rsplit(".", 1)[0]] = _to_dense(reader, name, jnp.float32)
        elif name in ("rope_factors_long.weight", "rope_factors_short.weight"):
            # longrope factor pair (phi3/minicpm3; llama-model.cpp
            # get_rope_factors picks by context length — the engine does)
            params[name.rsplit(".", 1)[0]] = np.asarray(
                dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape),
                np.float32).reshape(-1)
        elif name == "rope_freqs.weight":
            params["rope_freqs"] = np.asarray(
                dequantize_tensor(reader.data(name), ti.ggml_type, ti.shape), np.float32
            ).reshape(-1)

    if params.get("output") is None and "token_embd.weight" in reader.tensors:
        # tied lm_head: a K-major copy of the embedding table for the matmul
        # path (the rows layout can't feed the fused kernel)
        ti = reader.tensors["token_embd.weight"]
        if isinstance(params.get("tok_embd"), jnp.ndarray):
            params["output"] = params["tok_embd"]  # dense works either way
        else:
            params["output"] = _load_matrix(
                reader, "token_embd.weight", dense_dtype, use_planes, kmajor=True)
    params.setdefault("output", None)
    if progress_callback is not None:
        progress_callback(1.0)
    if cfg.kv_lora_rank > 0 \
            and not reader.akey("{arch}.rope_pe_deinterleaved", False):
        # external (reference-converter) MLA layout -> internal convention
        _mla_external_fixup(layers, cfg)
    if fuse and use_planes:
        _fuse_projections(layers)
    if scan_layers and not cfg.is_recurrent:
        stacked = stack_layers(layers)
        if stacked is not None:
            params["layers_stacked"] = stacked
            params["layers"] = []  # scan mode: no per-layer access
    return params, cfg
