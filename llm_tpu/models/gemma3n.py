"""Gemma3n decoder: alternating-updates (altup) streams, laurel blocks,
per-layer input embeddings, shared-KV tail layers, activation sparsity.

Parity target: llm_build_gemma3n_iswa
(/root/reference/src/llama-model.cpp:9190-9625) — altup predict/correct
(einsum orientation per Gemma3nTextAltUp), laurel low-rank residual,
per-layer inputs (per_layer_token_embd gather + per_layer_model_proj),
gaussian-topk activation sparsity on the FFN gate, KV reuse for the tail
layers (il_reuse = n_kv_layers - (2 if swa else 1)), iSWA with local rope
at base 10000, attention scale 1.0, final logit softcap.

TPU notes: K enters the cache UNROPED (rotated on read with cell
positions), so KV reuse is exact — the reuse layer shares the producing
layer's rope base because it shares its attention type. Magnitude
renormalization follows the HF reference (RMS with a 1e-5 clamp); the
ggml sqrt-of-sum variant differs only by the clamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention, build_attn_bias
from ..ops.norms import rms_norm
from ..ops.qmatmul import qembed, qmm
from ..ops.rope import apply_rope, rope_angles
from .config import ModelConfig
from .transformer import _kv_read, _kv_write


def _mag(x):
    """RMS magnitude with the HF epsilon clamp: [T, E] -> [T, 1]."""
    return jnp.sqrt(jnp.maximum((x * x).mean(-1, keepdims=True), 1e-5))


def _gaussian_topk(x, std_mul: float):
    """Activation sparsity (gaussian_topk): keep the tail above
    mean + std_mul * std, computed per token over the FF dim. Uses the
    BIASED std (divide by n) to match Gemma3nTextMLP._gaussian_topk
    (unbiased=False); the reference's port divides by n-1
    (llama-model.cpp gaussian_topk) — a small deviation from the model."""
    mean = x.mean(-1, keepdims=True)
    std = jnp.sqrt(((x - mean) ** 2).mean(-1, keepdims=True))
    return jax.nn.relu(x - (mean + std * std_mul))


def forward_gemma3n(
    params: dict,
    cfg: ModelConfig,
    kv_k: list,
    kv_v: list,
    tokens: jnp.ndarray,  # [T]
    tok_pos: jnp.ndarray,
    tok_seq: jnp.ndarray,
    write_idx: jnp.ndarray,
    cell_pos: jnp.ndarray,
    cell_seq_bits: jnp.ndarray,
    out_idx: jnp.ndarray,
    dtype=jnp.bfloat16,
    collect_acts: bool = False,
    collect_hidden: bool = False,
    input_embd=None,
    swa_cell_pos=None,
    swa_cell_seq_bits=None,
    swa_write_idx=None,
):
    """Engine-facing step (same contract as transformer.forward). Compute
    runs in f32 — the altup magnitude renorms and innovation terms are
    precision-sensitive."""
    f32 = jnp.float32
    E = cfg.n_embd
    T = tokens.shape[0]
    L = cfg.n_layers
    Lkv = cfg.n_kv_layers or L
    n_alt = cfg.altup_n
    i_act = cfg.altup_act
    Ea = cfg.n_embd_altup
    H, Hkv, Dk, Dv = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.head_dim_v
    eps = cfg.rms_eps

    cdt = f32 if dtype == f32 else jnp.bfloat16

    def mm(x, w):
        return qmm(x.astype(cdt), w, out_dtype=f32)

    # -- embeddings + per-layer inputs --------------------------------------
    if input_embd is not None:
        x0 = input_embd.astype(f32)
    else:
        x0 = qembed(params["tok_embd"], tokens, dtype=f32) * (float(E) ** 0.5)

    pl_tok = qembed(params["per_layer_token_embd"], tokens, dtype=f32)
    pl_tok = pl_tok.reshape(T, L, Ea) * (float(Ea) ** 0.5)
    pl_proj = mm(x0, params["per_layer_model_proj"]) * (float(E) ** -0.5)
    pl_proj = rms_norm(pl_proj.reshape(T, L, Ea),
                       params["per_layer_proj_norm"], eps)
    inp_per_layer = (pl_tok + pl_proj) * (2.0 ** -0.5)  # [T, L, Ea]

    # -- altup stack: project stream 0 into the other n_alt-1 streams ------
    tm = _mag(x0)
    ap = params["altup_proj"].astype(f32)  # [n_alt-1, E, E]
    added = jnp.einsum("te,aoe->tao", x0, ap)  # [T, n_alt-1, E]
    added = added * tm[:, None, :] / _mag(added.reshape(-1, E)).reshape(T, -1, 1)
    xs = jnp.concatenate([x0[:, None, :], added], axis=1)  # [T, n_alt, E]

    # -- rope tables + masks ------------------------------------------------
    cos_t, sin_t = rope_angles(tok_pos, cfg.rope, None)
    cos_c, sin_c = rope_angles(cell_pos, cfg.rope, None)
    dual = swa_cell_pos is not None
    c_pos_swa = swa_cell_pos if dual else cell_pos
    c_bits_swa = swa_cell_seq_bits if dual else cell_seq_bits
    cos_t2, sin_t2 = rope_angles(tok_pos, cfg.rope_swa, None)
    cos_c2, sin_c2 = rope_angles(c_pos_swa, cfg.rope_swa, None)
    bias = build_attn_bias(tok_pos, tok_seq, cell_pos, cell_seq_bits)
    bias_swa = build_attn_bias(tok_pos, tok_seq, c_pos_swa, c_bits_swa,
                               swa_window=cfg.swa_window)
    scale = cfg.attn_scale if cfg.attn_scale is not None else Dk ** -0.5

    def _altup_modalities(layer, act):
        r = rms_norm(act, layer["altup_router_norm"], eps) / float(E)
        return jnp.tanh(mm(r, layer["altup_router"]))  # [T, n_alt]

    new_k = list(kv_k)
    new_v = list(kv_v)
    hiddens: list = []
    for il, layer in enumerate(params["layers"]):
        is_swa = cfg.layer_is_swa(il)

        # altup predict
        mod = _altup_modalities(layer, xs[:, i_act])
        coefs = mm(mod, layer["altup_predict_coef"]).reshape(T, n_alt, n_alt)
        preds = xs + jnp.einsum("tke,tjk->tje", xs, coefs)
        act = preds[:, i_act]  # [T, E]

        h = rms_norm(act, layer["attn_norm"], eps)
        laurel = rms_norm(mm(mm(h, layer["laurel_l"]), layer["laurel_r"]),
                          layer["laurel_post_norm"], eps) + h

        # attention (KV reuse for the tail layers)
        q = mm(h, layer["attn_q"]).reshape(T, H, Dk)
        q = rms_norm(q, layer["attn_q_norm"], eps)
        q = apply_rope(q, cos_t2 if is_swa else cos_t,
                       sin_t2 if is_swa else sin_t,
                       cfg.rope.mode, cfg.rope.n_dims)
        if il < Lkv:
            k = mm(h, layer["attn_k"]).reshape(T, Hkv, Dk)
            k = rms_norm(k, layer["attn_k_norm"], eps)
            v = rms_norm(mm(h, layer["attn_v"]).reshape(T, Hkv, Dv), None, eps)
            widx_l = swa_write_idx if (dual and is_swa) else write_idx
            new_k[il] = _kv_write(kv_k[il], widx_l, k.astype(f32))
            new_v[il] = _kv_write(kv_v[il], widx_l, v.astype(f32))
            kc, vc = new_k[il], new_v[il]
        else:
            # reuse the last cache-owning layer of the SAME attention type
            # ([KV_REUSE], llama-model.cpp:122) — already written this step
            il_r = Lkv - (2 if is_swa else 1)
            kc, vc = new_k[il_r], new_v[il_r]
        k_all = apply_rope(_kv_read(kc, f32),
                           cos_c2 if is_swa else cos_c,
                           sin_c2 if is_swa else sin_c,
                           cfg.rope.mode, cfg.rope.n_dims)
        att = attention(q, k_all, _kv_read(vc, f32),
                        bias_swa if is_swa else bias, scale,
                        cell_pos=c_pos_swa if (dual and is_swa) else cell_pos,
                        tok_pos=tok_pos)
        attn_out = mm(att.reshape(T, H * Dv), layer["attn_output"])
        attn_out = rms_norm(attn_out, layer["attn_post_norm"], eps)

        attn_gated = act + attn_out
        attn_laurel = (attn_gated + laurel) * (2.0 ** -0.5)

        hf_in = rms_norm(attn_laurel, layer["ffn_norm"], eps)
        gate = mm(hf_in, layer["ffn_gate"])
        if cfg.act_sparsity is not None and cfg.act_sparsity[il] > 0.0:
            gate = _gaussian_topk(gate, cfg.act_sparsity[il])
        ffn = jax.nn.gelu(gate, approximate=True) * mm(hf_in, layer["ffn_up"])
        ffn = mm(ffn, layer["ffn_down"])
        ffn = rms_norm(ffn, layer["ffn_post_norm"], eps)
        gated = attn_laurel + ffn

        # altup correct
        mod_c = _altup_modalities(layer, gated)
        ccoefs = mm(mod_c, layer["altup_correct_coef"]) + 1.0  # [T, n_alt]
        innovation = gated - preds[:, i_act]
        corrected = preds + innovation[:, None, :] * ccoefs[:, :, None]

        # per-layer input injection into streams 1..n_alt-1
        fp = corrected[:, i_act] * layer["altup_correct_scale"].astype(f32)
        fp = jax.nn.gelu(mm(fp, layer["per_layer_inp_gate"]), approximate=True)
        fp = fp * inp_per_layer[:, il]
        fp = rms_norm(mm(fp, layer["per_layer_proj"]),
                      layer["per_layer_post_norm"], eps)
        xs = jnp.concatenate(
            [corrected[:, :1], corrected[:, 1:] + fp[:, None, :]], axis=1)
        if collect_hidden:
            hiddens.append(jnp.take(xs[:, i_act], out_idx, axis=0))

    # -- merge the altup streams back to one -------------------------------
    tm = _mag(xs[:, i_act])
    up = params["altup_unembd_proj"].astype(f32)
    un = jnp.einsum("tae,aoe->tao", xs[:, 1:], up)  # [T, n_alt-1, E]
    un = un * tm[:, None, :] / _mag(un.reshape(-1, E)).reshape(T, -1, 1)
    merged = (xs[:, 0] + un.sum(axis=1)) / float(n_alt)

    x = rms_norm(merged, params.get("output_norm"), eps)
    hs = jnp.take(x, out_idx, axis=0)
    out_w = params.get("output") if params.get("output") is not None \
        else params["tok_embd"]
    logits = qmm(hs.astype(cdt), out_w, out_dtype=f32)
    if cfg.final_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    out = [logits, new_k, new_v, hs.astype(f32)]
    if collect_acts:
        out.append([{} for _ in range(L)])
    if collect_hidden:
        out.append(hiddens)
    return tuple(out)
