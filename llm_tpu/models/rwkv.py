"""RWKV6 forward graph (recurrent linear attention).

Parity target: llm_build_rwkv6 (/root/reference/src/llama-model.cpp:
12659-12966) and the wkv6 recurrence (ggml_rwkv_wkv6; CPU semantics
ggml/src/ggml-cpu/ops.cpp:9213):

    per layer:  LN -> time-mix  (token-shift lerp with data-dependent
                5-way LoRA mixes; r/k/v/gate projections; decay
                w = exp(-exp(ddd)); wkv6 state recurrence; group-norm;
                gate; output proj) -> residual
                LN -> channel-mix (token-shift lerp; r = sigmoid,
                k = relu^2; value proj) -> residual
    with x*0.5 rescale every rescale_every_n layers, LN'd embeddings,
    and a 2-row token-shift state + [H, D, D] wkv state per (layer, seq).

The per-token recurrence (state' = state * w[i] + k[i]v[j]; out[j] =
sum_i r[i] (tf[i] k[i] v[j] + state[i,j])) runs as a lax.scan over time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import layer_norm
from ..ops.qmatmul import qembed, qmm
from .config import ModelConfig


def wkv6(r, k, v, tf, w, s0):
    """RWKV6 recurrence over time.

    r/k/v/w: [ns, nt, H, D] f32; tf (time_first): [H, D];
    s0: [ns, H, D, D] carried state (i=key dim, j=value dim).
    Returns (y [ns, nt, H, D], s_last)."""

    def step(state, xs):
        rt, kt, vt, wt = xs  # [ns, H, D]
        kv = kt[..., :, None] * vt[..., None, :]  # [ns, H, D, D]
        # out_j = sum_i r_i * (tf_i * kv_ij + state_ij)  — state BEFORE decay
        att = tf[None, :, :, None] * kv + state
        y = jnp.einsum("nhi,nhij->nhj", rt, att)
        state = state * wt[..., :, None] + kv
        return state, y

    xs = tuple(jnp.moveaxis(a, 1, 0) for a in (r, k, v, w))  # time-major
    s_last, ys = jax.lax.scan(step, s0, xs)
    return jnp.moveaxis(ys, 0, 1), s_last


def _lerp(cur, sx, mix):
    return cur + sx * mix


def _shifted(x, shift_row):
    """x_prev: previous token per position ([ns, nt, E]), row 0 from the
    carried shift state."""
    return jnp.concatenate([shift_row[:, None, :], x[:, :-1, :]], axis=1)


def _mm(x, w):
    ns, nt, e = x.shape
    return qmm(x.reshape(ns * nt, e).astype(jnp.bfloat16), w).reshape(ns, nt, -1)


def time_mix(x, att_shift, layer, cfg: ModelConfig):
    """Returns (out [ns, nt, E], new att shift row [ns, E],
    wkv_state_update fn taking s0 -> (y already included) ..."""
    ns, nt, E = x.shape
    D = cfg.wkv_head_size
    H = E // D

    sx = _shifted(x, att_shift) - x
    xxx = _lerp(x, sx, layer["time_mix_lerp_x"])  # [ns, nt, E]
    # 5-way data-dependent lerp deltas through the w1/w2 LoRA
    # w1: [E, 5*r]; w2: [5, r, E]
    t1 = jnp.tanh(_mm(xxx, layer["time_mix_w1"]).astype(jnp.float32))
    r5 = t1.reshape(ns, nt, 5, -1)
    w2 = layer["time_mix_w2"].astype(jnp.float32)  # dense [5, E, r]
    deltas = jnp.einsum("ntfr,fer->ntfe", r5, w2)  # [ns, nt, 5, E]

    def mixed(i, lerp_key):
        return _lerp(x, sx, deltas[:, :, i] + layer[lerp_key])

    xw = mixed(0, "time_mix_lerp_w")
    xk = mixed(1, "time_mix_lerp_k")
    xv = mixed(2, "time_mix_lerp_v")
    xr = mixed(3, "time_mix_lerp_r")
    xg = mixed(4, "time_mix_lerp_g")

    r = _mm(xr, layer["time_mix_receptance"]).astype(jnp.float32)
    k = _mm(xk, layer["time_mix_key"]).astype(jnp.float32)
    v = _mm(xv, layer["time_mix_value"]).astype(jnp.float32)
    g = jax.nn.silu(_mm(xg, layer["time_mix_gate"]).astype(jnp.float32))

    # decay: w = exp(-exp(decay + w2 @ tanh(w1 @ xw)))
    d1 = jnp.tanh(_mm(xw, layer["time_mix_decay_w1"]).astype(jnp.float32))
    dd = _mm_dense(d1, layer["time_mix_decay_w2"]) + layer["time_mix_decay"]
    w = jnp.exp(-jnp.exp(dd))

    shp = (ns, nt, H, D)
    return (r.reshape(shp), k.reshape(shp), v.reshape(shp), w.reshape(shp),
            g, x[:, -1, :])


def _mm_dense(x, w):
    """x [ns, nt, r] f32 @ dense [N, r] -> [ns, nt, N]."""
    return jnp.einsum("ntr,er->nte", x, w.astype(jnp.float32))


def channel_mix(x, ffn_shift, layer):
    sx = _shifted(x, ffn_shift) - x
    xk = _lerp(x, sx, layer["channel_mix_lerp_k"])
    xr = _lerp(x, sx, layer["channel_mix_lerp_r"])
    rr = jax.nn.sigmoid(_mm(xr, layer["channel_mix_receptance"]).astype(jnp.float32))
    kk = jnp.square(jax.nn.relu(_mm(xk, layer["channel_mix_key"]).astype(jnp.float32)))
    vv = _mm(kk.astype(jnp.bfloat16), layer["channel_mix_value"]).astype(jnp.float32)
    return rr * vv, x[:, -1, :]


def forward_rwkv6(
    params: dict,
    cfg: ModelConfig,
    shift_states: list,  # per layer [n_slots, 2, E] f32 (att, ffn rows)
    wkv_states: list,  # per layer [n_slots, H, D, D] f32
    tokens: jnp.ndarray,  # [ns, nt]
    slot_idx: jnp.ndarray,  # [ns]
    out_idx: jnp.ndarray,  # [O] into flattened [ns*nt]
    dtype=jnp.bfloat16,
):
    ns, nt = tokens.shape
    E = cfg.n_embd
    D = cfg.wkv_head_size
    H = E // D
    eps = cfg.rms_eps

    x = qembed(params["tok_embd"], tokens.reshape(-1), dtype=jnp.float32)
    x = layer_norm(x, params.get("tok_norm"), params.get("tok_norm_b"), eps)
    x = x.reshape(ns, nt, E).astype(jnp.float32)

    new_shift, new_wkv = [], []
    for il, layer in enumerate(params["layers"]):
        tsh = jnp.take(shift_states[il], slot_idx, axis=0)  # [ns, 2, E]
        wkv0 = jnp.take(wkv_states[il], slot_idx, axis=0).astype(jnp.float32)

        att_norm = layer_norm(x, layer["attn_norm"], layer.get("attn_norm_b"), eps)
        r, k, v, w, g, att_last = time_mix(att_norm, tsh[:, 0], layer, cfg)
        y, wkv1 = wkv6(r, k, v, layer["time_mix_first"], w, wkv0)
        y = y.reshape(ns * nt, H, D)
        # group norm over each head (ggml_norm eps 64e-5), then ln scale/bias
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        y = (y - mu) / jnp.sqrt(var + 64e-5)
        y = y.reshape(ns, nt, E) * layer["time_mix_ln"] + layer["time_mix_ln_b"]
        y = y * g.reshape(ns, nt, E)
        att_out = _mm(y.astype(jnp.bfloat16), layer["time_mix_output"]).astype(jnp.float32)
        x = x + att_out

        ffn_norm = layer_norm(x, layer["attn_norm_2"], layer.get("attn_norm_2_b"), eps)
        cm, ffn_last = channel_mix(ffn_norm, tsh[:, 1], layer)
        x = x + cm

        if cfg.rescale_every_n and (il + 1) % cfg.rescale_every_n == 0:
            x = x * 0.5

        new_tsh = jnp.stack([att_last, ffn_last], axis=1)
        new_shift.append(shift_states[il].at[slot_idx].set(
            new_tsh.astype(shift_states[il].dtype)))
        new_wkv.append(wkv_states[il].at[slot_idx].set(
            wkv1.astype(wkv_states[il].dtype)))

    x = layer_norm(x.reshape(ns * nt, E), params.get("output_norm"),
                   params.get("output_norm_b"), eps)
    hs = jnp.take(x, out_idx, axis=0)
    out_w = params.get("output") if params.get("output") is not None else params["tok_embd"]
    logits = qmm(hs.astype(jnp.bfloat16), out_w)
    return logits, new_shift, new_wkv, hs.astype(jnp.float32)
