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

from ..ops.norms import layer_norm, rms_norm
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

    # reference-converted GGUFs stack the 5 lerp biases in
    # time_mix_lerp_fused, rows ordered [w,k,v,r,g]
    # (convert_hf_to_gguf.py Rwkv6Model.modify_tensors)
    fused = layer.get("time_mix_lerp_fused")

    def mixed(i, lerp_key):
        bias = fused[i] if fused is not None else layer[lerp_key]
        return _lerp(x, sx, deltas[:, :, i] + bias)

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


# ---------------------------------------------------------------------------
# RWKV7 (parity: llm_build_rwkv7 / build_rwkv7_time_mix,
# /root/reference/src/llama-model.cpp:13056-13330, and the wkv7 recurrence
# ggml_rwkv_wkv7 — CPU semantics ggml/src/ggml-cpu/ops.cpp:9694-9707:
#   sa_i = sum_j a_j * S[i,j]
#   S[i,j] = S[i,j]*w_j + v_i*k_j + sa_i*b_j ;  y_i = sum_j S[i,j] * r_j )
# ---------------------------------------------------------------------------


def wkv7(r, w, k, v, a, b, s0):
    """RWKV7 recurrence. r/w/k/v/a/b: [ns, nt, H, D] f32;
    s0: [ns, H, D, D] with i = value dim, j = key dim.
    Returns (y [ns, nt, H, D], s_last)."""

    def step(state, xs):
        rt, wt, kt, vt, at, bt = xs  # [ns, H, D]
        sa = jnp.einsum("nhj,nhij->nhi", at, state)
        state = (state * wt[..., None, :]
                 + vt[..., :, None] * kt[..., None, :]
                 + sa[..., :, None] * bt[..., None, :])
        y = jnp.einsum("nhij,nhj->nhi", state, rt)
        return state, y

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w, k, v, a, b))
    s_last, ys = jax.lax.scan(step, s0, xs)
    return jnp.moveaxis(ys, 0, 1), s_last


def _lora_f32(x, w1, w2, bias=None):
    """bias + w2 @ (w1 @ x) with dense rows-layout f32 tensors
    (w1 [r, E], w2 [E, r])."""
    t = jnp.einsum("nte,re->ntr", x, w1.astype(jnp.float32))
    out = jnp.einsum("ntr,er->nte", t, w2.astype(jnp.float32))
    return out if bias is None else out + bias.astype(jnp.float32)


def time_mix7(x, att_shift, v_first, layer, cfg: ModelConfig):
    """RWKV7 time mix; returns (out, new shift row, v_first)."""
    ns, nt, E = x.shape
    D = cfg.wkv_head_size
    H = E // D
    has_gate = "time_mix_g1" in layer

    sx = _shifted(x, att_shift) - x
    fused = layer["time_mix_lerp_fused"].astype(jnp.float32)  # [n_mix, E]
    n_mix = fused.shape[0]
    # interpolation targets in view order r, w, k, v, a, (g)
    xs = [x + sx * fused[i] for i in range(n_mix)]
    xr, xw, xk, xv, xa = xs[:5]
    xg = xs[5] if has_gate else None

    r = _mm(xr, layer["time_mix_receptance"]).astype(jnp.float32)
    # decay: w = exp(-0.606531 * sigmoid(w0 + w2 @ tanh(w1 @ xw)))
    t1 = jnp.tanh(jnp.einsum("nte,re->ntr", xw,
                             _rows(layer["time_mix_w1"])))
    dd = jnp.einsum("ntr,er->nte", t1, _rows(layer["time_mix_w2"]))
    dd = dd + layer["time_mix_w0"].astype(jnp.float32)
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(dd))

    k = _mm(xk, layer["time_mix_key"]).astype(jnp.float32)
    v = _mm(xv, layer["time_mix_value"]).astype(jnp.float32)
    if v_first is None:
        v_first = v
    else:
        mixv = jax.nn.sigmoid(_lora_f32(
            xv, _rows(layer["time_mix_v1"]), _rows(layer["time_mix_v2"]),
            layer["time_mix_v0"]))
        v = v + (v_first - v) * mixv

    g = None
    if has_gate:
        g = jnp.einsum(
            "ntr,er->nte",
            jax.nn.sigmoid(jnp.einsum("nte,re->ntr", xg,
                                      _rows(layer["time_mix_g1"]))),
            _rows(layer["time_mix_g2"]))

    a = jax.nn.sigmoid(_lora_f32(
        xa, _rows(layer["time_mix_a1"]), _rows(layer["time_mix_a2"]),
        layer["time_mix_a0"]))

    kk = (k * layer["time_mix_k_k"].astype(jnp.float32)).reshape(ns, nt, H, D)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    ka = k * layer["time_mix_k_a"].astype(jnp.float32)
    k = k + a * ka - ka

    shp = (ns, nt, H, D)
    return (r.reshape(shp), w.reshape(shp), k.reshape(shp), v.reshape(shp),
            a.reshape(shp), kk, g, x[:, -1, :], v_first)


def _rows(w):
    """Dense rows-layout small matrix as f32."""
    return w.astype(jnp.float32)


def forward_rwkv7(
    params: dict,
    cfg: ModelConfig,
    shift_states: list,  # per layer [n_slots, 2, E] f32
    wkv_states: list,  # per layer [n_slots, H, D, D] f32
    tokens: jnp.ndarray,  # [ns, nt]
    slot_idx: jnp.ndarray,  # [ns]
    out_idx: jnp.ndarray,  # [O]
    dtype=jnp.bfloat16,
):
    ns, nt = tokens.shape
    E = cfg.n_embd
    D = cfg.wkv_head_size
    H = E // D
    eps = cfg.rms_eps

    hybrid = cfg.arch == "arwkv7"  # RwkvHybrid: RMS norms + qwen2 FFN
    x = qembed(params["tok_embd"], tokens.reshape(-1), dtype=jnp.float32)
    if params.get("tok_norm") is not None:
        x = layer_norm(x, params.get("tok_norm"), params.get("tok_norm_b"), eps)
    x = x.reshape(ns, nt, E).astype(jnp.float32)

    v_first = None
    new_shift, new_wkv = [], []
    for il, layer in enumerate(params["layers"]):
        tsh = jnp.take(shift_states[il], slot_idx, axis=0)
        wkv0 = jnp.take(wkv_states[il], slot_idx, axis=0).astype(jnp.float32)

        att_norm = (rms_norm(x, layer["attn_norm"], eps) if hybrid else
                    layer_norm(x, layer["attn_norm"],
                               layer.get("attn_norm_b"), eps))
        r, w, k, v, a, kk, g, att_last, v_first = time_mix7(
            att_norm, tsh[:, 0], v_first, layer, cfg)
        y, wkv1 = wkv7(r, w, k, v, -kk, kk * a, wkv0)
        y = y.reshape(ns * nt, H, D)
        if "time_mix_ln" in layer:
            mu = y.mean(-1, keepdims=True)
            var = ((y - mu) ** 2).mean(-1, keepdims=True)
            y = (y - mu) / jnp.sqrt(var + 64e-5)
            y = (y.reshape(ns, nt, E) * layer["time_mix_ln"]
                 + layer["time_mix_ln_b"])
        else:
            y = y.reshape(ns, nt, E)
        # bonus term: v * sum_per_head(k * r * r_k)
        rk = (k * r * layer["time_mix_r_k"].astype(jnp.float32)
              .reshape(H, D)[None, None]).sum(-1, keepdims=True)
        y = y + (v * rk).reshape(ns, nt, E)
        if g is not None:
            y = y * g
        att_out = _mm(y.astype(jnp.bfloat16),
                      layer["time_mix_output"]).astype(jnp.float32)
        x = x + att_out

        if hybrid:
            # arwkv7: qwen2 gated-silu FFN, no ffn token shift
            # (llm_build_arwkv7, token_shift_count == 1)
            h2 = rms_norm(x, layer["ffn_norm"], eps)
            gate = jax.nn.silu(_mm(h2, layer["ffn_gate"]).astype(jnp.float32))
            up = _mm(h2, layer["ffn_up"]).astype(jnp.float32)
            cm = _mm((gate * up).astype(jnp.bfloat16),
                     layer["ffn_down"]).astype(jnp.float32)
            x = x + cm
            ffn_last = att_last
        else:
            ffn_norm = layer_norm(x, layer["attn_norm_2"],
                                  layer.get("attn_norm_2_b"), eps)
            # rwkv7 channel mix: single k lerp, relu^2, no receptance gate
            # (build_rwkv7_channel_mix, llama-model.cpp:13062)
            sx = _shifted(ffn_norm, tsh[:, 1]) - ffn_norm
            xk2 = ffn_norm + sx * layer["channel_mix_lerp_k"]
            kk2 = jnp.square(jax.nn.relu(
                _mm(xk2, layer["channel_mix_key"]).astype(jnp.float32)))
            cm = _mm(kk2.astype(jnp.bfloat16),
                     layer["channel_mix_value"]).astype(jnp.float32)
            x = x + cm
            ffn_last = ffn_norm[:, -1, :]

        new_tsh = jnp.stack([att_last, ffn_last], axis=1)
        new_shift.append(shift_states[il].at[slot_idx].set(
            new_tsh.astype(shift_states[il].dtype)))
        new_wkv.append(wkv_states[il].at[slot_idx].set(
            wkv1.astype(wkv_states[il].dtype)))

    x = (rms_norm(x.reshape(ns * nt, E), params.get("output_norm"), eps)
         if hybrid else
         layer_norm(x.reshape(ns * nt, E), params.get("output_norm"),
                    params.get("output_norm_b"), eps))
    hs = jnp.take(x, out_idx, axis=0)
    out_w = params.get("output") if params.get("output") is not None else params["tok_embd"]
    logits = qmm(hs.astype(jnp.bfloat16), out_w)
    return logits, new_shift, new_wkv, hs.astype(jnp.float32)


# ---------------------------------------------------------------------------
# RWKV6Qwen2 ("qrwkv"): rwkv6 token-shift/lerp front end + gated linear
# attention + a qwen2-style gated-silu FFN. Parity: llm_build_rwkv6qwen2 and
# the is_qrwkv branches of build_rwkv6_time_mix
# (/root/reference/src/llama-model.cpp:12969,12716-12870) with the GLA
# recurrence ggml_gated_linear_attn (ggml-cpu/ops.cpp:9597-9607:
#   S[i,j] = S[i,j]*g_i + k_i*v_j ;  y_j += S[i,j] * q_i * scale )
# ---------------------------------------------------------------------------


def gla(r, k, v, w, s0, scale: float):
    """Gated linear attention. r/k/v/w: [ns, nt, H, D] f32; s0 [ns, H, D, D]
    (i=key dim, j=value dim). Returns (y, s_last)."""

    def step(state, xs):
        rt, kt, vt, wt = xs  # [ns, H, D]
        kv = kt[..., :, None] * vt[..., None, :]
        state = state * wt[..., :, None] + kv  # decay BEFORE add, read AFTER
        y = jnp.einsum("nhi,nhij->nhj", rt * scale, state)
        return state, y

    xs = tuple(jnp.moveaxis(a, 1, 0) for a in (r, k, v, w))
    s_last, ys = jax.lax.scan(step, s0, xs)
    return jnp.moveaxis(ys, 0, 1), s_last


def time_mix_qrwkv(x, att_shift, layer, cfg: ModelConfig):
    """qrwkv time mix: fused/split 5-way lerp, r/k/v biases, sigmoid gate,
    GQA k/v repeat, k = k*(1-w), no group-norm."""
    ns, nt, E = x.shape
    D = cfg.wkv_head_size
    H = E // D

    sx = _shifted(x, att_shift) - x
    xxx = _lerp(x, sx, layer["time_mix_lerp_x"])
    t1 = jnp.tanh(_mm(xxx, layer["time_mix_w1"]).astype(jnp.float32))
    r5 = t1.reshape(ns, nt, 5, -1)
    w2 = layer["time_mix_w2"].astype(jnp.float32)
    deltas = jnp.einsum("ntfr,fer->ntfe", r5, w2)

    if "time_mix_lerp_fused" in layer:  # [5, E] stacked lerp biases
        lf = layer["time_mix_lerp_fused"].astype(jnp.float32).reshape(5, E)

        def mixed(i, _key=None):
            return _lerp(x, sx, deltas[:, :, i] + lf[i])
    else:
        def mixed(i, key):
            return _lerp(x, sx, deltas[:, :, i] + layer[key])

    xw = mixed(0, "time_mix_lerp_w")
    xk = mixed(1, "time_mix_lerp_k")
    xv = mixed(2, "time_mix_lerp_v")
    xr = mixed(3, "time_mix_lerp_r")
    xg = mixed(4, "time_mix_lerp_g")

    def bias(t, key):
        b = layer.get(key)
        return t + b.astype(jnp.float32) if b is not None else t

    r = bias(_mm(xr, layer["time_mix_receptance"]).astype(jnp.float32),
             "time_mix_receptance_b")
    k = bias(_mm(xk, layer["time_mix_key"]).astype(jnp.float32),
             "time_mix_key_b")
    v = bias(_mm(xv, layer["time_mix_value"]).astype(jnp.float32),
             "time_mix_value_b")
    g = jax.nn.sigmoid(_mm(xg, layer["time_mix_gate"]).astype(jnp.float32))

    # GQA: k/v project to Hkv*D and repeat within head groups
    Hkv = k.shape[-1] // D
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k.reshape(ns, nt, Hkv, D), rep, axis=2).reshape(ns, nt, E)
        v = jnp.repeat(v.reshape(ns, nt, Hkv, D), rep, axis=2).reshape(ns, nt, E)

    d1 = jnp.tanh(_mm(xw, layer["time_mix_decay_w1"]).astype(jnp.float32))
    dd = _mm_dense(d1, layer["time_mix_decay_w2"]) + layer["time_mix_decay"]
    w = jnp.exp(-jnp.exp(dd))
    k = k * (1.0 - w)

    shp = (ns, nt, H, D)
    return (r.reshape(shp), k.reshape(shp), v.reshape(shp), w.reshape(shp),
            g, x[:, -1, :])


def forward_rwkv6qwen2(
    params: dict,
    cfg: ModelConfig,
    shift_states: list,  # per layer [n_slots, 2, E] (row 1 unused)
    wkv_states: list,  # per layer [n_slots, H, D, D]
    tokens: jnp.ndarray,  # [ns, nt]
    slot_idx: jnp.ndarray,  # [ns]
    out_idx: jnp.ndarray,  # [O]
    dtype=jnp.bfloat16,
):
    from ..ops.norms import rms_norm

    ns, nt = tokens.shape
    E = cfg.n_embd
    D = cfg.wkv_head_size
    eps = cfg.rms_eps

    x = qembed(params["tok_embd"], tokens.reshape(-1), dtype=jnp.float32)
    x = x.reshape(ns, nt, E)

    new_shift, new_wkv = [], []
    for il, layer in enumerate(params["layers"]):
        tsh = jnp.take(shift_states[il], slot_idx, axis=0)
        wkv0 = jnp.take(wkv_states[il], slot_idx, axis=0).astype(jnp.float32)

        att_norm = rms_norm(x, layer["attn_norm"], eps)
        r, k, v, w, g, att_last = time_mix_qrwkv(att_norm, tsh[:, 0], layer, cfg)
        y, wkv1 = gla(r, k, v, w, wkv0, float(D) ** -0.5)
        y = y.reshape(ns, nt, E) * g
        att_out = _mm(y.astype(jnp.bfloat16),
                      layer["time_mix_output"]).astype(jnp.float32)
        x = x + att_out

        h2 = rms_norm(x, layer["ffn_norm"], eps)
        gate = jax.nn.silu(_mm(h2, layer["ffn_gate"]).astype(jnp.float32))
        up = _mm(h2, layer["ffn_up"]).astype(jnp.float32)
        dn = _mm((gate * up).astype(jnp.bfloat16),
                 layer["ffn_down"]).astype(jnp.float32)
        x = x + dn

        new_tsh = jnp.stack([att_last, att_last], axis=1)
        new_shift.append(shift_states[il].at[slot_idx].set(
            new_tsh.astype(shift_states[il].dtype)))
        new_wkv.append(wkv_states[il].at[slot_idx].set(
            wkv1.astype(wkv_states[il].dtype)))

    x = rms_norm(x.reshape(ns * nt, E), params.get("output_norm"), eps)
    hs = jnp.take(x, out_idx, axis=0)
    out_w = params.get("output") if params.get("output") is not None else params["tok_embd"]
    logits = qmm(hs.astype(jnp.bfloat16), out_w)
    return logits, new_shift, new_wkv, hs.astype(jnp.float32)
