"""Mamba (selective state-space) forward graph + recurrent state.

Parity target: llm_build_mamba::build_mamba_layer
(/root/reference/src/llama-model.cpp:9812-9949) and the SSM ops
(ggml_ssm_conv / ggml_ssm_scan, reference CPU semantics in
ggml/src/ggml-cpu/ops.cpp:8623 ggml_compute_forward_ssm_scan_f32):

    per layer:  x -> RMSNorm -> in_proj -> (x, z)
                x: causal depthwise conv1d (carried conv state) -> SiLU
                x_proj -> (dt, B, C); dt_proj(dt)+bias
                selective scan:  s' = s * exp(softplus(dt) * A) +
                                      B * (x * softplus(dt))
                                 y  = C . s' + D * x
                out = out_proj(y * SiLU(z));  residual add

TPU-first design: the whole batch step is one jitted program over
[n_seqs, n_tokens] with the per-seq recurrent state gathered/scattered by
slot index (the analogue of the reference's build_rs state rows). The
intra-sequence recurrence runs as a lax.associative_scan (the parallel
scan from Annex D of the Mamba paper), so prefill parallelizes over time
instead of stepping token-by-token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from ..ops.qmatmul import qembed, qmm
from .config import ModelConfig


def _softplus(x):
    # reference clamps: dt <= 20 ? log1p(exp(dt)) : dt (ops.cpp ssm_scan)
    return jnp.where(x <= 20.0, jnp.log1p(jnp.exp(x)), x)


def ssm_conv(x, conv_state, w, b):
    """Causal depthwise conv over time with carried state.

    x: [ns, nt, d_inner] f32; conv_state: [ns, d_conv-1, d_inner];
    w: [d_conv, d_inner]; b: [d_inner].
    Returns (y [ns, nt, d_inner], new_state [ns, d_conv-1, d_inner])."""
    d_conv = w.shape[0]
    full = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # [ns, dc-1+nt, di]
    nt = x.shape[1]
    # small static kernel (d_conv ~ 4): sum of shifted slices
    y = sum(full[:, k:k + nt, :] * w[k][None, None, :] for k in range(d_conv))
    new_state = full[:, nt:, :] if d_conv > 1 else conv_state
    return y + b[None, None, :], new_state


def ssm_scan(s0, x, dt, A, B, C):
    """Selective scan (ggml_ssm_scan semantics, mamba-1 layout).

    s0: [ns, d_inner, d_state] carried state
    x, dt: [ns, nt, d_inner]; A: [d_inner, d_state];
    B, C: [ns, nt, d_state]
    Returns (y [ns, nt, d_inner], s_last [ns, d_inner, d_state])."""
    dtp = _softplus(dt.astype(jnp.float32))  # [ns, nt, di]
    dA = jnp.exp(dtp[..., None] * A[None, None])  # [ns, nt, di, dstate]
    dBx = (dtp * x.astype(jnp.float32))[..., None] * B[:, :, None, :].astype(jnp.float32)

    def combine(a, b):
        (a1, b1), (a2, b2) = a, b
        return a1 * a2, b1 * a2 + b2

    # prepend the carried state as a pseudo-step: a=1, b=s0
    ones = jnp.ones_like(s0)[:, None]  # [ns, 1, di, dstate]
    aa = jnp.concatenate([ones, dA], axis=1)
    bb = jnp.concatenate([s0[:, None], dBx], axis=1)
    _, s_all = jax.lax.associative_scan(combine, (aa, bb), axis=1)
    s_seq = s_all[:, 1:]  # [ns, nt, di, dstate]
    y = jnp.einsum("ntds,nts->ntd", s_seq, C.astype(jnp.float32))
    return y, s_seq[:, -1]


def mamba_layer(x, layer, cfg: ModelConfig, conv_state, ssm_state):
    """One mamba block over [ns, nt, n_embd]. Returns (out, conv', ssm')."""
    ns, nt, _ = x.shape
    di, ds, dtr = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank

    xz = qmm(x.reshape(ns * nt, -1), layer["ssm_in"]).reshape(ns, nt, 2 * di)
    xs, z = xz[..., :di], xz[..., di:]

    xs, new_conv = ssm_conv(xs.astype(jnp.float32), conv_state,
                            layer["ssm_conv1d"], layer["ssm_conv1d_b"])
    xs = jax.nn.silu(xs)

    x_db = qmm(xs.reshape(ns * nt, di).astype(jnp.bfloat16), layer["ssm_x"])
    x_db = x_db.reshape(ns, nt, dtr + 2 * ds)
    dt, Bm, Cm = x_db[..., :dtr], x_db[..., dtr:dtr + ds], x_db[..., dtr + ds:]
    if cfg.ssm_dt_b_c_rms:  # FalconMamba applies RMS norm on dt/B/C
        dt = rms_norm(dt, None, cfg.rms_eps)
        Bm = rms_norm(Bm, None, cfg.rms_eps)
        Cm = rms_norm(Cm, None, cfg.rms_eps)

    dt = qmm(dt.reshape(ns * nt, dtr).astype(jnp.bfloat16), layer["ssm_dt"])
    dt = dt.reshape(ns, nt, di) + layer["ssm_dt_b"][None, None, :]

    y, new_ssm = ssm_scan(ssm_state, xs, dt, layer["ssm_a"], Bm, Cm)
    y = y + xs.astype(jnp.float32) * layer["ssm_d"][None, None, :]
    y = y * jax.nn.silu(z.astype(jnp.float32))

    out = qmm(y.reshape(ns * nt, di).astype(jnp.bfloat16), layer["ssm_out"])
    return out.reshape(ns, nt, -1), new_conv, new_ssm


def forward_mamba(
    params: dict,
    cfg: ModelConfig,
    conv_states: list,  # per layer [n_slots, d_conv-1, d_inner] f32
    ssm_states: list,  # per layer [n_slots, d_inner, d_state] f32
    tokens: jnp.ndarray,  # [ns, nt] int32
    slot_idx: jnp.ndarray,  # [ns] int32 recurrent state slots
    out_idx: jnp.ndarray,  # [O] int32 into flattened [ns*nt]
    dtype=jnp.bfloat16,
):
    """One step over ns sequences x nt tokens each (the reference's
    equal-length ubatch shape). States are gathered by slot, updated, and
    scattered back; returns (logits [O, vocab] f32, conv', ssm', hidden)."""
    ns, nt = tokens.shape
    x = qembed(params["tok_embd"], tokens.reshape(-1), dtype=dtype)
    x = x.reshape(ns, nt, -1)

    new_conv, new_ssm = [], []
    for il, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer.get("attn_norm"), cfg.rms_eps)
        cs = jnp.take(conv_states[il], slot_idx, axis=0)
        ss = jnp.take(ssm_states[il], slot_idx, axis=0)
        block = mamba2_layer if "ssm_norm" in layer else mamba_layer
        out, cs2, ss2 = block(h, layer, cfg, cs, ss)
        new_conv.append(conv_states[il].at[slot_idx].set(cs2.astype(conv_states[il].dtype)))
        new_ssm.append(ssm_states[il].at[slot_idx].set(ss2.astype(ssm_states[il].dtype)))
        x = x + out.astype(x.dtype)

    x = rms_norm(x.reshape(ns * nt, -1), params.get("output_norm"), cfg.rms_eps)
    hs = jnp.take(x, out_idx, axis=0)
    out_w = params.get("output") if params.get("output") is not None else params["tok_embd"]
    logits = qmm(hs, out_w)
    return logits, new_conv, new_ssm, hs.astype(jnp.float32)


def ssm_scan2(s0, x, dt, A, B, C, n_group):
    """Mamba-2 scan (SSD): scalar per-head decay (build_mamba2_layer,
    /root/reference/src/llama-model.cpp:9951; ggml_ssm_scan mamba-2 path).

    s0: [ns, H, hd, S]; x: [ns, nt, H, hd]; dt: [ns, nt, H] (pre-softplus);
    A: [H] negative per-head; B, C: [ns, nt, G, S].
    Returns (y [ns, nt, H, hd], s_last)."""
    H = x.shape[2]
    rep = H // n_group
    dtp = _softplus(dt.astype(jnp.float32))  # [ns, nt, H]
    dA = jnp.exp(dtp * A[None, None, :])  # [ns, nt, H]
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=2)  # [ns, nt, H, S]
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=2)
    # dBx[t] = dt * x ⊗ B : [ns, nt, H, hd, S]
    dBx = (dtp[..., None] * x.astype(jnp.float32))[..., None] * Bh[:, :, :, None, :]

    def combine(a, b):
        (a1, b1), (a2, b2) = a, b
        return a1 * a2, b1 * a2[..., None, None] + b2

    ones = jnp.ones(s0.shape[:2], jnp.float32)[:, None]  # [ns, 1, H]
    aa = jnp.concatenate([ones, dA], axis=1)
    bb = jnp.concatenate([s0[:, None].astype(jnp.float32), dBx], axis=1)
    _, s_all = jax.lax.associative_scan(combine, (aa, bb), axis=1)
    s_seq = s_all[:, 1:]  # [ns, nt, H, hd, S]
    y = jnp.einsum("nthds,nths->nthd", s_seq, Ch)
    return y, s_seq[:, -1]


def mamba2_layer(x, layer, cfg: ModelConfig, conv_state, ssm_state):
    """One mamba-2 block over [ns, nt, n_embd]. in_proj packs
    [z | xBC | dt]; conv+silu over xBC; scalar-decay scan; +D*x; silu(z)
    gate; grouped RMS norm; out_proj. Returns (out, conv', ssm')."""
    ns, nt, _ = x.shape
    di, ds, G = cfg.ssm_d_inner, cfg.ssm_d_state, max(cfg.ssm_n_group, 1)
    H = cfg.ssm_dt_rank  # n_head (Mamba2Model converter: d_inner // head_dim)
    hd = di // H
    d_xbc = di + 2 * G * ds

    zxbcdt = qmm(x.reshape(ns * nt, -1), layer["ssm_in"])
    zxbcdt = zxbcdt.reshape(ns, nt, 2 * di + 2 * G * ds + H)
    z = zxbcdt[..., :di]
    xbc = zxbcdt[..., di:di + d_xbc]
    dt = zxbcdt[..., di + d_xbc:]

    xbc, new_conv = ssm_conv(xbc.astype(jnp.float32), conv_state,
                             layer["ssm_conv1d"], layer["ssm_conv1d_b"])
    xbc = jax.nn.silu(xbc)

    xs = xbc[..., :di].reshape(ns, nt, H, hd)
    Bm = xbc[..., di:di + G * ds].reshape(ns, nt, G, ds)
    Cm = xbc[..., di + G * ds:].reshape(ns, nt, G, ds)
    dt = dt + layer["ssm_dt_b"][None, None, :]

    A = layer["ssm_a"].reshape(-1)  # [H] (stored (H, 1))
    D = layer["ssm_d"].reshape(-1)
    ss0 = ssm_state.reshape(-1, H, hd, ds)
    y, new_ssm = ssm_scan2(ss0, xs, dt, A, Bm, Cm, G)
    y = y + xs.astype(jnp.float32) * D[None, None, :, None]
    y = y.reshape(ns, nt, di) * jax.nn.silu(z.astype(jnp.float32))

    # grouped RMS norm: ssm_norm stored [G, di/G] (Mamba2Model converter)
    yg = y.reshape(ns, nt, G, di // G)
    yg = rms_norm(yg, None, cfg.rms_eps) * layer["ssm_norm"][None, None]
    y = yg.reshape(ns, nt, di)

    out = qmm(y.reshape(ns * nt, di).astype(jnp.bfloat16), layer["ssm_out"])
    return out.reshape(ns, nt, -1), new_conv, new_ssm.reshape(ns, di, ds)
