"""Pallas TPU kernel: fused decode attention over the unified KV cache.

The replacement for the reference's decode flash-attention kernels
(CUDA fattn-vec, /root/reference/ggml/src/ggml-cuda/fattn-vec-f16.cuh;
dispatch fattn.cu:271): online-softmax attention of a few query tokens
against the whole cache, streamed block-by-block from HBM.

TPU-first design points:
  * K is cached UNROPED (see ops/attention.py). The kernel folds the
    on-read rotation into the score matmuls using the identity

        (R(p_s) k_s) . q  =  (k_s * cos_s) . q  +  (k_s * sin_s) . q_rot

    where q_rot is the rope "rotate" companion of q (built once per step,
    cheap) and cos/sin are the full-width per-cell tables. This costs two
    VPU multiplies per K element and one extra MXU dot — and removes the
    reference-design alternative of a separate rope pass that would
    round-trip the whole cache through HBM.
  * The seq/causal/SWA mask arrives as an additive f32 bias row [T, S]
    (built in-jit from cell metadata), so one kernel serves all mask
    shapes; cache cells beyond S are masked with an in-kernel iota guard
    (the last S-block may be ragged).
  * Grouped-query heads are unrolled: per KV head, scores for its G query
    heads ride one (T*G, D) x (D, Sblk) MXU dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _decode_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                 o_ref, acc_ref, m_ref, l_ref, *, scale, softcap, s_real,
                 sblk, dist_ref=None, slopes_ref=None):
    """One (kv-head, S-block) grid step of decode flash attention over the
    HEAD-MAJOR cache: kh/vh are this head's contiguous (Sblk, D) planes.
    Round-5 measurement (scripts/kbench7.py): per-head sublane slices of an
    (Sblk, Hkv, D) block ran at <200 GB/s; the head-major grid streams at
    ~335 GB/s with sblk=1024."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    _, tg, d = q_ref.shape  # (1, T*G, D)
    t = b_ref.shape[0]
    g = tg // t

    cos = cos_ref[...].astype(jnp.float32)  # (Sblk, D)
    sin = sin_ref[...].astype(jnp.float32)
    # clamp -inf from the mask builder so masked rows stay NaN-free
    bias = jnp.maximum(b_ref[...], NEG)  # (T, Sblk) f32
    # ragged tail: cells past the real cache end hold undefined K/V bytes;
    # their scores must be REPLACED (a where), not biased (NaN + c = NaN)
    si = j * sblk + jax.lax.broadcasted_iota(jnp.int32, bias.shape, 1)
    tail_ok = si < s_real
    # V rows in the tail are undefined too: 0-prob x NaN = NaN, so zero them
    row_i = j * sblk + jax.lax.broadcasted_iota(jnp.int32, (sblk, 1), 0)
    row_ok = row_i < s_real

    qh = q_ref[0].astype(jnp.float32)  # (TG, D)
    qrh = qr_ref[0].astype(jnp.float32)
    # scores = q.(k*cos) + q_rot.(k*sin)  — rope folded into the dots
    s1 = jax.lax.dot_general(
        qh, kh * cos, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(
        qrh, kh * sin, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = (s1 + s2) * scale  # (TG, Sblk)
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    if slopes_ref is not None:
        # ALiBi in-kernel (ggml soft_max_ext max_bias):
        # score -= slope_h * (pos_q - pos_k)
        dist = dist_ref[...].astype(jnp.float32)  # (T, Sblk)
        # slopes arrive as the FULL (Hkv, G) array (a (1, G) block would
        # be an illegal (1, 1) tile when G == 1, e.g. MHA ALiBi archs);
        # select this grid step's kv-head row with an iota mask (Mosaic
        # has no in-kernel dynamic_slice)
        sl = slopes_ref[...]  # (Hkv, G)
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, sl.shape, 0)
                  == pl.program_id(0))
        slope = jnp.sum(jnp.where(rowsel, sl, 0.0), axis=0)  # (G,)
        scores = scores - (slope[None, :, None]
                           * dist[:, None, :]).reshape(tg, -1)
    scores = scores + jnp.broadcast_to(
        bias[:, None, :], (t, g, scores.shape[-1])).reshape(tg, -1)
    scores = jnp.where(
        jnp.broadcast_to(tail_ok[:, None, :], (t, g, scores.shape[-1])
                         ).reshape(tg, -1),
        scores, NEG)

    m_old = m_ref[...]  # (TG, 1)
    l_old = l_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(scores - m_new)
    l_ref[...] = l_old * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    vs = jnp.where(row_ok, vh, 0.0)
    pv = jax.lax.dot_general(
        p, vs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def _kernel(q_ref, qr_ref, b_ref, k_ref, v_ref, cos_ref, sin_ref,
            *refs, scale, softcap, s_real, sblk, has_alibi=False):
    kh = k_ref[0].astype(jnp.float32)  # (Sblk, D)
    vh = v_ref[0].astype(jnp.float32)
    dist_ref, slopes_ref = (refs[0], refs[1]) if has_alibi else (None, None)
    o_ref, acc_ref, m_ref, l_ref = refs[2 if has_alibi else 0:]
    _decode_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                 o_ref, acc_ref, m_ref, l_ref,
                 scale=scale, softcap=softcap, s_real=s_real, sblk=sblk,
                 dist_ref=dist_ref, slopes_ref=slopes_ref)


def _kernel_q8(q_ref, qr_ref, b_ref, k_ref, ks_ref, v_ref, vs_ref,
               cos_ref, sin_ref, *refs, scale, softcap, s_real, sblk,
               has_alibi=False):
    """Quantized-KV variant: K/V are int8 with ONE bf16 scale per head row
    (the fattn-vec quantized-cache analogue, fattn-common.cuh:481-496);
    dequant is an in-register lane-broadcast multiply — in BF16: int8
    magnitudes (<=127) are exact in bf16 and the stored scale is bf16
    anyway, while the f32 broadcast multiply deoptimizes Mosaic 4.5x
    (scripts/kbench9.py: 82us f32 vs 18us bf16 at S=4096)."""
    kh = (k_ref[0].astype(jnp.bfloat16)
          * ks_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
    vh = (v_ref[0].astype(jnp.bfloat16)
          * vs_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
    dist_ref, slopes_ref = (refs[0], refs[1]) if has_alibi else (None, None)
    o_ref, acc_ref, m_ref, l_ref = refs[2 if has_alibi else 0:]
    _decode_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                 o_ref, acc_ref, m_ref, l_ref,
                 scale=scale, softcap=softcap, s_real=s_real, sblk=sblk,
                 dist_ref=dist_ref, slopes_ref=slopes_ref)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "sblk", "interpret"),
)
def flash_decode(
    q: jnp.ndarray,  # [T, H, D] roped queries
    q_rot: jnp.ndarray,  # [T, H, D] rope companion of q
    k: jnp.ndarray,  # [Hkv, S, D] UNROPED key cache (HEAD-MAJOR)
    v: jnp.ndarray,  # [Hkv, S, Dv]
    cos: jnp.ndarray,  # [S, D] full-width per-cell cos
    sin: jnp.ndarray,  # [S, D]
    bias: jnp.ndarray,  # [T, S] additive f32 mask
    scale: float,
    softcap: float = 0.0,
    sblk: int = 1024,
    interpret: bool = False,
    alibi_slopes: jnp.ndarray | None = None,  # [H] f32
    dist: jnp.ndarray | None = None,  # [T, S] f32 (pos_q - pos_k)
) -> jnp.ndarray:
    """Returns [T, H, Dv] f32. k/v may be (int8, per-head-scale) tuples —
    the quantized-cache path (scales [Hkv, S, 1]). alibi_slopes + dist
    engage the in-kernel ALiBi term (fattn-common.cuh slope path).

    The cache is HEAD-MAJOR [Hkv, S, D] (round-5 layout migration): each
    grid step (h, j) streams one head's contiguous (Sblk, D) plane, which
    roughly doubles decode HBM bandwidth vs per-head sublane slices of an
    [S, Hkv, D] block, and lets flash_prefill drop its per-call O(S*D)
    cache transposes."""
    quantized = isinstance(k, tuple)
    kq, ks = k if quantized else (k, None)
    vq, vs = v if quantized else (v, None)
    T, H, D = q.shape
    Hkv, S, Dv = vq.shape
    G = H // Hkv
    TG = T * G
    sblk = min(sblk, S)
    grid = (Hkv, pl.cdiv(S, sblk))
    has_alibi = alibi_slopes is not None

    # kv-head-major q so each grid step sees its own (TG, D) tile
    qx = q.reshape(T, Hkv, G, D).transpose(1, 0, 2, 3).reshape(Hkv, TG, D)
    qrx = q_rot.reshape(T, Hkv, G, D).transpose(1, 0, 2, 3).reshape(
        Hkv, TG, D)

    kfn = _kernel_q8 if quantized else _kernel
    kernel = functools.partial(
        kfn, scale=scale, softcap=softcap, s_real=S, sblk=sblk,
        has_alibi=has_alibi)
    qspec = pl.BlockSpec((1, TG, D), lambda h, j: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, sblk, D), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, sblk, Dv), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, sblk, 1), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((sblk, D), lambda h, j: (j, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((T, sblk), lambda h, j: (0, j),
                         memory_space=pltpu.VMEM)
    if quantized:
        in_specs = [qspec, qspec, bspec, kspec, sspec, vspec, sspec, tspec, tspec]
        args = (qx, qrx, bias, kq, ks, vq, vs, cos, sin)
    else:
        in_specs = [qspec, qspec, bspec, kspec, vspec, tspec, tspec]
        args = (qx, qrx, bias, kq, vq, cos, sin)
    if has_alibi:
        in_specs += [bspec,
                     pl.BlockSpec((Hkv, G), lambda h, j: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += (dist.astype(jnp.float32),
                 alibi_slopes.astype(jnp.float32).reshape(Hkv, G))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TG, Dv), lambda h, j: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, TG, Dv), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TG, Dv), jnp.float32),
            pltpu.VMEM((TG, 1), jnp.float32),
            pltpu.VMEM((TG, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * H * S * D + 2 * T * H * S * Dv,
            bytes_accessed=kq.size * kq.dtype.itemsize
            + vq.size * vq.dtype.itemsize
            + (cos.size + sin.size) * 2 + bias.size * 4,
            transcendentals=T * H * S,
        ),
        interpret=interpret,
    )(*args)
    # (Hkv, T*G, Dv) -> (T, H, Dv)
    return out.reshape(Hkv, T, G, Dv).transpose(1, 0, 2, 3).reshape(T, H, Dv)


def _prefill_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                  o_ref, acc_ref, m_ref, l_ref, *, g, scale, softcap,
                  s_real, sblk, dist_ref=None, slopes_ref=None):
    """One (kv-head, T-block, S-block) grid step of prefill flash attention.

    All head-carrying operands arrive head-major ([Hkv, ...]) with a
    size-1 head block, so every in-kernel view is a legal (sublane, lane)
    tile — Mosaic requires the last two block dims be 8/128-aligned."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    _, tg, d = q_ref.shape  # (1, Tblk*G, D)
    tblk = tg // g

    cos = cos_ref[...].astype(jnp.float32)  # (Sblk, D)
    sin = sin_ref[...].astype(jnp.float32)
    bias = jnp.maximum(b_ref[...], NEG)  # (Tblk, Sblk)
    si = j * sblk + jax.lax.broadcasted_iota(jnp.int32, bias.shape, 1)
    tail_ok = si < s_real
    row_i = j * sblk + jax.lax.broadcasted_iota(jnp.int32, (sblk, 1), 0)
    row_ok = row_i < s_real

    qh = q_ref[0].astype(jnp.float32)  # (TG, D)
    qrh = qr_ref[0].astype(jnp.float32)
    # scores = q.(k*cos) + q_rot.(k*sin) — rope folded into the dots
    s1 = jax.lax.dot_general(qh, kh * cos, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(qrh, kh * sin, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    scores = (s1 + s2) * scale  # (TG, Sblk)
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    if slopes_ref is not None:
        # ALiBi in-kernel: score -= slope_h * (pos_q - pos_k)
        dist = dist_ref[...].astype(jnp.float32)  # (Tblk, Sblk)
        sl = slopes_ref[...]  # full (Hkv, G) block; see decode kernel
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, sl.shape, 0)
                  == pl.program_id(0))
        slope = jnp.sum(jnp.where(rowsel, sl, 0.0), axis=0)  # (G,)
        scores = scores - (slope[None, :, None]
                           * dist[:, None, :]).reshape(tg, -1)
    scores = scores + jnp.broadcast_to(
        bias[:, None, :], (tblk, g, scores.shape[-1])).reshape(tg, -1)
    scores = jnp.where(
        jnp.broadcast_to(tail_ok[:, None, :], (tblk, g, scores.shape[-1])
                         ).reshape(tg, -1),
        scores, NEG)

    m_old = m_ref[...]
    l_old = l_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(scores - m_new)
    l_ref[...] = l_old * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    vs = jnp.where(row_ok, vh, 0.0)
    pv = jax.lax.dot_general(p, vs, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def _prefill_kernel(q_ref, qr_ref, b_ref, k_ref, v_ref, cos_ref, sin_ref,
                    *refs, g, scale, softcap, s_real, sblk,
                    has_alibi=False):
    kh = k_ref[0].astype(jnp.float32)  # (Sblk, D)
    vh = v_ref[0].astype(jnp.float32)
    dist_ref, slopes_ref = (refs[0], refs[1]) if has_alibi else (None, None)
    o_ref, acc_ref, m_ref, l_ref = refs[2 if has_alibi else 0:]
    _prefill_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                  o_ref, acc_ref, m_ref, l_ref, g=g, scale=scale,
                  softcap=softcap, s_real=s_real, sblk=sblk,
                  dist_ref=dist_ref, slopes_ref=slopes_ref)


def _prefill_kernel_q8(q_ref, qr_ref, b_ref, k_ref, ks_ref, v_ref, vs_ref,
                       cos_ref, sin_ref, *refs, g, scale, softcap,
                       s_real, sblk, has_alibi=False):
    # bf16 dequant: see _kernel_q8
    kh = (k_ref[0].astype(jnp.bfloat16)
          * ks_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
    vh = (v_ref[0].astype(jnp.bfloat16)
          * vs_ref[0].astype(jnp.bfloat16)).astype(jnp.float32)
    dist_ref, slopes_ref = (refs[0], refs[1]) if has_alibi else (None, None)
    o_ref, acc_ref, m_ref, l_ref = refs[2 if has_alibi else 0:]
    _prefill_body(q_ref, qr_ref, b_ref, kh, vh, cos_ref, sin_ref,
                  o_ref, acc_ref, m_ref, l_ref, g=g, scale=scale,
                  softcap=softcap, s_real=s_real, sblk=sblk,
                  dist_ref=dist_ref, slopes_ref=slopes_ref)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "tblk", "sblk", "interpret"),
)  # alibi args are traced; their presence re-specializes via has_alibi
def flash_prefill(
    q: jnp.ndarray,  # [T, H, D] roped queries
    q_rot: jnp.ndarray,  # [T, H, D] rope companion of q
    k: jnp.ndarray,  # [Hkv, S, D] UNROPED key cache (or (int8, scales))
    v: jnp.ndarray,  # [Hkv, S, Dv]
    cos: jnp.ndarray,  # [S, D] full-width per-cell cos
    sin: jnp.ndarray,  # [S, D]
    bias: jnp.ndarray,  # [T, S] additive f32 mask
    scale: float,
    softcap: float = 0.0,
    tblk: int = 256,
    sblk: int = 512,
    interpret: bool = False,
    alibi_slopes: jnp.ndarray | None = None,  # [H] f32
    dist: jnp.ndarray | None = None,  # [T, S] f32 (pos_q - pos_k)
) -> jnp.ndarray:
    """Tiled online-softmax flash attention for prefill (T > 8): grid over
    (kv-head, T-block, S-block), so prefill memory is O(Tblk*Sblk) instead
    of the unfused O(T*Hkv*G*S) score tensor (the analogue of the
    reference's prefill flash path, fattn-mma-f16.cuh via
    llama-graph.cpp:1046-1114). Same rope-folded-into-the-dots trick as
    flash_decode. Returns [T, H, Dv] f32."""
    quantized = isinstance(k, tuple)
    kq, ks = k if quantized else (k, None)
    vq, vs = v if quantized else (v, None)
    T, H, D = q.shape
    Hkv, S, Dv = vq.shape
    G = H // Hkv
    tblk = min(tblk, T)
    sblk = min(sblk, S)
    assert T % tblk == 0
    grid = (Hkv, T // tblk, pl.cdiv(S, sblk))

    # head-major q so each grid step sees (sublane, lane) tiles:
    # q: [T, H, D] -> [Hkv, T*G, D] (heads are kv-major: h = h_kv*G + g).
    # The cache is already head-major [Hkv, S, D] (round-5 layout) — the
    # per-call O(S*D) cache transposes this kernel used to pay are gone.
    qx = q.reshape(T, Hkv, G, D).transpose(1, 0, 2, 3).reshape(Hkv, T * G, D)
    qrx = q_rot.reshape(T, Hkv, G, D).transpose(1, 0, 2, 3).reshape(Hkv, T * G, D)
    kx = kq
    vx = vq

    has_alibi = alibi_slopes is not None
    kfn = _prefill_kernel_q8 if quantized else _prefill_kernel
    kernel = functools.partial(
        kfn, g=G, scale=scale, softcap=softcap, s_real=S, sblk=sblk,
        has_alibi=has_alibi)
    qspec = pl.BlockSpec((1, tblk * G, D), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, sblk, D), lambda h, i, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, sblk, Dv), lambda h, i, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, sblk, 1), lambda h, i, j: (h, j, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((sblk, D), lambda h, i, j: (j, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((tblk, sblk), lambda h, i, j: (i, j),
                         memory_space=pltpu.VMEM)
    if quantized:
        in_specs = [qspec, qspec, bspec, kspec, sspec, vspec, sspec,
                    tspec, tspec]
        args = (qx, qrx, bias, kx, ks, vx, vs, cos, sin)
    else:
        in_specs = [qspec, qspec, bspec, kspec, vspec, tspec, tspec]
        args = (qx, qrx, bias, kx, vx, cos, sin)
    if has_alibi:
        in_specs += [bspec,
                     pl.BlockSpec((Hkv, G), lambda h, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += (dist.astype(jnp.float32),
                 alibi_slopes.astype(jnp.float32).reshape(Hkv, G))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tblk * G, Dv), lambda h, i, j: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, T * G, Dv), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tblk * G, Dv), jnp.float32),
            pltpu.VMEM((tblk * G, 1), jnp.float32),
            pltpu.VMEM((tblk * G, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * H * S * D + 2 * T * H * S * Dv,
            bytes_accessed=(kq.size * kq.dtype.itemsize
                            + vq.size * vq.dtype.itemsize) * T // tblk
            + (cos.size + sin.size) * 2 + bias.size * 4,
            transcendentals=T * H * S,
        ),
        interpret=interpret,
    )(*args)
    # (Hkv, T, G, Dv) -> (T, H, Dv)
    return out.reshape(Hkv, T, G, Dv).transpose(1, 0, 2, 3).reshape(T, H, Dv)


def rope_companion(q: jnp.ndarray, mode: int,
                   n_dims: int | None = None) -> jnp.ndarray:
    """q_rot such that R(p)k . q == (k*cos_p).q + (k*sin_p).q_rot.

    NEOX halves: q_rot = [q_hi, -q_lo]; NORM pairs: q_rot = [q1, -q0]
    interleaved (derived from the rotation acting on k instead of q).
    Partial rotary (n_dims < D, stablelm/phi2/MLA layouts rotate the
    LEADING n_dims): the unrotated tail gets q_rot = 0, so its sin term
    vanishes and the cos=1 term carries the plain dot. Mode NONE
    (ALiBi/learned-position archs) is all-zeros."""
    from .rope import ROPE_TYPE_NEOX, ROPE_TYPE_NONE, ROPE_TYPE_NORM

    d = q.shape[-1]
    if mode == ROPE_TYPE_NONE:
        return jnp.zeros_like(q)
    nd = d if n_dims is None else n_dims
    if mode == ROPE_TYPE_NEOX:
        half = nd // 2
        rot = jnp.concatenate([q[..., half:nd], -q[..., :half]], axis=-1)
    elif mode == ROPE_TYPE_NORM:
        q0 = q[..., 0:nd:2]
        q1 = q[..., 1:nd:2]
        rot = jnp.stack([q1, -q0], axis=-1).reshape(*q.shape[:-1], nd)
    else:
        raise ValueError(f"unsupported rope mode {mode}")
    if nd == d:
        return rot
    return jnp.concatenate([rot, jnp.zeros_like(q[..., nd:])], axis=-1)


def expand_tables(cos_h: jnp.ndarray, sin_h: jnp.ndarray, mode: int, d: int,
                  n_dims: int | None = None):
    """Half-width [S, n_dims/2] rope tables -> full-width [S, D] per
    layout. Unrotated trailing dims get cos=1 / sin=0 (identity rotation);
    mode NONE yields all-ones / all-zeros tables."""
    from .rope import ROPE_TYPE_NEOX, ROPE_TYPE_NONE, ROPE_TYPE_NORM

    S = cos_h.shape[0]
    if mode == ROPE_TYPE_NONE:
        return (jnp.ones((S, d), cos_h.dtype), jnp.zeros((S, d), sin_h.dtype))
    nd = d if n_dims is None else n_dims
    ch = cos_h[..., : nd // 2]
    sh = sin_h[..., : nd // 2]
    if mode == ROPE_TYPE_NEOX:
        c = jnp.concatenate([ch, ch], -1)
        s = jnp.concatenate([sh, sh], -1)
    elif mode == ROPE_TYPE_NORM:
        c = jnp.stack([ch, ch], -1).reshape(*ch.shape[:-1], nd)
        s = jnp.stack([sh, sh], -1).reshape(*sh.shape[:-1], nd)
    else:
        raise ValueError(f"unsupported rope mode {mode}")
    if nd == d:
        return c, s
    pad = ((0, 0),) * (c.ndim - 1) + ((0, d - nd),)
    return (jnp.pad(c, pad, constant_values=1.0),
            jnp.pad(s, pad, constant_values=0.0))
