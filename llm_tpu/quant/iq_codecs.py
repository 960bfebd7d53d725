"""Importance-grid (IQ) and ternary (TQ) block codecs.

Decoders are bit-exact implementations of the reference formats
(block layouts: ggml/src/ggml-common.h:233-396; decode semantics:
ggml/src/ggml-quants.c dequantize_row_iq*/tq*). The fixed codebook grids
(ggml-common.h:518-1085) are format data constants shipped in
iq_grids.npz (see gen_iq_grids.py).

Encoders: TQ1_0/TQ2_0 match the reference quantizers exactly
(quantize_row_tq*_ref). The IQ encoders are our own vectorized
nearest-codeword searches with per-group least-squares scale refitting —
the reference's encoders (ggml-quants.c quantize_iq2_xxs etc.) use a
slower annealed search and, for IQ2*/IQ1*, *require* an importance
matrix; ours accept an optional per-channel weight `qw` the same way and
always produce valid bitstreams (verified against the reference's own
gguf-py dequantizers).

Element ordering inside a 256-value super-block follows the reference
exactly: 8 sub-blocks of 32, each made of four (IQ2*/IQ1*) or eight
(IQ3*) codebook words of 8 or 4 values.
"""

from __future__ import annotations

import os

import numpy as np

from ..gguf.constants import GGMLType, QK_K

# ---------------------------------------------------------------------------
# Codebooks
# ---------------------------------------------------------------------------

_GRIDS = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)), "iq_grids.npz"))

# grids expanded to (n_codes, values_per_code) arrays
GRID_IQ2XXS = _GRIDS["iq2xxs_grid"].view(np.uint8).reshape(256, 8).astype(np.float32)
GRID_IQ2XS = _GRIDS["iq2xs_grid"].view(np.uint8).reshape(512, 8).astype(np.float32)
GRID_IQ2S = _GRIDS["iq2s_grid"].view(np.uint8).reshape(1024, 8).astype(np.float32)
GRID_IQ3XXS = _GRIDS["iq3xxs_grid"].view(np.uint8).reshape(256, 4).astype(np.float32)
GRID_IQ3S = _GRIDS["iq3s_grid"].view(np.uint8).reshape(512, 4).astype(np.float32)
GRID_IQ1S = _GRIDS["iq1s_grid"].view(np.int8).reshape(2048, 8).astype(np.float32)

KSIGNS = _GRIDS["ksigns_iq2xs"]  # (128,) uint8; bit j = sign of element j
# (128, 8) multiplier table: +1 / -1
KSIGN_MULT = np.where(
    (KSIGNS[:, None] >> np.arange(8)[None, :]) & 1, -1.0, 1.0
).astype(np.float32)

IQ1S_DELTA = 0.125  # ggml-common.h:1082

_f16 = lambda x: np.asarray(x, np.float32).astype(np.float16).astype(np.float32)


def _store_f16(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, np.float32).astype("<f2").view(np.uint8)


def _read_f16(b: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(b).view("<f2").astype(np.float32).reshape(b.shape[0])


def _u8(raw: np.ndarray, ts: int) -> np.ndarray:
    b = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    return b.reshape(-1, ts)


def _u16(b: np.ndarray) -> np.ndarray:
    """little-endian uint16 view of a (..., 2k) uint8 array -> (..., k) int64"""
    b = np.ascontiguousarray(b)
    return b.view("<u2").astype(np.int64)


def _u32(b: np.ndarray) -> np.ndarray:
    b = np.ascontiguousarray(b)
    return b.view("<u4").astype(np.int64)


def _blocks(x: np.ndarray, qk: int) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    if x.shape[-1] % qk:
        raise ValueError(f"row size {x.shape[-1]} not a multiple of {qk}")
    return x.reshape(-1, qk)


# ---------------------------------------------------------------------------
# Shared encoder helpers
# ---------------------------------------------------------------------------


def _weights(xb: np.ndarray, qw, qk: int) -> np.ndarray:
    """Per-value search weights: x^2 by default, imatrix-style
    qw*sqrt(sigma2 + x^2) when an importance row is given (the shape the
    reference uses for its IQ quantizers)."""
    if qw is None:
        return xb * xb + 1e-9
    q = np.asarray(qw, np.float32).ravel()
    if q.size != qk:  # per-row importance (n_per_row) -> per-block view
        q = np.tile(q, xb.size // q.size)
    q = np.broadcast_to(q.reshape(-1, qk) if q.size > qk else q, xb.shape)
    sigma2 = np.mean(xb * xb, axis=-1, keepdims=True)
    return q * np.sqrt(sigma2 + xb * xb)


def _nearest_codes(t: np.ndarray, w: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """argmin_c sum_j w_j (t_j - grid[c,j])^2 for each row of t.

    t, w: (G, k); grid: (N, k). Returns (G,) indices."""
    # cost = const + sum w*g^2 - 2 sum w*t*g
    a = (w * t) @ grid.T  # (G, N)
    b = w @ (grid * grid).T  # (G, N)
    return np.argmin(b - 2.0 * a, axis=-1)


def _fit_scale(t: np.ndarray, w: np.ndarray, g: np.ndarray) -> np.ndarray:
    """least-squares d minimizing sum w (t - d g)^2 over the last axis."""
    num = np.sum(w * t * g, axis=-1)
    den = np.sum(w * g * g, axis=-1)
    return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)


def _even_parity_signs(xg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode signs of 8-value groups under the ksigns parity constraint.

    The 7-bit stored sign index s implies sign(elem 7) = parity(s)
    (ksigns_iq2xs table), i.e. only even-popcount sign patterns are
    representable. Flip the smallest-|x| element when the true pattern is
    odd. Returns (s7 indices (G,), signed multipliers (G, 8))."""
    neg = (xg < 0).astype(np.int64)  # (G, 8)
    parity = neg.sum(axis=-1) & 1
    flip_at = np.argmin(np.abs(xg), axis=-1)
    neg[parity == 1, flip_at[parity == 1]] ^= 1
    s7 = (neg[:, :7] << np.arange(7)[None, :]).sum(axis=-1)
    mult = 1.0 - 2.0 * neg.astype(np.float32)
    return s7, mult


def _pack_group_scales(db: np.ndarray, base: float, step: float, emax: int):
    """Quantize per-group scales db ~= d * (base + e) * step with e in
    [0, emax]; returns (d (B,), e (B, ngroups))."""
    mx = np.max(db, axis=-1)
    d = mx / ((base + emax) * step)
    d = _f16(d)
    safe = np.where(d > 0, d, 1.0)
    e = np.clip(np.round(db / (safe[:, None] * step) - base), 0, emax)
    return d, e.astype(np.int64)


# ---------------------------------------------------------------------------
# IQ2_XXS — 2.0625 bpw (ggml-common.h:339-343)
# ---------------------------------------------------------------------------


def dequantize_iq2_xxs(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 66)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    body = b[:, 2:].reshape(B, 8, 8)  # 8 sub-blocks x 8 bytes
    idx = body[:, :, 0:4].astype(np.int64)  # grid words
    sig = _u32(body[:, :, 4:8].reshape(B, 8, 4)).reshape(B, 8)
    db = (0.5 + (sig >> 28).astype(np.float32)) * 0.25 * d[:, None]  # (B, 8)
    s7 = (sig[:, :, None] >> (7 * np.arange(4))[None, None, :]) & 127  # (B,8,4)
    vals = GRID_IQ2XXS[idx] * KSIGN_MULT[s7]  # (B,8,4,8)
    return (db[:, :, None, None] * vals).reshape(B, QK_K)


def quantize_iq2_xxs(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xg = xb.reshape(B * 32, 8)
    wg = w.reshape(B * 32, 8)
    s7, mult = _even_parity_signs(xg)
    t = xg * mult  # targets are (mostly) magnitudes

    # initial per-32 scale from the largest magnitude / largest grid value
    db0 = np.max(np.abs(xb).reshape(B * 8, 32), axis=-1) / 43.0
    for _ in range(2):
        tn = t / np.where(db0 > 0, db0, 1.0).repeat(4)[:, None]
        codes = _nearest_codes(tn, wg, GRID_IQ2XXS)
        g = GRID_IQ2XXS[codes]
        db0 = _fit_scale(
            t.reshape(B * 8, 32), wg.reshape(B * 8, 32), g.reshape(B * 8, 32)
        )
    d, e = _pack_group_scales(db0.reshape(B, 8), 0.5, 0.25, 15)

    codes = codes.reshape(B, 8, 4)
    s7 = s7.reshape(B, 8, 4)
    sig = (s7 << (7 * np.arange(4))[None, None, :]).sum(axis=-1) | (e << 28)
    out = np.empty((B, 66), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    body = out[:, 2:].reshape(B, 8, 8)
    body[:, :, 0:4] = codes.astype(np.uint8)
    body[:, :, 4:8] = sig.astype("<u4").view(np.uint8).reshape(B, 8, 4)
    return out


# ---------------------------------------------------------------------------
# IQ2_XS — 2.3125 bpw (ggml-common.h:346-351)
# ---------------------------------------------------------------------------


def dequantize_iq2_xs(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 74)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = _u16(b[:, 2:66]).reshape(B, 8, 4)
    scales = b[:, 66:74].astype(np.int64)  # (B, 8)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)  # (B,8,2)
    db = (0.5 + nib) * 0.25 * d[:, None, None]  # (B,8,2) one per 16 values
    vals = GRID_IQ2XS[qs & 511] * KSIGN_MULT[qs >> 9]  # (B,8,4,8)
    dbl = db[:, :, [0, 0, 1, 1]]  # scale for word l is nibble l//2
    return (dbl[..., None] * vals).reshape(B, QK_K)


def quantize_iq2_xs(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xg = xb.reshape(B * 32, 8)
    wg = w.reshape(B * 32, 8)
    s7, mult = _even_parity_signs(xg)
    t = xg * mult

    db0 = np.max(np.abs(xb).reshape(B * 16, 16), axis=-1) / 43.0  # per 16 values
    for _ in range(2):
        tn = t / np.where(db0 > 0, db0, 1.0).repeat(2)[:, None]
        codes = _nearest_codes(tn, wg, GRID_IQ2XS)
        g = GRID_IQ2XS[codes]
        db0 = _fit_scale(
            t.reshape(B * 16, 16), wg.reshape(B * 16, 16), g.reshape(B * 16, 16)
        )
    d, e = _pack_group_scales(db0.reshape(B, 16), 0.5, 0.25, 15)

    qs = (codes.reshape(B, 8, 4) | (s7.reshape(B, 8, 4) << 9)).astype("<u2")
    e = e.reshape(B, 8, 2)
    out = np.empty((B, 74), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:66] = qs.view(np.uint8).reshape(B, 64)
    out[:, 66:74] = (e[:, :, 0] | (e[:, :, 1] << 4)).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# IQ2_S — 2.5625 bpw (ggml-common.h:354-360)
# ---------------------------------------------------------------------------


def dequantize_iq2_s(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 82)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:34].astype(np.int64).reshape(B, 8, 4)  # low 8 idx bits
    signs = b[:, 34:66].astype(np.int64).reshape(B, 8, 4)  # full 8-bit signs
    qh = b[:, 66:74].astype(np.int64)  # (B, 8): 2 idx high bits per word
    scales = b[:, 74:82].astype(np.int64)
    idx = qs | ((qh[:, :, None] << (8 - 2 * np.arange(4))[None, None, :]) & 0x300)
    smult = np.where(
        (signs[..., None] >> np.arange(8)[None, None, None, :]) & 1, -1.0, 1.0
    ).astype(np.float32)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)
    db = (0.5 + nib) * 0.25 * d[:, None, None]
    dbl = db[:, :, [0, 0, 1, 1]]
    return (dbl[..., None] * GRID_IQ2S[idx] * smult).reshape(B, QK_K)


def quantize_iq2_s(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xg = xb.reshape(B * 32, 8)
    wg = w.reshape(B * 32, 8)
    neg = (xg < 0).astype(np.int64)
    sbyte = (neg << np.arange(8)[None, :]).sum(axis=-1)  # free 8-bit signs
    t = np.abs(xg)

    db0 = np.max(np.abs(xb).reshape(B * 16, 16), axis=-1) / 43.0
    for _ in range(2):
        tn = t / np.where(db0 > 0, db0, 1.0).repeat(2)[:, None]
        codes = _nearest_codes(tn, wg, GRID_IQ2S)
        g = GRID_IQ2S[codes]
        db0 = _fit_scale(
            t.reshape(B * 16, 16), wg.reshape(B * 16, 16), g.reshape(B * 16, 16)
        )
    d, e = _pack_group_scales(db0.reshape(B, 16), 0.5, 0.25, 15)

    codes = codes.reshape(B, 8, 4)
    out = np.empty((B, 82), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:34] = (codes & 0xFF).astype(np.uint8).reshape(B, 32)
    out[:, 34:66] = sbyte.astype(np.uint8).reshape(B, 32)
    hi = codes >> 8  # (B,8,4) in [0,3]
    out[:, 66:74] = (hi << (2 * np.arange(4))[None, None, :]).sum(axis=-1).astype(np.uint8)
    e = e.reshape(B, 8, 2)
    out[:, 74:82] = (e[:, :, 0] | (e[:, :, 1] << 4)).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# IQ3_XXS — 3.0625 bpw (ggml-common.h:363-369)
# ---------------------------------------------------------------------------


def dequantize_iq3_xxs(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 98)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:66].astype(np.int64).reshape(B, 8, 8)  # 8 grid words of 4 per sub-block
    sas = _u32(b[:, 66:98]).reshape(B, 8)  # scale+signs per sub-block
    db = (0.5 + (sas >> 28).astype(np.float32)) * 0.5 * d[:, None]
    s7 = (sas[:, :, None] >> (7 * np.arange(4))[None, None, :]) & 127  # per 8 values
    vals = GRID_IQ3XXS[qs].reshape(B, 8, 4, 8)  # pair grid words -> 8 values
    smult = KSIGN_MULT[s7]  # (B,8,4,8)
    return (db[:, :, None, None] * vals * smult).reshape(B, QK_K)


def quantize_iq3_xxs(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xg = xb.reshape(B * 32, 8)
    wg = w.reshape(B * 32, 8)
    s7, mult = _even_parity_signs(xg)
    t4 = (xg * mult).reshape(B * 64, 4)
    w4 = wg.reshape(B * 64, 4)

    db0 = np.max(np.abs(xb).reshape(B * 8, 32), axis=-1) / 62.0
    for _ in range(2):
        tn = t4 / np.where(db0 > 0, db0, 1.0).repeat(8)[:, None]
        codes = _nearest_codes(tn, w4, GRID_IQ3XXS)
        g = GRID_IQ3XXS[codes]
        db0 = _fit_scale(
            t4.reshape(B * 8, 32), w4.reshape(B * 8, 32), g.reshape(B * 8, 32)
        )
    d, e = _pack_group_scales(db0.reshape(B, 8), 0.5, 0.5, 15)

    s7 = s7.reshape(B, 8, 4)
    sas = (s7 << (7 * np.arange(4))[None, None, :]).sum(axis=-1) | (e << 28)
    out = np.empty((B, 98), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:66] = codes.reshape(B, 64).astype(np.uint8)
    out[:, 66:98] = sas.astype("<u4").view(np.uint8).reshape(B, 32)
    return out


# ---------------------------------------------------------------------------
# IQ3_S — 3.4375 bpw (ggml-common.h:372-380)
# ---------------------------------------------------------------------------


def dequantize_iq3_s(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 110)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:66].astype(np.int64).reshape(B, 8, 8)
    qh = b[:, 66:74].astype(np.int64)  # (B, 8): high idx bit per grid word
    signs = b[:, 74:106].astype(np.int64).reshape(B, 8, 4)  # sign byte per 8 values
    scales = b[:, 106:110].astype(np.int64)  # (B, 4) nibble per sub-block
    idx = qs | (((qh[:, :, None] >> np.arange(8)[None, None, :]) & 1) << 8)
    vals = GRID_IQ3S[idx].reshape(B, 8, 4, 8)
    smult = np.where(
        (signs[..., None] >> np.arange(8)[None, None, None, :]) & 1, -1.0, 1.0
    ).astype(np.float32)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(B, 8)
    db = (1.0 + 2.0 * nib.astype(np.float32)) * d[:, None]  # (B, 8)
    return (db[:, :, None, None] * vals * smult).reshape(B, QK_K)


def quantize_iq3_s(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xg = xb.reshape(B * 32, 8)
    neg = (xg < 0).astype(np.int64)
    sbyte = (neg << np.arange(8)[None, :]).sum(axis=-1)
    t4 = np.abs(xb).reshape(B * 64, 4)
    w4 = w.reshape(B * 64, 4)

    db0 = np.max(np.abs(xb).reshape(B * 8, 32), axis=-1) / 15.0
    for _ in range(2):
        tn = t4 / np.where(db0 > 0, db0, 1.0).repeat(8)[:, None]
        codes = _nearest_codes(tn, w4, GRID_IQ3S)
        g = GRID_IQ3S[codes]
        db0 = _fit_scale(
            t4.reshape(B * 8, 32), w4.reshape(B * 8, 32), g.reshape(B * 8, 32)
        )
    # db = d * (1 + 2e), e in [0, 15]
    mx = np.max(db0.reshape(B, 8), axis=-1)
    d = _f16(mx / 31.0)
    safe = np.where(d > 0, d, 1.0)
    e = np.clip(np.round((db0.reshape(B, 8) / safe[:, None] - 1.0) / 2.0), 0, 15).astype(np.int64)

    codes = codes.reshape(B, 8, 8)
    out = np.empty((B, 110), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:66] = (codes & 0xFF).astype(np.uint8).reshape(B, 64)
    out[:, 66:74] = ((codes >> 8) << np.arange(8)[None, None, :]).sum(axis=-1).astype(np.uint8)
    out[:, 74:106] = sbyte.astype(np.uint8).reshape(B, 32)
    out[:, 106:110] = (e[:, 0::2] | (e[:, 1::2] << 4)).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# IQ1_S — 1.5625 bpw (ggml-common.h:383-388)
# ---------------------------------------------------------------------------


def dequantize_iq1_s(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 50)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:34].astype(np.int64).reshape(B, 8, 4)
    qh = _u16(b[:, 34:50]).reshape(B, 8)
    dl = (2.0 * ((qh >> 12) & 7).astype(np.float32) + 1.0) * d[:, None]  # (B,8)
    delta = np.where(qh & 0x8000, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
    idx = qs | (((qh[:, :, None] >> (3 * np.arange(4))[None, None, :]) & 7) << 8)
    vals = GRID_IQ1S[idx] + delta[:, :, None, None]  # (B,8,4,8)
    return (dl[:, :, None, None] * vals).reshape(B, QK_K)


def quantize_iq1_s(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xg = xb.reshape(B * 8, 32)  # per sub-block of 32 (shared scale + delta)
    wg = w.reshape(B * 8, 32)

    db0 = np.max(np.abs(xg), axis=-1) / 1.125  # grid in {-1,0,1} + delta
    best_codes = None
    best_cost = None
    best_delta_neg = None
    for _ in range(2):
        dsafe = np.where(db0 > 0, db0, 1.0)
        costs, codes_per_delta = [], []
        for delta in (IQ1S_DELTA, -IQ1S_DELTA):
            grid_d = GRID_IQ1S + delta  # (2048, 8)
            tn = (xg / dsafe[:, None]).reshape(B * 32, 8)
            w8 = wg.reshape(B * 32, 8)
            codes = _nearest_codes(tn, w8, grid_d)
            g = grid_d[codes].reshape(B * 8, 32)
            err = np.sum(wg * (xg - db0[:, None] * g) ** 2, axis=-1)
            costs.append(err)
            codes_per_delta.append(codes.reshape(B * 8, 4))
        neg = (costs[1] < costs[0])
        best_delta_neg = neg
        best_codes = np.where(neg[:, None], codes_per_delta[1], codes_per_delta[0])
        delta_vec = np.where(neg, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
        g = GRID_IQ1S[best_codes].reshape(B * 8, 32) + delta_vec[:, None]
        db0 = np.maximum(_fit_scale(xg, wg, g), 0.0)

    # dl = d * (2h + 1), h in [0, 7]
    mx = np.max(db0.reshape(B, 8), axis=-1)
    d = _f16(mx / 15.0)
    safe = np.where(d > 0, d, 1.0)
    h = np.clip(np.round((db0.reshape(B, 8) / safe[:, None] - 1.0) / 2.0), 0, 7).astype(np.int64)

    codes = best_codes.reshape(B, 8, 4)
    hi3 = (codes >> 8) & 7
    qh = (hi3 << (3 * np.arange(4))[None, None, :]).sum(axis=-1)
    qh |= h << 12
    qh |= np.where(best_delta_neg.reshape(B, 8), 0x8000, 0)
    out = np.empty((B, 50), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:34] = (codes & 0xFF).astype(np.uint8).reshape(B, 32)
    out[:, 34:50] = qh.astype("<u2").view(np.uint8).reshape(B, 16)
    return out


# ---------------------------------------------------------------------------
# IQ1_M — 1.75 bpw (ggml-common.h:391-396); block has no f16 d field — the
# block scale hides in the top nibbles of the four 16-bit scale words.
# ---------------------------------------------------------------------------


def dequantize_iq1_m(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 56)
    B = b.shape[0]
    qs = b[:, 0:32].astype(np.int64).reshape(B, 8, 4)
    qh = b[:, 32:48].astype(np.int64).reshape(B, 8, 2)
    sc = _u16(b[:, 48:56]).reshape(B, 4)
    du16 = (
        (sc[:, 0] >> 12)
        | ((sc[:, 1] >> 8) & 0x00F0)
        | ((sc[:, 2] >> 4) & 0x0F00)
        | (sc[:, 3] & 0xF000)
    )
    d = du16.astype("<u2").view("<f2").astype(np.float32)
    ib = np.arange(8)
    scw = sc[:, ib // 2]  # (B, 8)
    dl1 = 2.0 * ((scw >> (6 * (ib % 2))) & 7).astype(np.float32) + 1.0
    dl2 = 2.0 * ((scw >> (6 * (ib % 2) + 3)) & 7).astype(np.float32) + 1.0
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1) * d[:, None, None]  # (B,8,4)
    idx = np.empty((B, 8, 4), np.int64)
    idx[:, :, 0] = qs[:, :, 0] | ((qh[:, :, 0] << 8) & 0x700)
    idx[:, :, 1] = qs[:, :, 1] | ((qh[:, :, 0] << 4) & 0x700)
    idx[:, :, 2] = qs[:, :, 2] | ((qh[:, :, 1] << 8) & 0x700)
    idx[:, :, 3] = qs[:, :, 3] | ((qh[:, :, 1] << 4) & 0x700)
    hbit = np.stack(
        [qh[:, :, 0] & 0x08, qh[:, :, 0] & 0x80, qh[:, :, 1] & 0x08, qh[:, :, 1] & 0x80],
        axis=-1,
    )
    delta = np.where(hbit != 0, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
    vals = GRID_IQ1S[idx] + delta[..., None]
    return (dl[..., None] * vals).reshape(B, QK_K)


def quantize_iq1_m(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    w = _weights(xb, qw, QK_K)
    xh = xb.reshape(B * 16, 16)  # scale granularity: 16 values
    wh = w.reshape(B * 16, 16)
    x8 = xb.reshape(B * 32, 8)
    w8 = w.reshape(B * 32, 8)

    db0 = np.max(np.abs(xh), axis=-1) / 1.125
    for _ in range(2):
        dsafe = np.where(db0 > 0, db0, 1.0)
        costs, codes_all = [], []
        for delta in (IQ1S_DELTA, -IQ1S_DELTA):
            grid_d = GRID_IQ1S + delta
            tn = x8 / dsafe.repeat(2)[:, None]
            codes = _nearest_codes(tn, w8, grid_d)
            g = grid_d[codes]
            err = np.sum(w8 * (x8 - dsafe.repeat(2)[:, None] * g) ** 2, axis=-1)
            costs.append(err)
            codes_all.append(codes)
        neg = costs[1] < costs[0]  # per 8-group delta sign
        codes = np.where(neg, codes_all[1], codes_all[0])
        delta_vec = np.where(neg, -IQ1S_DELTA, IQ1S_DELTA).astype(np.float32)
        g = (GRID_IQ1S[codes] + delta_vec[:, None]).reshape(B * 16, 16)
        db0 = np.maximum(_fit_scale(xh, wh, g), 0.0)

    # dl = d * (2h + 1), h in [0, 7]; d is f16, packed into scale top nibbles
    mx = np.max(db0.reshape(B, 16), axis=-1)
    d = _f16(mx / 15.0)
    safe = np.where(d > 0, d, 1.0)
    h = np.clip(np.round((db0.reshape(B, 16) / safe[:, None] - 1.0) / 2.0), 0, 7).astype(np.int64)

    codes = codes.reshape(B, 8, 4)
    neg = neg.reshape(B, 8, 4)
    lo = (codes & 0xFF).astype(np.uint8).reshape(B, 32)
    h3 = (codes >> 8) & 7
    qh0 = h3[:, :, 0] | (np.where(neg[:, :, 0], 8, 0)) | (h3[:, :, 1] << 4) | np.where(neg[:, :, 1], 0x80, 0)
    qh1 = h3[:, :, 2] | (np.where(neg[:, :, 2], 8, 0)) | (h3[:, :, 3] << 4) | np.where(neg[:, :, 3], 0x80, 0)
    qh = np.stack([qh0, qh1], axis=-1).reshape(B, 16)
    du16 = _store_f16(d).view("<u2").astype(np.int64).reshape(B)
    hp = h.reshape(B, 4, 4)  # scale words: 4 3-bit scales + d nibble each
    sc = (
        hp[:, :, 0]
        | (hp[:, :, 1] << 3)
        | (hp[:, :, 2] << 6)
        | (hp[:, :, 3] << 9)
    )
    dnib = np.stack(
        [du16 & 0xF, (du16 >> 4) & 0xF, (du16 >> 8) & 0xF, (du16 >> 12) & 0xF], axis=-1
    )
    sc |= dnib << 12
    out = np.empty((B, 56), np.uint8)
    out[:, 0:32] = lo
    out[:, 32:48] = qh.astype(np.uint8)
    out[:, 48:56] = sc.astype("<u2").view(np.uint8).reshape(B, 8)
    return out


# ---------------------------------------------------------------------------
# TQ1_0 / TQ2_0 — ternary (ggml-common.h:233-246); bit-exact with
# quantize_row_tq1_0_ref / tq2_0 (ggml-quants.c:2064-2130)
# ---------------------------------------------------------------------------

_POW3 = np.array([1, 3, 9, 27, 81, 243], np.uint16)


def _trits_decode(q: np.ndarray, n: int) -> np.ndarray:
    """q: uint8 array; returns (..., n) trits in {-1,0,1}; digit k extracted
    as ((q*3^k mod 256)*3) >> 8 (the reference's multiply trick)."""
    q = q.astype(np.uint16)
    digs = []
    for k in range(n):
        v = (q * _POW3[k]) & 0xFF
        digs.append(((v * 3) >> 8).astype(np.int8) - 1)
    return np.stack(digs, axis=-1)


def dequantize_tq1_0(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 54)
    B = b.shape[0]
    qs = b[:, 0:48]
    qh = b[:, 48:52]
    d = _read_f16(b[:, 52:54])
    y = np.empty((B, QK_K), np.float32)
    # 32-byte chunk: element (n, m) -> y[32n + m]
    t = _trits_decode(qs[:, 0:32], 5)  # (B, 32, 5)
    y[:, 0:160] = np.moveaxis(t, -1, 1).reshape(B, 160)
    t = _trits_decode(qs[:, 32:48], 5)  # (B, 16, 5)
    y[:, 160:240] = np.moveaxis(t, -1, 1).reshape(B, 80)
    t = _trits_decode(qh, 4)  # (B, 4, 4)
    y[:, 240:256] = np.moveaxis(t, -1, 1).reshape(B, 16)
    return y * d[:, None]


def quantize_tq1_0(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    amax = np.max(np.abs(xb), axis=-1)
    d = amax  # stored as f16; id computed from the *f32* amax (ref semantics)
    id = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = np.clip(np.round(xb * id[:, None]), -1, 1).astype(np.int64) + 1  # {0,1,2}

    def pack(vals: np.ndarray, n: int) -> np.ndarray:
        """vals: (B, m, n) trits MSB-first -> ceil-scaled byte"""
        acc = np.zeros(vals.shape[:-1], np.uint16)
        for k in range(n):
            acc = acc * 3 + vals[..., k].astype(np.uint16)
        if n < 5:
            acc = acc * (3 ** (5 - n))
        return ((acc * 256 + 242) // 243).astype(np.uint8)

    out = np.empty((B, 54), np.uint8)
    seg = q[:, 0:160].reshape(B, 5, 32)  # digit n stride 32
    out[:, 0:32] = pack(np.moveaxis(seg, 1, 2), 5)
    seg = q[:, 160:240].reshape(B, 5, 16)
    out[:, 32:48] = pack(np.moveaxis(seg, 1, 2), 5)
    seg = q[:, 240:256].reshape(B, 4, 4)
    out[:, 48:52] = pack(np.moveaxis(seg, 1, 2), 4)
    out[:, 52:54] = _store_f16(d).reshape(-1, 2)
    return out


def dequantize_tq2_0(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 66)
    B = b.shape[0]
    qs = b[:, 0:64].reshape(B, 2, 32)
    d = _read_f16(b[:, 64:66])
    shifts = (2 * np.arange(4))[None, None, :, None]
    q = ((qs[:, :, None, :] >> shifts) & 3).astype(np.float32) - 1.0  # (B,2,4,32)
    return (q.reshape(B, QK_K) * d[:, None]).astype(np.float32)


def quantize_tq2_0(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    amax = np.max(np.abs(xb), axis=-1)
    d = amax
    id = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
    q = (np.clip(np.round(xb * id[:, None]), -1, 1).astype(np.int64) + 1).reshape(B, 2, 4, 32)
    packed = (q << (2 * np.arange(4))[None, None, :, None]).sum(axis=2)
    out = np.empty((B, 66), np.uint8)
    out[:, 0:64] = packed.reshape(B, 64).astype(np.uint8)
    out[:, 64:66] = _store_f16(d).reshape(-1, 2)
    return out


QUANTIZE = {
    GGMLType.IQ2_XXS: quantize_iq2_xxs,
    GGMLType.IQ2_XS: quantize_iq2_xs,
    GGMLType.IQ2_S: quantize_iq2_s,
    GGMLType.IQ3_XXS: quantize_iq3_xxs,
    GGMLType.IQ3_S: quantize_iq3_s,
    GGMLType.IQ1_S: quantize_iq1_s,
    GGMLType.IQ1_M: quantize_iq1_m,
    GGMLType.TQ1_0: quantize_tq1_0,
    GGMLType.TQ2_0: quantize_tq2_0,
}

DEQUANTIZE = {
    GGMLType.IQ2_XXS: dequantize_iq2_xxs,
    GGMLType.IQ2_XS: dequantize_iq2_xs,
    GGMLType.IQ2_S: dequantize_iq2_s,
    GGMLType.IQ3_XXS: dequantize_iq3_xxs,
    GGMLType.IQ3_S: dequantize_iq3_s,
    GGMLType.IQ1_S: dequantize_iq1_s,
    GGMLType.IQ1_M: dequantize_iq1_m,
    GGMLType.TQ1_0: dequantize_tq1_0,
    GGMLType.TQ2_0: dequantize_tq2_0,
}


# ---------------------------------------------------------------------------
# Plane decomposition (int8 q + per-group scales) for the fused TPU kernel.
#
# Every IQ/TQ value is scale * integer (codebook entries, sign-multiplied
# grids, trits; IQ1's +-0.125 delta folds in exactly via q=8*grid+-1 and
# scale/8 — powers of two keep f32 products bit-identical). This keeps
# sub-4-bit checkpoints on the fused plane path at 8 bits/weight in HBM
# (the reference runs fused vec_dots for every type, ggml-cuda/vecdotq.cuh)
# instead of a dense bf16 expansion at load.
# ---------------------------------------------------------------------------


def planes_iq2_xxs(raw: np.ndarray):
    b = _u8(raw, 66)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    body = b[:, 2:].reshape(B, 8, 8)
    idx = body[:, :, 0:4].astype(np.int64)
    sig = _u32(body[:, :, 4:8].reshape(B, 8, 4)).reshape(B, 8)
    db = (0.5 + (sig >> 28).astype(np.float32)) * 0.25 * d[:, None]
    s7 = (sig[:, :, None] >> (7 * np.arange(4))[None, None, :]) & 127
    vals = GRID_IQ2XXS[idx] * KSIGN_MULT[s7]
    return vals.reshape(B, QK_K).astype(np.int8), db, None, 32


def planes_iq2_xs(raw: np.ndarray):
    b = _u8(raw, 74)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = _u16(b[:, 2:66]).reshape(B, 8, 4)
    scales = b[:, 66:74].astype(np.int64)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)
    db = (0.5 + nib) * 0.25 * d[:, None, None]  # (B, 8, 2): one per 16
    vals = GRID_IQ2XS[qs & 511] * KSIGN_MULT[qs >> 9]
    return (vals.reshape(B, QK_K).astype(np.int8),
            db.reshape(B, 16), None, 16)


def planes_iq2_s(raw: np.ndarray):
    b = _u8(raw, 82)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:34].astype(np.int64).reshape(B, 8, 4)
    signs = b[:, 34:66].astype(np.int64).reshape(B, 8, 4)
    qh = b[:, 66:74].astype(np.int64)
    scales = b[:, 74:82].astype(np.int64)
    idx = qs | ((qh[:, :, None] << (8 - 2 * np.arange(4))[None, None, :]) & 0x300)
    smult = np.where(
        (signs[..., None] >> np.arange(8)[None, None, None, :]) & 1, -1.0, 1.0
    ).astype(np.float32)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.float32)
    db = (0.5 + nib) * 0.25 * d[:, None, None]
    vals = GRID_IQ2S[idx] * smult
    return (vals.reshape(B, QK_K).astype(np.int8),
            db.reshape(B, 16), None, 16)


def planes_iq3_xxs(raw: np.ndarray):
    b = _u8(raw, 98)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:66].astype(np.int64).reshape(B, 8, 8)
    sas = _u32(b[:, 66:98]).reshape(B, 8)
    db = (0.5 + (sas >> 28).astype(np.float32)) * 0.5 * d[:, None]
    s7 = (sas[:, :, None] >> (7 * np.arange(4))[None, None, :]) & 127
    vals = GRID_IQ3XXS[qs].reshape(B, 8, 4, 8) * KSIGN_MULT[s7]
    return vals.reshape(B, QK_K).astype(np.int8), db, None, 32


def planes_iq3_s(raw: np.ndarray):
    b = _u8(raw, 110)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:66].astype(np.int64).reshape(B, 8, 8)
    qh = b[:, 66:74].astype(np.int64)
    signs = b[:, 74:106].astype(np.int64).reshape(B, 8, 4)
    scales = b[:, 106:110].astype(np.int64)
    idx = qs | (((qh[:, :, None] >> np.arange(8)[None, None, :]) & 1) << 8)
    vals = GRID_IQ3S[idx].reshape(B, 8, 4, 8)
    smult = np.where(
        (signs[..., None] >> np.arange(8)[None, None, None, :]) & 1, -1.0, 1.0
    ).astype(np.float32)
    nib = np.stack([scales & 0xF, scales >> 4], axis=-1).reshape(B, 8)
    db = (1.0 + 2.0 * nib.astype(np.float32)) * d[:, None]
    return ((vals * smult).reshape(B, QK_K).astype(np.int8), db, None, 32)


def planes_iq1_s(raw: np.ndarray):
    b = _u8(raw, 50)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:34].astype(np.int64).reshape(B, 8, 4)
    qh = _u16(b[:, 34:50]).reshape(B, 8)
    dl = (2.0 * ((qh >> 12) & 7).astype(np.float32) + 1.0) * d[:, None]
    delta8 = np.where(qh & 0x8000, -1.0, 1.0).astype(np.float32)  # 8*delta
    idx = qs | (((qh[:, :, None] >> (3 * np.arange(4))[None, None, :]) & 7) << 8)
    q = 8.0 * GRID_IQ1S[idx] + delta8[:, :, None, None]
    return q.reshape(B, QK_K).astype(np.int8), dl * 0.125, None, 32


def planes_iq1_m(raw: np.ndarray):
    b = _u8(raw, 56)
    B = b.shape[0]
    qs = b[:, 0:32].astype(np.int64).reshape(B, 8, 4)
    qh = b[:, 32:48].astype(np.int64).reshape(B, 8, 2)
    sc = _u16(b[:, 48:56]).reshape(B, 4)
    du16 = (
        (sc[:, 0] >> 12)
        | ((sc[:, 1] >> 8) & 0x00F0)
        | ((sc[:, 2] >> 4) & 0x0F00)
        | (sc[:, 3] & 0xF000)
    )
    d = du16.astype("<u2").view("<f2").astype(np.float32)
    ib = np.arange(8)
    scw = sc[:, ib // 2]
    dl1 = 2.0 * ((scw >> (6 * (ib % 2))) & 7).astype(np.float32) + 1.0
    dl2 = 2.0 * ((scw >> (6 * (ib % 2) + 3)) & 7).astype(np.float32) + 1.0
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1) * d[:, None, None]  # (B,8,4)
    idx = np.empty((B, 8, 4), np.int64)
    idx[:, :, 0] = qs[:, :, 0] | ((qh[:, :, 0] << 8) & 0x700)
    idx[:, :, 1] = qs[:, :, 1] | ((qh[:, :, 0] << 4) & 0x700)
    idx[:, :, 2] = qs[:, :, 2] | ((qh[:, :, 1] << 8) & 0x700)
    idx[:, :, 3] = qs[:, :, 3] | ((qh[:, :, 1] << 4) & 0x700)
    hbit = np.stack(
        [qh[:, :, 0] & 0x08, qh[:, :, 0] & 0x80, qh[:, :, 1] & 0x08, qh[:, :, 1] & 0x80],
        axis=-1,
    )
    delta8 = np.where(hbit != 0, -1.0, 1.0).astype(np.float32)
    q = 8.0 * GRID_IQ1S[idx] + delta8[..., None]
    # scale granularity: one dl per 8 values (word) -> gs = 8
    return (q.reshape(B, QK_K).astype(np.int8),
            (dl * 0.125).reshape(B, 32), None, 8)


def planes_tq1_0(raw: np.ndarray):
    b = _u8(raw, 54)
    B = b.shape[0]
    qs = b[:, 0:48]
    qh = b[:, 48:52]
    d = _read_f16(b[:, 52:54])
    q = np.empty((B, QK_K), np.int8)
    t = _trits_decode(qs[:, 0:32], 5)
    q[:, 0:160] = np.moveaxis(t, -1, 1).reshape(B, 160)
    t = _trits_decode(qs[:, 32:48], 5)
    q[:, 160:240] = np.moveaxis(t, -1, 1).reshape(B, 80)
    t = _trits_decode(qh, 4)
    q[:, 240:256] = np.moveaxis(t, -1, 1).reshape(B, 16)
    return q, d.reshape(B, 1), None, QK_K


def planes_tq2_0(raw: np.ndarray):
    b = _u8(raw, 66)
    B = b.shape[0]
    qs = b[:, 0:64].reshape(B, 2, 32)
    d = _read_f16(b[:, 64:66])
    shifts = (2 * np.arange(4))[None, None, :, None]
    q = (((qs[:, :, None, :] >> shifts) & 3).astype(np.int8) - 1)
    return q.reshape(B, QK_K), d.reshape(B, 1), None, QK_K


PLANE_FNS = {
    "IQ2_XXS": planes_iq2_xxs,
    "IQ2_XS": planes_iq2_xs,
    "IQ2_S": planes_iq2_s,
    "IQ3_XXS": planes_iq3_xxs,
    "IQ3_S": planes_iq3_s,
    "IQ1_S": planes_iq1_s,
    "IQ1_M": planes_iq1_m,
    "TQ1_0": planes_tq1_0,
    "TQ2_0": planes_tq2_0,
}
