"""Block-quantization codecs (numpy, vectorized over blocks).

These implement the GGUF on-disk block formats so the engine can read any
GGUF checkpoint and the quantize tool can write them. The bit layouts and
quantization searches match the reference semantics:
  - layouts: /root/reference/ggml/src/ggml-common.h:85-419
  - (de)quant math: /root/reference/ggml/src/ggml-quants.c
    (make_qx_quants :373, make_qkx2_quants :544, get_scale_min_k4 :625)
but the implementation is block-parallel numpy (the whole tensor is one
vector op per candidate scale) rather than the reference's per-block loops.

All quantize/dequantize functions operate on flat rows: x has shape
(n_rows, n_per_row) float32; raw bytes have shape (n_rows, row_nbytes).
Optional `qw` is an importance-matrix weight array broadcastable to x.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, QK_K, type_traits

GROUP_MAX_EPS = 1e-15

# IQ4 non-linear 4-bit codebook (ggml-common.h kvalues_iq4nl table).
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.float32,
)


def _f16(x: np.ndarray) -> np.ndarray:
    """Round f32 -> f16 storage precision and back (storage round-trip)."""
    return x.astype(np.float16)


def _nearest(x: np.ndarray) -> np.ndarray:
    """round-half-to-even, matching ggml's nearest_int()."""
    return np.rint(x)


def _safe_inv(d: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, 1.0 / d, 0.0)
    return inv


def _blocks(x: np.ndarray, qk: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.shape[-1] % qk:
        raise ValueError(f"row length {x.shape[-1]} not a multiple of {qk}")
    return x.reshape(-1, qk)


def _u8(raw: np.ndarray, ts: int) -> np.ndarray:
    raw = np.ascontiguousarray(raw).view(np.uint8)
    if raw.size % ts:
        raise ValueError(f"raw size {raw.size} not a multiple of block size {ts}")
    return raw.reshape(-1, ts)


def _read_f16(b: np.ndarray) -> np.ndarray:
    """View consecutive uint8 pairs (last axis) as little-endian f16 -> f32."""
    return (
        np.ascontiguousarray(b).view(np.dtype("<f2")).astype(np.float32).reshape(b.shape[0], -1)
    )


def _store_f16(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype="<f2").view(np.uint8)


# ---------------------------------------------------------------------------
# Scale searches (vectorized analogues of make_qx_quants / make_qkx2_quants)
# ---------------------------------------------------------------------------


def _make_qx_quants(x: np.ndarray, nmax: int, qw: np.ndarray | None = None):
    """Signed symmetric search: values l in [-nmax, nmax-1], returns
    (L = l + nmax as int, scale). x: (B, n)."""
    B, n = x.shape
    amax_idx = np.argmax(np.abs(x), axis=-1)
    maxv = np.take_along_axis(x, amax_idx[:, None], -1)[:, 0]
    dead = np.abs(maxv) < GROUP_MAX_EPS
    maxv_safe = np.where(dead, 1.0, maxv)

    w = qw if qw is not None else x * x

    def trial(iscale):
        l = np.clip(_nearest(iscale[:, None] * x), -nmax, nmax - 1)
        sumlx = np.sum(w * x * l, axis=-1)
        suml2 = np.sum(w * l * l, axis=-1)
        return l, sumlx, suml2

    iscale0 = -nmax / maxv_safe
    L, sumlx, suml2 = trial(iscale0)
    scale = np.where(suml2 > 0, sumlx / np.where(suml2 > 0, suml2, 1.0), 0.0)
    best = scale * sumlx
    for step in range(-9, 10):
        if step == 0:
            continue
        l, sumlx, suml2 = trial(-(nmax + 0.1 * step) / maxv_safe)
        better = (suml2 > 0) & (sumlx * sumlx > best * suml2)
        L = np.where(better[:, None], l, L)
        new_scale = sumlx / np.where(suml2 > 0, suml2, 1.0)
        scale = np.where(better, new_scale, scale)
        best = np.where(better, new_scale * sumlx, best)

    L = np.where(dead[:, None], 0, L + nmax).astype(np.int32)
    scale = np.where(dead, 0.0, scale)
    return L, scale


def _make_qkx2_quants(
    x: np.ndarray,
    nmax: int,
    weights: np.ndarray,
    rmin: float,
    rdelta: float,
    nstep: int,
    use_mad: bool,
):
    """Asymmetric search: x ~ scale * L + min, L in [0, nmax], min <= 0.
    Returns (L int, scale, the_min = -min). x: (B, n)."""
    minv = np.minimum(x.min(axis=-1), 0.0)
    maxv = x.max(axis=-1)
    flat = maxv == minv

    sum_w = np.sum(weights, axis=-1)
    sum_x = np.sum(weights * x, axis=-1)

    span = np.where(flat, 1.0, maxv - minv)
    iscale = nmax / span
    scale = 1.0 / iscale
    L = np.clip(_nearest(iscale[:, None] * (x - minv[:, None])), 0, nmax)
    diff = scale[:, None] * L + minv[:, None] - x
    diff = np.abs(diff) if use_mad else diff * diff
    best_err = np.sum(weights * diff, axis=-1)

    best_min = minv.copy()
    for step in range(nstep + 1):
        isc = (rmin + rdelta * step + nmax) / span
        l = np.clip(_nearest(isc[:, None] * (x - minv[:, None])), 0, nmax)
        sum_l = np.sum(weights * l, axis=-1)
        sum_l2 = np.sum(weights * l * l, axis=-1)
        sum_xl = np.sum(weights * l * x, axis=-1)
        D = sum_w * sum_l2 - sum_l * sum_l
        Dp = D > 0
        D_safe = np.where(Dp, D, 1.0)
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / D_safe
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D_safe
        pos_min = this_min > 0
        this_min = np.where(pos_min, 0.0, this_min)
        sum_l2_safe = np.where(sum_l2 > 0, sum_l2, 1.0)
        this_scale = np.where(pos_min, sum_xl / sum_l2_safe, this_scale)
        diff = this_scale[:, None] * l + this_min[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        cur_err = np.sum(weights * diff, axis=-1)
        better = Dp & (cur_err < best_err)
        L = np.where(better[:, None], l, L)
        best_err = np.where(better, cur_err, best_err)
        scale = np.where(better, this_scale, scale)
        best_min = np.where(better, this_min, best_min)

    L = np.where(flat[:, None], 0, L).astype(np.int32)
    scale = np.where(flat, 0.0, scale)
    the_min = np.where(flat, -minv, -best_min)
    return L, scale, the_min


def _best_index_nl(values: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Nearest index into a sorted codebook (ascending) for each element."""
    idx = np.searchsorted(values, x)
    idx = np.clip(idx, 1, len(values) - 1)
    lo = values[idx - 1]
    hi = values[idx]
    pick_lo = (x - lo) < (hi - x)
    return np.where(pick_lo, idx - 1, idx).astype(np.int32)


# ---------------------------------------------------------------------------
# Legacy 32-value block formats
# ---------------------------------------------------------------------------


def _signed_absmax(x: np.ndarray) -> np.ndarray:
    """The value with the largest magnitude (keeping its sign) per block."""
    idx = np.argmax(np.abs(x), axis=-1)
    return np.take_along_axis(x, idx[:, None], -1)[:, 0]


def quantize_q4_0(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    maxv = _signed_absmax(xb)
    d = _f16(maxv / -8.0).astype(np.float32)
    q = np.clip((xb * _safe_inv(d)[:, None] + 8.5).astype(np.int32), None, 15)
    q = np.clip(q, 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    out = np.empty((xb.shape[0], 18), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:] = lo | (hi << 4)
    return out


def dequantize_q4_0(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 18)
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=-1).astype(np.float32) - 8.0
    return q * d


def quantize_q4_1(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    minv = xb.min(axis=-1)
    maxv = xb.max(axis=-1)
    d = _f16((maxv - minv) / 15.0).astype(np.float32)
    m = _f16(minv).astype(np.float32)
    q = np.clip(((xb - m[:, None]) * _safe_inv(d)[:, None] + 0.5).astype(np.int32), 0, 15)
    q = q.astype(np.uint8)
    out = np.empty((xb.shape[0], 20), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:4] = _store_f16(m).reshape(-1, 2)
    out[:, 4:] = q[:, :16] | (q[:, 16:] << 4)
    return out


def dequantize_q4_1(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 20)
    d = _read_f16(b[:, 0:2])
    m = _read_f16(b[:, 2:4])
    qs = b[:, 4:]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=-1).astype(np.float32)
    return q * d + m


def quantize_q5_0(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    maxv = _signed_absmax(xb)
    d = _f16(maxv / -16.0).astype(np.float32)
    q = np.clip((xb * _safe_inv(d)[:, None] + 16.5).astype(np.int32), 0, 31).astype(np.uint32)
    lo, hi = q[:, :16], q[:, 16:]
    qh = np.zeros(xb.shape[0], np.uint32)
    for j in range(16):
        qh |= ((lo[:, j] >> 4) & 1) << j
        qh |= ((hi[:, j] >> 4) & 1) << (j + 16)
    out = np.empty((xb.shape[0], 22), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:6] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 6:] = (lo & 0xF).astype(np.uint8) | ((hi & 0xF).astype(np.uint8) << 4)
    return out


def dequantize_q5_0(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 22)
    d = _read_f16(b[:, 0:2])
    qh = np.ascontiguousarray(b[:, 2:6]).view("<u4").reshape(-1).astype(np.uint32)
    qs = b[:, 6:]
    j = np.arange(16)
    xh0 = ((qh[:, None] >> j) << 4) & 0x10
    xh1 = (qh[:, None] >> (j + 12)) & 0x10
    x0 = ((qs & 0x0F) | xh0).astype(np.float32) - 16.0
    x1 = ((qs >> 4) | xh1).astype(np.float32) - 16.0
    return np.concatenate([x0, x1], axis=-1) * d


def quantize_q5_1(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    minv = xb.min(axis=-1)
    maxv = xb.max(axis=-1)
    d = _f16((maxv - minv) / 31.0).astype(np.float32)
    m = _f16(minv).astype(np.float32)
    q = np.clip(((xb - m[:, None]) * _safe_inv(d)[:, None] + 0.5).astype(np.int32), 0, 31)
    q = q.astype(np.uint32)
    lo, hi = q[:, :16], q[:, 16:]
    qh = np.zeros(xb.shape[0], np.uint32)
    for j in range(16):
        qh |= ((lo[:, j] >> 4) & 1) << j
        qh |= ((hi[:, j] >> 4) & 1) << (j + 16)
    out = np.empty((xb.shape[0], 24), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:4] = _store_f16(m).reshape(-1, 2)
    out[:, 4:8] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 8:] = (lo & 0xF).astype(np.uint8) | ((hi & 0xF).astype(np.uint8) << 4)
    return out


def dequantize_q5_1(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 24)
    d = _read_f16(b[:, 0:2])
    m = _read_f16(b[:, 2:4])
    qh = np.ascontiguousarray(b[:, 4:8]).view("<u4").reshape(-1).astype(np.uint32)
    qs = b[:, 8:]
    j = np.arange(16)
    xh0 = ((qh[:, None] >> j) << 4) & 0x10
    xh1 = (qh[:, None] >> (j + 12)) & 0x10
    x0 = ((qs & 0x0F) | xh0).astype(np.float32)
    x1 = ((qs >> 4) | xh1).astype(np.float32)
    return np.concatenate([x0, x1], axis=-1) * d + m


def quantize_q8_0(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    amax = np.abs(xb).max(axis=-1)
    d = _f16(amax / 127.0).astype(np.float32)
    q = np.clip(_nearest(xb * _safe_inv(d)[:, None]), -128, 127).astype(np.int8)
    out = np.empty((xb.shape[0], 34), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out


def dequantize_q8_0(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 34)
    d = _read_f16(b[:, 0:2])
    q = b[:, 2:].view(np.int8).astype(np.float32)
    return q * d


def quantize_q8_1(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    amax = np.abs(xb).max(axis=-1)
    d = _f16(amax / 127.0).astype(np.float32)
    q = np.clip(_nearest(xb * _safe_inv(d)[:, None]), -128, 127).astype(np.int8)
    s = d * q.sum(axis=-1, dtype=np.float32)
    out = np.empty((xb.shape[0], 36), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:4] = _store_f16(s).reshape(-1, 2)
    out[:, 4:] = q.view(np.uint8)
    return out


def dequantize_q8_1(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 36)
    d = _read_f16(b[:, 0:2])
    q = b[:, 4:].view(np.int8).astype(np.float32)
    return q * d


# ---------------------------------------------------------------------------
# K-quants (256-value super-blocks)
# ---------------------------------------------------------------------------


def _pack2(L: np.ndarray) -> np.ndarray:
    """Pack 2-bit L (B, 256) into qs (B, 64) with the Q2/Q3 layout:
    per 128-value half, byte l holds values {l, l+32, l+64, l+96}."""
    B = L.shape[0]
    Lh = L.reshape(B, 2, 4, 32).astype(np.uint8)  # (B, half, group, 32)
    qs = Lh[:, :, 0] | (Lh[:, :, 1] << 2) | (Lh[:, :, 2] << 4) | (Lh[:, :, 3] << 6)
    return qs.reshape(B, 64)


def _unpack2(qs: np.ndarray) -> np.ndarray:
    B = qs.shape[0]
    q = qs.reshape(B, 2, 32)
    out = np.stack([(q >> s) & 3 for s in (0, 2, 4, 6)], axis=2)  # (B,2,4,32)
    return out.reshape(B, 256)


def quantize_q2_K(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    sub = xb.reshape(B * 16, 16)
    w = np.abs(sub)
    if qw is not None:
        qwb = np.broadcast_to(np.asarray(qw, np.float32), x.shape).reshape(B * 16, 16)
        sigma2 = np.sum(xb * xb, axis=-1, keepdims=True) / QK_K
        sig = np.repeat(sigma2, 16, axis=0).reshape(B * 16, 1)
        w = qwb * np.sqrt(sig + sub * sub)
    L, scales, mins = _make_qkx2_quants(sub, 3, w, -0.5, 0.1, 15, True)
    scales = scales.reshape(B, 16)
    mins = mins.reshape(B, 16)
    L = L.reshape(B, QK_K)

    max_scale = scales.max(axis=-1)
    max_min = mins.max(axis=-1)
    inv_scale = np.where(max_scale > 0, 15.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 15.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = _nearest(inv_scale[:, None] * scales).astype(np.uint8)
    lm = _nearest(inv_min[:, None] * mins).astype(np.uint8)
    packed_scales = ls | (lm << 4)
    d = _f16(np.where(max_scale > 0, max_scale / 15.0, 0.0)).astype(np.float32)
    dmin = _f16(np.where(max_min > 0, max_min / 15.0, 0.0)).astype(np.float32)

    dl = d[:, None] * ls.astype(np.float32)
    ml = dmin[:, None] * lm.astype(np.float32)
    dl_e = np.repeat(dl, 16, axis=1)
    ml_e = np.repeat(ml, 16, axis=1)
    Lq = np.clip(_nearest((xb + ml_e) * _safe_inv(dl_e)), 0, 3).astype(np.int32)
    L = np.where(dl_e != 0, Lq, L)

    out = np.empty((B, 84), np.uint8)
    out[:, 0:16] = packed_scales
    out[:, 16:80] = _pack2(L)
    out[:, 80:82] = _store_f16(d).reshape(-1, 2)
    out[:, 82:84] = _store_f16(dmin).reshape(-1, 2)
    return out


def dequantize_q2_K(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 84)
    B = b.shape[0]
    scales = b[:, 0:16]
    q = _unpack2(b[:, 16:80])
    d = _read_f16(b[:, 80:82])
    dmin = _read_f16(b[:, 82:84])
    sc = (scales & 0xF).astype(np.float32)
    mn = (scales >> 4).astype(np.float32)
    dl = np.repeat(d * sc, 16, axis=1)
    ml = np.repeat(dmin * mn, 16, axis=1)
    return dl * q.astype(np.float32) - ml


def quantize_q3_K(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    sub = xb.reshape(B * 16, 16)
    w = None
    if qw is not None:
        qwb = np.broadcast_to(np.asarray(qw, np.float32), x.shape).reshape(B * 16, 16)
        sigma2 = np.sum(xb * xb, axis=-1, keepdims=True) / QK_K
        sig = np.repeat(sigma2, 16, axis=0).reshape(B * 16, 1)
        w = qwb * np.sqrt(sig + sub * sub)
    _, scales = _make_qx_quants(sub, 4, w)
    scales = scales.reshape(B, 16)

    aidx = np.argmax(np.abs(scales), axis=-1)
    max_scale = np.take_along_axis(scales, aidx[:, None], -1)[:, 0]
    dead = max_scale == 0
    iscale = np.where(dead, 0.0, -32.0 / np.where(dead, 1.0, max_scale))
    lsc = (np.clip(_nearest(iscale[:, None] * scales), -32, 31) + 32).astype(np.int32)
    d = _f16(np.where(dead, 0.0, _safe_inv(iscale))).astype(np.float32)

    # 6-bit scale packing: low nibbles of j in scales[0..7], high nibble pair
    # packing in scales[8..11] (quantize_row_q3_K_ref layout)
    sc_bytes = np.zeros((B, 12), np.uint8)
    for j in range(16):
        lj = lsc[:, j]
        if j < 8:
            sc_bytes[:, j] |= (lj & 0xF).astype(np.uint8)
        else:
            sc_bytes[:, j - 8] |= ((lj & 0xF) << 4).astype(np.uint8)
        sc_bytes[:, 8 + j % 4] |= ((lj >> 4) << (2 * (j // 4))).astype(np.uint8)

    eff = d[:, None] * (lsc - 32).astype(np.float32)  # effective per-sub scale
    eff_e = np.repeat(eff, 16, axis=1)
    Lq = np.clip(_nearest(xb * _safe_inv(eff_e)), -4, 3).astype(np.int32) + 4
    L = np.where(eff_e != 0, Lq, 4)  # value 4 encodes 0 (hbit set, low2 = 0)

    hbit = (L > 3).astype(np.uint8)
    Llow = np.where(L > 3, L - 4, L).astype(np.uint8)
    # hmask: element j sets bit (j//32) of hmask[j%32]
    hm = np.zeros((B, 32), np.uint8)
    hb = hbit.reshape(B, 8, 32)
    for k in range(8):
        hm |= hb[:, k] << k

    out = np.empty((B, 110), np.uint8)
    out[:, 0:32] = hm
    out[:, 32:96] = _pack2(Llow.astype(np.int32))
    out[:, 96:108] = sc_bytes
    out[:, 108:110] = _store_f16(d).reshape(-1, 2)
    return out


def _q3k_scales(sc_bytes: np.ndarray) -> np.ndarray:
    """Unpack 16 6-bit signed scales from the 12-byte Q3_K field."""
    B = sc_bytes.shape[0]
    out = np.empty((B, 16), np.int32)
    for j in range(16):
        if j < 8:
            lo = sc_bytes[:, j] & 0xF
        else:
            lo = sc_bytes[:, j - 8] >> 4
        hi = (sc_bytes[:, 8 + j % 4] >> (2 * (j // 4))) & 3
        out[:, j] = (lo.astype(np.int32) | (hi.astype(np.int32) << 4)) - 32
    return out


def dequantize_q3_K(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 110)
    B = b.shape[0]
    hm = b[:, 0:32]
    q = _unpack2(b[:, 32:96])  # (B, 256) values 0..3
    scales = _q3k_scales(b[:, 96:108])
    d = _read_f16(b[:, 108:110])
    hbits = np.stack([(hm >> k) & 1 for k in range(8)], axis=1).reshape(B, 256)
    vals = q.astype(np.float32) - np.where(hbits > 0, 0.0, 4.0)
    dl = np.repeat(d * scales.astype(np.float32), 16, axis=1)
    return dl * vals


def _pack_k4_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Pack 8 6-bit (scale, min) pairs into 12 bytes (get_scale_min_k4 layout)."""
    B = ls.shape[0]
    sc = np.zeros((B, 12), np.uint8)
    for j in range(8):
        s, m = ls[:, j].astype(np.uint8), lm[:, j].astype(np.uint8)
        if j < 4:
            sc[:, j] = s
            sc[:, j + 4] = m
        else:
            sc[:, j + 4] = (s & 0xF) | ((m & 0xF) << 4)
            sc[:, j - 4] |= (s >> 4) << 6
            sc[:, j] |= (m >> 4) << 6
    return sc


def _unpack_k4_scales(sc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    B = sc.shape[0]
    ls = np.empty((B, 8), np.int32)
    lm = np.empty((B, 8), np.int32)
    for j in range(8):
        if j < 4:
            ls[:, j] = sc[:, j] & 63
            lm[:, j] = sc[:, j + 4] & 63
        else:
            ls[:, j] = (sc[:, j + 4] & 0xF) | ((sc[:, j - 4] >> 6) << 4)
            lm[:, j] = (sc[:, j + 4] >> 4) | ((sc[:, j] >> 6) << 4)
    return ls, lm


def _qkx_weights(xb: np.ndarray, sub: np.ndarray, qw, nsub: int, size: int):
    """Per-value weights for the K-quant searches: av_x + |x| without an
    imatrix, qw * sqrt(sigma2 + x^2) with one (quantize_row_q4_K_impl)."""
    B = xb.shape[0]
    if qw is not None:
        qwb = np.broadcast_to(np.asarray(qw, np.float32), (B, QK_K)).reshape(B * nsub, size)
        sigma2 = 2.0 * np.sum(xb * xb, axis=-1, keepdims=True) / QK_K
        sig = np.repeat(sigma2, nsub, axis=0).reshape(B * nsub, 1)
        return qwb * np.sqrt(sig + sub * sub)
    av_x = np.sqrt(np.mean(sub * sub, axis=-1, keepdims=True))
    return av_x + np.abs(sub)


def _quantize_q45_K(x: np.ndarray, qw, nmax: int, rmin, rdelta, nstep):
    """Shared Q4_K / Q5_K top half: search + 6-bit super-scales. Returns
    (B, L, d, dmin, sc_bytes) where L is the final requantized code."""
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    sub = xb.reshape(B * 8, 32)
    w = _qkx_weights(xb, sub, qw, 8, 32)
    L, scales, mins = _make_qkx2_quants(sub, nmax, w, rmin, rdelta, nstep, False)
    scales = scales.reshape(B, 8)
    mins = mins.reshape(B, 8)
    L = L.reshape(B, QK_K)

    max_scale = scales.max(axis=-1)
    max_min = mins.max(axis=-1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _nearest(inv_scale[:, None] * scales)).astype(np.int32)
    lm = np.minimum(63, _nearest(inv_min[:, None] * mins)).astype(np.int32)
    sc_bytes = _pack_k4_scales(ls, lm)
    d = _f16(max_scale / 63.0).astype(np.float32)
    dmin = _f16(max_min / 63.0).astype(np.float32)

    ls_u, lm_u = _unpack_k4_scales(sc_bytes)
    dd = d[:, None] * ls_u.astype(np.float32)
    mm = dmin[:, None] * lm_u.astype(np.float32)
    dd_e = np.repeat(dd, 32, axis=1)
    mm_e = np.repeat(mm, 32, axis=1)
    Lq = np.clip(_nearest((xb + mm_e) * _safe_inv(dd_e)), 0, nmax).astype(np.int32)
    L = np.where(dd_e != 0, Lq, L)
    return B, L, d, dmin, sc_bytes


def quantize_q4_K(x: np.ndarray, qw=None) -> np.ndarray:
    B, L, d, dmin, sc_bytes = _quantize_q45_K(x, qw, 15, -1.0, 0.1, 20)
    Lr = L.reshape(B, 4, 2, 32).astype(np.uint8)  # (B, 64-chunk, lo/hi, 32)
    qs = (Lr[:, :, 0] | (Lr[:, :, 1] << 4)).reshape(B, 128)
    out = np.empty((B, 144), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:4] = _store_f16(dmin).reshape(-1, 2)
    out[:, 4:16] = sc_bytes
    out[:, 16:] = qs
    return out


def dequantize_q4_K(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 144)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    dmin = _read_f16(b[:, 2:4])
    ls, lm = _unpack_k4_scales(b[:, 4:16])
    qs = b[:, 16:].reshape(B, 4, 32)
    q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(B, 256).astype(np.float32)
    dl = np.repeat(d * ls.astype(np.float32), 32, axis=1)
    ml = np.repeat(dmin * lm.astype(np.float32), 32, axis=1)
    return dl * q - ml


def quantize_q5_K(x: np.ndarray, qw=None) -> np.ndarray:
    B, L, d, dmin, sc_bytes = _quantize_q45_K(x, qw, 31, -0.5, 0.1, 15)
    Lr = L.reshape(B, 4, 2, 32)
    lo = Lr[:, :, 0]
    hi = Lr[:, :, 1]
    qs = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.uint8).reshape(B, 128)
    qh = np.zeros((B, 32), np.uint8)
    for n in range(4):
        qh |= ((lo[:, n] > 15) << (2 * n)).astype(np.uint8)
        qh |= ((hi[:, n] > 15) << (2 * n + 1)).astype(np.uint8)
    out = np.empty((B, 176), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:4] = _store_f16(dmin).reshape(-1, 2)
    out[:, 4:16] = sc_bytes
    out[:, 16:48] = qh
    out[:, 48:] = qs
    return out


def dequantize_q5_K(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 176)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    dmin = _read_f16(b[:, 2:4])
    ls, lm = _unpack_k4_scales(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:].reshape(B, 4, 32)
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    parts = []
    for n in range(4):
        u1 = 1 << (2 * n)
        u2 = 2 << (2 * n)
        parts.append(lo[:, n] + np.where((qh & u1) > 0, 16, 0))
        parts.append(hi[:, n] + np.where((qh & u2) > 0, 16, 0))
    q = np.stack(parts, axis=1).reshape(B, 256).astype(np.float32)
    dl = np.repeat(d * ls.astype(np.float32), 32, axis=1)
    ml = np.repeat(dmin * lm.astype(np.float32), 32, axis=1)
    return dl * q - ml


def quantize_q6_K(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    sub = xb.reshape(B * 16, 16)
    w = None
    if qw is not None:
        qwb = np.broadcast_to(np.asarray(qw, np.float32), (B, QK_K)).reshape(B * 16, 16)
        w = qwb
    _, scales = _make_qx_quants(sub, 32, w)
    scales = scales.reshape(B, 16)

    aidx = np.argmax(np.abs(scales), axis=-1)
    max_scale = np.take_along_axis(scales, aidx[:, None], -1)[:, 0]
    dead = np.abs(max_scale) < GROUP_MAX_EPS
    iscale = np.where(dead, 0.0, -128.0 / np.where(dead, 1.0, max_scale))
    sc8 = np.minimum(127, _nearest(iscale[:, None] * scales)).astype(np.int32)
    sc8 = np.clip(sc8, -128, 127)
    d = _f16(np.where(dead, 0.0, _safe_inv(iscale))).astype(np.float32)

    eff = d[:, None] * sc8.astype(np.float32)
    eff_e = np.repeat(eff, 16, axis=1)
    Lq = np.clip(_nearest(xb * _safe_inv(eff_e)), -32, 31).astype(np.int32) + 32
    L = np.where(eff_e != 0, Lq, 32)
    L = np.where(dead[:, None], 0, L)

    Lr = L.reshape(B, 2, 4, 32)  # (B, half, {a,b,c,d}, 32)
    a, bb, c, dd4 = Lr[:, :, 0], Lr[:, :, 1], Lr[:, :, 2], Lr[:, :, 3]
    ql = np.concatenate(
        [(a & 0xF) | ((c & 0xF) << 4), (bb & 0xF) | ((dd4 & 0xF) << 4)], axis=-1
    ).astype(np.uint8).reshape(B, 128)
    qh = ((a >> 4) | ((bb >> 4) << 2) | ((c >> 4) << 4) | ((dd4 >> 4) << 6)).astype(
        np.uint8
    ).reshape(B, 64)
    out = np.empty((B, 210), np.uint8)
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc8.astype(np.int8).view(np.uint8)
    out[:, 208:210] = _store_f16(d).reshape(-1, 2)
    return out


def dequantize_q6_K(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 210)
    B = b.shape[0]
    ql = b[:, 0:128].reshape(B, 2, 2, 32)  # (B, half, {0,32}, 32)
    qh = b[:, 128:192].reshape(B, 2, 32)
    sc = b[:, 192:208].view(np.int8).astype(np.float32)
    d = _read_f16(b[:, 208:210])
    q1 = ((ql[:, :, 0] & 0xF) | (((qh >> 0) & 3) << 4)).astype(np.int32) - 32
    q2 = ((ql[:, :, 1] & 0xF) | (((qh >> 2) & 3) << 4)).astype(np.int32) - 32
    q3 = ((ql[:, :, 0] >> 4) | (((qh >> 4) & 3) << 4)).astype(np.int32) - 32
    q4 = ((ql[:, :, 1] >> 4) | (((qh >> 6) & 3) << 4)).astype(np.int32) - 32
    q = np.stack([q1, q2, q3, q4], axis=2).reshape(B, 256).astype(np.float32)
    dl = np.repeat(d * sc, 16, axis=1)
    return dl * q


def quantize_q8_K(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    aidx = np.argmax(np.abs(xb), axis=-1)
    maxv = np.take_along_axis(xb, aidx[:, None], -1)[:, 0]
    dead = maxv == 0
    iscale = np.where(dead, 0.0, -127.0 / np.where(dead, 1.0, maxv))
    q = np.minimum(127, _nearest(iscale[:, None] * xb)).astype(np.int32)
    q = np.clip(q, -128, 127).astype(np.int8)
    q = np.where(dead[:, None], 0, q).astype(np.int8)
    d = np.where(dead, 0.0, _safe_inv(iscale)).astype(np.float32)
    bsums = q.reshape(B, 16, 16).sum(axis=-1, dtype=np.int32).astype(np.int16)
    out = np.empty((B, 292), np.uint8)
    out[:, 0:4] = d.astype("<f4").view(np.uint8).reshape(-1, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:292] = bsums.astype("<i2").view(np.uint8).reshape(-1, 32)
    return out


def dequantize_q8_K(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 292)
    d = np.ascontiguousarray(b[:, 0:4]).view("<f4").reshape(-1, 1)
    q = b[:, 4:260].view(np.int8).astype(np.float32)
    return q * d


# ---------------------------------------------------------------------------
# IQ4 non-linear formats
# ---------------------------------------------------------------------------


def _iq4_search(sub: np.ndarray, w: np.ndarray, ntry: int):
    """Per sub-block codebook scale search (quantize_row_iq4_nl_impl)."""
    values = KVALUES_IQ4NL
    aidx = np.argmax(np.abs(sub), axis=-1)
    maxv = np.take_along_axis(sub, aidx[:, None], -1)[:, 0]
    dead = np.abs(maxv) < GROUP_MAX_EPS
    maxv_safe = np.where(dead, 1.0, maxv)

    def trial(idv):
        al = idv[:, None] * sub
        li = _best_index_nl(values, al)
        qv = values[li]
        sumqx = np.sum(w * qv * sub, axis=-1)
        sumq2 = np.sum(w * qv * qv, axis=-1)
        return li, sumqx, sumq2

    d0 = -maxv_safe / values[0]
    li, sumqx, sumq2 = trial(_safe_inv(d0))
    d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0.0)
    best = d * sumqx
    for itry in range(-ntry, ntry + 1):
        idv = (itry + values[0]) / maxv_safe
        _, sumqx, sumq2 = trial(idv)
        better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
        nd = sumqx / np.where(sumq2 > 0, sumq2, 1)
        d = np.where(better, nd, d)
        best = np.where(better, nd * sumqx, best)
    d = np.where(dead, 0.0, d)
    return d, li, dead


def quantize_iq4_nl(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, 32)
    w = xb * xb if qw is None else np.broadcast_to(
        np.asarray(qw, np.float32), x.shape
    ).reshape(-1, 32) * np.abs(xb)
    d, _, dead = _iq4_search(xb, w, ntry=7)
    df = _f16(d).astype(np.float32)
    L = _best_index_nl(KVALUES_IQ4NL, _safe_inv(df)[:, None] * xb)
    L = np.where(dead[:, None], 0, L).astype(np.uint8)
    out = np.empty((xb.shape[0], 18), np.uint8)
    out[:, 0:2] = _store_f16(df).reshape(-1, 2)
    out[:, 2:] = L[:, :16] | (L[:, 16:] << 4)
    return out


def dequantize_iq4_nl(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 18)
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:]
    q = np.concatenate(
        [KVALUES_IQ4NL[qs & 0xF], KVALUES_IQ4NL[qs >> 4]], axis=-1
    )
    return q * d


def quantize_iq4_xs(x: np.ndarray, qw=None) -> np.ndarray:
    xb = _blocks(x, QK_K)
    B = xb.shape[0]
    sub = xb.reshape(B * 8, 32)
    if qw is None:
        w = sub * sub
    else:
        qwb = np.broadcast_to(np.asarray(qw, np.float32), (B, QK_K)).reshape(B * 8, 32)
        sigma2 = 2.0 * np.sum(xb * xb, axis=-1, keepdims=True) / QK_K
        sig = np.repeat(sigma2, 8, axis=0).reshape(B * 8, 1)
        w = qwb * np.sqrt(sig + sub * sub)
    dsub, _, _ = _iq4_search(sub, w, ntry=7)
    scales = dsub.reshape(B, 8)

    aidx = np.argmax(np.abs(scales), axis=-1)
    max_scale = np.take_along_axis(scales, aidx[:, None], -1)[:, 0]
    dead = np.abs(max_scale) < GROUP_MAX_EPS
    d = _f16(np.where(dead, 0.0, -max_scale / 32.0)).astype(np.float32)
    idv = _safe_inv(d)
    ls = np.clip(_nearest(idv[:, None] * scales), -32, 31).astype(np.int32)
    dl = d[:, None] * ls.astype(np.float32)
    dl_e = np.repeat(dl, 32, axis=1)
    L = _best_index_nl(KVALUES_IQ4NL, _safe_inv(dl_e) * xb).astype(np.uint8)
    ls += 32

    scales_l = np.zeros((B, 4), np.uint8)
    scales_h = np.zeros(B, np.uint16)
    for ib in range(8):
        l_l = (ls[:, ib] & 0xF).astype(np.uint8)
        l_h = (ls[:, ib] >> 4).astype(np.uint16)
        if ib % 2 == 0:
            scales_l[:, ib // 2] |= l_l
        else:
            scales_l[:, ib // 2] |= l_l << 4
        scales_h |= l_h << (2 * ib)

    Lr = L.reshape(B, 8, 2, 16)
    qs = (Lr[:, :, 0] | (Lr[:, :, 1] << 4)).reshape(B, 128)
    out = np.empty((B, 136), np.uint8)
    out[:, 0:2] = _store_f16(d).reshape(-1, 2)
    out[:, 2:4] = scales_h.astype("<u2").view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = scales_l
    out[:, 8:] = qs
    return out


def dequantize_iq4_xs(raw: np.ndarray) -> np.ndarray:
    b = _u8(raw, 136)
    B = b.shape[0]
    d = _read_f16(b[:, 0:2])
    scales_h = np.ascontiguousarray(b[:, 2:4]).view("<u2").reshape(-1).astype(np.int32)
    scales_l = b[:, 4:8]
    qs = b[:, 8:].reshape(B, 8, 16)
    ls = np.empty((B, 8), np.int32)
    for ib in range(8):
        lo = (scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF
        hi = (scales_h >> (2 * ib)) & 3
        ls[:, ib] = (lo.astype(np.int32) | (hi << 4)) - 32
    q = np.stack([KVALUES_IQ4NL[qs & 0xF], KVALUES_IQ4NL[qs >> 4]], axis=2).reshape(B, 256)
    dl = np.repeat(d * ls.astype(np.float32), 32, axis=1)
    return dl * q


# ---------------------------------------------------------------------------
# Float storage formats
# ---------------------------------------------------------------------------


def dequantize_f32(raw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(raw).view("<f4").astype(np.float32).reshape(1, -1)


def dequantize_f16(raw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(raw).view("<f2").astype(np.float32).reshape(1, -1)


def dequantize_bf16(raw: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(raw).view("<u2").astype(np.uint32) << 16
    return u.view(np.float32).reshape(1, -1)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

_QUANTIZE = {
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q4_1: quantize_q4_1,
    GGMLType.Q5_0: quantize_q5_0,
    GGMLType.Q5_1: quantize_q5_1,
    GGMLType.Q8_0: quantize_q8_0,
    GGMLType.Q8_1: quantize_q8_1,
    GGMLType.Q2_K: quantize_q2_K,
    GGMLType.Q3_K: quantize_q3_K,
    GGMLType.Q4_K: quantize_q4_K,
    GGMLType.Q5_K: quantize_q5_K,
    GGMLType.Q6_K: quantize_q6_K,
    GGMLType.Q8_K: quantize_q8_K,
    GGMLType.IQ4_NL: quantize_iq4_nl,
    GGMLType.IQ4_XS: quantize_iq4_xs,
}

from . import iq_codecs as _iq  # noqa: E402  (grids-backed IQ/TQ formats)

_QUANTIZE.update(_iq.QUANTIZE)

_DEQUANTIZE = {
    GGMLType.F32: dequantize_f32,
    GGMLType.F16: dequantize_f16,
    GGMLType.BF16: dequantize_bf16,
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_1: dequantize_q4_1,
    GGMLType.Q5_0: dequantize_q5_0,
    GGMLType.Q5_1: dequantize_q5_1,
    GGMLType.Q8_0: dequantize_q8_0,
    GGMLType.Q8_1: dequantize_q8_1,
    GGMLType.Q2_K: dequantize_q2_K,
    GGMLType.Q3_K: dequantize_q3_K,
    GGMLType.Q4_K: dequantize_q4_K,
    GGMLType.Q5_K: dequantize_q5_K,
    GGMLType.Q6_K: dequantize_q6_K,
    GGMLType.Q8_K: dequantize_q8_K,
    GGMLType.IQ4_NL: dequantize_iq4_nl,
    GGMLType.IQ4_XS: dequantize_iq4_xs,
}

_DEQUANTIZE.update(_iq.DEQUANTIZE)


def supported_quant_types() -> list[GGMLType]:
    return sorted(_QUANTIZE.keys())


def quantize(x: np.ndarray, ggml_type: GGMLType | int, qw: np.ndarray | None = None) -> np.ndarray:
    """Quantize rows of x (..., n) -> raw bytes (n_rows, row_nbytes)."""
    t = GGMLType(ggml_type)
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = x.shape[-1]
    rows = x.reshape(-1, n)
    if t == GGMLType.F32:
        return rows.astype("<f4").view(np.uint8)
    if t == GGMLType.F16:
        return rows.astype("<f2").view(np.uint8)
    if t == GGMLType.BF16:
        u = rows.view(np.uint32) if rows.dtype == np.float32 else rows.astype(np.float32).view(np.uint32)
        u = u.astype(np.uint64)
        return (((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype("<u2")).view(np.uint8)
    if t not in _QUANTIZE:
        raise ValueError(f"quantization to {t.name} not supported")
    tt = type_traits(t)
    raw = _QUANTIZE[t](rows, qw)
    return raw.reshape(rows.shape[0], n // tt.block_size * tt.type_size)


def dequantize(raw: np.ndarray, ggml_type: GGMLType | int, n_per_row: int) -> np.ndarray:
    """Dequantize raw bytes -> f32 rows (n_rows, n_per_row)."""
    t = GGMLType(ggml_type)
    if t not in _DEQUANTIZE:
        raise ValueError(f"dequantization of {t.name} not supported")
    out = _DEQUANTIZE[t](np.ascontiguousarray(raw).view(np.uint8).reshape(-1))
    return out.reshape(-1, n_per_row)


def dequantize_tensor(raw: np.ndarray, ggml_type: GGMLType | int, shape: tuple[int, ...]) -> np.ndarray:
    """Dequantize a GGUF tensor given its ne-order shape; returns numpy-order
    (reversed) f32 array, i.e. shape (..., ne[1], ne[0])."""
    ne0 = shape[0] if shape else 1
    out = dequantize(raw, ggml_type, ne0)
    return out.reshape(tuple(reversed(shape)))
