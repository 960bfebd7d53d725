"""QTensor: the on-device representation of a block-quantized weight.

This replaces the reference's in-situ block structs (and its `repack.cpp`
online re-layout, /root/reference/ggml/src/ggml-cpu/repack.cpp) with a
TPU-first decomposition done once at load:

    W[k, n]  =  qs[k, n] * scales[k//gs, n]  -  mins[k//gs, n]

  * `qs` — small integers (int8; optionally nibble-packed for 4-bit types),
    laid out K-major [K, N] so the matmul contraction dim is the sublane
    dim and the lane dim is the (128-aligned) output-feature dim.
  * `scales` — effective per-group scale (e.g. Q4_K: d * 6-bit sub-scale,
    already multiplied out from the super-block encoding).
  * `mins` — effective per-group offset (zero-point) term, or None for
    symmetric types. The matmul offset contribution factors into a small
    rank-K/gs correction: x @ W = x @ (qs*S) - groupsum(x) @ M, mirroring
    the reference's Q8 `bsums` trick (ggml-common.h block_q8_K.bsums).

All bit-unpacking happens here in numpy at load time; device kernels see
only MXU/VPU-friendly planes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import numpy as np

from ..gguf.constants import GGMLType, QK_K
from . import codecs
from .codecs import (
    KVALUES_IQ4NL,
    _q3k_scales,
    _read_f16,
    _u8,
    _unpack2,
    _unpack_k4_scales,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "scales", "mins"],
    meta_fields=["group_size", "ggml_type", "layout", "zp", "pack_tk", "kmajor"],
)
@dataclass
class QTensor:
    """Device planes for a quantized matrix.

    Matmul weights are stored K-MAJOR (kmajor=True), the TPU-native layout:

        W[k, n] = (q[k, n] - zp) * scales[k//gs, n] - mins[k//gs, n]

    so in the Pallas kernel the lane (last) dim is the output-feature dim
    (>= 128) and expanding per-group scales along K is a sublane reshape —
    the only reshape kind Mosaic supports. The contraction runs over
    sublanes, exactly how the MXU wants its stationary operand.

    Embedding tables use kmajor=False ("rows" layout: qs [V, K], scales
    [V, K//gs]) so token gathers are row gathers; the tied lm_head gets a
    separate K-major copy at load.

    layout "i8": int8 planes. layout "p4": uint8 nibble-packed along K with
    pairing stride pack_tk (see ops/pallas_qmm.py); zp subtracted in-kernel.
    """

    qs: jax.Array  # kmajor: [K(/2), N]; rows: [N, K(/2)]
    scales: jax.Array  # kmajor: [K//gs, N]; rows: [N, K//gs]
    mins: jax.Array | None
    group_size: int
    ggml_type: GGMLType
    layout: str = "i8"
    zp: int = 0
    pack_tk: int = 256
    kmajor: bool = True

    @property
    def in_features(self) -> int:
        k = self.qs.shape[0] if self.kmajor else self.qs.shape[-1]
        return k * 2 if self.layout == "p4" else k

    @property
    def out_features(self) -> int:
        return self.qs.shape[-1] if self.kmajor else self.qs.shape[0]


def planes_from_raw(raw: np.ndarray, ggml_type: GGMLType, n_per_row: int):
    """Unpack raw row-major GGUF bytes into (qs int8, scales f32, mins f32|None,
    group_size), all shaped per-row: qs (rows, n), scales (rows, n//gs)."""
    t = GGMLType(ggml_type)

    if t == GGMLType.Q8_0:
        b = _u8(raw, 34)
        d = _read_f16(b[:, 0:2])
        q = b[:, 2:].view(np.int8)
        return q, d, None, 32

    if t == GGMLType.Q4_0:
        b = _u8(raw, 18)
        d = _read_f16(b[:, 0:2])
        qs = b[:, 2:]
        q = (np.concatenate([qs & 0xF, qs >> 4], axis=-1).astype(np.int8) - 8)
        return q, d, None, 32

    if t == GGMLType.Q4_1:
        b = _u8(raw, 20)
        d = _read_f16(b[:, 0:2])
        m = _read_f16(b[:, 2:4])
        qs = b[:, 4:]
        q = np.concatenate([qs & 0xF, qs >> 4], axis=-1).astype(np.int8)
        return q, d, -m, 32

    if t == GGMLType.Q5_0:
        b = _u8(raw, 22)
        d = _read_f16(b[:, 0:2])
        qh = np.ascontiguousarray(b[:, 2:6]).view("<u4").reshape(-1).astype(np.uint32)
        qs = b[:, 6:]
        j = np.arange(16)
        xh0 = ((qh[:, None] >> j) << 4) & 0x10
        xh1 = (qh[:, None] >> (j + 12)) & 0x10
        q = np.concatenate([(qs & 0x0F) | xh0, (qs >> 4) | xh1], axis=-1).astype(np.int8) - 16
        return q, d, None, 32

    if t == GGMLType.Q5_1:
        b = _u8(raw, 24)
        d = _read_f16(b[:, 0:2])
        m = _read_f16(b[:, 2:4])
        qh = np.ascontiguousarray(b[:, 4:8]).view("<u4").reshape(-1).astype(np.uint32)
        qs = b[:, 8:]
        j = np.arange(16)
        xh0 = ((qh[:, None] >> j) << 4) & 0x10
        xh1 = (qh[:, None] >> (j + 12)) & 0x10
        q = np.concatenate([(qs & 0x0F) | xh0, (qs >> 4) | xh1], axis=-1).astype(np.int8)
        return q, d, -m, 32

    if t == GGMLType.Q4_K:
        b = _u8(raw, 144)
        B = b.shape[0]
        d = _read_f16(b[:, 0:2])
        dmin = _read_f16(b[:, 2:4])
        ls, lm = _unpack_k4_scales(b[:, 4:16])
        qs = b[:, 16:].reshape(B, 4, 32)
        q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(B, 256).astype(np.int8)
        scales = d * ls.astype(np.float32)  # (B, 8)
        mins = dmin * lm.astype(np.float32)
        return q, scales, mins, 32

    if t == GGMLType.Q5_K:
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
        for n4 in range(4):
            parts.append(lo[:, n4] + np.where((qh & (1 << (2 * n4))) > 0, 16, 0))
            parts.append(hi[:, n4] + np.where((qh & (2 << (2 * n4))) > 0, 16, 0))
        q = np.stack(parts, axis=1).reshape(B, 256).astype(np.int8)
        scales = d * ls.astype(np.float32)
        mins = dmin * lm.astype(np.float32)
        return q, scales, mins, 32

    if t == GGMLType.Q6_K:
        b = _u8(raw, 210)
        B = b.shape[0]
        ql = b[:, 0:128].reshape(B, 2, 2, 32)
        qh = b[:, 128:192].reshape(B, 2, 32)
        sc = b[:, 192:208].view(np.int8).astype(np.float32)
        d = _read_f16(b[:, 208:210])
        q1 = ((ql[:, :, 0] & 0xF) | (((qh >> 0) & 3) << 4)).astype(np.int32) - 32
        q2 = ((ql[:, :, 1] & 0xF) | (((qh >> 2) & 3) << 4)).astype(np.int32) - 32
        q3 = ((ql[:, :, 0] >> 4) | (((qh >> 4) & 3) << 4)).astype(np.int32) - 32
        q4 = ((ql[:, :, 1] >> 4) | (((qh >> 6) & 3) << 4)).astype(np.int32) - 32
        q = np.stack([q1, q2, q3, q4], axis=2).reshape(B, 256).astype(np.int8)
        scales = d * sc  # (B, 16)
        return q, scales, None, 16

    if t == GGMLType.Q2_K:
        b = _u8(raw, 84)
        scales = b[:, 0:16]
        q = _unpack2(b[:, 16:80]).astype(np.int8)
        d = _read_f16(b[:, 80:82])
        dmin = _read_f16(b[:, 82:84])
        eff_s = d * (scales & 0xF).astype(np.float32)
        eff_m = dmin * (scales >> 4).astype(np.float32)
        return q, eff_s, eff_m, 16

    if t == GGMLType.Q3_K:
        b = _u8(raw, 110)
        B = b.shape[0]
        hm = b[:, 0:32]
        q2 = _unpack2(b[:, 32:96]).astype(np.int8)
        sc6 = _q3k_scales(b[:, 96:108])
        d = _read_f16(b[:, 108:110])
        hbits = np.stack([(hm >> kk) & 1 for kk in range(8)], axis=1).reshape(B, 256)
        q = (q2 - np.where(hbits > 0, 0, 4)).astype(np.int8)
        scales = d * sc6.astype(np.float32)
        return q, scales, None, 16

    if t == GGMLType.IQ4_NL:
        b = _u8(raw, 18)
        d = _read_f16(b[:, 0:2])
        qs = b[:, 2:]
        q = np.concatenate(
            [KVALUES_IQ4NL[qs & 0xF], KVALUES_IQ4NL[qs >> 4]], axis=-1
        ).astype(np.int8)
        return q, d, None, 32

    if t == GGMLType.IQ4_XS:
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
        q = np.stack(
            [KVALUES_IQ4NL[qs & 0xF], KVALUES_IQ4NL[qs >> 4]], axis=2
        ).reshape(B, 256).astype(np.int8)
        scales = d * ls.astype(np.float32)
        return q, scales, None, 32

    from .iq_codecs import PLANE_FNS

    fn = PLANE_FNS.get(t.name)
    if fn is not None:  # IQ1/IQ2/IQ3/TQ sub-4-bit formats
        return fn(raw)

    raise ValueError(f"no plane unpacker for {t.name}")


def _finalize_rows(q, scales, mins, gs, n_rows, n_per_row):
    """Reshape per-block planes to per-row [rows, n] / [rows, n//gs]."""
    q = q.reshape(n_rows, n_per_row)
    n_groups = n_per_row // gs
    scales = scales.reshape(n_rows, n_groups)
    if mins is not None:
        mins = mins.reshape(n_rows, n_groups)
    return q, scales, mins


# 4-bit types eligible for nibble packing: stored value range and zero-point
_PACK4 = {
    GGMLType.Q4_0: 8,  # planes hold q-8 in [-8, 7] -> re-bias by 8
    GGMLType.Q4_1: 0,
    GGMLType.Q4_K: 0,
    # linear sub-4-bit types whose plane values fit a nibble after re-bias:
    # stored nibble-packed so a 2-bit model reads 4 bits/weight, not 8
    GGMLType.Q2_K: 0,   # values 0..3
    GGMLType.Q3_K: 4,   # values -4..3
    GGMLType.TQ1_0: 1,  # trits -1..1
    GGMLType.TQ2_0: 1,
}


def qtensor_from_gguf(
    raw: np.ndarray,
    ggml_type: GGMLType,
    ne_shape: tuple[int, ...],
    device=None,
    scales_dtype=np.float32,
    pack4: bool = True,
    kmajor: bool = True,
) -> QTensor:
    """Build a QTensor from raw GGUF tensor bytes.

    GGUF weight matrices have ne=(K, N): N rows (output channels) of length
    K (the contraction dim). Matmul weights are transposed to K-major at
    load; embedding tables pass kmajor=False to keep the row layout.
    4-bit types are nibble-packed ("p4"), halving HBM traffic in the
    Pallas matmul kernel.
    """
    t = GGMLType(ggml_type)
    if len(ne_shape) == 1:
        ne_shape = (ne_shape[0], 1)
    if len(ne_shape) > 2:
        # collapse trailing dims (e.g. per-expert stacks handled by caller)
        n = 1
        for d in ne_shape[1:]:
            n *= d
        ne_shape = (ne_shape[0], n)
    K, N = int(ne_shape[0]), int(ne_shape[1])
    put = partial(jax.device_put, device=device)

    if kmajor:
        from .. import native

        can_pack = K % 256 == 0
        if native.available() and int(t) in native.NATIVE_TYPES and (
            can_pack or int(t) in (8, 14)
        ):
            res = native.unpack_planes(int(t), raw, N, K)
            if res is not None:
                qn, sn, mn, gs, layout, zp = res
                return QTensor(
                    qs=put(qn),
                    scales=put(sn.astype(scales_dtype)),
                    mins=put(mn.astype(scales_dtype)) if mn is not None else None,
                    group_size=gs, ggml_type=t, layout=layout, zp=zp,
                    pack_tk=256, kmajor=True,
                )

    q, scales, mins, gs = planes_from_raw(raw, t, K)
    q, scales, mins = _finalize_rows(q, scales, mins, gs, N, K)  # [N, K] rows

    layout, zp, pack_tk = "i8", 0, 256
    do_pack = pack4 and t in _PACK4 and K % 256 == 0
    if do_pack:
        zp = _PACK4[t]
        layout = "p4"

    if kmajor:
        q = np.ascontiguousarray(q.T)  # [K, N]
        if do_pack:
            from ..ops.pallas_qmm import pack_p4_kmajor

            q = pack_p4_kmajor(q, zp, tile_k=pack_tk)
        scales = np.ascontiguousarray(scales.T.astype(scales_dtype))
        mins = np.ascontiguousarray(mins.T.astype(scales_dtype)) if mins is not None else None
    else:
        if do_pack:
            from ..ops.pallas_qmm import pack_p4

            q = pack_p4(q, zp, tile_k=pack_tk)
        scales = np.ascontiguousarray(scales.astype(scales_dtype))
        mins = np.ascontiguousarray(mins.astype(scales_dtype)) if mins is not None else None

    return QTensor(
        qs=put(np.ascontiguousarray(q)),
        scales=put(scales),
        mins=put(mins) if mins is not None else None,
        group_size=gs,
        ggml_type=t,
        layout=layout,
        zp=zp,
        pack_tk=pack_tk,
        kmajor=kmajor,
    )


def expert_qtensor_from_gguf(
    raw: np.ndarray,
    ggml_type: GGMLType,
    ne_shape: tuple[int, ...],
    device=None,
    scales_dtype=np.float32,
) -> QTensor:
    """Stacked expert planes from a 3-D GGUF tensor ne=(K, N, E): a
    rows-layout QTensor whose leaves carry a leading expert dim —
    qs [E, N, K(/2)], scales/mins [E, N, K//gs]. Keeps a quantized MoE
    model's experts at their stored bit-width in HBM instead of the dense
    bf16 the XLA fallback needs (the analogue of ggml_mul_mat_id running
    directly on quantized experts, ggml.h:1271)."""
    K, N, E = (int(d) for d in ne_shape)
    flat = qtensor_from_gguf(raw, ggml_type, (K, N * E), device=device,
                             scales_dtype=scales_dtype, kmajor=False)
    return QTensor(
        qs=flat.qs.reshape(E, N, -1),
        scales=flat.scales.reshape(E, N, -1),
        mins=flat.mins.reshape(E, N, -1) if flat.mins is not None else None,
        group_size=flat.group_size, ggml_type=flat.ggml_type,
        layout=flat.layout, zp=flat.zp, pack_tk=flat.pack_tk, kmajor=False,
    )


def unpack_p4_np(packed: np.ndarray, pack_tk: int, zp: int) -> np.ndarray:
    """Inverse of ops.pallas_qmm.pack_p4 (numpy)."""
    lead, kh = packed.shape[:-1], packed.shape[-1]
    half = pack_tk // 2
    p = packed.reshape(*lead, kh // half, half).astype(np.int16)
    q = np.stack([p & 0xF, p >> 4], axis=-2)  # [..., tiles, {lo,hi}, half]
    return (q.reshape(*lead, kh * 2) - zp).astype(np.int8)


def dequantize_qtensor(qt: QTensor) -> np.ndarray:
    """Reference dequant of the planes — for tests. Returns f32 [N, K]
    regardless of storage layout."""
    q = np.asarray(qt.qs)
    if qt.kmajor:
        if qt.layout == "p4":
            q = unpack_p4_kmajor_np(q, qt.pack_tk, qt.zp)
        q = q.T.astype(np.float32)  # -> [N, K]
        s = np.repeat(np.asarray(qt.scales, np.float32).T, qt.group_size, axis=-1)
        w = q * s
        if qt.mins is not None:
            w = w - np.repeat(np.asarray(qt.mins, np.float32).T, qt.group_size, axis=-1)
        return w
    if qt.layout == "p4":
        q = unpack_p4_np(q, qt.pack_tk, qt.zp)
    q = q.astype(np.float32)
    s = np.repeat(np.asarray(qt.scales, np.float32), qt.group_size, axis=-1)
    w = q * s
    if qt.mins is not None:
        w = w - np.repeat(np.asarray(qt.mins, np.float32), qt.group_size, axis=-1)
    return w


def unpack_p4_kmajor_np(packed: np.ndarray, pack_tk: int, zp: int) -> np.ndarray:
    """Inverse of ops.pallas_qmm.pack_p4_kmajor: [K//2, N] -> [K, N]."""
    kh, n = packed.shape
    half = pack_tk // 2
    p = packed.reshape(kh // half, half, n).astype(np.int16)
    q = np.stack([p & 0xF, p >> 4], axis=1)  # [tiles, {lo,hi}, half, N]
    return (q.reshape(kh * 2, n) - zp).astype(np.int8)


def supported_plane_types() -> list[GGMLType]:
    """Every stored quant type decodes to fused-kernel planes: linear 4-bit
    types nibble-pack (p4); codebook IQ types carry sign-folded int8 grid
    values; ternary packs to nibbles. Nothing falls back to dense bf16."""
    return [
        GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
        GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
        GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS,
        GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
        GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
        GGMLType.TQ1_0, GGMLType.TQ2_0,
    ]


def concat_qtensors(tensors: list) -> "QTensor | None":
    """Concatenate K-major QTensors along the output dim (lane axis) — used
    to fuse QKV / gate+up projections into one kernel launch. Returns None
    when the planes are incompatible (mixed quant recipes)."""
    import jax.numpy as jnp

    first = tensors[0]
    if not all(isinstance(t, QTensor) for t in tensors):
        return None
    for t in tensors:
        if (
            not t.kmajor
            or t.layout != first.layout
            or t.group_size != first.group_size
            or t.zp != first.zp
            or t.pack_tk != first.pack_tk
            or t.qs.shape[0] != first.qs.shape[0]
            or t.scales.dtype != first.scales.dtype
            or (t.mins is None) != (first.mins is None)
        ):
            return None
    return QTensor(
        qs=jnp.concatenate([t.qs for t in tensors], axis=1),
        scales=jnp.concatenate([t.scales for t in tensors], axis=1),
        mins=jnp.concatenate([t.mins for t in tensors], axis=1)
        if first.mins is not None else None,
        group_size=first.group_size,
        ggml_type=first.ggml_type,
        layout=first.layout,
        zp=first.zp,
        pack_tk=first.pack_tk,
        kmajor=True,
    )
