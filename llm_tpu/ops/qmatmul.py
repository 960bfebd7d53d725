"""Quantized matmul / embedding-gather entry points.

This is the TPU replacement for the reference's fused dequant-dot kernels
(CPU ggml_vec_dot_* in /root/reference/ggml/src/ggml-cpu/quants.c, CUDA MMQ
in /root/reference/ggml/src/ggml-cuda/mmq.cuh). Two paths:

  * Pallas path (ops/pallas_qmm.py): fused in-VMEM dequant + MXU matmul —
    HBM reads the int planes only. Default on TPU for aligned shapes.
  * XLA path: dequantize planes in-jit and let XLA fuse. Always available;
    used on CPU, for odd shapes, and for row-layout (embedding) tensors.

The zero-point trick: W = (q-zp)*S - rep(M)  =>  x @ W = x @ ((q-zp)*S)
- groupsum(x) @ M, mirroring the reference's Q8 bsums optimization
(block_q8_K.bsums, ggml-common.h:329-334).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.qtensor import QTensor
from .pallas_qmm import qmm_pallas

# module-level default compute dtype for dequantized weights
_DEFAULT_DTYPE = jnp.bfloat16

# "auto" (pallas on TPU when aligned) | "pallas" | "xla"
_BACKEND = os.environ.get("LLM_TPU_QMM", "auto")
_INTERPRET = False  # pallas interpret mode (tests on CPU)

# fold the group-offset (mins) correction into the Pallas kernel instead of
# an XLA matmul after it
_FUSE_MINS = os.environ.get("LLM_TPU_FUSE_MINS", "0") == "1"


def set_backend(backend: str, interpret: bool = False) -> None:
    global _BACKEND, _INTERPRET
    assert backend in ("auto", "pallas", "xla")
    _BACKEND = backend
    _INTERPRET = interpret


def _unpack_p4_rows(packed: jnp.ndarray, pack_tk: int, zp: int) -> jnp.ndarray:
    """Row-major unpack [..., K//2] -> [..., K]."""
    lead, kh = packed.shape[:-1], packed.shape[-1]
    half = pack_tk // 2
    p = packed.reshape(*lead, kh // half, half).astype(jnp.int32)
    q = jnp.stack([p & 0xF, p >> 4], axis=-2)
    return (q.reshape(*lead, kh * 2) - zp).astype(jnp.int8)


def _unpack_p4_kmajor(packed: jnp.ndarray, pack_tk: int, zp: int) -> jnp.ndarray:
    """K-major unpack [K//2, N] -> [K, N]."""
    kh, n = packed.shape
    half = pack_tk // 2
    p = packed.reshape(kh // half, half, n).astype(jnp.int32)
    q = jnp.stack([p & 0xF, p >> 4], axis=1)
    return (q.reshape(kh * 2, n) - zp).astype(jnp.int8)


def _int_planes(qt: QTensor) -> jnp.ndarray:
    """int8 planes in storage orientation (unpacking p4 if needed)."""
    if qt.layout == "p4":
        if qt.kmajor:
            return _unpack_p4_kmajor(qt.qs, qt.pack_tk, qt.zp)
        return _unpack_p4_rows(qt.qs, qt.pack_tk, qt.zp)
    return qt.qs


def _dequant_w(qt: QTensor, dtype) -> jnp.ndarray:
    """Dequantized weight in storage orientation ([K, N] kmajor / [N, K] rows)."""
    qi = _int_planes(qt)
    g = qt.group_size
    if qt.kmajor:
        k, n = qi.shape
        q = qi.astype(dtype).reshape(k // g, g, n)
        w = q * qt.scales.astype(dtype)[:, None, :]
        if qt.mins is not None:
            w = w - qt.mins.astype(dtype)[:, None, :]
        return w.reshape(k, n)
    n, k = qi.shape
    q = qi.astype(dtype).reshape(n, k // g, g)
    w = q * qt.scales.astype(dtype)[..., None]
    if qt.mins is not None:
        w = w - qt.mins.astype(dtype)[..., None]
    return w.reshape(n, k)


_TILE_N_OPTS = tuple(
    int(x) for x in os.environ.get("LLM_TPU_TILE_N", "4096,2048,1024,512,256,128").split(",")
)
_TILE_K_OPTS = tuple(
    int(x) for x in os.environ.get("LLM_TPU_TILE_K", "2048,1024,512,256,128").split(",")
)


# optional per-shape tile overrides: {(K, N): (tile_n, tile_k)}. Populated
# from LLM_TPU_TILE_TABLE (a JSON file of [[K, N, tn, tk], ...]) or by the
# autotune tool at runtime.
_TILE_TABLE: dict[tuple[int, int], tuple[int, int]] = {}
if os.environ.get("LLM_TPU_TILE_TABLE"):
    import json as _json

    try:
        with open(os.environ["LLM_TPU_TILE_TABLE"]) as _f:
            _TILE_TABLE = {(int(r[0]), int(r[1])): (int(r[2]), int(r[3]))
                           for r in _json.load(_f)}
    except (OSError, ValueError):
        pass


def set_tile_table(table: dict[tuple[int, int], tuple[int, int]]) -> None:
    global _TILE_TABLE
    _TILE_TABLE = dict(table)


# tile table for the group-factored decode path (pallas_qmm._gdot_kernel):
# its optimum differs from the classic kernel's (bigger-N tiles win; huge
# tile_k loses). LLM_TPU_TILE_TABLE_GDOT, same JSON format.
_TILE_TABLE_GDOT: dict[tuple[int, int], tuple[int, int]] = {}
if os.environ.get("LLM_TPU_TILE_TABLE_GDOT"):
    import json as _json

    try:
        with open(os.environ["LLM_TPU_TILE_TABLE_GDOT"]) as _f:
            _TILE_TABLE_GDOT = {(int(r[0]), int(r[1])): (int(r[2]), int(r[3]))
                                for r in _json.load(_f)}
    except (OSError, ValueError):
        pass


def set_tile_table_gdot(table) -> None:
    global _TILE_TABLE_GDOT
    _TILE_TABLE_GDOT = dict(table)


def _pick_tile(n: int, options=None) -> int | None:
    """Largest option dividing n evenly (exact tiles)."""
    for t in options or _TILE_N_OPTS:
        if n % t == 0:
            return t
    return None


def _pick_tile_n(n: int) -> int | None:
    """Tile for the output dim. Prefers the largest exactly-dividing option;
    when only tiny tiles divide (e.g. lm_head N=128256 -> 128), uses the
    largest option <= n with a ragged last tile instead — the kernel masks
    the boundary block, which beats crawling through 128-wide tiles."""
    exact = _pick_tile(n, _TILE_N_OPTS)
    best = _TILE_N_OPTS[0]
    if exact is not None and exact * 4 >= min(best, n):
        return exact
    for t in _TILE_N_OPTS:
        if t <= n:
            return t
    return exact if exact is not None else (n if n % 128 == 0 else None)


def _pallas_ok(qt: QTensor, k: int, b: int) -> bool:
    if _BACKEND == "xla" or not qt.kmajor:
        return False
    if _BACKEND == "auto" and jax.default_backend() not in ("tpu",):
        return False
    if _pick_tile_n(qt.out_features) is None:
        return False
    if qt.layout == "p4":
        return k % qt.pack_tk == 0
    tk = _pick_tile(k, _TILE_K_OPTS)
    return tk is not None and tk % qt.group_size == 0


def _vmem_estimate(b: int, tile_n: int, tile_k: int, gs: int, layout: str,
                   ptk: int = 256) -> int:
    """Scoped-VMEM bytes for one qmm grid step. Mosaic DOUBLE-BUFFERS every
    pipelined in/out block (next tile streams while this one computes), so
    block buffers count twice; the accumulator scratch and the dequant
    temporaries are single."""
    xblk = b * tile_k * 2 + (tile_k // gs) * b * 2
    qs = (tile_k // (2 if layout == "p4" else 1)) * tile_n
    scales = 2 * (tile_k // gs) * tile_n * 2
    out = b * tile_n * 4
    acc = b * tile_n * 4
    wtmp = ptk * tile_n * (4 + 2)  # f32 unpack + cdtype dequant chunk
    return 2 * (xblk + qs + scales + out) + acc + wtmp


_VMEM_BUDGET = 13 << 20  # inside Mosaic's 16MB scoped-vmem default


def _fit_tiles(b: int, tile_n: int, tile_k: int, gs: int, layout: str,
               min_tk: int):
    """Shrink tiles until the kernel's scoped-VMEM footprint fits — big
    prefill batches (B=512) overflow the tiles that are optimal at
    decode (B=1)."""
    while (_vmem_estimate(b, tile_n, tile_k, gs, layout) > _VMEM_BUDGET
           and tile_n > 256 and tile_n % 2 == 0):
        tile_n //= 2
    while (_vmem_estimate(b, tile_n, tile_k, gs, layout) > _VMEM_BUDGET
           and tile_k > min_tk and tile_k % 2 == 0
           and (tile_k // 2) % min_tk == 0):
        tile_k //= 2
    return tile_n, tile_k


class StackedWeight:
    """A per-layer view into depth-stacked weights ([L, ...] leaves) plus a
    traced layer index. The Pallas path DMAs layer idx's tiles straight out
    of the stacked HBM buffer (scalar-prefetch index maps) so the lax.scan
    decoder never materializes per-layer weight copies."""

    __slots__ = ("w", "idx")

    def __init__(self, w, idx):
        self.w = w  # stacked QTensor (kmajor leaves [L, ...]) or dense [L, N, K]
        self.idx = idx  # traced int32 scalar


def _slice_stacked(w, idx):
    """Materialize layer idx of a stacked weight (XLA fallback path)."""
    take = lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False)
    if isinstance(w, QTensor):
        return QTensor(
            qs=take(w.qs), scales=take(w.scales),
            mins=take(w.mins) if w.mins is not None else None,
            group_size=w.group_size, ggml_type=w.ggml_type, layout=w.layout,
            zp=w.zp, pack_tk=w.pack_tk, kmajor=w.kmajor,
        )
    return take(w)


def qmm(
    x: jnp.ndarray,
    w: "QTensor | jnp.ndarray | StackedWeight",
    dtype=None,
    out_dtype=None,
) -> jnp.ndarray:
    """y[..., n] = sum_k x[..., k] * W[k, n].

    Accepts a QTensor (any layout), a dense jnp array [N, K] (row-major,
    as GGUF/converters produce dense weights), or a StackedWeight (scan
    path). Accumulates in f32.
    """
    dtype = dtype or _DEFAULT_DTYPE
    lead = x.shape[:-1]
    k = x.shape[-1]

    lidx = None
    if isinstance(w, StackedWeight):
        if isinstance(w.w, QTensor):
            probe = QTensor(
                qs=w.w.qs[0], scales=w.w.scales[0],
                mins=w.w.mins[0] if w.w.mins is not None else None,
                group_size=w.w.group_size, ggml_type=w.w.ggml_type,
                layout=w.w.layout, zp=w.w.zp, pack_tk=w.w.pack_tk,
                kmajor=w.w.kmajor,
            )
            if _pallas_ok(probe, k, int(np.prod(lead)) if lead else 1):
                lidx = w.idx
                stacked_qt = w.w
                w = probe  # tile decisions read the per-layer geometry
            else:
                w = _slice_stacked(w.w, w.idx)
        else:
            w = _slice_stacked(w.w, w.idx)

    if isinstance(w, QTensor):
        x2 = x.reshape(-1, k)
        b = x2.shape[0]
        if _pallas_ok(w, k, b):
            pad = (-b) % 8
            if pad:
                x2 = jnp.pad(x2, ((0, pad), (0, 0)))
            from .pallas_qmm import GDOT_MAX_B

            # group-factored decode path: engages per shape, from measured
            # wins recorded in the gdot tile table (LLM_TPU_GDOT=force
            # overrides to always-on for experiments, =0 disables)
            _gdot_env = os.environ.get("LLM_TPU_GDOT", "1")
            gdot_ok = (w.layout == "p4" and (b + pad) <= GDOT_MAX_B
                       and k % 256 == 0 and _gdot_env != "0")
            use_gdot = gdot_ok and (
                _gdot_env == "force"
                or (k, w.out_features) in _TILE_TABLE_GDOT)
            tuned = (_TILE_TABLE_GDOT.get((k, w.out_features))
                     if use_gdot else None) \
                or _TILE_TABLE.get((k, w.out_features))
            if tuned is not None:
                tile_n, tile_k = tuned
            else:
                tile_n = _pick_tile_n(w.out_features)
                if w.layout == "p4":
                    # the kernel handles any multiple of the pack stride
                    tile_k = next(
                        t for t in _TILE_K_OPTS + (w.pack_tk,)
                        if k % t == 0 and t % w.pack_tk == 0
                    )
                else:
                    tile_k = _pick_tile(k, _TILE_K_OPTS)
            min_tk = w.pack_tk if w.layout == "p4" else w.group_size
            tile_n, tile_k = _fit_tiles(
                b + pad, min(tile_n, w.out_features), min(tile_k, k),
                w.group_size, w.layout, min_tk)
            if lidx is not None:
                # stacked planes + always-fused mins: no per-layer slices
                y = qmm_pallas(
                    x2.astype(dtype), stacked_qt.qs, stacked_qt.scales,
                    stacked_qt.mins,
                    gs=w.group_size, zp=w.zp, layout=w.layout,
                    tile_n=tile_n, tile_k=tile_k, interpret=_INTERPRET,
                    compute_dtype=dtype, lidx=lidx, gdot=use_gdot,
                )
            else:
                y = qmm_pallas(
                    x2.astype(dtype), w.qs, w.scales,
                    w.mins if _FUSE_MINS else None,
                    gs=w.group_size, zp=w.zp, layout=w.layout,
                    tile_n=tile_n, tile_k=tile_k, interpret=_INTERPRET,
                    compute_dtype=dtype, gdot=use_gdot,
                )
            if w.mins is not None and not _FUSE_MINS and lidx is None:
                g = w.group_size
                xg = x2.astype(jnp.float32).reshape(b + pad, k // g, g).sum(-1)
                y = y - jax.lax.dot_general(
                    xg.astype(dtype), w.mins.astype(dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if pad:
                y = y[:b]
        else:
            wd = _dequant_w(w, dtype)  # [K, N] or [N, K]
            contract = (0,) if w.kmajor else (1,)
            y = jax.lax.dot_general(
                x2.astype(dtype), wd,
                dimension_numbers=(((1,), contract), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = y.reshape(*lead, -1)
    else:
        y = jax.lax.dot_general(
            x.astype(w.dtype) if w.dtype != jnp.float32 else x.astype(jnp.float32),
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y


def qembed(w: QTensor | jnp.ndarray, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Row gather + dequant: embeddings for token ids. w rows = vocab
    (QTensor with kmajor=False, or dense [V, K])."""
    dtype = dtype or _DEFAULT_DTYPE
    if isinstance(w, QTensor):
        assert not w.kmajor, "embedding tables must use the rows layout"
        qrows = jnp.take(w.qs, ids, axis=0)
        if w.layout == "p4":
            qrows = _unpack_p4_rows(qrows, w.pack_tk, w.zp)
        q = qrows.astype(jnp.float32)
        s = jnp.take(w.scales, ids, axis=0).astype(jnp.float32)
        g = w.group_size
        k = q.shape[-1]
        out = q.reshape(*q.shape[:-1], k // g, g) * s[..., None]
        if w.mins is not None:
            m = jnp.take(w.mins, ids, axis=0).astype(jnp.float32)
            out = out - m[..., None]
        return out.reshape(*q.shape[:-1], k).astype(dtype)
    return jnp.take(w, ids, axis=0).astype(dtype)


def dequant_expert_rows(qt: QTensor, idx: jnp.ndarray,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Gather expert sub-planes from a stacked rows-layout QTensor
    (qs [E, N, K(/2)], see quant.qtensor.expert_qtensor_from_gguf) by
    expert ids idx [...] and dequantize -> [..., N, K]. Only the selected
    experts' int planes leave HBM; the bf16/f32 expansion is a local
    (gathered) temporary."""
    assert not qt.kmajor
    qs = jnp.take(qt.qs, idx, axis=0)
    if qt.layout == "p4":
        q = _unpack_p4_rows(qs, qt.pack_tk, qt.zp)
    else:
        q = qs
    g = qt.group_size
    k = q.shape[-1]
    sc = jnp.take(qt.scales, idx, axis=0).astype(dtype)
    w = q.astype(dtype).reshape(*q.shape[:-1], k // g, g) * sc[..., None]
    if qt.mins is not None:
        m = jnp.take(qt.mins, idx, axis=0).astype(dtype)
        w = w - m[..., None]
    return w.reshape(*q.shape[:-1], k)
