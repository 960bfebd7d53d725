"""Pallas TPU kernel: fused dequantize × matmul.

This is the MXU replacement for the reference's fused quantized matmul
kernels (CUDA MMQ /root/reference/ggml/src/ggml-cuda/mmq.cuh, CPU vec_dot
/root/reference/ggml/src/ggml-cpu/quants.c). Weights stream HBM->VMEM as
small integers and are dequantized in-register against per-group scales,
so HBM traffic is ~1 byte/weight (int8 planes) or ~0.5 (nibble-packed),
never the bf16-materialized weight.

All weight planes are K-MAJOR (quant/qtensor.py):
  * "i8":  qs int8  [K, N]
  * "p4":  qs uint8 [K//2, N]; within each K-tile of size TK, sublane t
           packs element k = t (low nibble) and k = t + TK//2 (high
           nibble), so unpacking is a sublane-aligned concat.
  * scales/mins f32|bf16 [K//gs, N]

K-major matters on real hardware: the lane (minor) dim is the 128-aligned
output-feature dim, and expanding scales group-wise along K is a
sublane-only reshape — the only reshape Mosaic supports; lane-splitting
reshapes fail to compile ("infer-vector-layout: unsupported shape cast").

The group zero-point term (Q4_K mins etc.) is NOT in the kernel: it
factors into groupsum(x) @ mins — a rank-K/gs correction matmul handled
by XLA (mirrors the reference's Q8 bsums trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# K-tile must match the nibble-pairing stride used at pack time.
PACK_TK = 256


def _dequant_w(q, s_ref, gs, zp, cdtype):
    """q (TK, TN) small ints + scales (TK//gs, TN) -> w (TK, TN)."""
    tk, tn = q.shape
    if zp:
        q = q - float(zp)
    s = s_ref[...].astype(jnp.float32)  # (TK//gs, TN)
    # expand along K: sublane-only broadcast+reshape (lane dim unchanged)
    s_full = jnp.broadcast_to(s[:, None, :], (tk // gs, gs, tn)).reshape(tk, tn)
    return (q * s_full).astype(cdtype)


def _qmm_kernel_i8(x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, zp, cdtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...].astype(jnp.float32)  # (TK, TN)
    w = _dequant_w(q, s_ref, gs, zp, cdtype)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(cdtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


def _qmm_kernel_p4(x_ref, q_ref, s_ref, o_ref, acc_ref, *, gs, zp, cdtype, ptk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = q_ref[...].astype(jnp.int32)  # (TK//2, TN), TK = m * ptk
    kh, tn = packed.shape
    half = ptk // 2
    m = kh // half
    p3 = packed.reshape(m, half, tn)  # sublane-only reshape
    lo = (p3 & 0xF).astype(jnp.float32)
    hi = (p3 >> 4).astype(jnp.float32)
    # per pack-tile: [lo half | hi half] along K, tiles stay in order
    q = jnp.concatenate([lo, hi], axis=1).reshape(m * ptk, tn)
    w = _dequant_w(q, s_ref, gs, zp, cdtype)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(cdtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("gs", "zp", "layout", "tile_n", "tile_k", "interpret",
                     "compute_dtype"),
)
def qmm_pallas(
    x: jnp.ndarray,  # [B, K] (bf16/f32)
    qs: jnp.ndarray,  # [K, N] int8 or [K//2, N] uint8 (p4)
    scales: jnp.ndarray,  # [K//gs, N]
    gs: int = 32,
    zp: int = 0,
    layout: str = "i8",
    tile_n: int = 256,
    tile_k: int = PACK_TK,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """y[b, n] = sum_k x[b,k] * (q[k,n] - zp) * scales[k//gs, n]  (f32)."""
    B, K = x.shape
    N = qs.shape[-1]
    tile_n = min(tile_n, N)
    tile_k = min(tile_k, K)
    assert K % tile_k == 0 and N % tile_n == 0, (N, K, tile_n, tile_k)
    assert tile_k % gs == 0

    grid = (N // tile_n, K // tile_k)
    cdtype = jnp.dtype(compute_dtype)
    kfac = 2 if layout == "p4" else 1
    if layout == "p4":
        assert tile_k % PACK_TK == 0
        kernel = functools.partial(
            _qmm_kernel_p4, gs=gs, zp=zp, cdtype=cdtype, ptk=PACK_TK
        )
    else:
        kernel = functools.partial(_qmm_kernel_i8, gs=gs, zp=zp, cdtype=cdtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, tile_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_k // kfac, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_k // gs, tile_n), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=qs.size * qs.dtype.itemsize + scales.size * 4
            + B * K * 2 + B * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qs, scales)


def pack_p4(qs_i8, zp: int, tile_k: int = PACK_TK):
    """Row-major packing [N, K] -> [N, K//2] (embedding tables).

    Within each K-tile, byte t holds k=t (low) and k=t+tile_k//2 (high),
    both offset by zp so storage is unsigned 0..15.
    """
    import numpy as np

    q = np.asarray(qs_i8, np.int16) + zp
    assert q.min() >= 0 and q.max() <= 15, "values do not fit 4 bits"
    N, K = q.shape
    tile_k = min(tile_k, K)
    assert K % tile_k == 0
    half = tile_k // 2
    qt = q.reshape(N, K // tile_k, 2, half)
    packed = (qt[:, :, 0] | (qt[:, :, 1] << 4)).astype(np.uint8)
    return packed.reshape(N, K // 2)


def pack_p4_kmajor(qs_i8, zp: int, tile_k: int = PACK_TK):
    """K-major packing [K, N] -> [K//2, N]: sublane t of each K-tile packs
    k=t (low nibble) and k=t+tile_k//2 (high nibble)."""
    import numpy as np

    q = np.asarray(qs_i8, np.int16) + zp
    assert q.min() >= 0 and q.max() <= 15, "values do not fit 4 bits"
    K, N = q.shape
    tile_k = min(tile_k, K)
    assert K % tile_k == 0
    half = tile_k // 2
    qt = q.reshape(K // tile_k, 2, half, N)
    packed = (qt[:, 0] | (qt[:, 1] << 4)).astype(np.uint8)
    return packed.reshape(K // 2, N)
