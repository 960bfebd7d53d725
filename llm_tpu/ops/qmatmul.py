"""Quantized matmul / embedding-gather entry points.

This is the TPU replacement for the reference's fused dequant-dot kernels
(CPU ggml_vec_dot_* in /root/reference/ggml/src/ggml-cpu/quants.c, CUDA MMQ
in /root/reference/ggml/src/ggml-cuda/mmq.cuh). Two paths:

  * XLA path (this file): dequantize planes in-jit and let XLA fuse the
    dequant into the dot. Always available, used for correctness and on CPU.
  * Pallas path (ops/pallas/qmm.py): fused in-VMEM dequant + MXU matmul with
    the group-offset term folded into a rank-(K/gs) correction, used on TPU.

The zero-point trick: W = qs*S - rep(M)  =>  x @ W^T = x @ (qs*S)^T -
groupsum(x) @ M^T, mirroring the reference's Q8 bsums optimization
(block_q8_K.bsums, ggml-common.h:329-334).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.qtensor import QTensor

# module-level default compute dtype for dequantized weights
_DEFAULT_DTYPE = jnp.bfloat16


def _dequant_rows(qt: QTensor, dtype) -> jnp.ndarray:
    """[N, K] dequantized weight (scales applied groupwise, mins subtracted)."""
    n, k = qt.qs.shape
    g = qt.group_size
    q = qt.qs.astype(dtype).reshape(n, k // g, g)
    w = q * qt.scales.astype(dtype)[..., None]
    if qt.mins is not None:
        w = w - qt.mins.astype(dtype)[..., None]
    return w.reshape(n, k)


def qmm(
    x: jnp.ndarray,
    w: QTensor | jnp.ndarray,
    dtype=None,
    out_dtype=None,
) -> jnp.ndarray:
    """y[..., n] = sum_k x[..., k] * W[n, k]   (W row-major [N, K]).

    Accepts a dense jnp array [N, K] or a QTensor. Accumulates in f32.
    """
    dtype = dtype or _DEFAULT_DTYPE
    if isinstance(w, QTensor):
        if w.mins is not None:
            # symmetric part + group-sum correction (keeps dequant mul-only)
            n, k = w.qs.shape
            g = w.group_size
            ws = (w.qs.astype(dtype).reshape(n, k // g, g) * w.scales.astype(dtype)[..., None]).reshape(n, k)
            y = jax.lax.dot_general(
                x.astype(dtype), ws,
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xg = x.astype(jnp.float32).reshape(*x.shape[:-1], k // g, g).sum(-1)
            y = y - jax.lax.dot_general(
                xg.astype(dtype), w.mins.astype(dtype),
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            wd = _dequant_rows(w, dtype)
            y = jax.lax.dot_general(
                x.astype(dtype), wd,
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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
    """Row gather + dequant: embeddings for token ids. w rows = vocab."""
    dtype = dtype or _DEFAULT_DTYPE
    if isinstance(w, QTensor):
        q = jnp.take(w.qs, ids, axis=0).astype(jnp.float32)
        s = jnp.take(w.scales, ids, axis=0).astype(jnp.float32)
        g = w.group_size
        k = q.shape[-1]
        out = q.reshape(*q.shape[:-1], k // g, g) * s[..., None]
        if w.mins is not None:
            m = jnp.take(w.mins, ids, axis=0).astype(jnp.float32)
            out = out - m[..., None]
        return out.reshape(*q.shape[:-1], k).astype(dtype)
    return jnp.take(w, ids, axis=0).astype(dtype)
