"""Normalization ops (ggml RMS_NORM / NORM semantics: f32 accumulation,
eps inside the sqrt). Reference behavior: ggml.h GGML_OP_RMS_NORM and
llama's build_norm (/root/reference/src/llama-graph.cpp)."""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray | None, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None,
    bias: jnp.ndarray | None,
    eps: float,
) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
