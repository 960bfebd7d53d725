"""Rotary position embeddings with linear + YaRN scaling and per-dim
frequency factors.

Behavioral parity target: ggml_rope_ext (/root/reference/ggml/include/ggml.h:1597;
math in /root/reference/ggml/src/ggml-cpu/ops.cpp rope_yarn/rope_yarn_ramp and
ggml.c ggml_rope_yarn_corr_dims). Two layout modes exist in the format:

  * NORM (mode 0): rotate adjacent pairs (x[2i], x[2i+1]). GGUF llama
    checkpoints are stored pre-permuted for this mode.
  * NEOX (mode 2): rotate split halves (x[i], x[i + n_rot/2]).

Implementation is a single angle computation + two apply functions; angles
are computed once per step and shared across layers.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

ROPE_TYPE_NONE = -1
ROPE_TYPE_NORM = 0
ROPE_TYPE_NEOX = 2


@dataclass(frozen=True)
class RopeParams:
    n_dims: int  # number of rotated dims (<= head_dim)
    mode: int = ROPE_TYPE_NEOX
    freq_base: float = 10000.0
    freq_scale: float = 1.0  # 1/scaling_factor for linear/yarn interp
    ext_factor: float = 0.0  # YaRN extrapolation mix (0 = off)
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_ctx_orig: int = 0  # original training context (YaRN)


def _yarn_corr_dims(p: RopeParams) -> tuple[float, float]:
    """ggml_rope_yarn_corr_dims: ramp window in rotated-dim index space."""

    def corr_dim(n_rot: float) -> float:
        return (
            p.n_dims
            * math.log(max(p.n_ctx_orig, 1) / (n_rot * 2 * math.pi))
            / (2 * math.log(p.freq_base))
        )

    start = math.floor(corr_dim(p.beta_fast))
    end = math.ceil(corr_dim(p.beta_slow))
    return max(0.0, start), min(float(p.n_dims - 1), end)


def rope_angles(
    positions: jnp.ndarray,
    p: RopeParams,
    freq_factors: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape [*positions.shape, n_dims//2].

    freq_factors: optional per-dim divisors (llama3-style rope_freqs tensor).
    """
    half = p.n_dims // 2
    dim_idx = np.arange(half, dtype=np.float32)
    inv_freq = np.power(p.freq_base, -2.0 * dim_idx / p.n_dims)
    if freq_factors is not None:
        # freq_factors may be a traced array (params["rope_freqs"] rides
        # the jit pytree) — keep this computation in jnp
        inv_freq = jnp.asarray(inv_freq) \
            / jnp.asarray(freq_factors, jnp.float32)[:half]

    theta_extrap = positions.astype(jnp.float32)[..., None] * inv_freq
    return _finish_angles(theta_extrap, p, dim_idx, dtype)


def _finish_angles(theta_extrap, p: RopeParams, dim_idx, dtype):
    theta_interp = p.freq_scale * theta_extrap
    mscale = p.attn_factor

    if p.ext_factor != 0.0:
        low, high = _yarn_corr_dims(p)
        # ramp over pair index i0/2 == dim_idx
        y = (dim_idx - low) / max(0.001, high - low)
        ramp = (1.0 - np.clip(y, 0.0, 1.0)) * p.ext_factor
        theta = theta_interp * (1.0 - ramp) + theta_extrap * ramp
        mscale *= 1.0 + 0.1 * math.log(1.0 / p.freq_scale)
    else:
        theta = theta_interp

    return (jnp.cos(theta) * mscale).astype(dtype), (jnp.sin(theta) * mscale).astype(dtype)


def mrope_angles(
    positions: jnp.ndarray,  # [..., 4] (t, h, w, e) per token
    sections,  # 4-tuple of section widths over PAIR indices
    p: RopeParams,
    freq_factors: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-section rope (qwen2vl M-RoPE; ggml_mrope_cache_init,
    ggml-cpu/ops.cpp:5895-5951): pair index i keeps the standard frequency
    base^(-2i/n_dims), but its rotation angle uses the position COMPONENT
    whose section (cyclic over sum(sections)) contains i. With all four
    position streams equal this reduces exactly to NEOX rope."""
    half = p.n_dims // 2
    dim_idx = np.arange(half, dtype=np.float32)
    inv_freq = np.power(p.freq_base, -2.0 * dim_idx / p.n_dims)
    if freq_factors is not None:
        inv_freq = jnp.asarray(inv_freq) \
            / jnp.asarray(freq_factors, jnp.float32)[:half]
    sect = [int(s) for s in sections]
    sect_dims = max(1, sum(sect))
    comp = np.zeros(half, np.int32)
    edges = np.cumsum(sect)
    for i in range(half):
        s = i % sect_dims
        comp[i] = int(np.searchsorted(edges, s, side="right"))
    pos_pair = jnp.take_along_axis(
        positions.astype(jnp.float32),
        jnp.broadcast_to(jnp.asarray(comp)[..., :],
                         positions.shape[:-1] + (half,)),
        axis=-1)
    theta_extrap = pos_pair * inv_freq
    return _finish_angles(theta_extrap, p, dim_idx, dtype)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, mode: int, n_dims: int
) -> jnp.ndarray:
    """Rotate the first n_dims of the last axis of x.

    x: [..., n_heads, head_dim]; cos/sin: [..., n_dims//2] broadcast over heads.
    """
    if mode == ROPE_TYPE_NONE:
        return x
    dtype = x.dtype
    head_dim = x.shape[-1]
    rot, rest = x[..., :n_dims], x[..., n_dims:]
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    rot = rot.astype(jnp.float32)

    if mode == ROPE_TYPE_NORM:
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        r0 = x0 * c - x1 * s
        r1 = x0 * s + x1 * c
        out = jnp.stack([r0, r1], axis=-1).reshape(rot.shape)
    elif mode == ROPE_TYPE_NEOX:
        half = n_dims // 2
        x0 = rot[..., :half]
        x1 = rot[..., half:]
        r0 = x0 * c - x1 * s
        r1 = x0 * s + x1 * c
        out = jnp.concatenate([r0, r1], axis=-1)
    else:
        raise ValueError(f"unsupported rope mode {mode}")

    if n_dims < head_dim:
        out = jnp.concatenate([out, rest.astype(jnp.float32)], axis=-1)
    return out.astype(dtype)
